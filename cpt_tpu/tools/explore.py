"""Prompt-design search: sweep colors / ZSL templates by zero-shot accuracy.

Parity with the reference's exploration scripts
(``Oscar/oscar/explore/explore_color_recog.py`` — which color word the
pretrained MLM recognizes best for painted regions — and
``explore_template.py`` / ``sgd_to_explore_template.py`` — zero-shot
accuracy per prompt template). Those are one-off research scripts; this is
the same search as a first-class driver: each candidate (color word or
template id) is evaluated with the standard zero-shot RefCOCO pipeline and
ranked by accuracy. The winning values the paper shipped (red
RGBA(240,0,30,127); template 1) are the defaults in ``data/prompts.py``.

Note: sweeping a *color* fully requires re-extracting features with that
paint color (stage 1); given a mapping color→predictions.tsv this driver
evaluates each. Template sweeps reuse one predictions.tsv.
"""
from __future__ import annotations

import argparse
import json
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["templates", "colors", "soft"],
                   default="templates")
    p.add_argument("--soft_slots", default="2,2",
                   help="soft mode: n_pre,n_post learnable [unusedN] "
                        "slots around [MASK]")
    p.add_argument("--soft_steps", type=int, default=100,
                   help="soft mode: optimizer steps")
    p.add_argument("--soft_lr", type=float, default=0.02,
                   help="soft mode: AdamW lr on the slot embeddings "
                        "(reference sgd_to_explore_template.py:392)")
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=8)
    p.add_argument("--data_file", default=None,
                   help="predictions.tsv (templates mode)")
    p.add_argument("--color_data", default=None,
                   help='json {"red": "red_predictions.tsv", ...} '
                        "(colors mode)")
    p.add_argument("--ann_file", default=None)
    p.add_argument("--det_file", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--templates", default="1,2,3,4,5,6")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N queries")
    p.add_argument("--output", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="tiny self-contained smoke sweep (random weights)")
    return p


def _setup(args, data_file):
    from cpt_tpu.config.bert import OSCAR_BASE, tiny_bert_config
    from cpt_tpu.data.refcoco import RefcocoCPTData
    from cpt_tpu.models.bert.heads import REC_MLM_CPT
    from cpt_tpu.utils.tokenization import (BertTokenizer, load_vocab,
                                            toy_vocab)

    if args.synthetic:
        tok = BertTokenizer(toy_vocab())
        cfg = tiny_bert_config(vocab_size=192, img_feature_dim=134)
    else:
        tok = BertTokenizer(load_vocab(args.vocab))
        cfg = OSCAR_BASE
    model = REC_MLM_CPT(cfg, dtype=jnp.bfloat16)

    def data_for(template: Optional[int], soft_slots=None):
        return RefcocoCPTData(data_file, args.ann_file, args.det_file, tok,
                              img_feat_dim=cfg.img_feature_dim,
                              zsl_template=template, soft_slots=soft_slots)

    d0 = data_for(None)
    ex0 = d0.example(0)
    t = ex0.seqs[0]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(t.input_ids[None]),
        jnp.asarray(t.segment_ids[None]),
        jnp.asarray(t.attention_mask[None]),
        jnp.zeros((1, d0.img_seq_len, cfg.img_feature_dim)))
    if args.checkpoint:
        from cpt_tpu.utils.convert import (load_torch_file,
                                           merge_pretrained_into_init)
        params = merge_pretrained_into_init(
            load_torch_file(args.checkpoint), params, cfg)
    return model, params, tok, data_for


def soft_prompt_optimizer(slot_ids, lr: float):
    """AdamW on ONLY the ``word_embeddings`` rows in ``slot_ids``.

    The reference's TemplateEmbedding (sgd_to_explore_template.py:26-57)
    substitutes a 21-row trainable table at token ids 1-20 and trains
    only that table; since those [unusedN] ids never occur outside the
    template slots, that is exactly equivalent to training only those
    rows of the word-embedding table with everything else frozen. Grad
    AND update are row-masked (the latter kills AdamW's decoupled decay
    on the frozen rows). ``slot_ids`` are the actual vocab ids of the
    slot tokens (derive via ``tok.convert_tokens_to_ids`` — in the real
    BERT vocab [unused1] is id 2, not 1)."""
    import optax

    slot_ids = np.asarray(slot_ids, np.int32)

    def emb_mask(tree):
        flat, td = jax.tree_util.tree_flatten_with_path(tree)
        return jax.tree_util.tree_unflatten(
            td, ["word_embeddings" in jax.tree_util.keystr(p)
                 for p, _ in flat])

    def row_zero(updates):
        def f(path, u):
            if "word_embeddings" in jax.tree_util.keystr(path):
                row = jnp.zeros((u.shape[0], 1), u.dtype)
                row = row.at[jnp.asarray(slot_ids)].set(1)
                return u * row
            return jnp.zeros_like(u)

        return jax.tree_util.tree_map_with_path(f, updates)

    def _stateless(fn):
        return optax.GradientTransformation(
            lambda params: optax.EmptyState(),
            lambda updates, state, params=None: (fn(updates), state))

    base = optax.masked(optax.adamw(lr, eps=1e-8), emb_mask)
    return optax.chain(_stateless(row_zero), base, _stateless(row_zero))


def run_soft_mode(args, results):
    """Continuous-template search: optimize the slot embeddings against
    the RefCOCO MLM objective, report zero-shot accuracy before/after,
    and read out the nearest vocabulary tokens per slot (the reference's
    readout applies the MLM head to the trained rows,
    sgd_to_explore_template.py:419-426)."""
    from cpt_tpu.data.refcoco import iter_train_batches
    from cpt_tpu.engine import train as train_lib
    from cpt_tpu.engine.scoring import refcoco_evaluate

    n_pre, n_post = (int(x) for x in args.soft_slots.split(","))
    k = n_pre + n_post
    model, params, tok, data_for = _setup(args, args.data_file)
    # The actual vocab rows behind the prompt's [unused1]..[unusedK]
    # slots (id 2..K+1 in real BERT vocabs where [unused0]=1).
    slot_ids = tok.convert_tokens_to_ids(
        [f"[unused{i}]" for i in range(1, k + 1)])
    data = data_for(None, soft_slots=(n_pre, n_post))
    idx = (list(range(min(args.limit, len(data)))) if args.limit else None)

    acc0, _ = refcoco_evaluate(model, params, data, tok,
                               batch_size=args.batch_size, indices=idx)
    results["soft_before"] = acc0
    print(f"soft slots {n_pre}+{n_post}: zero-shot acc {acc0:.2f}")

    tx = soft_prompt_optimizer(slot_ids, args.soft_lr)
    state = train_lib.create_train_state(params, tx)
    step_fn = train_lib.make_mlm_train_step(model, tx, dropout=False)
    rng = jax.random.PRNGKey(args.seed)
    it = 0
    while it < args.soft_steps:
        for fb in iter_train_batches(data, args.train_batch_size,
                                     seed=args.seed + it):
            rng, sub = jax.random.split(rng)
            state, loss = step_fn(state,
                                  train_lib.batch_arrays_mlm(fb), sub)
            it += 1
            if it % 20 == 0:
                print(f"soft step {it}: loss {float(loss):.4f}")
            if it >= args.soft_steps:
                break
    params = state.params

    acc1, _ = refcoco_evaluate(model, params, data, tok,
                               batch_size=args.batch_size, indices=idx)
    results["soft_after"] = acc1
    print(f"soft-tuned acc {acc1:.2f} (was {acc0:.2f})")

    # nearest-token readout per slot
    table = params["params"]["bert"]["embeddings"]["word_embeddings"][
        "embedding"]
    rows = jnp.asarray(table)[jnp.asarray(slot_ids)]
    logits = np.asarray(model.apply(
        params, rows, jnp.asarray(table),
        method=lambda m, h, t: m.mlm_head(h, t)))
    readout = []
    for s in range(k):
        order = np.argsort(-logits[s])[:20]
        readout.append(list(zip(tok.convert_ids_to_tokens(order.tolist()),
                                logits[s][order].tolist())))
        top = [t for t, _ in readout[-1][:5]]
        print(f"slot {s + 1}: {' '.join(top)}")
    results["soft_readout"] = readout
    return results


def main(argv: Optional[List[str]] = None):
    from cpt_tpu.engine.scoring import refcoco_evaluate

    args = build_args().parse_args(argv)
    results = {}

    if args.mode == "soft":
        run_soft_mode(args, results)
        if args.output:
            json.dump(results, open(args.output, "w"))
        return results

    if args.mode == "templates":
        model, params, tok, data_for = _setup(args, args.data_file)
        for tid in [int(t) for t in args.templates.split(",")]:
            data = data_for(tid)
            idx = (list(range(min(args.limit, len(data))))
                   if args.limit else None)
            acc, _ = refcoco_evaluate(model, params, data, tok,
                                      batch_size=args.batch_size,
                                      indices=idx)
            results[f"template{tid}"] = acc
            print(f"template {tid}: acc {acc:.2f}")
    else:
        color_data = json.loads(open(args.color_data).read())
        for color, tsv in color_data.items():
            model, params, tok, data_for = _setup(args, tsv)
            data = data_for(None)
            idx = (list(range(min(args.limit, len(data))))
                   if args.limit else None)
            acc, _ = refcoco_evaluate(model, params, data, tok,
                                      batch_size=args.batch_size,
                                      indices=idx)
            results[color] = acc
            print(f"color {color}: acc {acc:.2f}")

    best = max(results, key=results.get)
    print(f"best: {best} ({results[best]:.2f})")
    if args.output:
        json.dump(results, open(args.output, "w"))
    return results


if __name__ == "__main__":
    main()
