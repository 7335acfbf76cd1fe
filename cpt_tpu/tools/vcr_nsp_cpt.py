"""VCR CPT driver — q→a / qa→r NSP candidate scoring (+ q→ar twin-head).

Mirrors reference ``Oscar/oscar/fewshot/vcr_nsp_cpt.py`` and
``vcr_qar_nsp_cpt.py``: each question's candidates become sequence pairs;
``NSPCPT`` (pretrained NSP head) scores each, score = 1 − softmax[:, 1];
argmax per candidate group. Training labels: 0 at the correct candidate,
1 elsewhere. ``--task qar`` uses ``VCRQAR_NSPCPT`` twin heads: answers with
the "ans" head, rationales (conditioned on the predicted answer) with "rat";
q→ar accuracy requires both correct.
"""
from __future__ import annotations

import argparse
import json
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.config.bert import OSCAR_BASE
from cpt_tpu.data.vcr import VCRCPTData, load_vcr_examples
from cpt_tpu.engine import train as train_lib
from cpt_tpu.engine.scoring import make_nsp_score_fn
from cpt_tpu.models.bert.heads import (NSPCPT, NSPFT, VCRQAR_NSPCPT,
                                       VCR_QAR_NSPFT)
from cpt_tpu.tools._common import add_clip_arg, clip_of
from cpt_tpu.utils import convert as cv
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feat_file", required=True)
    p.add_argument("--examples", required=True, help="examples json/jsonl")
    p.add_argument("--val_examples", default=None)
    p.add_argument("--val_feat_file", default=None,
                   help="eval-split feature TSV; the reference loads train "
                        "and eval features from separate dirs "
                        "(vcr_nsp_cpt.py:774-776,968-981). Defaults to "
                        "--feat_file")
    p.add_argument("--task", default="qa", choices=["qa", "qar_r", "qar"],
                   help="qa: q->a; qar_r: qa->r; qar: q->ar twin heads")
    p.add_argument("--model_variant", default="cpt", choices=["cpt", "ft"],
                   help="cpt: pretrained NSP head (NSPCPT); ft: fresh "
                        "classifier (NSPFT, reference vcr_ft.py)")
    p.add_argument("--vocab", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--num_train_epochs", type=int, default=0)
    p.add_argument("--per_gpu_train_batch_size", type=int, default=4,
                   help="examples per batch (x num candidates sequences)")
    p.add_argument("--per_gpu_eval_batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=2.5e-5)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    add_clip_arg(p, "vcr_nsp_cpt.py:458-461")
    p.add_argument("--max_seq_length", type=int, default=80)
    p.add_argument("--max_img_seq_length", type=int, default=60)
    p.add_argument("--seed", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--num_hidden_layers", type=int, default=None)
    p.add_argument("--img_feature_dim", type=int, default=None)
    return p


def model_config(args):
    import dataclasses

    overrides = {}
    for k in ("hidden_size", "num_hidden_layers", "img_feature_dim"):
        if getattr(args, k) is not None:
            overrides[k] = getattr(args, k)
    if args.hidden_size is not None and args.hidden_size < 768:
        overrides.setdefault("num_attention_heads", max(1, args.hidden_size // 16))
        overrides.setdefault("intermediate_size", args.hidden_size * 4)
    return (dataclasses.replace(OSCAR_BASE, **overrides)
            if overrides else OSCAR_BASE)


def group_scores(flat_scores: np.ndarray, meta, n_examples: int):
    """[(example idx, cand idx)] + flat scores → {example: [cand scores]}."""
    grouped = {}
    for s, (ex_i, ci) in zip(flat_scores, meta):
        grouped.setdefault(ex_i, {})[ci] = float(s)
    return {k: [v[i] for i in sorted(v)] for k, v in grouped.items()}


def run_eval(model, params, data: VCRCPTData, batch_size: int, *,
             head=None, use_rationale=False):
    fn = make_nsp_score_fn(model, head=head)
    results, n_correct, n_total = {}, 0, 0
    for start in range(0, len(data), batch_size):
        idxs = list(range(start, min(start + batch_size, len(data))))
        max_cands = max(
            len(data.examples[i].rationale_choices if use_rationale
                else data.examples[i].choices) for i in idxs)
        b, _labels, meta = data.batch(idxs, use_rationale=use_rationale,
                                      pad_to=batch_size * max_cands)
        scores = np.asarray(fn(params, jnp.asarray(b.input_ids),
                               jnp.asarray(b.segment_ids),
                               jnp.asarray(b.attention_mask),
                               jnp.asarray(b.img_feats)))
        grouped = group_scores(scores[: len(meta)], meta, len(idxs))
        for ex_i, cand_scores in grouped.items():
            ex = data.examples[ex_i]
            pred = int(np.argmax(cand_scores))
            gt = ex.rationale_label if use_rationale else ex.label
            results[ex.q_id] = {"pred": pred, "scores": cand_scores,
                                "gt": gt}
            if gt is not None:
                n_correct += int(pred == gt)
                n_total += 1
    return 100.0 * n_correct / max(n_total, 1), results


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    tokenizer = BertTokenizer(args.vocab if args.vocab else toy_vocab())
    cfg = model_config(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    twin = args.task == "qar"
    if args.model_variant == "ft":
        model_cls = VCR_QAR_NSPFT if twin else NSPFT
    else:
        model_cls = VCRQAR_NSPCPT if twin else NSPCPT
    model = model_cls(cfg, dtype=dtype)

    data = VCRCPTData(args.feat_file, load_vcr_examples(args.examples),
                      tokenizer, args.max_seq_length, args.max_img_seq_length,
                      cfg.img_feature_dim)
    val_data = (VCRCPTData(args.val_feat_file or args.feat_file,
                           load_vcr_examples(args.val_examples), tokenizer,
                           args.max_seq_length, args.max_img_seq_length,
                           cfg.img_feature_dim)
                if args.val_examples else data)

    b0, _, _ = data.batch([0])
    init = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.asarray(b0.input_ids),
        jnp.asarray(b0.segment_ids), jnp.asarray(b0.attention_mask),
        jnp.asarray(b0.img_feats))
    if args.checkpoint:
        pre = cv.convert_bert_state_dict(cv.load_torch_file(args.checkpoint), cfg)
        if args.model_variant == "ft":
            task = "bert_only"      # FT keeps a freshly-initialized classifier
        else:
            task = "vcr_qar_nsp_cpt" if twin else "nsp_cpt"
        params = {"params": cv.merge_pretrained_into_init(
            init["params"], cv.params_for_task(pre, task))}
    else:
        params = init
        print("WARNING: random init (no --checkpoint)")

    use_rat = args.task == "qar_r"
    if args.num_train_epochs > 0:
        n_cands = len(data.examples[0].rationale_choices if use_rat
                      else data.examples[0].choices)
        bsz = args.per_gpu_train_batch_size
        steps = max(1, len(data) // bsz) * args.num_train_epochs
        # stock AdamW betas + 1.0 clip (reference vcr_nsp_cpt.py:385,458)
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(steps * args.warmup_ratio),
            num_train_steps=steps, betas=(0.9, 0.999),
            max_grad_norm=clip_of(args))
        tx = train_lib.build_optimizer(params, ocfg)
        state = train_lib.create_train_state(params, tx)
        head_kw = {"head": "rat" if use_rat else "ans"} if twin else {}
        step_fn = train_lib.make_nsp_train_step(model, tx, **head_kw)
        rng = jax.random.PRNGKey(args.seed)
        import random as pyrandom

        order_rng = pyrandom.Random(args.seed)
        t0 = time.time()
        for epoch in range(args.num_train_epochs):
            order = list(range(len(data)))
            order_rng.shuffle(order)
            for start in range(0, len(order), bsz):
                chunk = order[start:start + bsz]
                b, labels, _meta = data.batch(chunk, use_rationale=use_rat,
                                              pad_to=bsz * n_cands)
                arrays = (jnp.asarray(b.input_ids), jnp.asarray(b.segment_ids),
                          jnp.asarray(b.attention_mask),
                          jnp.asarray(b.img_feats), jnp.asarray(labels))
                rng, sub = jax.random.split(rng)
                state, loss = step_fn(state, arrays, sub)
            if (epoch + 1) % 5 == 0:
                print(f"epoch {epoch + 1}: loss {float(loss):.4f} "
                      f"({time.time() - t0:.1f}s)")
        params = state.params

    if twin:
        acc_a, res_a = run_eval(model, params, val_data,
                                args.per_gpu_eval_batch_size, head="ans")
        acc_r, res_r = run_eval(model, params, val_data,
                                args.per_gpu_eval_batch_size, head="rat",
                                use_rationale=True)
        both = [int(res_a[q]["pred"] == res_a[q]["gt"]
                    and res_r[q]["pred"] == res_r[q]["gt"])
                for q in res_a if res_a[q]["gt"] is not None]
        acc = 100.0 * float(np.mean(both)) if both else 0.0
        print(f"q->a: {acc_a:.2f}  qa->r: {acc_r:.2f}  q->ar: {acc:.2f}")
        results = {"qa": res_a, "qar": res_r}
    else:
        acc, results = run_eval(model, params, val_data,
                                args.per_gpu_eval_batch_size,
                                use_rationale=use_rat)
        print(f"accuracy: {acc:.2f}")
    if args.output:
        pickle.dump({"accuracy": acc, "results": results},
                    open(args.output, "wb"))
    return acc


if __name__ == "__main__":
    main()
