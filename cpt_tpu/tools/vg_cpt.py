"""VG relation-detection CPT driver — multi-mask predicate scoring.

Mirrors reference ``Oscar/oscar/fewshot/vg_cpt.py``: per subject/object pair
six template sequences (mask widths 1-3 × both directions), predicate score
= mean log-softmax-prob of its tokens at the matching-width masks; recall
eval over the 51-predicate VG vocabulary
(``vg_cpt.py:255-306``, ``utils/vg_eval.py``).
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
from cpt_tpu.data import prompts
from cpt_tpu.data.vg import VGCPTData, reverse_imkey
from cpt_tpu.engine import train as train_lib
from cpt_tpu.engine.evaluate import vg_recall_eval
from cpt_tpu.models.bert.heads import REC_MLM_CPT
from cpt_tpu.utils import convert as cv
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feat_file", required=True, help="eval predictions.tsv")
    p.add_argument("--train_feat_file", default=None)
    p.add_argument("--predicate_vocab", required=True,
                   help='json {"idx_to_predicate": {"1": "on", ...}}')
    p.add_argument("--gt_file", default=None,
                   help="pickle [{img_path, relations [R,3]}] for recall eval")
    p.add_argument("--vocab", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--num_train_epochs", type=int, default=0)
    p.add_argument("--per_gpu_train_batch_size", type=int, default=8)
    p.add_argument("--per_gpu_eval_batch_size", type=int, default=48)
    p.add_argument("--learning_rate", type=float, default=2.5e-5)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--max_seq_length", type=int, default=70)
    p.add_argument("--max_img_seq_length", type=int, default=50)
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


def make_multi_mask_fn(model):
    @jax.jit
    def fn(params, input_ids, segment_ids, attention_mask, img_feats,
           mask_positions):
        _, logits = model.apply(params, input_ids, segment_ids,
                                attention_mask, img_feats=img_feats,
                                mask_pos=mask_positions)  # [N, W, V]
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return fn


def evaluate(model, params, data: VGCPTData, idx2pred_tokens, batch_size: int):
    """→ predictions {imkey: logits [num_pred + 1]} over both directions."""
    fn = make_multi_mask_fn(model)
    w = prompts.VG_MAX_MASK_WIDTH
    predictions = {}
    per_pair = 2 * w
    pairs_per_batch = max(1, batch_size // per_pair)
    n_pred = max(idx2pred_tokens) + 1
    for start in range(0, len(data), pairs_per_batch):
        idxs = list(range(start, min(start + pairs_per_batch, len(data))))
        b, _labels, mask_positions, meta = data.batch(
            idxs, both_directions=True, pad_to=pairs_per_batch * per_pair)
        probs = np.asarray(fn(params, jnp.asarray(b.input_ids),
                              jnp.asarray(b.segment_ids),
                              jnp.asarray(b.attention_mask),
                              jnp.asarray(b.img_feats),
                              jnp.asarray(np.maximum(mask_positions, 0))))
        for j, idx in enumerate(idxs):
            img_key = meta[j * per_pair][1]
            rows = probs[j * per_pair:(j + 1) * per_pair]   # [6, W, V]
            for direction, key in ((0, img_key), (1, reverse_imkey(img_key))):
                logits = np.zeros(n_pred, np.float32)
                block = rows[direction * w:(direction + 1) * w]
                for pidx, tokens in idx2pred_tokens.items():
                    k = len(tokens)
                    pr = block[k - 1, np.arange(k), tokens]
                    logits[pidx] = float(np.mean(np.log(np.maximum(pr, 1e-20))))
                predictions[key] = logits
    return predictions


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    tokenizer = BertTokenizer(args.vocab if args.vocab else toy_vocab())
    cfg = model_config(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = REC_MLM_CPT(cfg, dtype=dtype)

    vocab = json.load(open(args.predicate_vocab))
    idx2pred_tokens = {
        int(i): tokenizer.convert_tokens_to_ids(tokenizer.tokenize(
            prompts.REL_CANONICALIZE.get(p, p)))
        for i, p in vocab["idx_to_predicate"].items()}

    data = VGCPTData(args.feat_file, tokenizer, args.max_seq_length,
                     args.max_img_seq_length, cfg.img_feature_dim)

    b0, _, _, _ = data.batch([0])
    init = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), jnp.asarray(b0.input_ids),
        jnp.asarray(b0.segment_ids), jnp.asarray(b0.attention_mask),
        jnp.asarray(b0.img_feats))
    if args.checkpoint:
        pre = cv.convert_bert_state_dict(cv.load_torch_file(args.checkpoint), cfg)
        params = {"params": cv.merge_pretrained_into_init(
            init["params"], cv.params_for_task(pre, "rec_mlm_cpt"))}
    else:
        params = init
        print("WARNING: random init (no --checkpoint)")

    if args.num_train_epochs > 0 and args.train_feat_file:
        train_data = VGCPTData(args.train_feat_file, tokenizer,
                               args.max_seq_length, args.max_img_seq_length,
                               cfg.img_feature_dim)
        w = prompts.VG_MAX_MASK_WIDTH
        bsz = args.per_gpu_train_batch_size  # pairs per step (x3 width seqs)
        steps = max(1, len(train_data) // bsz) * args.num_train_epochs
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(steps * args.warmup_ratio), num_train_steps=steps)
        tx = train_lib.build_optimizer(params, ocfg)
        state = train_lib.create_train_state(params, tx)
        step_fn = train_lib.make_mlm_train_step(model, tx)
        rng = jax.random.PRNGKey(args.seed)
        import random as pyrandom

        order_rng = pyrandom.Random(args.seed)
        t0 = time.time()
        for epoch in range(args.num_train_epochs):
            order = list(range(len(train_data)))
            order_rng.shuffle(order)
            for start in range(0, len(order), bsz):
                chunk = order[start:start + bsz]
                b, mlm_labels, mask_positions, _meta = train_data.batch(
                    chunk, both_directions=False, pad_to=bsz * w)
                arrays = (jnp.asarray(b.input_ids), jnp.asarray(b.segment_ids),
                          jnp.asarray(b.attention_mask),
                          jnp.asarray(b.img_feats),
                          jnp.asarray(np.maximum(mask_positions, 0)),
                          jnp.asarray(mlm_labels))
                rng, sub = jax.random.split(rng)
                state, loss = step_fn(state, arrays, sub)
            if (epoch + 1) % 5 == 0:
                print(f"epoch {epoch + 1}: loss {float(loss):.4f} "
                      f"({time.time() - t0:.1f}s)")
        params = state.params

    predictions = evaluate(model, params, data, idx2pred_tokens,
                           args.per_gpu_eval_batch_size)
    result = None
    if args.gt_file:
        gts = pickle.load(open(args.gt_file, "rb"))
        result = vg_recall_eval(predictions, gts,
                                num_classes=max(idx2pred_tokens) + 1)
        print("  ".join(f"{k}: {v:.4f}" for k, v in result.items()))
    if args.output:
        pickle.dump({"predictions": predictions, "recall": result},
                    open(args.output, "wb"))
    return predictions, result


if __name__ == "__main__":
    main()
