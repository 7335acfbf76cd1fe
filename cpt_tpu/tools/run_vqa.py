"""VQA full-finetune driver (``ImageBertForSequenceClassification``, bce).

Mirrors reference ``Oscar/oscar/run_vqa.py``: soft-target BCE over the
answer vocabulary, VQA accuracy = Σ gt score of the argmax answer.
"""
from __future__ import annotations

import argparse
import json
import pickle
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cpt_tpu.data.vqa import VQAData, load_vqa_examples
from cpt_tpu.engine import train as train_lib
from cpt_tpu.models.bert.heads import ImageBertForSequenceClassification
from cpt_tpu.tools._common import (add_common_args, build_tokenizer,
                                   dtype_of, load_or_init, model_config)


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feat_file", required=True)
    p.add_argument("--examples", required=True)
    p.add_argument("--val_examples", default=None)
    p.add_argument("--num_labels", type=int, default=3129)
    p.add_argument("--loss_type", default="bce", choices=["bce", "kl", "xe"])
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    return add_common_args(p)


def evaluate(model, params, data: VQAData, batch_size: int):
    @jax.jit
    def fwd(params, ids, segs, attn, feats):
        _, logits = model.apply(params, ids, segs, attn, img_feats=feats)
        return logits.astype(jnp.float32)

    total_score, n, results = 0.0, 0, {}
    for start in range(0, len(data), batch_size):
        idxs = list(range(start, min(start + batch_size, len(data))))
        b, soft, hard = data.batch(idxs, pad_to=batch_size)
        logits = np.asarray(fwd(params, jnp.asarray(b.input_ids),
                                jnp.asarray(b.segment_ids),
                                jnp.asarray(b.attention_mask),
                                jnp.asarray(b.img_feats)))
        pred = logits.argmax(-1)
        for j, idx in enumerate(idxs):
            ex = data.examples[idx]
            results[ex.q_id] = int(pred[j])
            if ex.label_scores:
                total_score += soft[j, pred[j]]
                n += 1
    return 100.0 * total_score / max(n, 1), results


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    tokenizer = build_tokenizer(args)
    cfg = model_config(args, num_labels=args.num_labels,
                       loss_type=args.loss_type)
    model = ImageBertForSequenceClassification(cfg, dtype=dtype_of(args))

    data = VQAData(args.feat_file, load_vqa_examples(args.examples),
                   args.num_labels, tokenizer, args.max_seq_length,
                   args.max_img_seq_length, cfg.img_feature_dim)
    val = (VQAData(args.feat_file, load_vqa_examples(args.val_examples),
                   args.num_labels, tokenizer, args.max_seq_length,
                   args.max_img_seq_length, cfg.img_feature_dim)
           if args.val_examples else data)

    bsz = args.per_gpu_train_batch_size
    b0, _, _ = data.batch([0], pad_to=bsz)
    params = load_or_init(model, (jnp.asarray(b0.input_ids),
                                  jnp.asarray(b0.segment_ids),
                                  jnp.asarray(b0.attention_mask),
                                  jnp.asarray(b0.img_feats)), args, cfg)

    if args.num_train_epochs > 0:
        steps = max(1, len(data) // bsz) * args.num_train_epochs
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(steps * args.warmup_ratio), num_train_steps=steps)
        tx = train_lib.build_optimizer(params, ocfg)
        state = train_lib.create_train_state(params, tx)

        @jax.jit
        def step(state, batch, rng):
            ids, segs, attn, feats, soft, hard = batch

            def loss_fn(p):
                target = soft if cfg.loss_type in ("bce", "kl") else hard
                loss, _ = model.apply(p, ids, segs, attn, img_feats=feats,
                                      labels=target, deterministic=False,
                                      rngs={"dropout": rng})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            upd, opt = tx.update(grads, state.opt_state, state.params)
            return train_lib.TrainState(
                optax.apply_updates(state.params, upd), opt,
                state.step + 1), loss

        rng = jax.random.PRNGKey(args.seed)
        order_rng = random.Random(args.seed)
        for epoch in range(args.num_train_epochs):
            order = list(range(len(data)))
            order_rng.shuffle(order)
            for start in range(0, len(order), bsz):
                chunk = order[start:start + bsz]
                b, soft, hard = data.batch(chunk, pad_to=bsz)
                rng, sub = jax.random.split(rng)
                state, loss = step(
                    state, (jnp.asarray(b.input_ids),
                            jnp.asarray(b.segment_ids),
                            jnp.asarray(b.attention_mask),
                            jnp.asarray(b.img_feats), jnp.asarray(soft),
                            jnp.asarray(hard)), sub)
            if (epoch + 1) % 5 == 0:
                print(f"epoch {epoch + 1}: loss {float(loss):.4f}")
        params = state.params

    acc, results = evaluate(model, params, val, args.per_gpu_eval_batch_size)
    print(f"vqa score: {acc:.2f}")
    if args.output:
        pickle.dump({"accuracy": acc, "results": results},
                    open(args.output, "wb"))
    return acc


if __name__ == "__main__":
    main()
