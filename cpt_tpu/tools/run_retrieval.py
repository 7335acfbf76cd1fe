"""Image-text retrieval driver (binary match scoring + R@K ranking).

Mirrors reference ``Oscar/oscar/run_retrieval.py``: binary classifier over
(caption, image) pairs; eval scores every caption×image pair and reports
R@1/5/10 in both directions.
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

from cpt_tpu.data.retrieval import RetrievalData, rank_scores
from cpt_tpu.data.tensorize import pad_img_feats
from cpt_tpu.engine import train as train_lib
from cpt_tpu.models.bert.heads import ImageBertForSequenceClassification
from cpt_tpu.tools._common import (add_common_args, build_tokenizer,
                                   dtype_of, load_or_init, model_config)


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feat_file", required=True)
    p.add_argument("--captions", required=True,
                   help="json {img_key: [captions]}")
    p.add_argument("--train_steps", type=int, default=0)
    p.add_argument("--max_seq_length", type=int, default=70)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--dp", type=int, default=1,
                   help="shard batches over a dp mesh of this many chips")
    return add_common_args(p)


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    tokenizer = build_tokenizer(args)
    cfg = model_config(args, num_labels=2, loss_type="xe")
    model = ImageBertForSequenceClassification(cfg, dtype=dtype_of(args))

    data = RetrievalData(args.feat_file, json.load(open(args.captions)),
                         tokenizer, args.max_seq_length,
                         args.max_img_seq_length, cfg.img_feature_dim)

    rng_py = random.Random(args.seed)
    bsz = args.per_gpu_train_batch_size
    b0 = data.train_batch(bsz, rng_py)
    params = load_or_init(model, tuple(jnp.asarray(x) for x in b0[:4]),
                          args, cfg)

    if args.dp > 1:
        from cpt_tpu.parallel.mesh import make_mesh, replicated, shard_batch

        mesh = make_mesh(dp=args.dp, devices=jax.devices()[:args.dp])
        assert bsz % args.dp == 0
        assert args.per_gpu_eval_batch_size % args.dp == 0
        shard_b = lambda b: shard_batch(b, mesh)
        rep = lambda t: jax.device_put(t, replicated(mesh))
    else:
        shard_b = rep = lambda x: x

    if args.train_steps > 0:
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(args.train_steps * args.warmup_ratio),
            num_train_steps=args.train_steps)
        tx = train_lib.build_optimizer(params, ocfg)
        state = jax.tree_util.tree_map(
            rep, train_lib.create_train_state(params, tx))

        @jax.jit
        def step(state, batch, rng):
            ids, segs, attn, feats, labels = batch

            def loss_fn(p):
                loss, _ = model.apply(p, ids, segs, attn, img_feats=feats,
                                      labels=labels, deterministic=False,
                                      rngs={"dropout": rng})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            upd, opt = tx.update(grads, state.opt_state, state.params)
            return train_lib.TrainState(
                optax.apply_updates(state.params, upd), opt,
                state.step + 1), loss

        rng = jax.random.PRNGKey(args.seed)
        for it in range(args.train_steps):
            batch = data.train_batch(bsz, rng_py)
            rng, sub = jax.random.split(rng)
            state, loss = step(
                state, shard_b(tuple(jnp.asarray(x) for x in batch)),
                rep(sub))
            if (it + 1) % 20 == 0:
                print(f"step {it + 1}: loss {float(loss):.4f}")
        params = state.params

    # rank all caption x image pairs
    @jax.jit
    def fwd(params, ids, segs, attn, feats):
        _, logits = model.apply(params, ids, segs, attn, img_feats=feats)
        return jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1]

    captions_flat, owners = [], []
    for ci, key in enumerate(data.img_keys):
        for cap in data.captions[key]:
            captions_flat.append(cap)
            owners.append(ci)
    n_img = len(data.img_keys)
    scores = np.zeros((len(captions_flat), n_img), np.float32)
    ebsz = args.per_gpu_eval_batch_size
    pairs = [(i, j) for i in range(len(captions_flat)) for j in range(n_img)]
    for start in range(0, len(pairs), ebsz):
        chunk = pairs[start:start + ebsz]
        t, r, d = data.max_seq_len, data.img_seq_len, data.img_feat_dim
        ids = np.zeros((ebsz, t), np.int32)
        segs = np.zeros((ebsz, t), np.int32)
        attn = np.zeros((ebsz, t + r), np.int32)
        feats = np.zeros((ebsz, r, d), np.float32)
        for k, (i, j) in enumerate(chunk):
            seq, f = data.tensorize(captions_flat[i], data.img_keys[j])
            ids[k], segs[k], attn[k], feats[k] = (
                seq.input_ids, seq.segment_ids, seq.attention_mask, f)
        s = np.asarray(fwd(params, *shard_b(tuple(
            jnp.asarray(x) for x in (ids, segs, attn, feats)))))
        for k, (i, j) in enumerate(chunk):
            scores[i, j] = s[k]

    metrics = rank_scores(scores, owners, n_img)
    print("  ".join(f"{k}: {v:.2f}" for k, v in metrics.items()))
    if args.output:
        pickle.dump({"metrics": metrics, "scores": scores},
                    open(args.output, "wb"))
    return metrics


if __name__ == "__main__":
    main()
