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

from cpt_tpu.data.retrieval import RetrievalData, rank_rerank, rank_scores
from cpt_tpu.data.tensorize import pad_img_feats
from cpt_tpu.engine import train as train_lib
from cpt_tpu.models.bert.heads import ImageBertForSequenceClassification
from cpt_tpu.tools._common import (add_common_args,
                                   build_tokenizer,
                                   check_img_feature_type,
                                   dtype_of,
                                   load_or_init,
                                   model_config,
                                   optim_overrides)


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feat_file", default=None)
    p.add_argument("--data_dir", default=None,
                   help="reference coco_ir layout: {split}_captions.pt "
                        "here + imageid2idx.json/predictions.tsv beside "
                        "--img_feat_file (loads the reference's own data "
                        "files, run_retrieval.py:23-75)")
    p.add_argument("--img_feat_file", default=None,
                   help="3-column (key, num_boxes, b64) feature TSV for "
                        "--data_dir mode")
    p.add_argument("--split", default="train",
                   help="{split}_captions.pt to load in --data_dir mode")
    p.add_argument("--captions", default=None,
                   help="json {img_key: [captions]}")
    p.add_argument("--train_steps", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop the loop early while keeping the "
                        "--train_steps LR-schedule horizon")
    p.add_argument("--save_every", type=int, default=0,
                   help="save full train state to {output_dir}/state "
                        "every N steps")
    p.add_argument("--resume", action="store_true",
                   help="restore {output_dir}/state and continue mid-run "
                        "(exact: per-step seeded streams)")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--eval_img_keys_file", default="",
                   help="text file of image keys (one per line) selecting "
                        "an eval subset, e.g. the COCO 1k/5k folds "
                        "(reference run_retrieval.py:76-84)")
    p.add_argument("--eval_caption_index_file", default="",
                   help="json {img_key: [[img_key, cap_idx], ...]} of "
                        "hard-negative caption candidates per image — "
                        "enables the re-rank evaluation setting the "
                        "reference's published R@K numbers use "
                        "(run_retrieval.py:86-95); .pt files saved by "
                        "torch.save are also accepted")
    p.add_argument("--hard_negative_training", action="store_true",
                   help="sample training negatives from the image's "
                        "caption-index candidates instead of uniformly")
    p.add_argument("--max_seq_length", type=int, default=70)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--att_mask_type", default="CLR",
                   choices=["CLR", "CL", "CR", "LR"],
                   help="caption/od-label/region attention structure "
                        "(reference run_retrieval.py:169-194)")
    p.add_argument("--num_captions_per_img", type=int, default=None,
                   help="cap the captions used per image (reference "
                        "--num_captions_per_img_train)")
    p.add_argument("--num_captions_per_img_val", type=int, default=None,
                   help="separate cap for the EVAL ranking pool "
                        "(reference --num_captions_per_img_val, default 5 "
                        "there). Unset: full-pairwise eval uses the whole "
                        "caption pool, and the re-rank branch uses ALL "
                        "candidates from the caption-index file")
    p.add_argument("--no_od_labels", action="store_true",
                   help="drop od-label text_b (reference --add_od_labels "
                        "off; the published recipes keep it on, our "
                        "default)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard batches over a dp mesh of this many chips")
    return add_common_args(p)


def _load_caption_indexs(path):
    """{img_key: [(img_key, cap_idx), ...]} from json, or from a
    torch.save'd dict (reference run_retrieval.py:92-95 — values may be
    json-encoded strings there)."""
    if path.endswith((".pt", ".bin", ".pth")):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
    else:
        obj = json.load(open(path))
    return {k: (json.loads(v) if isinstance(v, str) else v)
            for k, v in obj.items()}


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    check_img_feature_type(args, "run_retrieval")
    tokenizer = build_tokenizer(args)
    cfg = model_config(args, num_labels=2, loss_type="xe")
    model = ImageBertForSequenceClassification(cfg, dtype=dtype_of(args))

    eval_keys = None
    if args.eval_img_keys_file:
        with open(args.eval_img_keys_file) as f:
            eval_keys = [line.strip() for line in f if line.strip()]
    cap_idx = None
    if args.eval_caption_index_file:
        cap_idx = _load_caption_indexs(args.eval_caption_index_file)
    common = dict(max_seq_len=args.max_seq_length,
                  img_seq_len=args.max_img_seq_length,
                  img_feat_dim=cfg.img_feature_dim,
                  eval_img_keys=eval_keys, caption_indexs=cap_idx,
                  att_mask_type=args.att_mask_type,
                  num_captions_per_img=args.num_captions_per_img,
                  use_od_labels=not args.no_od_labels)
    if args.data_dir:
        from cpt_tpu.data.retrieval import CocoIRRetrievalData

        if not args.img_feat_file:
            raise SystemExit("--data_dir mode needs --img_feat_file")
        data = CocoIRRetrievalData(args.data_dir, args.img_feat_file,
                                   tokenizer, split=args.split, **common)
    else:
        if not (args.feat_file and args.captions):
            raise SystemExit("need --feat_file + --captions, or "
                             "--data_dir + --img_feat_file")
        data = RetrievalData(args.feat_file, json.load(open(args.captions)),
                             tokenizer, **common)

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
            num_train_steps=args.train_steps,
            scheduler=args.scheduler,
            **optim_overrides(args, betas=(0.9, 0.999)))
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

        import os

        from cpt_tpu.utils import checkpoint as ckpt_lib

        start_it = 0
        if (args.resume and args.output_dir
                and ckpt_lib.has_checkpoint(
                    os.path.join(args.output_dir, "state"))):
            state = jax.tree_util.tree_map(rep, ckpt_lib.restore_checkpoint(
                os.path.join(args.output_dir, "state"),
                jax.device_get(state)))
            start_it = int(state.step)
            print(f"resumed at step {start_it}")

        base_rng = jax.random.PRNGKey(args.seed)
        stop_at = (min(args.train_steps, args.max_steps) if args.max_steps
                   else args.train_steps)
        for it in range(start_it, stop_at):
            step_py = random.Random(args.seed * 1_000_003 + it)
            batch = data.train_batch(
                bsz, step_py, hard_negatives=args.hard_negative_training)
            sub = jax.random.fold_in(base_rng, it)
            state, loss = step(
                state, shard_b(tuple(jnp.asarray(x) for x in batch)),
                rep(sub))
            if (it + 1) % 20 == 0:
                print(f"step {it + 1}: loss {float(loss):.4f}")
            if (args.save_every and args.output_dir
                    and (it + 1) % args.save_every == 0):
                ckpt_lib.save_checkpoint(
                    os.path.join(args.output_dir, "state"),
                    f"step{it + 1}", state)
        params = state.params

    @jax.jit
    def fwd(params, ids, segs, attn, feats):
        _, logits = model.apply(params, ids, segs, attn, img_feats=feats)
        return jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1]

    ebsz = args.per_gpu_eval_batch_size
    t, r, d = data.max_seq_len, data.img_seq_len, data.img_feat_dim

    def score_pairs(cap_img_pairs):
        """Match scores for [(caption_text, img_key)], batched."""
        out = np.zeros((len(cap_img_pairs),), np.float32)
        for start in range(0, len(cap_img_pairs), ebsz):
            chunk = cap_img_pairs[start:start + ebsz]
            ids = np.zeros((ebsz, t), np.int32)
            segs = np.zeros((ebsz, t), np.int32)
            attn = np.zeros((ebsz, *data.attn_shape), np.int32)
            feats = np.zeros((ebsz, r, d), np.float32)
            for k, (cap, ik) in enumerate(chunk):
                seq, f = data.tensorize(cap, ik)
                ids[k], segs[k], attn[k], feats[k] = (
                    seq.input_ids, seq.segment_ids, seq.attention_mask, f)
            s = np.asarray(fwd(params, *shard_b(tuple(
                jnp.asarray(x) for x in (ids, segs, attn, feats)))))
            out[start:start + len(chunk)] = s[:len(chunk)]
        return out

    if data.caption_indexs is not None:
        # hard-negative re-rank: each image scored only against its
        # candidate captions (reference run_retrieval.py:113-116, 264-281)
        entries = data.rerank_entries(args.num_captions_per_img_val)
        n_cand = len(entries) // len(data.img_keys)
        # candidate cap_idx indexes the FULL caption pool (the reference
        # never caps the captions dict itself, only the eval indexing)
        scores = score_pairs([(data.full_captions[ik][ci], key)
                              for key, ik, ci, _ in entries])
        labels = np.asarray([lab for *_, lab in entries])
        metrics = rank_rerank(scores, labels, n_cand)
    else:
        # full pairwise ranking over every caption x image pair
        # (the reference's cross_image_eval protocol); the eval caption
        # pool may be capped separately from training
        # (--num_captions_per_img_val, run_retrieval.py:73-75)
        ncap_val = args.num_captions_per_img_val
        if ncap_val is not None:
            # cap from the FULL pool, not the train-capped one — the
            # reference's eval dataset caps independently of training
            data.captions = {k: v[:ncap_val]
                             for k, v in data.full_captions.items()}
        captions_flat, owners = [], []
        for ci, key in enumerate(data.img_keys):
            for cap in data.captions[key]:
                captions_flat.append(cap)
                owners.append(ci)
        n_img = len(data.img_keys)
        flat = score_pairs([(cap, ik) for cap in captions_flat
                            for ik in data.img_keys])
        scores = flat.reshape(len(captions_flat), n_img)
        metrics = rank_scores(scores, owners, n_img)
    print("  ".join(f"{k}: {v:.2f}" for k, v in metrics.items()))
    if args.output:
        pickle.dump({"metrics": metrics, "scores": scores},
                    open(args.output, "wb"))
    return metrics


if __name__ == "__main__":
    main()
