"""NLVR2 driver (``ImageBertForMultipleChoice``, image-pair statements).

Mirrors reference ``Oscar/oscar/run_nlvr.py``: each example's statement is
paired with both images; the multiple-choice head classifies true/false.
"""
from __future__ import annotations

import argparse
import pickle
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cpt_tpu.data.nlvr import NLVRData, load_nlvr_examples
from cpt_tpu.engine import train as train_lib
from cpt_tpu.models.bert.heads import ImageBertForMultipleChoice
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
    p.add_argument("--examples", default=None)
    p.add_argument("--nlvr2_data_dir", default=None,
                   help="reference NLVR2 layout: nlvr2_{split}.json + "
                        "nlvr2_img_frcnn_feats.pt here (run_nlvr.py:73-107"
                        "; loads the reference's own data files)")
    p.add_argument("--split", default="train",
                   help="train split in --nlvr2_data_dir mode "
                        "(train/dev/balanced_dev/...)")
    p.add_argument("--val_split", default=None,
                   help="val split in --nlvr2_data_dir mode")
    p.add_argument("--val_examples", default=None)
    p.add_argument("--max_seq_length", type=int, default=55)
    p.add_argument("--max_img_seq_length", type=int, default=40)
    p.add_argument("--pair_mode", default="pair",
                   choices=["pair", "concat"],
                   help="pair = two choice sequences + multiple-choice "
                        "head (reference --use_pair, the published NLVR2 "
                        "recipe); concat = one sequence with both images' "
                        "labels/features + a binary classifier (the "
                        "reference's default tensorize_example path)")
    p.add_argument("--optim", default="adamw", choices=["adamw", "adamax"],
                   help="optimizer family (reference run_nlvr.py:403-405 "
                        "AdamW | Adamax; the published NLVR2 recipe uses "
                        "AdamW)")
    p.add_argument("--no_od_labels", action="store_true",
                   help="drop the od-label text segment (reference "
                        "--use_label_seq off, run_nlvr.py:713; the "
                        "published recipe keeps labels on, our default)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard batches over a dp mesh of this many chips")
    p.add_argument("--max_steps", type=int, default=0,
                   help="cap total optimizer steps; the LR schedule keeps "
                        "the full epoch horizon (exact-resume kill point)")
    p.add_argument("--save_every", type=int, default=0,
                   help="save full train state to {output_dir}/state "
                        "every N steps")
    p.add_argument("--resume", action="store_true",
                   help="restore {output_dir}/state and continue from the "
                        "saved step (exact: seed-derived shuffles/rngs)")
    p.add_argument("--output_dir", default=None)
    return add_common_args(p)


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    check_img_feature_type(args, "run_nlvr")
    tokenizer = build_tokenizer(args)
    if args.pair_mode == "pair":
        # reference NLVR recipe (run_nlvr.py use_pair path): num_choices=2,
        # mlp classifier over the CONCATENATED pooled pair → 2 labels
        cfg = model_config(args, num_labels=2, classifier="mlp")
        model = ImageBertForMultipleChoice(cfg, num_choices=2,
                                           dtype=dtype_of(args))
    else:
        from cpt_tpu.models.bert.heads import (
            ImageBertForSequenceClassification)

        cfg = model_config(args, num_labels=2, loss_type="xe",
                           classifier="mlp")
        model = ImageBertForSequenceClassification(cfg, dtype=dtype_of(args))

    if args.nlvr2_data_dir:
        from cpt_tpu.data.nlvr import Nlvr2JsonData

        data = Nlvr2JsonData(args.nlvr2_data_dir, args.split, tokenizer,
                             args.max_seq_length, args.max_img_seq_length,
                             cfg.img_feature_dim, mode=args.pair_mode,
                             use_od_labels=not args.no_od_labels)
        val = (Nlvr2JsonData(args.nlvr2_data_dir, args.val_split,
                             tokenizer, args.max_seq_length,
                             args.max_img_seq_length, cfg.img_feature_dim,
                             mode=args.pair_mode,
                             use_od_labels=not args.no_od_labels)
               if args.val_split else data)
    else:
        if not (args.feat_file and args.examples):
            raise SystemExit("need --feat_file + --examples, or "
                             "--nlvr2_data_dir")
        data = NLVRData(args.feat_file, load_nlvr_examples(args.examples),
                        tokenizer, args.max_seq_length,
                        args.max_img_seq_length, cfg.img_feature_dim,
                        mode=args.pair_mode,
                        use_od_labels=not args.no_od_labels)
        val = (NLVRData(args.feat_file,
                        load_nlvr_examples(args.val_examples), tokenizer,
                        args.max_seq_length, args.max_img_seq_length,
                        cfg.img_feature_dim, mode=args.pair_mode,
                        use_od_labels=not args.no_od_labels)
               if args.val_examples else data)

    bsz = args.per_gpu_train_batch_size
    ids, segs, attn, feats, labels = data.batch([0], pad_to=1)
    params = load_or_init(model, tuple(jnp.asarray(x) for x in
                                       (ids, segs, attn, feats)), args, cfg)

    if args.dp > 1:
        from cpt_tpu.parallel.mesh import make_mesh, replicated, shard_batch

        mesh = make_mesh(dp=args.dp, devices=jax.devices()[:args.dp])
        assert bsz % args.dp == 0
        assert args.per_gpu_eval_batch_size % args.dp == 0
        shard_b = lambda b: shard_batch(b, mesh)
        rep = lambda t: jax.device_put(t, replicated(mesh))
    else:
        shard_b = rep = lambda x: x

    if args.num_train_epochs > 0:
        steps_per_epoch = max(1, len(data) // bsz)
        steps = steps_per_epoch * args.num_train_epochs
        stop_at = min(steps, args.max_steps) if args.max_steps else steps
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(steps * args.warmup_ratio), num_train_steps=steps,
            scheduler=args.scheduler, optim=args.optim,
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

        gstep = 0
        if (args.resume and args.output_dir
                and ckpt_lib.has_checkpoint(
                    os.path.join(args.output_dir, "state"))):
            state = jax.tree_util.tree_map(rep, ckpt_lib.restore_checkpoint(
                os.path.join(args.output_dir, "state"),
                jax.device_get(state)))
            gstep = int(state.step)
            print(f"resumed at step {gstep}")

        base_rng = jax.random.PRNGKey(args.seed)
        loss = jnp.float32(float("nan"))
        for epoch in range(gstep // steps_per_epoch,
                           args.num_train_epochs):
            if gstep >= stop_at:
                break
            order = list(range(len(data)))
            random.Random((args.seed + 1) * 7919 + epoch).shuffle(order)
            for si in range(gstep % steps_per_epoch, steps_per_epoch):
                if gstep >= stop_at:
                    break
                chunk = order[si * bsz:(si + 1) * bsz]
                batch = data.batch(chunk, pad_to=bsz)
                sub = jax.random.fold_in(base_rng, gstep)
                state, loss = step(
                    state, shard_b(tuple(jnp.asarray(x) for x in batch)),
                    rep(sub))
                gstep += 1
                if (args.save_every and args.output_dir
                        and gstep % args.save_every == 0):
                    ckpt_lib.save_checkpoint(
                        os.path.join(args.output_dir, "state"),
                        f"step{gstep}", state)
            if (epoch + 1) % 10 == 0:
                print(f"epoch {epoch + 1}: loss {float(loss):.4f}")
        params = state.params

    @jax.jit
    def fwd(params, ids, segs, attn, feats):
        _, logits = model.apply(params, ids, segs, attn, img_feats=feats)
        return logits.astype(jnp.float32)

    n_correct, n_total, results = 0, 0, {}
    ebsz = args.per_gpu_eval_batch_size
    for start in range(0, len(val), ebsz):
        idxs = list(range(start, min(start + ebsz, len(val))))
        ids, segs, attn, feats, labels = val.batch(idxs, pad_to=ebsz)
        logits = np.asarray(fwd(params, *shard_b(tuple(
            jnp.asarray(x) for x in (ids, segs, attn, feats)))))
        pred = logits.argmax(-1)
        for j, idx in enumerate(idxs):
            ex = val.examples[idx]
            results[ex.ex_id] = int(pred[j])
            if labels[j] >= 0:
                n_correct += int(pred[j] == labels[j])
                n_total += 1
    acc = 100.0 * n_correct / max(n_total, 1)
    print(f"nlvr2 accuracy: {acc:.2f}")
    if args.output:
        pickle.dump({"accuracy": acc, "results": results},
                    open(args.output, "wb"))
    return acc


if __name__ == "__main__":
    main()
