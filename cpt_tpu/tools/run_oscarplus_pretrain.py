"""Oscar+ pretraining driver: MLM + contrastive over TSV corpora.

Mirrors reference ``Oscar/oscar/run_oscarplus_pretrain.py`` (+ the
``run_mlm.py`` text-only variant via ``--text_only``): masked-LM CE on
caption tokens plus the NSP-style "polluted tags" contrastive CE from the
0.5-probability text-b swap (``oscar_tsv.py:256-``).
"""
from __future__ import annotations

import argparse
import json
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cpt_tpu.data.pretrain import OscarPretrainData
from cpt_tpu.engine import train as train_lib
from cpt_tpu.models.bert.heads import (BertImgForPreTraining,
                                       cross_entropy_ignore_index)
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
    p.add_argument("--captions", default=None,
                   help="json {img_key: caption}")
    p.add_argument("--yaml", default=None,
                   help="multi-corpus descriptor (reference oscar_tsv.py "
                        "format: corpus/corpus_file/image_feature_path)")
    p.add_argument("--chunk_start_id", type=int, default=-1)
    p.add_argument("--chunk_end_id", type=int, default=-1)
    p.add_argument("--train_steps", type=int, default=100)
    p.add_argument("--max_seq_length", type=int, default=35)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--text_only", action="store_true",
                   help="text-only MLM (run_mlm.py equivalent)")
    p.add_argument("--extra_yaml", default=None,
                   help="second (QA-style) corpus descriptor trained "
                        "alongside the main one with --extra_loss_weight "
                        "(reference --extra_dataset_file, "
                        "run_oscarplus_pretrain.py:50,408-425)")
    p.add_argument("--extra_feat_file", default=None)
    p.add_argument("--extra_captions", default=None)
    p.add_argument("--extra_loss_weight", type=float, default=0.0,
                   help="per-step loss = (1-w)*main + w*extra, exactly the "
                        "reference's two-dataloader weighting "
                        "(run_oscarplus_pretrain.py:410-425)")
    p.add_argument("--mask_loss_for_unmatched", type=int, default=1,
                   help="keep MLM loss on polluted od-label tokens "
                        "(reference flag; 0 = drop, oscar_tsv.py:693-694)")
    p.add_argument("--texta_false_prob", type=float, default=0.0,
                   help="ABSOLUTE probability the CAPTION is swapped (the "
                        "wrong-text_a retrieval triplet; od-label swaps "
                        "then fill 0.5 - p): the reference's single-dice "
                        "ladder, oscar_tsv.py:263-283. p < 0.5 enables "
                        "3-way contrastive")
    p.add_argument("--use_b", type=int, default=1,
                   help="1 = caption [SEP] od-labels [SEP] layout; 0 = "
                        "caption-only text side (reference --use_b)")
    p.add_argument("--textb_sample_mode", type=int, default=0,
                   choices=[0, 1, 2],
                   help="polluting-text_b source: 0 = random line "
                        "(caption or tags) of a random other doc, 1/2 = "
                        "its tags line (reference "
                        "run_oscarplus_pretrain.py:78-82)")
    p.add_argument("--extra_textb_sample_mode", type=int, default=1,
                   choices=[0, 1, 2],
                   help="same for the --extra_* corpus (reference "
                        "default 1)")
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop the loop after this many steps while keeping "
                        "the --train_steps LR-schedule horizon — so an "
                        "interrupted run's steps match an uninterrupted "
                        "one's exactly (0 = run to --train_steps)")
    p.add_argument("--save_every", type=int, default=0,
                   help="save a step checkpoint (params+optimizer+step) to "
                        "--output every N steps (reference "
                        "run_oscarplus_pretrain.py periodic save_checkpoint)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint from --output and "
                        "continue mid-run (reference utils/checkpoint.py:"
                        "73-93 recover semantics); per-step seeded rngs "
                        "make the continued run identical to an "
                        "uninterrupted one")
    add_common_args(p)
    # the reference pretrain runner does NOT clip by default
    # (run_oscarplus_pretrain.py:114 --max_grad_norm default=-1.0,
    # :436 `if args.max_grad_norm > 0`), unlike the finetune runners
    p.set_defaults(max_grad_norm=-1.0)
    return p


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    check_img_feature_type(args, "run_oscarplus_pretrain")
    tokenizer = build_tokenizer(args)
    from cpt_tpu.data.pretrain import pretrain_contrast_classes

    cfg = model_config(args, num_contrast_classes=pretrain_contrast_classes(
        args.texta_false_prob, bool(args.use_b)))
    model = BertImgForPreTraining(cfg, dtype=dtype_of(args))

    corrupt_kw = dict(texta_false_prob=args.texta_false_prob,
                      use_b=bool(args.use_b),
                      mask_loss_for_unmatched=bool(
                          args.mask_loss_for_unmatched),
                      textb_sample_mode=args.textb_sample_mode)
    if args.yaml:
        from cpt_tpu.data.pretrain import MultiCorpusPretrainData

        data = MultiCorpusPretrainData(
            args.yaml, tokenizer, args.max_seq_length,
            args.max_img_seq_length, cfg.img_feature_dim,
            chunk_start_id=args.chunk_start_id,
            chunk_end_id=args.chunk_end_id, **corrupt_kw)
        print(f"mixed corpus: {len(data)} samples from "
              f"{'_'.join(data.datasets)}")
    else:
        assert args.feat_file and args.captions, \
            "--yaml or --feat_file/--captions required"
        data = OscarPretrainData(
            args.feat_file, json.load(open(args.captions)), tokenizer,
            args.max_seq_length, args.max_img_seq_length,
            cfg.img_feature_dim, **corrupt_kw)
    # optional second corpus, trained each step at --extra_loss_weight
    # (reference's batch/batch_extra two-dataloader loop,
    # run_oscarplus_pretrain.py:380-425)
    extra = None
    extra_kw = dict(corrupt_kw,
                    textb_sample_mode=args.extra_textb_sample_mode)
    if args.extra_yaml:
        from cpt_tpu.data.pretrain import MultiCorpusPretrainData

        extra = MultiCorpusPretrainData(
            args.extra_yaml, tokenizer, args.max_seq_length,
            args.max_img_seq_length, cfg.img_feature_dim, **extra_kw)
    elif args.extra_feat_file:
        assert args.extra_captions, "--extra_captions required"
        extra = OscarPretrainData(
            args.extra_feat_file, json.load(open(args.extra_captions)),
            tokenizer, args.max_seq_length, args.max_img_seq_length,
            cfg.img_feature_dim, **extra_kw)
    w_extra = args.extra_loss_weight if extra is not None else 0.0

    bsz = args.per_gpu_train_batch_size
    rng_py = random.Random(args.seed)
    batch0 = data.batch(list(range(min(bsz, len(data)))), rng_py, pad_to=bsz)

    img0 = None if args.text_only else jnp.asarray(batch0[3])
    attn0 = (jnp.asarray(batch0[2][:, : args.max_seq_length])
             if args.text_only else jnp.asarray(batch0[2]))
    params = load_or_init(model, (jnp.asarray(batch0[0]),
                                  jnp.asarray(batch0[1]), attn0, img0),
                          args, cfg, task="bert_only")

    ocfg = train_lib.OptimConfig(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=int(args.train_steps * args.warmup_ratio),
        num_train_steps=args.train_steps, scheduler=args.scheduler,
        **optim_overrides(args, betas=(0.9, 0.999)))
    tx = train_lib.build_optimizer(params, ocfg)
    state = train_lib.create_train_state(params, tx)

    def batch_loss(p, batch, rng):
        ids, segs, attn, feats, mlm, contrast = batch
        _, mlm_logits, nsp_logits = model.apply(
            p, ids, segs, attn, img_feats=None if args.text_only else feats,
            deterministic=False, rngs={"dropout": rng})
        mlm_labels = mlm if not args.text_only else mlm[:, : ids.shape[1]]
        mlm_loss = cross_entropy_ignore_index(
            mlm_logits, mlm_labels[:, : mlm_logits.shape[1]])
        nsp_loss = cross_entropy_ignore_index(nsp_logits, contrast)
        return mlm_loss, nsp_loss

    @jax.jit
    def step(state, batch, rng, batch_extra=None):
        def loss_fn(p):
            mlm_loss, nsp_loss = batch_loss(p, batch, rng)
            loss = mlm_loss + nsp_loss
            if batch_extra is not None:
                # reference two-corpus weighting: (1-w)·main + w·extra
                # (run_oscarplus_pretrain.py:410-425 forward_backward)
                me, ne = batch_loss(p, batch_extra,
                                    jax.random.fold_in(rng, 1))
                loss = (1.0 - w_extra) * loss + w_extra * (me + ne)
            return loss, (mlm_loss, nsp_loss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        upd, opt = tx.update(grads, state.opt_state, state.params)
        return train_lib.TrainState(
            optax.apply_updates(state.params, upd), opt,
            state.step + 1), loss, aux

    from cpt_tpu.utils import checkpoint as ckpt_lib

    start_it = 0
    if args.resume and args.output and ckpt_lib.has_checkpoint(args.output):
        state = ckpt_lib.restore_checkpoint(args.output, state)
        start_it = int(state.step)
        print(f"resumed from {ckpt_lib.last_checkpoint_name(args.output)} "
              f"at step {start_it}")

    base_rng = jax.random.PRNGKey(args.seed)
    order = list(range(len(data)))
    losses = []
    stop_at = (min(args.train_steps, args.max_steps) if args.max_steps
               else args.train_steps)
    for it in range(start_it, stop_at):
        # per-step seeds (fold_in / derived Random): the batch and dropout
        # streams depend only on (seed, it), so a resumed run replays the
        # exact uninterrupted sequence
        step_py = random.Random(args.seed * 1_000_003 + it)
        chunk = [order[(it * bsz + j) % len(order)] for j in range(bsz)]
        batch = data.batch(chunk, step_py, pad_to=bsz)
        jb = tuple(jnp.asarray(x) for x in batch)
        if args.text_only:
            jb = (jb[0], jb[1], jb[2][:, : args.max_seq_length], jb[3],
                  jb[4], jb[5])
        jbe = None
        if extra is not None:
            # the reference's second dataloader cycles independently
            # (run_oscarplus_pretrain.py:348-360 batch/batch_extra)
            echunk = [(it * bsz + j) % len(extra) for j in range(bsz)]
            jbe = tuple(jnp.asarray(x)
                        for x in extra.batch(echunk, step_py, pad_to=bsz))
            if args.text_only:
                jbe = (jbe[0], jbe[1], jbe[2][:, : args.max_seq_length],
                       jbe[3], jbe[4], jbe[5])
        sub = jax.random.fold_in(base_rng, it)
        state, loss, (mlm_l, nsp_l) = step(state, jb, sub, jbe)
        losses.append(float(loss))
        if (it + 1) % 20 == 0:
            print(f"step {it + 1}: loss {float(loss):.4f} "
                  f"(mlm {float(mlm_l):.4f} nsp {float(nsp_l):.4f})")
        if (args.save_every and args.output
                and (it + 1) % args.save_every == 0):
            ckpt_lib.save_checkpoint(args.output, f"step{it + 1}", state)
    if losses:
        print(f"pretrain done: first {losses[0]:.4f} -> last "
              f"{losses[-1]:.4f}")
    if args.output:
        ckpt_lib.save_checkpoint(args.output, "pretrained", state)
    return losses


if __name__ == "__main__":
    main()
