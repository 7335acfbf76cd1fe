"""RefCOCO CPT grounding driver — zero-shot eval and few-shot prompt tuning.

Mirrors the reference entry points ``Oscar/oscar/fewshot/refcoco_cpt.py`` and
``Oscar/oscar/zeroshot/refcoco_cpt.py``: loads cached stage-1 features
(predictions.tsv), optionally prompt-tunes ``REC_MLM_CPT`` for N epochs, then
reports grounding accuracy (IoU>0.5).

Usage:
  python -m cpt_tpu.tools.refcoco_cpt \
      --data_file .../predictions.tsv --ann_file .../finetune_refcoco.json \
      --det_file .../dets.json --vocab .../vocab.txt \
      [--checkpoint .../pytorch_model.bin] [--train_data_file ...]
      [--num_train_epochs 20] [--learning_rate 2.5e-5] ...
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.config.bert import OSCAR_BASE, BertConfig
from cpt_tpu.data.refcoco import RefcocoCPTData, iter_train_batches
from cpt_tpu.engine import train as train_lib
from cpt_tpu.engine.scoring import refcoco_evaluate
from cpt_tpu.models.bert.heads import REC_MLM_CPT
from cpt_tpu.utils import convert as cv
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_file", required=True, help="eval predictions.tsv")
    p.add_argument("--train_data_file", default=None,
                   help="train predictions.tsv (few-shot); omit for zero-shot")
    p.add_argument("--ann_file", required=True)
    p.add_argument("--train_ann_file", default=None)
    p.add_argument("--det_file", required=True)
    p.add_argument("--train_det_file", default=None)
    p.add_argument("--vocab", default=None,
                   help="vocab.txt (bert-base-uncased); toy vocab if omitted")
    p.add_argument("--checkpoint", default=None,
                   help="Oscar pytorch_model.bin (random init if omitted)")
    p.add_argument("--output", default=None, help="predictions json out")
    p.add_argument("--txt_seq_len", type=int, default=70)
    p.add_argument("--img_seq_len", type=int, default=50)
    p.add_argument("--per_gpu_eval_batch_size", type=int, default=128)
    p.add_argument("--dp", type=int, default=1,
                   help="shard eval batches over a dp mesh of this many "
                        "chips (batch size must divide)")
    p.add_argument("--per_gpu_train_batch_size", type=int, default=32)
    p.add_argument("--num_train_epochs", type=int, default=20)
    p.add_argument("--learning_rate", type=float, default=2.5e-5)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--lr_mul", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=8)
    p.add_argument("--zsl_template", type=int, default=None,
                   help="zero-shot template variant 1-6 (reference "
                        "refcoco_zsl_cpt_dataset.py); default = fsl template")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    # tiny-config escape hatch for smoke runs without a checkpoint
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--num_hidden_layers", type=int, default=None)
    p.add_argument("--img_feature_dim", type=int, default=None)
    return p


def model_config(args) -> BertConfig:
    cfg = OSCAR_BASE
    import dataclasses

    overrides = {}
    for k in ("hidden_size", "num_hidden_layers", "img_feature_dim"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    if args.hidden_size is not None and args.hidden_size < 768:
        overrides.setdefault("num_attention_heads",
                             max(1, args.hidden_size // 16))
        overrides.setdefault("intermediate_size", args.hidden_size * 4)
        overrides.setdefault("vocab_size", 30522)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def main(argv=None):
    from cpt_tpu.parallel import distributed as dist

    dist.initialize_from_env()
    args = build_args().parse_args(argv)
    tokenizer = BertTokenizer(args.vocab if args.vocab else toy_vocab())
    cfg = model_config(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = REC_MLM_CPT(cfg, dtype=dtype)

    data = RefcocoCPTData(args.data_file, args.ann_file, args.det_file,
                          tokenizer, args.txt_seq_len, args.img_seq_len,
                          cfg.img_feature_dim,
                          zsl_template=args.zsl_template)

    ex = data.example(0)
    t = ex.seqs[0]
    init_params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(t.input_ids[None]), jnp.asarray(t.segment_ids[None]),
        jnp.asarray(t.attention_mask[None]),
        jnp.zeros((1, args.img_seq_len, cfg.img_feature_dim)))
    if args.checkpoint:
        sd = cv.load_torch_file(args.checkpoint)
        pre = cv.convert_bert_state_dict(sd, cfg)
        mapped = cv.params_for_task(pre, "rec_mlm_cpt")
        params = {"params": cv.merge_pretrained_into_init(
            init_params["params"], mapped)}
        print(f"loaded checkpoint {args.checkpoint}")
    else:
        params = init_params
        print("WARNING: random init (no --checkpoint)")

    train_mesh = None
    if args.dp > 1:
        from cpt_tpu.parallel.mesh import make_mesh

        train_mesh = make_mesh(dp=args.dp, devices=jax.devices()[:args.dp])

    if args.train_data_file:
        train_data = RefcocoCPTData(
            args.train_data_file, args.train_ann_file or args.ann_file,
            args.train_det_file or args.det_file, tokenizer,
            args.txt_seq_len, args.img_seq_len, cfg.img_feature_dim)
        # size the schedule like the reference (iters/epoch × epochs)
        approx_steps = max(1, (len(train_data) * 2 //
                               args.per_gpu_train_batch_size)) * args.num_train_epochs
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(approx_steps * args.warmup_ratio),
            num_train_steps=approx_steps, lr_mul=args.lr_mul)
        tx = train_lib.build_optimizer(params, ocfg)
        state = train_lib.create_train_state(params, tx)
        step_fn = train_lib.make_mlm_train_step(model, tx)
        if train_mesh is not None:
            # DDP equivalent: replicate state, shard each batch over dp
            from cpt_tpu.parallel.mesh import replicated, shard_batch

            assert args.per_gpu_train_batch_size % args.dp == 0
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, replicated(train_mesh)), state)
            shard_b = lambda b: shard_batch(b, train_mesh)
        else:
            shard_b = lambda b: b
        rng = jax.random.PRNGKey(args.seed)
        t0 = time.time()
        for epoch in range(args.num_train_epochs):
            for fb in iter_train_batches(train_data,
                                         args.per_gpu_train_batch_size,
                                         seed=args.seed + epoch):
                rng, sub = jax.random.split(rng)
                try:
                    state, loss = step_fn(
                        state, shard_b(train_lib.batch_arrays_mlm(fb)), sub)
                except RuntimeError as e:
                    # reference skips the batch on runtime errors
                    # (refcoco_cpt.py:244-253)
                    print(f"runtime error, skipping batch: {e}")
                    continue
            print(f"epoch {epoch}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.1f}s elapsed)")
        params = state.params

    t0 = time.time()
    mesh = train_mesh
    acc, preds = refcoco_evaluate(model, params, data, tokenizer,
                                  batch_size=args.per_gpu_eval_batch_size,
                                  mesh=mesh,
                                  host_sharded=dist.process_count() > 1)
    dt = time.time() - t0
    n_seq = sum(len(data.example(i).seqs) for i in range(min(len(data), 1)))
    if dist.is_main_process():
        print(f"miou: {acc:.2f}")
        print(f"eval wall-clock: {dt:.1f}s "
              f"({len(data) / max(dt, 1e-9):.1f} queries/s)")
    if args.output:
        out = args.output
        if dist.process_count() > 1:
            out = f"{out}.shard{dist.process_index()}"
        json.dump({"accuracy": acc, "predictions": preds}, open(out, "w"))
    return acc


if __name__ == "__main__":
    main()
