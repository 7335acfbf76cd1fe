"""VQA full-finetune driver (``ImageBertForSequenceClassification``, bce).

Mirrors reference ``Oscar/oscar/run_vqa.py``: soft-target BCE over the
answer vocabulary, VQA accuracy = Σ gt score of the argmax answer,
periodic eval with best-model selection (``run_vqa.py:560-585``), and
eval-server submission output — ``{name}_results.json`` rows
``{"question_id": int, "answer": str}`` (``run_vqa.py:815-840``; GQA's
test-std variant ``{"questionId", "prediction"}`` via ``run_gqa.py:698``).

``--dp N`` shards train/eval batches over an N-chip dp mesh (the
reference's DDP equivalent).
"""
from __future__ import annotations

import argparse
import json
import os
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
                                   dtype_of, load_or_init, model_config,
                                   optim_overrides)


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feat_file", default=None)
    p.add_argument("--examples", default=None)
    p.add_argument("--qla_data_dir", default=None,
                   help="reference VQA layout: {split}_img_frcnn_feats.pt "
                        "+ {split}_qla.json here (run_vqa.py:82-133; "
                        "loads the reference's own data files)")
    p.add_argument("--split", default="train2014",
                   help="train split name in --qla_data_dir mode; the "
                        "reference's composite splits work directly "
                        "(train+val2014 = --do_train_val, train2014_vg = "
                        "--use_vg, vg = --use_vg_dev; run_vqa.py:47-67)")
    p.add_argument("--val_split", default=None,
                   help="val split name in --qla_data_dir mode")
    p.add_argument("--feat_split", default=None,
                   help="feature .pt split name when the composite qla "
                        "split reuses another split's features")
    p.add_argument("--val_examples", default=None)
    p.add_argument("--test_examples", default=None,
                   help="unlabeled test split; writes {test_name}_results.json")
    p.add_argument("--test_name", default="test2015",
                   help="submission file prefix (test2015 / test-dev2015 / "
                        "submission)")
    p.add_argument("--label2ans", default=None,
                   help="json list or {label: answer} mapping labels to "
                        "answer strings for submission output")
    p.add_argument("--output_dir", default=None,
                   help="submission jsons + periodic checkpoints")
    p.add_argument("--num_labels", type=int, default=3129)
    p.add_argument("--loss_type", default="bce", choices=["bce", "kl", "xe"])
    p.add_argument("--adjust_dp", action="store_true",
                   help="raise every dropout to 0.3 from epoch 3 on "
                        "(reference run_vqa.py:534-542)")
    p.add_argument("--adjust_loss", action="store_true",
                   help="switch the loss from kl to bce at "
                        "--adjust_loss_epoch (reference run_vqa.py:545-547)")
    p.add_argument("--adjust_loss_epoch", type=int, default=-1)
    p.add_argument("--submission_format", default="vqa",
                   choices=["vqa", "gqa"])
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--eval_every", type=int, default=0,
                   help="eval val every N epochs and keep the best params "
                        "(0 = only at the end)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard batches over a dp mesh of this many chips")
    p.add_argument("--max_steps", type=int, default=0,
                   help="cap total optimizer steps (reference run_vqa.py "
                        "t_total/max_steps); 0 = run all epochs")
    p.add_argument("--save_every", type=int, default=0,
                   help="save a full train-state checkpoint (params+"
                        "optimizer+step) to {output_dir}/state every N "
                        "steps — enables mid-epoch resume")
    p.add_argument("--resume", action="store_true",
                   help="restore {output_dir}/state and continue from the "
                        "saved step; per-epoch shuffles and per-step rngs "
                        "are seed-derived, so the continued run matches an "
                        "uninterrupted one exactly")
    return add_common_args(p)


def _make_fwd(model, mesh):
    def raw(params, ids, segs, attn, feats):
        _, logits = model.apply(params, ids, segs, attn, img_feats=feats)
        return logits.astype(jnp.float32)

    if mesh is None:
        return jax.jit(raw)
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(raw, in_shardings=(NamedSharding(mesh, P()),) +
                   (NamedSharding(mesh, P("dp")),) * 4,
                   out_shardings=NamedSharding(mesh, P("dp")))


def evaluate(model, params, data: VQAData, batch_size: int, mesh=None):
    fwd = _make_fwd(model, mesh)
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


def load_label2ans(path, num_labels):
    """json list / {label: answer} dict, or the reference's pickled
    ``trainval_label2ans.pkl`` list (run_vqa.py cmds)."""
    if path is None:
        return [str(i) for i in range(num_labels)]
    if path.endswith(".pkl"):
        blob = pickle.load(open(path, "rb"))
    else:
        blob = json.load(open(path))
    if isinstance(blob, dict):
        return [blob.get(str(i), str(i)) for i in range(num_labels)]
    return list(blob)


def write_submission(results, label2ans, out_path, fmt: str):
    """Eval-server output rows (reference run_vqa.py:827-840 /
    run_gqa.py:696-703)."""
    rows = []
    for q_id, label in results.items():
        ans = label2ans[label]
        if fmt == "gqa":
            rows.append({"questionId": str(q_id), "prediction": ans})
        else:
            rows.append({"question_id": int(q_id)
                         if str(q_id).lstrip("-").isdigit() else q_id,
                         "answer": ans})
    json.dump(rows, open(out_path, "w"))
    print(f"wrote {out_path} ({len(rows)} rows)")


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    tokenizer = build_tokenizer(args)

    # VQ-VAE codebook files: when {qla_data_dir}/vqvae exists, the code
    # geometry comes from the codebook itself and the code embedding is
    # initialized from it (reference run_vqa.py:1103-1125)
    vq = None
    if args.img_feature_type != "faster_r-cnn" and args.qla_data_dir:
        vqdir = os.path.join(args.qla_data_dir, "vqvae")
        if os.path.isdir(vqdir):
            import torch

            # the reference hardcodes vqvae/train.pt (its splits are only
            # ever 'train'/'val'); fall back to vqvae/{split}.pt so other
            # split names don't force a duplicate codebook file
            vq_path = os.path.join(vqdir, "train.pt")
            if not os.path.exists(vq_path):
                vq_path = os.path.join(vqdir, f"{args.split}.pt")
            vq = torch.load(vq_path, weights_only=False)
            if args.code_level == "top":
                emb = np.asarray(vq["embeddings_t"])
                args.code_dim, args.code_voc = emb.shape
                args.code_size = len(next(iter(vq["feats_top"].values())))
            elif args.code_level == "bottom":
                emb = np.asarray(vq["embeddings_b"])
                args.code_dim, args.code_voc = emb.shape
                args.code_size = len(next(iter(
                    vq["feats_bottom"].values())))
            else:   # both: concatenated dims, no codebook init (:1117)
                args.code_dim = (np.asarray(vq["embeddings_t"]).shape[0]
                                 + np.asarray(vq["embeddings_b"]).shape[0])
                args.code_size = len(next(iter(vq["feats_both"].values())))

    cfg = model_config(args, num_labels=args.num_labels,
                       loss_type=args.loss_type)
    model = ImageBertForSequenceClassification(cfg, dtype=dtype_of(args))

    mesh = None
    if args.dp > 1:
        from cpt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, devices=jax.devices()[:args.dp])
        assert args.per_gpu_train_batch_size % args.dp == 0
        assert args.per_gpu_eval_batch_size % args.dp == 0

    if args.qla_data_dir:
        from cpt_tpu.data.vqa import QlaVQAData

        lvl = args.code_level if vq is not None else None
        data = QlaVQAData(args.qla_data_dir, args.split, args.num_labels,
                          tokenizer, args.max_seq_length,
                          args.max_img_seq_length, cfg.img_feature_dim,
                          feat_split=args.feat_split, vqvae_level=lvl)
        val = (QlaVQAData(args.qla_data_dir, args.val_split,
                          args.num_labels, tokenizer, args.max_seq_length,
                          args.max_img_seq_length, cfg.img_feature_dim,
                          vqvae_level=lvl)
               if args.val_split else data)
    else:
        if not (args.feat_file and args.examples):
            raise SystemExit("need --feat_file + --examples, or "
                             "--qla_data_dir")
        data = VQAData(args.feat_file, load_vqa_examples(args.examples),
                       args.num_labels, tokenizer, args.max_seq_length,
                       args.max_img_seq_length, cfg.img_feature_dim)
        val = (VQAData(args.feat_file, load_vqa_examples(args.val_examples),
                       args.num_labels, tokenizer, args.max_seq_length,
                       args.max_img_seq_length, cfg.img_feature_dim)
               if args.val_examples else data)

    if args.img_feature_type != "faster_r-cnn":
        if not getattr(data, "code_mode", False):
            raise SystemExit(
                "--img_feature_type dis_code[_t] needs integer code-id "
                "arrays in the feature file (qla .pt loader)")
        if args.img_feature_type == "dis_code_t":
            for d in {id(data): data, id(val): val}.values():
                d.enable_code_t(args.code_size, args.code_dim)

    bsz = args.per_gpu_train_batch_size
    b0, _, _ = data.batch([0], pad_to=bsz)
    load_info = {}
    params = load_or_init(model, (jnp.asarray(b0.input_ids),
                                  jnp.asarray(b0.segment_ids),
                                  jnp.asarray(b0.attention_mask),
                                  jnp.asarray(b0.img_feats)), args, cfg,
                          info=load_info)
    # don't clobber a fine-tuned checkpoint's TRAINED code embedding with
    # the raw codebook — init from the codebook only when the checkpoint
    # didn't supply one (the reference's do_eval reload skips
    # init_code_embedding for the same reason, run_vqa.py:1188)
    ckpt_has_code = (load_info.get("ckpt_params") is not None and
                     "code_embeddings" in
                     load_info["ckpt_params"].get("bert", {}))
    if (vq is not None and args.code_level in ("top", "bottom")
            and not ckpt_has_code):
        # init the code embedding from the VQ-VAE codebook, transposed to
        # [code_voc, code_dim] (reference run_vqa.py:1121-1125 +
        # modeling_bert.py:322-323)
        emb = np.asarray(vq["embeddings_t" if args.code_level == "top"
                            else "embeddings_b"]).T
        ce = params["params"]["bert"]["code_embeddings"]
        assert ce["embedding"].shape == emb.shape, \
            (ce["embedding"].shape, emb.shape)
        ce["embedding"] = jnp.asarray(emb, ce["embedding"].dtype)
        print(f"initialized code embedding from the {args.code_level} "
              f"codebook {emb.shape}")

    best = {"acc": -1.0, "params": params, "epoch": 0}
    if args.num_train_epochs > 0:
        steps_per_epoch = max(1, len(data) // bsz)
        steps = steps_per_epoch * args.num_train_epochs
        # --max_steps caps the LOOP only; the LR schedule keeps the full
        # horizon so an interrupted-then-resumed run matches an
        # uninterrupted one step for step
        stop_at = min(steps, args.max_steps) if args.max_steps else steps
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(steps * args.warmup_ratio), num_train_steps=steps,
            scheduler=args.scheduler,
            **optim_overrides(args, betas=(0.9, 0.999)))
        tx = train_lib.build_optimizer(params, ocfg)
        state = train_lib.create_train_state(params, tx)

        # --adjust_dp / --adjust_loss rebuild the (parameterless) dropout/
        # loss configuration mid-training (reference run_vqa.py:534-547:
        # dropout → 0.3 from epoch 3, kl → bce from --adjust_loss_epoch);
        # the param tree is unchanged, so the same state flows through —
        # at most one extra compile per configuration
        _steps = {}

        def step_for(epoch):
            import dataclasses as _dc

            drop = (0.3 if args.adjust_dp and epoch >= 3
                    else cfg.hidden_dropout_prob)
            # reference run_vqa.py:545 — `epoch >= args.adjust_loss_epoch`
            # with default -1, so bare --adjust_loss switches from epoch 0
            lt = ("bce" if args.adjust_loss
                  and epoch >= args.adjust_loss_epoch else cfg.loss_type)
            key = (drop, lt)
            if key not in _steps:
                # the reference bumps the classifier/img-embedding/text-
                # embedding dropouts only; our hidden dropouts share one
                # config knob (attention-probs dropout stays untouched,
                # as in the reference)
                mcfg = _dc.replace(cfg, hidden_dropout_prob=drop,
                                   loss_type=lt)
                m = (model if mcfg == cfg
                     else ImageBertForSequenceClassification(
                         mcfg, dtype=dtype_of(args)))

                def step_raw(state, batch, rng, m=m, lt=lt):
                    ids, segs, attn, feats, soft, hard = batch

                    def loss_fn(p):
                        target = soft if lt in ("bce", "kl") else hard
                        loss, _ = m.apply(p, ids, segs, attn,
                                          img_feats=feats, labels=target,
                                          deterministic=False,
                                          rngs={"dropout": rng})
                        return loss

                    loss, grads = jax.value_and_grad(loss_fn)(state.params)
                    upd, opt = tx.update(grads, state.opt_state,
                                         state.params)
                    return train_lib.TrainState(
                        optax.apply_updates(state.params, upd), opt,
                        state.step + 1), loss

                _steps[key] = jax.jit(step_raw)
            return _steps[key]

        if mesh is None:
            shard_b = rep = lambda x: x
        else:
            from cpt_tpu.parallel.mesh import replicated, shard_batch

            shard_b = lambda b: shard_batch(b, mesh)
            rep = lambda t: jax.device_put(t, replicated(mesh))
            state = jax.tree_util.tree_map(rep, state)

        from cpt_tpu.utils import checkpoint as ckpt_lib

        gstep = 0
        if args.resume and args.output_dir:
            state_dir = os.path.join(args.output_dir, "state")
            if ckpt_lib.has_checkpoint(state_dir):
                state = jax.tree_util.tree_map(rep, ckpt_lib.
                                               restore_checkpoint(state_dir,
                                                                  state))
                gstep = int(state.step)
                print(f"resumed at step {gstep}")

        base_rng = jax.random.PRNGKey(args.seed)
        loss = jnp.float32(float("nan"))
        for epoch in range(gstep // steps_per_epoch,
                           args.num_train_epochs):
            if gstep >= stop_at:
                break
            # per-epoch seeded shuffle: identical whether or not the run
            # was interrupted
            order = list(range(len(data)))
            random.Random((args.seed + 1) * 7919 + epoch).shuffle(order)
            for si in range(gstep % steps_per_epoch, steps_per_epoch):
                if gstep >= stop_at:
                    break
                chunk = order[si * bsz:(si + 1) * bsz]
                b, soft, hard = data.batch(chunk, pad_to=bsz)
                sub = jax.random.fold_in(base_rng, gstep)
                batch = shard_b((jnp.asarray(b.input_ids),
                                 jnp.asarray(b.segment_ids),
                                 jnp.asarray(b.attention_mask),
                                 jnp.asarray(b.img_feats),
                                 jnp.asarray(soft), jnp.asarray(hard)))
                state, loss = step_for(epoch)(state, batch, rep(sub))
                gstep += 1
                if (args.save_every and args.output_dir
                        and gstep % args.save_every == 0):
                    ckpt_lib.save_checkpoint(
                        os.path.join(args.output_dir, "state"),
                        f"step{gstep}", state)
            if (epoch + 1) % 5 == 0:
                print(f"epoch {epoch + 1}: loss {float(loss):.4f}")
            if args.eval_every and (epoch + 1) % args.eval_every == 0:
                acc, _ = evaluate(model, state.params, val,
                                  args.per_gpu_eval_batch_size, mesh)
                print(f"epoch {epoch + 1}: val {acc:.2f}")
                if acc > best["acc"]:
                    best = {"acc": acc, "params": state.params,
                            "epoch": epoch + 1}
                if args.output_dir:
                    from cpt_tpu.utils.checkpoint import save_model

                    save_model(os.path.join(args.output_dir,
                                            f"checkpoint-{epoch + 1}"),
                               state.params)
        params = best["params"] if best["acc"] >= 0 else state.params
        if best["acc"] >= 0:
            print(f"best val {best['acc']:.2f} at epoch {best['epoch']}")

    acc, results = evaluate(model, params, val,
                            args.per_gpu_eval_batch_size, mesh)
    print(f"vqa score: {acc:.2f}")
    if args.output:
        pickle.dump({"accuracy": acc, "results": results},
                    open(args.output, "wb"))

    if args.test_examples:
        if args.img_feature_type != "faster_r-cnn":
            raise SystemExit("--test_examples uses the TSV float-feature "
                             "loader; dis_code test submissions need the "
                             "qla loader (--qla_data_dir + a test --split)")
        test = VQAData(args.feat_file, load_vqa_examples(args.test_examples),
                       args.num_labels, tokenizer, args.max_seq_length,
                       args.max_img_seq_length, cfg.img_feature_dim)
        _, test_results = evaluate(model, params, test,
                                   args.per_gpu_eval_batch_size, mesh)
        out_dir = args.output_dir or "."
        os.makedirs(out_dir, exist_ok=True)
        write_submission(
            test_results, load_label2ans(args.label2ans, args.num_labels),
            os.path.join(out_dir, f"{args.test_name}_results.json"),
            args.submission_format)
    return acc


if __name__ == "__main__":
    main()
