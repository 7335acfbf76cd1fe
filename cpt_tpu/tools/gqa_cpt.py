"""GQA CPT driver — few-shot prompt tuning + answer-vocab eval.

Mirrors reference ``Oscar/oscar/fewshot/gqa_cpt.py``: REC_MLM_CPT scores the
answer vocabulary's first tokens at the [MASK] slot; training uses the
"one optimizer step = full train set" recipe (grad accumulation sized to
the sampled dataset, ``gqa_cpt.py:328-334``); best model selected by val
accuracy. Results saved as ``val_results.pk``-style pickles for the
reference eval scripts (``eval/gqa/show*.py``).

``--model_variant ft`` is the few-shot finetune baseline
(``Oscar/oscar/fewshot/gqa_ft.py`` + ``modeling_gqa.py:23-76``): the raw
(un-colored) question, plain image features, and a freshly-initialized
linear classifier over the pooled output scoring all answer labels with
CE — the comparison row for CPT in the paper's few-shot GQA table.
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
from cpt_tpu.data.gqa import GQACPTData, load_gqa_examples
from cpt_tpu.engine import train as train_lib
from cpt_tpu.engine.scoring import make_mlm_at_mask_fn
from cpt_tpu.models.bert.heads import REC_MLM_CPT
from cpt_tpu.tools._common import add_clip_arg, clip_of
from cpt_tpu.utils import convert as cv
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_feat_file", required=True)
    p.add_argument("--color_img_feat_file", default=None)
    p.add_argument("--questions", required=True, help="train questions json")
    p.add_argument("--val_questions", default=None)
    p.add_argument("--val_img_feat_file", default=None,
                   help="eval-split feature TSV; the reference keeps "
                        "train and test-dev colored features in separate "
                        "files (gqa_cpt.py:797-798,997-1002). Defaults to "
                        "--img_feat_file")
    p.add_argument("--val_color_img_feat_file", default=None,
                   help="eval-split colored-feature TSV (reference "
                        "--testdev_color_img_feat_file); defaults to "
                        "--color_img_feat_file")
    p.add_argument("--ans2label", required=True, help="json {answer: label}")
    p.add_argument("--vocab", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None, help="val_results.pk path")
    p.add_argument("--n_sample", type=int, default=16)
    p.add_argument("--random_seed", type=int, default=88)
    p.add_argument("--num_train_epochs", type=int, default=40)
    p.add_argument("--per_gpu_train_batch_size", type=int, default=16)
    p.add_argument("--per_gpu_eval_batch_size", type=int, default=128)
    p.add_argument("--learning_rate", type=float, default=2.5e-5)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    add_clip_arg(p, "gqa_cpt.py:451-454")
    p.add_argument("--max_seq_length", type=int, default=45)
    p.add_argument("--max_img_seq_length", type=int, default=45)
    p.add_argument("--use_color", type=int, default=1)
    p.add_argument("--model_variant", default="cpt", choices=["cpt", "ft"],
                   help="cpt: [MASK] answer-vocab scoring (REC_MLM_CPT); "
                        "ft: fresh pooled linear classifier over answer "
                        "labels (reference fewshot/gqa_ft.py)")
    p.add_argument("--eval_every", type=int, default=0,
                   help="epochs between val evals; keeps the best params "
                        "(reference best-model deepcopy, gqa_cpt.py:381-386)")
    p.add_argument("--save_dir", default=None,
                   help="save final (best) params via Orbax")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--num_hidden_layers", type=int, default=None)
    p.add_argument("--img_feature_dim", type=int, default=None)
    return p


def model_config(args):
    import dataclasses

    cfg = OSCAR_BASE
    overrides = {}
    for k in ("hidden_size", "num_hidden_layers", "img_feature_dim"):
        if getattr(args, k) is not None:
            overrides[k] = getattr(args, k)
    if args.hidden_size is not None and args.hidden_size < 768:
        overrides.setdefault("num_attention_heads", max(1, args.hidden_size // 16))
        overrides.setdefault("intermediate_size", args.hidden_size * 4)
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def evaluate(model, params, data: GQACPTData, batch_size: int,
             variant: str = "cpt"):
    if variant == "cpt":
        fn = make_mlm_at_mask_fn(model)
    else:                                # ft: pooled classifier logits
        @jax.jit
        def fn(params, ids, segs, attn, feats, _mask_pos):
            _, logits = model.apply(params, ids, segs, attn, img_feats=feats)
            return logits.astype(jnp.float32)
    n_correct, n_total = 0, 0
    results = {}
    for start in range(0, len(data), batch_size):
        idxs = list(range(start, min(start + batch_size, len(data))))
        batch, _tokens, answers = data.batch(idxs, pad_to=batch_size)
        out = np.asarray(fn(params, jnp.asarray(batch.input_ids),
                            jnp.asarray(batch.segment_ids),
                            jnp.asarray(batch.attention_mask),
                            jnp.asarray(batch.img_feats),
                            jnp.asarray(batch.mask_pos)))
        # cpt: [MASK] logits sliced to the answer vocab; ft: class logits
        scores = out[:, data.answer_token_ids] if variant == "cpt" else out
        pred = scores.argmax(-1)
        for j, idx in enumerate(idxs):
            ex = data.examples[idx]
            results[str(ex.q_id)] = {"pred": int(pred[j]),
                                     "scores": scores[j]}
            if answers[j] >= 0:
                n_correct += int(pred[j] == answers[j])
                n_total += 1
    acc = 100.0 * n_correct / max(n_total, 1)
    return acc, results


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    tokenizer = BertTokenizer(args.vocab if args.vocab else toy_vocab())
    cfg = model_config(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    ans2label = json.load(open(args.ans2label))
    ft = args.model_variant == "ft"
    if ft:
        import dataclasses

        from cpt_tpu.models.bert.heads import ImageBertForSequenceClassification

        # reference FT: one linear layer over pooled output, CE over labels
        # (modeling_gqa.py:30-35, fewshot/gqa_ft.py:430); raw question, no
        # color marking
        cfg = dataclasses.replace(cfg, num_labels=len(ans2label),
                                  classifier="linear", loss_type="xe")
        model = ImageBertForSequenceClassification(cfg, dtype=dtype)
        use_color = False
    else:
        model = REC_MLM_CPT(cfg, dtype=dtype)
        use_color = bool(args.use_color)

    train_data = GQACPTData(args.img_feat_file, args.color_img_feat_file,
                            load_gqa_examples(args.questions), ans2label,
                            tokenizer, args.max_seq_length,
                            args.max_img_seq_length, cfg.img_feature_dim,
                            use_color=use_color)
    val_data = (GQACPTData(args.val_img_feat_file or args.img_feat_file,
                           args.val_color_img_feat_file
                           or args.color_img_feat_file,
                           load_gqa_examples(args.val_questions), ans2label,
                           tokenizer, args.max_seq_length,
                           args.max_img_seq_length, cfg.img_feature_dim,
                           use_color=use_color)
                if args.val_questions else None)

    bsz = args.per_gpu_train_batch_size
    batch0, _, _ = train_data.batch([0], pad_to=bsz)
    init = jax.jit(model.init)(
        jax.random.PRNGKey(args.random_seed),
        jnp.asarray(batch0.input_ids), jnp.asarray(batch0.segment_ids),
        jnp.asarray(batch0.attention_mask), jnp.asarray(batch0.img_feats))
    if args.checkpoint:
        sd = cv.load_torch_file(args.checkpoint)
        pre = cv.convert_bert_state_dict(sd, cfg)
        task = "bert_only" if ft else "rec_mlm_cpt"  # FT: fresh classifier
        params = {"params": cv.merge_pretrained_into_init(
            init["params"], cv.params_for_task(pre, task))}
    else:
        params = init
        print("WARNING: random init (no --checkpoint)")

    train_idxs = train_data.train_indices(args.n_sample, args.random_seed)
    if not train_idxs:
        print("no color-marked train examples; evaluating zero-shot only")
    else:
        # reference recipe: one optimizer step consumes the whole sampled set
        accum = max(1, len(train_idxs) // bsz)
        steps_per_epoch = max(1, len(train_idxs) // (bsz * accum))
        total = steps_per_epoch * args.num_train_epochs
        # the reference's gqa driver uses stock AdamW betas + 1.0 clip
        # (gqa_cpt.py:342,451-454), unlike refcoco/vg's (0.9, 0.98)
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(total * args.warmup_ratio),
            num_train_steps=total, grad_accum_steps=accum,
            betas=(0.9, 0.999),
            max_grad_norm=clip_of(args))
        tx = train_lib.build_optimizer(params, ocfg)
        state = train_lib.create_train_state(params, tx)
        step_fn = (train_lib.make_cls_train_step(model, tx) if ft
                   else train_lib.make_mlm_train_step(model, tx))
        rng = jax.random.PRNGKey(args.random_seed)

        t0 = time.time()
        best_acc, best_params = -1.0, None
        for epoch in range(args.num_train_epochs):
            order = list(train_idxs)
            for start in range(0, len(order), bsz):
                chunk = order[start:start + bsz]
                batch, label_tokens, answers = train_data.batch(
                    chunk, pad_to=bsz)
                common = (jnp.asarray(batch.input_ids),
                          jnp.asarray(batch.segment_ids),
                          jnp.asarray(batch.attention_mask),
                          jnp.asarray(batch.img_feats))
                arrays = (common + (jnp.asarray(answers),) if ft
                          else common + (jnp.asarray(batch.mask_pos),
                                         jnp.asarray(label_tokens)))
                rng, sub = jax.random.split(rng)
                state, loss = step_fn(state, arrays, sub)
            if (epoch + 1) % 10 == 0:
                print(f"epoch {epoch + 1}: loss {float(loss):.4f} "
                      f"({time.time() - t0:.1f}s)")
            if (args.eval_every and val_data is not None
                    and (epoch + 1) % args.eval_every == 0):
                acc, _ = evaluate(model, state.params, val_data,
                                  args.per_gpu_eval_batch_size,
                                  args.model_variant)
                if acc > best_acc:
                    best_acc, best_params = acc, jax.device_get(state.params)
                print(f"epoch {epoch + 1}: val acc {acc:.2f} "
                      f"(best {best_acc:.2f})")
        params = (best_params if best_params is not None else state.params)

    eval_data = val_data or train_data
    acc, results = evaluate(model, params, eval_data,
                            args.per_gpu_eval_batch_size,
                            args.model_variant)
    print(f"accuracy: {acc:.2f}")
    if args.save_dir:
        from cpt_tpu.utils import checkpoint as ckpt_lib

        ckpt_lib.save_model(args.save_dir, jax.device_get(params), cfg)
        print(f"saved model to {args.save_dir}")
    if args.output:
        with open(args.output, "wb") as f:
            pickle.dump({"accuracy": acc, "results": results}, f)
    return acc


if __name__ == "__main__":
    main()
