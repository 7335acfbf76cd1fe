"""COCO captioning driver: masked-LM training, beam-search inference,
CIDEr-D eval, optional SCST finetune and constrained beam search.

Mirrors reference ``Oscar/oscar/run_captioning.py`` (+ ``utils/cbs.py``).
Data: feature TSV + json {img_key: [reference captions]}.
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

from cpt_tpu.data.tensorize import pad_img_feats
from cpt_tpu.engine import train as train_lib
from cpt_tpu.engine.generation import (GenerationConfig, beam_search,
                                       decode_caption, greedy_or_sample)
from cpt_tpu.models.bert.captioning import (BertForImageCaptioning,
                                            CaptionTensorizer)
from cpt_tpu.tools._common import (add_common_args,
                                   build_tokenizer,
                                   check_img_feature_type,
                                   dtype_of,
                                   load_or_init,
                                   model_config,
                                   optim_overrides)
from cpt_tpu.utils.cider import CiderD
from cpt_tpu.utils.tsv import TSVFile, decode_feature


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feat_file", default=None)
    p.add_argument("--captions", default=None,
                   help="json {img_key: [captions]}")
    p.add_argument("--dataset_yaml", default=None,
                   help="reference CaptionTSVDataset yaml (feature/label "
                        "TSVs + COCO-style caption json) — loads the "
                        "reference's own caption data files directly "
                        "(reference --train_yaml)")
    p.add_argument("--val_yaml", default=None,
                   help="separate dataset for the --eval_every "
                        "during-training CIDEr eval (reference --val_yaml)")
    p.add_argument("--test_yaml", default=None,
                   help="separate dataset for the final decode + metric "
                        "eval (reference --test_yaml; defaults to the "
                        "training set)")
    p.add_argument("--max_seq_length", type=int, default=70)
    p.add_argument("--max_seq_a_length", type=int, default=40)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    p.add_argument("--max_masked_tokens", type=int, default=3)
    p.add_argument("--mask_prob", type=float, default=0.15,
                   help="caption-token masking probability "
                        "(run_captioning.py:836)")
    p.add_argument("--no_od_labels", action="store_true",
                   help="drop od-label context (text_b) from training and "
                        "decoding (reference --add_od_labels off; CPT/VinVL "
                        "recipes keep it on, so on is our default)")
    p.add_argument("--label_smoothing", type=float, default=0.1,
                   help="BertCaptioningLoss label smoothing "
                        "(modeling_bert.py:575-600)")
    p.add_argument("--drop_worst_ratio", type=float, default=0.0,
                   help="fraction of highest-loss slots dropped from the "
                        "caption loss (run_captioning.py:855)")
    p.add_argument("--drop_worst_after", type=int, default=0,
                   help="apply --drop_worst_ratio only from this step on "
                        "(run_captioning.py:857)")
    p.add_argument("--num_beams", type=int, default=5)
    p.add_argument("--num_keep_best", type=int, default=1,
                   help="beams kept per image in the prediction output "
                        "(run_captioning.py:909)")
    p.add_argument("--max_gen_length", type=int, default=0,
                   help="decode-step cap; 0 = full --max_seq_a_length "
                        "canvas (run_captioning.py:902)")
    p.add_argument("--do_sample", action="store_true",
                   help="sampling decode instead of greedy/beam")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--repetition_penalty", type=float, default=1.0)
    p.add_argument("--length_penalty", type=float, default=1.0)
    p.add_argument("--no_tie_weights", action="store_true",
                   help="UNTIE the caption decoder from the word "
                        "embeddings — the reference's default "
                        "(config.tie_weights=False, modeling_bert.py:"
                        "616-625); our default ties, matching "
                        "--tie_weights recipes")
    p.add_argument("--freeze_embedding", action="store_true",
                   help="freeze the word-embedding table during training "
                        "(reference modeling_bert.py:622-625 "
                        "requires_grad=False)")
    p.add_argument("--num_return_sequences", type=int, default=1,
                   help="independent sampling decodes kept per image "
                        "(reference run_captioning.py:668; sampling mode "
                        "only)")
    p.add_argument("--scst_steps", type=int, default=0)
    p.add_argument("--sc_beam_size", type=int, default=1,
                   help="beam size of the SCST baseline decode "
                        "(reference run_captioning.py:543,895; 1 = greedy)")
    p.add_argument("--sc_train_sample_n", type=int, default=5,
                   help="SCST rollouts per image (run_captioning.py:891)")
    p.add_argument("--sc_baseline_type", default="greedy",
                   choices=["greedy", "sample"],
                   help="REINFORCE baseline: greedy decode or leave-one-out "
                        "sample mean (caption_evaluate.py:133-144)")
    p.add_argument("--train_steps", type=int, default=0)
    p.add_argument("--eval_every", type=int, default=0,
                   help="evaluate CIDEr-D on a val subset every N steps, "
                        "track the best model and append eval_logs.json "
                        "(reference --evaluate_during_training + "
                        "best_CIDEr, run_captioning.py:508-521)")
    p.add_argument("--eval_subset", type=int, default=32,
                   help="images per during-training eval (greedy decode)")
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop the loop early while keeping the "
                        "--train_steps LR-schedule horizon (exact-resume "
                        "kill point)")
    p.add_argument("--save_every", type=int, default=0,
                   help="save full train state to {output_dir}/state "
                        "every N steps")
    p.add_argument("--resume", action="store_true",
                   help="restore {output_dir}/state and continue "
                        "mid-run; per-step seeded streams make the "
                        "continued run exact")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--spice_lite", action="store_true",
                   help="add the approximate SPICE_lite tuple-F1 to eval "
                        "metrics (utils/spice_lite.py; NOT comparable to "
                        "Java SPICE)")
    p.add_argument("--use_cbs", action="store_true",
                   help="constrained beam search: constraints = each "
                        "image's top od-label words (reference cbs.py)")
    p.add_argument("--min_constraints_to_satisfy", type=int, default=1)
    p.add_argument("--num_constraints", type=int, default=2)
    return add_common_args(p)


def load_feats(tsv, imgid2idx, key):
    _, payload = tsv.seek(imgid2idx[key])
    info = json.loads(payload)
    boxlist = info["objects"]
    feats = np.stack([decode_feature(o["feature"]) for o in boxlist])
    od = " ".join(o["class"] for o in boxlist)
    return feats, od


class CaptionYamlData:
    """Reference caption-dataset yaml (``run_captioning.py:29-127``
    CaptionTSVDataset layout): ``feature`` TSV rows
    ``(key, {"num_boxes", "features": b64 f32 [n, D]})``, optional
    ``label`` TSV rows ``(key, [{"class": ...}])``, ``caption`` json
    ``[{"image_id", "caption"}]``. Loads the reference's own data files
    without conversion."""

    def __init__(self, yaml_file: str):
        import base64

        import yaml as _yaml

        self._b64 = base64
        cfg = _yaml.safe_load(open(yaml_file))
        root = os.path.dirname(os.path.abspath(yaml_file))

        def path(v):
            if v is None:
                return None
            return v if os.path.isfile(v) else os.path.join(root, v)

        self.feat_tsv = TSVFile(path(cfg["feature"]))
        lbl = path(cfg.get("label"))
        self.label_tsv = TSVFile(lbl) if lbl and os.path.isfile(lbl) \
            else None
        self.key2idx = {self.feat_tsv.seek(i)[0]: i
                        for i in range(len(self.feat_tsv))}
        cap_path = path(cfg.get("caption"))
        self.captions = {}
        if cap_path and os.path.isfile(cap_path):
            for row in json.load(open(cap_path)):
                self.captions.setdefault(
                    str(row["image_id"]), []).append(row["caption"])

    def load(self, key):
        i = self.key2idx[key]
        info = json.loads(self.feat_tsv.seek(i)[1])
        feats = np.frombuffer(
            self._b64.b64decode(info["features"]), np.float32).reshape(
            int(info["num_boxes"]), -1)
        od = ""
        if self.label_tsv is not None:
            objs = json.loads(self.label_tsv.seek(i)[1])
            od = " ".join(o["class"] for o in objs)
        return feats, od


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    args = build_args().parse_args(argv)
    check_img_feature_type(args, "run_captioning")
    tokenizer = build_tokenizer(args)
    cfg = model_config(args)
    if args.no_tie_weights:
        import dataclasses

        cfg = dataclasses.replace(cfg, tie_weights=False)
    model = BertForImageCaptioning(cfg, dtype=dtype_of(args))

    def freeze_embedding_tx(tx):
        """--freeze_embedding: zero the word-embedding update (the
        reference sets requires_grad=False on exactly that table,
        modeling_bert.py:622-625)."""
        return (train_lib.freeze_params(tx, "word_embeddings")
                if args.freeze_embedding else tx)

    def yaml_source(path):
        ydata = CaptionYamlData(path)
        caps = {k: v for k, v in ydata.captions.items()
                if k in ydata.key2idx}
        return caps, ydata.load

    if args.dataset_yaml:
        captions, get_feats = yaml_source(args.dataset_yaml)
    else:
        if not (args.feat_file and args.captions):
            raise SystemExit("need --feat_file + --captions, or "
                             "--dataset_yaml")
        tsv = TSVFile(args.feat_file)
        imgid2idx = {tsv.seek(i)[0]: i for i in range(len(tsv))}
        captions = {k: v for k, v in json.load(open(args.captions)).items()
                    if k in imgid2idx}

        def get_feats(k):
            return load_feats(tsv, imgid2idx, k)
    keys = sorted(captions)
    # separate val/test datasets (reference --val_yaml/--test_yaml,
    # run_captioning.py:809-813,980-997); default to the training source
    if args.val_yaml:
        val_captions, val_get_feats = yaml_source(args.val_yaml)
    else:
        val_captions, val_get_feats = captions, get_feats
    if args.test_yaml:
        test_captions, test_get_feats = yaml_source(args.test_yaml)
    else:
        test_captions, test_get_feats = captions, get_feats

    tens_train = CaptionTensorizer(
        tokenizer, args.max_img_seq_length, args.max_seq_length,
        args.max_seq_a_length, max_masked_tokens=args.max_masked_tokens,
        mask_prob=args.mask_prob)
    tens_test = CaptionTensorizer(
        tokenizer, args.max_img_seq_length, args.max_seq_length,
        args.max_seq_a_length, is_train=False)
    use_od = not args.no_od_labels

    def train_batch(batch_keys, rng_py):
        rows = []
        for k in batch_keys:
            feats, od = get_feats(k)
            cap = rng_py.choice(captions[k])
            rows.append(tens_train.tensorize(
                cap, feats, text_b=od if use_od else None, rng=rng_py))
        # tensorize returns (ids, segs, attn, feats, mpos, mids); the model
        # signature is (input_ids, attention_mask, token_type_ids, ...)
        order = (0, 2, 1, 3, 4, 5)
        stack = [np.stack([r[i] for r in rows]) for i in order]
        return tuple(jnp.asarray(x) for x in stack)

    rng_py = random.Random(args.seed)
    b0 = train_batch(keys[: min(2, len(keys))], rng_py)
    params = load_or_init(model, b0, args, cfg)

    if args.train_steps > 0:
        ocfg = train_lib.OptimConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            warmup_steps=int(args.train_steps * args.warmup_ratio),
            num_train_steps=args.train_steps,
            scheduler=args.scheduler,
            **optim_overrides(args, betas=(0.9, 0.999)))
        tx = freeze_embedding_tx(train_lib.build_optimizer(params, ocfg))
        state = train_lib.create_train_state(params, tx)

        # drop_worst_ratio is shape-static (top_k size) → one jitted step
        # per ratio; at most two compiles (before/after --drop_worst_after)
        _steps = {}

        def step_for(ratio):
            if ratio not in _steps:
                @jax.jit
                def step(state, batch, rng):
                    def loss_fn(p):
                        loss, _ = model.apply(
                            p, *batch, label_smoothing=args.label_smoothing,
                            drop_worst_ratio=ratio, deterministic=False,
                            rngs={"dropout": rng})
                        return loss

                    loss, grads = jax.value_and_grad(loss_fn)(state.params)
                    upd, opt = tx.update(grads, state.opt_state, state.params)
                    return train_lib.TrainState(
                        optax.apply_updates(state.params, upd), opt,
                        state.step + 1), loss

                _steps[ratio] = step
            return _steps[ratio]

        from cpt_tpu.utils import checkpoint as ckpt_lib

        start_it = 0
        if (args.resume and args.output_dir
                and ckpt_lib.has_checkpoint(
                    os.path.join(args.output_dir, "state"))):
            state = ckpt_lib.restore_checkpoint(
                os.path.join(args.output_dir, "state"), state)
            start_it = int(state.step)
            print(f"resumed at step {start_it}")

        # during-training eval: greedy decode on a val subset, best-model
        # tracking + eval_logs.json (reference --evaluate_during_training)
        best_cider, best_params, eval_log = -1.0, None, []
        if args.eval_every:
            eval_cfg = GenerationConfig(
                max_seq_a_len=args.max_seq_a_length,
                bos_token_id=tokenizer.cls_token_id,
                eos_token_id=tokenizer.sep_token_id,
                mask_token_id=tokenizer.mask_token_id)
            eval_keys = sorted(val_captions)[: args.eval_subset]
            eval_scorer = CiderD(
                {k: [c.split() for c in v]
                 for k, v in val_captions.items()})

            def quick_cider(p):
                hyps = {}
                for k in eval_keys:
                    fe, od = val_get_feats(k)
                    bi, sg, at, f, _, _, _ = tens_test.tensorize(
                        "", fe, text_b=od if use_od else None)
                    toks, _ = greedy_or_sample(
                        model, p, eval_cfg, jnp.asarray(sg[None]),
                        jnp.asarray(at[None]), jnp.asarray(f[None]),
                        base_ids=jnp.asarray(bi[None]))
                    hyps[k] = decode_caption(tokenizer, np.asarray(toks[0]),
                                             eval_cfg).split()
                return eval_scorer.corpus_score(hyps)

        base_rng = jax.random.PRNGKey(args.seed)
        bsz = args.per_gpu_train_batch_size
        stop_at = (min(args.train_steps, args.max_steps) if args.max_steps
                   else args.train_steps)
        for it in range(start_it, stop_at):
            # per-step seeded streams: a resumed run replays the exact
            # uninterrupted sequence (masking + caption choice + dropout)
            step_py = random.Random(args.seed * 1_000_003 + it)
            bk = [keys[(it * bsz + j) % len(keys)] for j in range(bsz)]
            sub = jax.random.fold_in(base_rng, it)
            ratio = (args.drop_worst_ratio
                     if it >= args.drop_worst_after else 0.0)
            state, loss = step_for(ratio)(state, train_batch(bk, step_py),
                                          sub)
            if (it + 1) % 20 == 0:
                print(f"step {it + 1}: loss {float(loss):.4f}")
            if (args.save_every and args.output_dir
                    and (it + 1) % args.save_every == 0):
                ckpt_lib.save_checkpoint(
                    os.path.join(args.output_dir, "state"),
                    f"step{it + 1}", state)
            if args.eval_every and (it + 1) % args.eval_every == 0:
                c = quick_cider(state.params)
                if c > best_cider:
                    best_cider = c
                    best_params = jax.tree_util.tree_map(np.asarray,
                                                         state.params)
                eval_log.append({"step": it + 1, "CIDEr": c,
                                 "best_CIDEr": best_cider})
                if args.output_dir:
                    os.makedirs(args.output_dir, exist_ok=True)
                    json.dump(eval_log, open(os.path.join(
                        args.output_dir, "eval_logs.json"), "w"))
                print(f"eval step {it + 1}: CIDEr {c:.3f} "
                      f"(best {best_cider:.3f})")
        params = (jax.tree_util.tree_map(jnp.asarray, best_params)
                  if best_params is not None else state.params)

    gen_len = (min(args.max_gen_length, args.max_seq_a_length)
               if args.max_gen_length else args.max_seq_a_length)
    gen_cfg = GenerationConfig(
        max_seq_a_len=gen_len,
        bos_token_id=tokenizer.cls_token_id,
        eos_token_id=tokenizer.sep_token_id,
        mask_token_id=tokenizer.mask_token_id,
        num_beams=args.num_beams,
        num_keep_best=args.num_keep_best,
        do_sample=args.do_sample,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        repetition_penalty=args.repetition_penalty,
        length_penalty=args.length_penalty)
    refs = {k: [c.split() for c in v] for k, v in test_captions.items()}
    scorer = CiderD(refs)
    # SCST rewards come from the TRAINING references (the reference builds
    # ScstRewardCriterion from the train dataset's captions)
    scst_scorer = (scorer if test_captions is captions else
                   CiderD({k: [c.split() for c in v]
                           for k, v in captions.items()}))

    if args.scst_steps > 0:
        from cpt_tpu.engine.scst import scst_step

        # the reference's SCST phase reuses the XE train loop's clip
        # (run_captioning.py:489)
        tx = optax.adam(args.learning_rate)
        if args.max_grad_norm > 0:
            tx = optax.chain(
                optax.clip_by_global_norm(args.max_grad_norm), tx)
        tx = freeze_embedding_tx(tx)
        opt = tx.init(params)
        rng = jax.random.PRNGKey(args.seed + 1)
        for it in range(args.scst_steps):
            k = keys[it % len(keys)]
            feats, od = get_feats(k)
            ids, segs, attn, f, _, _, _ = tens_test.tensorize("", feats,
                                                              text_b=od)
            batch = (jnp.asarray(segs[None]), jnp.asarray(attn[None]),
                     jnp.asarray(f[None]), jnp.asarray(ids[None]))
            rng, sub = jax.random.split(rng)
            grads, r_s, r_g = scst_step(
                model, params, None, gen_cfg, scst_scorer, tokenizer,
                batch, [k],
                sub, sample_n=args.sc_train_sample_n,
                baseline_type=args.sc_baseline_type,
                baseline_beams=args.sc_beam_size)
            upd, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, upd)
            if (it + 1) % 10 == 0:
                print(f"scst {it + 1}: sample {r_s:.2f} "
                      f"{args.sc_baseline_type} baseline {r_g:.2f}")

    hyps, outputs = {}, {}
    dec_rng = jax.random.PRNGKey(args.seed + 2)
    for k in sorted(test_captions):
        feats, od = test_get_feats(k)
        ids, segs, attn, f, _, _, _ = tens_test.tensorize(
            "", feats, text_b=od if use_od else None)
        ctx = (jnp.asarray(segs[None]), jnp.asarray(attn[None]),
               jnp.asarray(f[None]))
        base = jnp.asarray(ids[None])
        if args.use_cbs:
            from cpt_tpu.engine.generation import make_step_logits_fn
            from cpt_tpu.utils.cbs import build_fsm, constrained_beam_search

            words = list(dict.fromkeys(od.split()))[: args.num_constraints]
            constraints = [tokenizer.convert_tokens_to_ids(
                tokenizer.tokenize(w)) for w in words if w]
            trans, nsat = build_fsm(constraints, cfg.vocab_size)
            base_step = make_step_logits_fn(model, gen_cfg)

            def step_fn(params, tokens, step, segs, attn, f):
                n = tokens.shape[0]
                return base_step(params, tokens, step,
                                 jnp.repeat(segs, n, 0),
                                 jnp.repeat(attn, n, 0),
                                 jnp.repeat(f, n, 0),
                                 jnp.repeat(base, n, 0))

            toks, _score = constrained_beam_search(
                step_fn, params, ctx, transitions=trans,
                num_satisfied=nsat, beams_per_state=max(args.num_beams, 2),
                max_len=gen_cfg.max_seq_a_len,
                bos_id=gen_cfg.bos_token_id, eos_id=gen_cfg.eos_token_id,
                pad_id=gen_cfg.pad_token_id,
                min_constraints=min(args.min_constraints_to_satisfy,
                                    len(constraints)),
                num_group_states=1 << len(constraints))
            text = decode_caption(tokenizer, np.asarray(toks), gen_cfg)
        elif args.num_beams > 1 and not args.do_sample:
            toks, scores = beam_search(model, params, gen_cfg, *ctx,
                                       base_ids=base)
            text = decode_caption(tokenizer, np.asarray(toks[0, 0]), gen_cfg)
            if args.num_keep_best > 1:
                outputs[k] = [
                    {"caption": decode_caption(tokenizer,
                                               np.asarray(toks[0, j]),
                                               gen_cfg),
                     "confidence": float(scores[0, j])}
                    for j in range(toks.shape[1])]
        else:
            dec_rng, sub = jax.random.split(dec_rng)
            toks, scores = greedy_or_sample(model, params, gen_cfg, *ctx,
                                            sub, base_ids=base)
            text = decode_caption(tokenizer, np.asarray(toks[0]), gen_cfg)
            if args.do_sample and args.num_return_sequences > 1:
                # reference generate(num_return_sequences=n): n independent
                # sampling decodes per image (run_captioning.py:668)
                seqs = [{"caption": text, "confidence": float(scores[0])}]
                for _ in range(args.num_return_sequences - 1):
                    dec_rng, sub = jax.random.split(dec_rng)
                    t2, s2 = greedy_or_sample(model, params, gen_cfg, *ctx,
                                              sub, base_ids=base)
                    seqs.append({"caption": decode_caption(
                        tokenizer, np.asarray(t2[0]), gen_cfg),
                        "confidence": float(s2[0])})
                outputs[k] = seqs
        hyps[k] = text.split()
        outputs.setdefault(k, text)
    cider = scorer.corpus_score(hyps)
    print(f"CIDEr-D: {cider:.2f}")
    # full coco-caption metric protocol (caption_evaluate.py:59-90 analogue)
    from cpt_tpu.engine.caption_eval import corpus_bleu, rouge_l
    from cpt_tpu.utils.meteor import meteor

    metrics = {
        "CIDEr": cider,
        "METEOR": sum(meteor(h, refs[k]) for k, h in hyps.items())
        / max(len(hyps), 1),
        "ROUGE_L": sum(rouge_l(h, refs[k]) for k, h in hyps.items())
        / max(len(hyps), 1),
    }
    bleu = corpus_bleu(hyps, {k: refs[k] for k in hyps})
    metrics.update({f"Bleu_{i + 1}": bleu[i] for i in range(4)})
    if args.spice_lite:
        from cpt_tpu.utils.spice_lite import spice_lite_corpus

        metrics["SPICE_lite"] = spice_lite_corpus(
            {k: " ".join(h) for k, h in hyps.items()},
            {k: [" ".join(r) for r in refs[k]] for k in hyps})
    print(" ".join(f"{k}={v:.3f}" for k, v in sorted(metrics.items())))
    if args.output:
        pickle.dump({"cider": cider, "metrics": metrics,
                     "captions": outputs}, open(args.output, "wb"))
    return cider, outputs


if __name__ == "__main__":
    main()
