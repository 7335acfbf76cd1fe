"""Shared driver plumbing for the task runner CLIs."""
from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp

from cpt_tpu.config.bert import OSCAR_BASE, OSCAR_LARGE, BertConfig
from cpt_tpu.utils import convert as cv
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def add_common_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    p.add_argument("--vocab", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--seed", type=int, default=88)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--num_train_epochs", type=int, default=0)
    p.add_argument("--per_gpu_train_batch_size", type=int, default=16)
    p.add_argument("--per_gpu_eval_batch_size", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--model_size", default="base",
                   choices=["base", "large"],
                   help="Oscar encoder geometry: base (VinVL_B) or large "
                        "(VinVL_L, Oscar/README.md:30)")
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--num_hidden_layers", type=int, default=None)
    p.add_argument("--img_feature_dim", type=int, default=None)
    p.add_argument("--classifier", default=None, choices=["linear", "mlp"],
                   help="task-head shape (reference run_vqa.py --classifier)")
    p.add_argument("--cls_hidden_scale", type=int, default=None,
                   help="mlp classifier hidden width multiplier")
    p.add_argument("--drop_out", type=float, default=None,
                   help="BERT hidden dropout override (reference --drop_out)")
    p.add_argument("--use_img_layernorm", action="store_true",
                   help="LayerNorm on the image-feature embedding "
                        "(modeling_bert.py:166-171)")
    p.add_argument("--scheduler", default="linear",
                   choices=["linear", "constant"],
                   help="LR schedule after warmup (reference --scheduler)")
    p.add_argument("--img_feature_type", default="faster_r-cnn",
                   choices=["faster_r-cnn", "dis_code", "dis_code_t"],
                   help="image-feature variant: faster_r-cnn = float "
                        "region features; dis_code[_t] = VQ-VAE discrete "
                        "code ids through an embedding table (reference "
                        "modeling_bert.py:167-176)")
    p.add_argument("--code_voc", type=int, default=512,
                   help="dis_code vocabulary size")
    p.add_argument("--code_dim", type=int, default=512,
                   help="dis_code embedding width")
    p.add_argument("--code_size", type=int, default=0,
                   help="dis_code_t code length per image")
    p.add_argument("--code_level", default="top",
                   choices=["top", "bottom", "both"],
                   help="which VQ-VAE code level to use when a vqvae/ "
                        "codebook dir is present (reference run_vqa.py:"
                        "979,1103-1125: geometry from the codebook, code "
                        "embedding initialized from embeddings_{t,b})")
    p.add_argument("--max_grad_norm", type=float, default=1.0,
                   help="global-norm gradient clip; <= 0 disables. The "
                        "reference finetune runners clip at 1.0 "
                        "(run_vqa.py:577,989) but pretraining defaults to "
                        "no clipping (run_oscarplus_pretrain.py:114 "
                        "default=-1.0) — run_oscarplus_pretrain overrides "
                        "this default accordingly")
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    return p


def clip_of(args):
    """--max_grad_norm → OptimConfig.max_grad_norm (reference semantics:
    ``if args.max_grad_norm > 0`` gates the clip, so 0/negative disable —
    run_oscarplus_pretrain.py:436)."""
    return args.max_grad_norm if args.max_grad_norm > 0 else None


def add_clip_arg(p: argparse.ArgumentParser, ref: str,
                 default: float = 1.0) -> argparse.ArgumentParser:
    """The clip flag alone, for drivers that don't take the full common
    surface (gqa_cpt / vcr_nsp_cpt)."""
    p.add_argument("--max_grad_norm", type=float, default=default,
                   help="global-norm gradient clip; <= 0 disables "
                        f"(reference {ref})")
    return p


def optim_overrides(args, betas=None) -> dict:
    """OptimConfig kwargs from the shared optimizer flags. The upstream
    run_* finetune runners use stock AdamW betas (0.9, 0.999) + clip 1.0
    (run_vqa.py:478,577); the CPT fewshot drivers use betas (0.9, 0.98)
    and no clipping (refcoco_cpt.py:342,511) — OptimConfig's defaults."""
    kw = {"eps": args.adam_epsilon, "max_grad_norm": clip_of(args)}
    if betas is not None:
        kw["betas"] = betas
    return kw


def check_img_feature_type(args, runner: str):
    """Fail fast on --img_feature_type dis_code[_t] in runners whose data
    loaders only emit float region features (the discrete-code path flows
    through the VQA/GQA qla loaders, which detect integer arrays in the
    ``.pt`` feature dict) — otherwise the flag crashes at init with an
    obscure nn.Embed dtype error."""
    if getattr(args, "img_feature_type", "faster_r-cnn") != "faster_r-cnn":
        raise SystemExit(
            f"--img_feature_type {args.img_feature_type} is supported by "
            f"run_vqa / run_gqa (qla feature loader) only, not {runner}")


def model_config(args, **extra) -> BertConfig:
    base = (OSCAR_LARGE if getattr(args, "model_size", "base") == "large"
            else OSCAR_BASE)
    overrides = dict(extra)
    for k in ("hidden_size", "num_hidden_layers", "img_feature_dim",
              "classifier", "cls_hidden_scale"):
        if getattr(args, k, None) is not None:
            overrides[k] = getattr(args, k)
    if getattr(args, "drop_out", None) is not None:
        overrides["hidden_dropout_prob"] = args.drop_out
    if getattr(args, "img_feature_type", "faster_r-cnn") != "faster_r-cnn":
        overrides["img_feature_type"] = args.img_feature_type
        for k in ("code_voc", "code_dim", "code_size"):
            overrides[k] = getattr(args, k)
    if getattr(args, "use_img_layernorm", False):
        overrides["use_img_layernorm"] = True
    if args.hidden_size is not None and args.hidden_size < 768:
        overrides.setdefault("num_attention_heads",
                             max(1, args.hidden_size // 16))
        overrides.setdefault("intermediate_size", args.hidden_size * 4)
    return dataclasses.replace(base, **overrides) if overrides else base


def build_tokenizer(args) -> BertTokenizer:
    return BertTokenizer(args.vocab if args.vocab else toy_vocab())


def load_or_init(model, init_args, args, cfg, task: str = "bert_only",
                 info: dict = None):
    """``info`` (optional out-param) is filled with
    ``{"ckpt_params": <converted tree or None>}`` so callers can tell
    which leaves the checkpoint actually supplied (e.g. run_vqa must
    not clobber a fine-tuned code embedding with the raw codebook)."""
    init = jax.jit(model.init)(jax.random.PRNGKey(args.seed), *init_args)
    if args.checkpoint:
        pre = cv.convert_bert_state_dict(
            cv.load_torch_file(args.checkpoint), cfg)
        mapped = cv.params_for_task(pre, task)
        if info is not None:
            info["ckpt_params"] = mapped
        return {"params": cv.merge_pretrained_into_init(
            init["params"], mapped)}
    if info is not None:
        info["ckpt_params"] = None
    print("WARNING: random init (no --checkpoint)")
    return init


def dtype_of(args):
    return jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32


def add_detector_config_args(p: argparse.ArgumentParser):
    """--config_file / --opts: drive a detector CLI from the reference's
    own yacs yaml (prompt_feat configs/sgg_configs), zero conversion."""
    p.add_argument("--config_file", default=None,
                   help="reference yacs yaml; resolved over the reference "
                        "defaults exactly as the reference tools do "
                        "(models/detector/yacs_bridge.py)")
    p.add_argument("--opts", nargs="*", default=None,
                   help="trailing KEY VALUE yacs overrides (the reference "
                        "tools' --opts / cfg.merge_from_list)")
    return p


def apply_reference_config(parser: argparse.ArgumentParser, argv):
    """Pre-scan argv for --config_file, resolve the yaml, and install its
    values as parser DEFAULTS so explicit CLI flags still win — the same
    precedence as the reference's defaults ← yaml ← opts ← argparse chain.
    Returns the ReferenceRunConfig (or None without --config_file)."""
    import json as _json
    import os.path as _op
    import sys as _sys

    argv = list(_sys.argv[1:]) if argv is None else list(argv)
    pre = argparse.ArgumentParser(add_help=False)
    add_detector_config_args(pre)
    known, _ = pre.parse_known_args(argv)
    if not known.config_file:
        return None
    from cpt_tpu.models.detector.yacs_bridge import load_reference_yaml

    ref = load_reference_yaml(known.config_file, opts=known.opts)
    cand = {
        "base_lr": ref.solver.base_lr,
        "max_iter": ref.solver.max_iter,
        "steps": list(ref.solver.steps),
        "warmup_iters": ref.solver.warmup_iters,
        "checkpoint_period": ref.checkpoint_period,
        "output_dir": ref.output_dir,
    }
    if ref.relation_on:
        cand["rel_algorithm"] = ref.relation_algorithm
        cand["sg"] = True
    if ref.expected_results:
        cand["expected_results"] = _json.dumps(
            [list(e) for e in ref.expected_results])
    # MODEL.WEIGHT: reference loads it relative to its cwd; also try
    # next to the yaml so checked-out reference trees work in place
    for root in ("", _op.dirname(_op.abspath(known.config_file))):
        w = _op.join(root, ref.weight) if root else ref.weight
        if ref.weight and _op.isfile(w):
            cand["checkpoint"] = w
            break
    dests = {a.dest for a in parser._actions}
    parser.set_defaults(**{k: v for k, v in cand.items() if k in dests})
    return ref
