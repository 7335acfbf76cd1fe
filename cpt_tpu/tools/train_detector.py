"""Detector training driver (``train_sg_net.py`` equivalent).

Mirrors reference ``prompt_feat/tools/train_sg_net.py`` + ``engine/
trainer.py``: iteration-based SGD training of AttrRCNN (RPN + box +
attribute losses) with WarmupMultiStepLR, stage freezing, periodic Orbax
checkpoints and last_checkpoint resume.

Data: json list [{img, boxes [[x,y,w,h]...], labels [...],
attributes [[...]...]?}] + --image_root, or --synthetic N.
"""
from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.engine.detector_train import do_train
from cpt_tpu.engine.solver import SolverConfig
from cpt_tpu.models.detector.attr_rcnn import AttrRCNNTrainer
from cpt_tpu.models.detector.config import VINVL_X152C4, tiny_detector_config
from cpt_tpu.models.detector.convert import load_vinvl_checkpoint
from cpt_tpu.models.detector.rpn import grid_anchors


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ann_file", default=None)
    p.add_argument("--tsv", default=None,
                   help="od/vg-TSV dataset yaml (reference vg_tsv.py "
                        "format: img/label/hw TSVs + labelmap jsondict); "
                        "comma-separate several yamls to train over their "
                        "concatenation (DATASETS.TRAIN tuple)")
    p.add_argument("--image_root", default=None)
    p.add_argument("--checkpoint", default=None, help="init weights .pth")
    p.add_argument("--output_dir", default="./detector_ckpt")
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--max_iter", type=int, default=90000)
    p.add_argument("--steps", type=int, nargs="+", default=[49000, 65000])
    p.add_argument("--warmup_iters", type=int, default=500)
    p.add_argument("--checkpoint_period", type=int, default=10000)
    p.add_argument("--freeze_conv_body_at", type=int, default=2)
    p.add_argument("--max_gt", type=int, default=32)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", type=int, default=None)
    p.add_argument("--hflip_prob", type=float, default=0.5,
                   help="train-time horizontal flip (reference "
                        "transforms/build.py:14: FLIP_PROB_TRAIN=0.5)")
    p.add_argument("--vflip_prob", type=float, default=0.0)
    p.add_argument("--color_jitter", type=float, nargs=4,
                   default=[0.0, 0.0, 0.0, 0.0],
                   metavar=("B", "C", "S", "H"),
                   help="brightness/contrast/saturation/hue jitter")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--sg", action="store_true",
                   help="train the SceneParser relation head over a "
                        "VG-TSV with relations (reference train_sg_net.py "
                        "with RELATION_ON: detector frozen, gt boxes as "
                        "detections, predicate CE)")
    p.add_argument("--rel_algorithm", default="sg_reldn",
                   choices=["sg_reldn", "sg_imp", "sg_msdn", "sg_grcnn",
                            "sg_nm"])
    p.add_argument("--max_rel_dets", type=int, default=16)
    p.add_argument("--max_rels", type=int, default=32,
                   help="gt relation slots per image (padded)")
    from cpt_tpu.tools._common import add_detector_config_args

    return add_detector_config_args(p)


def train_scene_graph(args, cfg, dtype, ref=None):
    """Relation-head training: gt boxes as detections, detector gradients
    zeroed (the reference SceneParser freezes the detector —
    ``scene_parser.py:39`` + ``train_sg_net.py``)."""
    import optax

    from cpt_tpu.data.vg_tsv import VGTSVDataset
    from cpt_tpu.engine.solver import SolverConfig, warmup_multistep_lr
    from cpt_tpu.models.detector.scene_parser import SceneParser

    assert args.tsv, "--sg requires --tsv (VG-TSV with relations)"
    ds = VGTSVDataset(args.tsv.split(",")[0], attribute_on=False,
                      relation_on=True)
    n_rel = len(ds.relation_to_ind)
    parser = SceneParser(cfg, num_rel_classes=n_rel,
                         algorithm=args.rel_algorithm,
                         max_rel_dets=args.max_rel_dets, dtype=dtype)
    freq = jnp.asarray(ds.compute_freq_prior().astype(np.float32))

    h = w = cfg.input.pad_h
    from cpt_tpu.models.detector.rpn import grid_anchors

    anchors = jnp.asarray(grid_anchors(cfg.rpn, h // 16, w // 16))
    params = jax.jit(parser.init)(
        jax.random.PRNGKey(0), jnp.zeros((h, w, 3)), jnp.asarray([h, w]),
        anchors, freq)
    if args.checkpoint:
        params["params"]["detector"] = load_vinvl_checkpoint(
            args.checkpoint, cfg)
        print(f"loaded detector {args.checkpoint}")

    k, r = args.max_rel_dets, args.max_rels

    def samples():
        while True:
            for i in range(len(ds)):
                img, target, _ = ds[i]
                canvas = np.zeros((h, w, 3), np.float32)
                ih, iw = img.shape[:2]
                canvas[: min(ih, h), : min(iw, w)] = img[:h, :w]
                boxes = np.zeros((k, 4), np.float32)
                labels = np.zeros((k,), np.int32)
                valid = np.zeros((k,), bool)
                n = min(len(target["boxes"]), k)
                boxes[:n] = target["boxes"][:n]
                labels[:n] = target["labels"][:n]
                valid[:n] = True
                rels = np.zeros((r, 3), np.int32)
                rel_valid = np.zeros((r,), bool)
                tr = target.get("relation_triplets",
                                np.zeros((0, 3), np.int64))
                tr = tr[(tr[:, 0] < n) & (tr[:, 1] < n)][:r]
                rels[: len(tr)] = tr
                rel_valid[: len(tr)] = True
                yield (jnp.asarray(canvas),
                       jnp.asarray([min(ih, h), min(iw, w)], jnp.int32),
                       jnp.asarray(boxes), jnp.asarray(labels),
                       jnp.asarray(valid), jnp.asarray(rels),
                       jnp.asarray(rel_valid))

    sched = warmup_multistep_lr(dataclasses.replace(
        ref.solver if ref is not None else SolverConfig(),
        base_lr=args.base_lr, steps=tuple(args.steps),
        max_iter=args.max_iter, warmup_iters=args.warmup_iters))
    tx = optax.sgd(sched, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, it):
        def loss_fn(p):
            # match_pair_labels consumes gt_valid as a per-REL-row mask
            img, hw_, b, l, v, rels, rel_valid = batch
            return parser.apply(p, img, hw_, b, l, v, rels, b, rel_valid,
                                freq, method=parser.relation_train_loss)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # detector frozen: zero its gradient subtree
        grads["params"]["detector"] = jax.tree_util.tree_map(
            jnp.zeros_like, grads["params"]["detector"])
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    it = samples()
    loss = None
    for i in range(args.max_iter):
        params, opt_state, loss = step(params, opt_state, next(it),
                                       jnp.int32(i))
        if (i + 1) % 20 == 0 or i + 1 == args.max_iter:
            print(f"iter {i + 1}: rel loss {float(loss):.4f}")
    if args.output_dir:
        from cpt_tpu.utils import checkpoint as ckpt_lib

        ckpt_lib.save_checkpoint(args.output_dir, "scene_parser",
                                 {"params": params["params"]})
    return params, float(loss)


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    from cpt_tpu.tools._common import apply_reference_config

    parser = build_args()
    ref = apply_reference_config(parser, argv)
    args = parser.parse_args(argv)
    if ref is not None:
        cfg = ref.detector
    else:
        cfg = tiny_detector_config() if args.tiny else VINVL_X152C4
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.sg:
        return train_scene_graph(args, cfg, dtype, ref)
    trainer = AttrRCNNTrainer(cfg, dtype=dtype)
    rng = np.random.RandomState(0)

    h = w = cfg.input.pad_h
    anchors = jnp.asarray(grid_anchors(cfg.rpn, h // 16, w // 16))
    g = args.max_gt

    def pad_gt(boxes, labels, attrs):
        b = np.zeros((g, 4), np.float32)
        l = np.zeros((g,), np.int32)
        a = np.zeros((g, 16), np.int32)
        v = np.zeros((g,), bool)
        n = min(len(boxes), g)
        b[:n] = boxes[:n]
        l[:n] = labels[:n]
        v[:n] = True
        for i in range(n):
            row = (attrs[i] if attrs else [])[:16]
            a[i, : len(row)] = row
        return b, l, v, a

    from cpt_tpu.data.detector_transforms import TrainTransforms

    aug = TrainTransforms(args.hflip_prob, args.vflip_prob,
                          *args.color_jitter, seed=1)

    def batches():
        if args.tsv:
            from cpt_tpu.data.vg_tsv import (ConcatDetectionDataset,
                                             DetectionTSVDataset)

            parts = [DetectionTSVDataset(p, attribute_on=True)
                     for p in args.tsv.split(",")]
            # comma-separated yamls = the reference's DATASETS.TRAIN
            # tuple -> ConcatDataset training path (data/build.py:46-70)
            ds = (parts[0] if len(parts) == 1
                  else ConcatDetectionDataset(parts))
            while True:
                for i in range(len(ds)):
                    img, target, _ = ds[i]
                    img, tboxes = aug(img, target["boxes"])
                    canvas = np.zeros((h, w, 3), np.float32)
                    ih, iw = img.shape[:2]
                    canvas[: min(ih, h), : min(iw, w)] = img[:h, :w]
                    b, l, v, a = pad_gt(tboxes, target["labels"],
                                        target.get("attributes",
                                                   np.zeros(0)).tolist())
                    yield (jnp.asarray(canvas),
                           jnp.asarray([min(ih, h), min(iw, w)], jnp.int32),
                           jnp.asarray(b), jnp.asarray(l), jnp.asarray(v),
                           jnp.asarray(a), anchors)
            return
        if args.synthetic is not None:
            while True:
                img = jnp.asarray(
                    rng.randn(h, w, 3).astype(np.float32) * 30)
                boxes = np.array([[8, 8, 40, 40], [50, 20, 60, 60]],
                                 np.float32)
                b, l, v, a = pad_gt(boxes, [1, 2], [[1], [2]])
                yield (img, jnp.asarray([h, w]), jnp.asarray(b),
                       jnp.asarray(l), jnp.asarray(v), jnp.asarray(a),
                       anchors)
            return
        from cpt_tpu.tools.extract_features import load_image

        anns = json.load(open(args.ann_file))
        while True:
            for ann in anns:
                img, hw = load_image(f"{args.image_root}/{ann['img']}", h, w)
                canvas = np.zeros((h, w, 3), np.float32)
                canvas[: img.shape[0], : img.shape[1]] = img
                boxes = np.asarray(ann["boxes"], np.float32)
                boxes[:, 2] = boxes[:, 0] + boxes[:, 2] - 1
                boxes[:, 3] = boxes[:, 1] + boxes[:, 3] - 1
                img, boxes = aug(img, boxes)
                b, l, v, a = pad_gt(boxes, ann["labels"],
                                    ann.get("attributes"))
                yield (jnp.asarray(canvas), jnp.asarray(hw, jnp.int32),
                       jnp.asarray(b), jnp.asarray(l), jnp.asarray(v),
                       jnp.asarray(a), anchors)

    it = batches()
    first = next(it)
    params = jax.jit(trainer.init)(jax.random.PRNGKey(0), *first,
                                   jax.random.PRNGKey(1))
    if args.checkpoint:
        params = {"params": load_vinvl_checkpoint(args.checkpoint, cfg)}
        print(f"loaded {args.checkpoint}")

    # --config_file supplies the full reference solver (weight decay,
    # momentum, optimizer, clipping); CLI flags override the lr/schedule
    base_solver = ref.solver if ref is not None else SolverConfig()
    solver = dataclasses.replace(
        base_solver, base_lr=args.base_lr, steps=tuple(args.steps),
        max_iter=args.max_iter, warmup_iters=args.warmup_iters)

    def chain():
        yield first
        yield from it

    state = do_train(trainer, params, chain(), solver=solver,
                     checkpoint_dir=args.output_dir,
                     checkpoint_period=args.checkpoint_period,
                     freeze_conv_body_at=args.freeze_conv_body_at)
    print(f"trained to step {int(state.step)}")
    return state


if __name__ == "__main__":
    main()
