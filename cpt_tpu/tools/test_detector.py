"""Detector evaluation driver: RPN-mode detection over a split → VOC mAP.

Mirrors reference ``prompt_feat/tools/test_sg_net.py`` (detection eval on
VG, ``vg_eval.py``): runs AttrRCNN with RPN proposals + filter_results_fast
over an image list, evaluates VOC-style mAP against gt boxes, and applies
the ``TEST.EXPECTED_RESULTS`` σ-tolerance assertion when given.

Data: json list [{img, width, height, boxes [[x,y,w,h]...], labels [...]}]
with --image_root, or --synthetic N.
"""
from __future__ import annotations

import argparse
import json
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.engine.detection_eval import (check_expected_results,
                                           eval_detection_voc)
from cpt_tpu.engine.extract import make_detect_fn
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import VINVL_X152C4, tiny_detector_config
from cpt_tpu.models.detector.convert import load_vinvl_checkpoint
from cpt_tpu.models.detector.rpn import grid_anchors


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ann_file", default=None)
    p.add_argument("--tsv", default=None,
                   help="od/vg-TSV dataset yaml (reference vg_tsv.py "
                        "format: img/label/hw TSVs + labelmap jsondict)")
    p.add_argument("--image_root", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--expected_results", default=None,
                   help='json [["mAP", 0.35, 0.01], ...]')
    p.add_argument("--attr_eval", action="store_true",
                   help="force-box ATTRIBUTE mAP over the TSV gt boxes "
                        "(the reference test_sg_net.py:115 attribute "
                        "evaluation: vg_eval eval_attributes=True)")
    p.add_argument("--voc_box_convention", action="store_true",
                   help="use the plain-VOC evaluator's double-inclusive "
                        "box convention (reference voc_eval.py) instead "
                        "of the VG-TSV protocol's single +1 "
                        "(vg_eval.py, the default)")
    p.add_argument("--coco_eval", action="store_true",
                   help="also report COCO-protocol AP/AP50/AP75")
    p.add_argument("--bbox_aug", action="store_true",
                   help="test-time bbox augmentation (reference "
                        "TEST.BBOX_AUG / engine/bbox_aug.py): pool "
                        "detections over hflip + --bbox_aug_scales and "
                        "merge with NMS")
    p.add_argument("--bbox_aug_scales", default="",
                   help="comma-separated rescale factors, e.g. 0.75,1.25")
    p.add_argument("--sg", action="store_true",
                   help="scene-graph relation eval over a VG-TSV (--tsv "
                        "with relations): SceneParser inference + both SG "
                        "recall protocols (reference test_sg_net.py + "
                        "evaluation/sg)")
    p.add_argument("--rel_algorithm", default="sg_reldn",
                   choices=["sg_reldn", "sg_imp", "sg_msdn", "sg_grcnn",
                            "sg_nm"])
    p.add_argument("--max_rel_dets", type=int, default=16)
    from cpt_tpu.tools._common import add_detector_config_args

    return add_detector_config_args(p)


def attr_eval(args, model, cfg, params, h, w):
    """Force-box attribute evaluation (reference ``test_sg_net.py:115`` →
    ``vg_eval.py`` ``eval_attributes=True``): run the attribute head on
    the gt boxes, post-process per the reference's AttributePostProcessor
    (softmax with background zeroed, ``postprocess_threshold``, top
    ``max_num_attr_per_obj`` slots), then attribute mAP."""
    from cpt_tpu.data.vg_tsv import DetectionTSVDataset
    from cpt_tpu.engine.detection_eval import eval_detection_attributes
    from cpt_tpu.engine.extract import to_detector_input

    ds = DetectionTSVDataset(args.tsv, attribute_on=True)
    m = cfg.max_force_boxes
    ac = cfg.attributes
    k = min(ac.max_num_attr_per_obj, ac.num_attributes - 1)

    @jax.jit
    def fb(prm, image_u8, hw, boxes, valid):
        x = to_detector_input(image_u8, cfg.input.pixel_mean,
                              dtype=model.dtype)
        out = model.apply(prm, x, hw, boxes, valid, with_attributes=True)
        return out["attr_logits"]

    preds, gts = [], []
    t0 = time.time()
    for i in range(len(ds)):
        img, target, _ = ds[i]
        ih, iw = img.shape[:2]
        canvas = np.zeros((h, w, 3), np.uint8)
        canvas[: min(ih, h), : min(iw, w)] = img[:h, :w]
        gt_boxes = np.asarray(target["boxes"], np.float32)
        n = min(len(gt_boxes), m)
        boxes = np.zeros((m, 4), np.float32)
        boxes[:n] = gt_boxes[:n]
        valid = np.zeros((m,), bool)
        valid[:n] = True
        logits = np.asarray(fb(params, jnp.asarray(canvas),
                               jnp.asarray([min(ih, h), min(iw, w)],
                                           jnp.int32),
                               jnp.asarray(boxes), jnp.asarray(valid)))[:n]
        prob = np.exp(logits - logits.max(-1, keepdims=True))
        prob /= prob.sum(-1, keepdims=True)
        prob[:, 0] = 0.0                       # __no_attribute__
        prob[prob <= ac.postprocess_threshold] = 0.0
        order = np.argsort(-prob, axis=-1)[:, :k]
        attr_labels = order.astype(np.int64)
        attr_scores = np.take_along_axis(prob, order, axis=-1)
        preds.append({"boxes": gt_boxes[:n], "attr_labels": attr_labels,
                      "attr_scores": attr_scores})
        gts.append({"boxes": gt_boxes[:n],
                    "attributes": np.asarray(target.get(
                        "attributes", np.zeros((n, 1), np.int64)))[:n]})
    dt = time.time() - t0
    print(f"attr-eval: {len(preds)} images in {dt:.1f}s")
    results = eval_detection_attributes(preds, gts, ac.num_attributes)
    print(f"attr mAP: {results['attr_mAP']:.4f} "
          f"(weighted {results['attr_weighted_mAP']:.4f})")
    if args.output:
        with open(args.output, "w") as f:
            json.dump({k2: float(v) for k2, v in results.items()}, f)
    return results


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
    model = AttrRCNN(cfg, dtype=dtype)
    rng = np.random.RandomState(0)

    h = w = cfg.input.pad_h
    fh, fw = h // 16, w // 16
    anchors = jnp.asarray(grid_anchors(cfg.rpn, fh, fw))
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((h, w, 3)), jnp.asarray([h, w]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))
    if args.checkpoint:
        params = {"params": load_vinvl_checkpoint(args.checkpoint, cfg)}
    else:
        params = init
        print("WARNING: random detector weights")

    if args.attr_eval:
        if args.coco_eval or args.expected_results or args.bbox_aug:
            raise SystemExit(
                "--attr_eval is a standalone force-box attribute "
                "evaluation and cannot combine with --coco_eval/"
                "--expected_results/--bbox_aug")
        return attr_eval(args, model, cfg, params, h, w)

    fn = make_detect_fn(model, cfg, with_attributes=False)

    def samples():
        if args.tsv:
            from cpt_tpu.data.vg_tsv import DetectionTSVDataset

            ds = DetectionTSVDataset(args.tsv, attribute_on=False)
            for i in range(len(ds)):
                img, target, _ = ds[i]
                ih, iw = img.shape[:2]
                canvas = np.zeros((h, w, 3), np.uint8)
                canvas[: min(ih, h), : min(iw, w)] = img[:h, :w]
                yield ds.get_img_key(i), canvas, (min(ih, h), min(iw, w)), {
                    "boxes": target["boxes"], "labels": target["labels"]}
            return
        if args.synthetic is not None:
            for i in range(args.synthetic):
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                gt = {"boxes": np.array([[8, 8, 40, 40]], np.float32),
                      "labels": np.array([1])}
                yield f"syn{i}", img, (h, w), gt
            return
        from cpt_tpu.tools.extract_features import load_image

        for ann in json.load(open(args.ann_file)):
            img, hw = load_image(
                f"{args.image_root}/{ann['img']}", h, w)
            boxes = np.asarray(ann["boxes"], np.float32)
            boxes[:, 2] = boxes[:, 0] + boxes[:, 2] - 1
            boxes[:, 3] = boxes[:, 1] + boxes[:, 3] - 1
            yield ann["img"], img, hw, {
                "boxes": boxes, "labels": np.asarray(ann["labels"])}

    aug_scales = [float(s) for s in args.bbox_aug_scales.split(",") if s]

    def detect_one(img_np, hw_):
        feats, boxes, labels, scores, valid, _ = fn(
            params, jnp.asarray(img_np), anchors,
            jnp.asarray(hw_, jnp.int32))
        return {"boxes": boxes, "scores": scores, "labels": labels,
                "valid": valid}

    preds, gts = [], []
    t0 = time.time()
    n = 0
    for key, img, hw, gt in samples():
        if args.bbox_aug:
            from cpt_tpu.engine.bbox_aug import im_detect_bbox_aug

            out = im_detect_bbox_aug(detect_one, img, hw,
                                     scales=aug_scales)
        else:
            out = detect_one(img, hw)
        v = np.asarray(out["valid"])
        preds.append({"boxes": np.asarray(out["boxes"])[v],
                      "labels": np.asarray(out["labels"])[v],
                      "scores": np.asarray(out["scores"])[v]})
        gts.append(gt)
        n += 1
    dt = time.time() - t0
    print(f"detected {n} images in {dt:.1f}s ({n / max(dt, 1e-9):.2f} img/s)")

    results = eval_detection_voc(preds, gts, cfg.roi_heads.num_classes,
                                 double_inclusive=args.voc_box_convention)
    print(f"mAP: {results['mAP']:.4f}")
    if args.coco_eval:
        from cpt_tpu.engine.detection_eval import eval_detection_coco

        coco = eval_detection_coco(preds, gts)
        results.update({f"coco_{k}": v for k, v in coco.items()})
        print(f"COCO AP: {coco['AP']:.4f}  AP50: {coco['AP50']:.4f}  "
              f"AP75: {coco['AP75']:.4f}")
    if args.sg:
        assert args.tsv, "--sg requires --tsv (VG-TSV with relations)"
        from cpt_tpu.data.vg_tsv import VGTSVDataset
        from cpt_tpu.engine.sg_infer import evaluate_scene_graphs
        from cpt_tpu.models.detector.scene_parser import SceneParser

        ds = VGTSVDataset(args.tsv, attribute_on=False, relation_on=True)
        n_rel = len(ds.relation_to_ind)
        parser = SceneParser(cfg, num_rel_classes=n_rel,
                             algorithm=args.rel_algorithm,
                             max_rel_dets=args.max_rel_dets, dtype=dtype)
        pinit = jax.jit(parser.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((h, w, 3)),
                                     jnp.asarray([h, w]), anchors)
        if args.checkpoint:
            # reuse detector weights; relation head stays at init unless a
            # scene-parser checkpoint provides it
            pinit["params"]["detector"] = params["params"]
        sg = evaluate_scene_graphs(parser, pinit, ds, anchors, (h, w))
        for proto, metric in sg.items():
            print(f"{proto}: " + " ".join(f"{k}={v:.4f}"
                                          for k, v in sorted(metric.items())))
        results.update({f"sg_{p}_{k}": v for p, m in sg.items()
                        for k, v in m.items()})
    ok = True
    if args.expected_results:
        expected = [tuple(e) for e in json.loads(args.expected_results)]
        ok = check_expected_results(results, expected)
    if args.output:
        pickle.dump({"results": results, "predictions": preds},
                    open(args.output, "wb"))
    return results, ok


if __name__ == "__main__":
    main()
