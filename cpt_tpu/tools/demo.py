"""Visualization demo: colored prompts, grounding boxes, and detections.

Mirrors the reference's ``demo/`` visualizers: ``color_image.py`` (prompt
paints), ``predictor.py``'s COCODemo (run the detector on an image, select
top predictions, overlay per-class-colored boxes with class names and
scores — ``predictor.py:261-411``), writing PNGs. No webcam loop (headless
environment; ``webcam.py`` is a cv2 capture shell around the same
predictor).

Usage:
  # prompt painting
  python -m cpt_tpu.tools.demo --image img.jpg \
      --boxes '[[10,10,120,140],[150,40,300,220]]' --out out.png \
      [--pred_box '[10,10,120,140]']
  # detection overlay (COCODemo equivalent)
  python -m cpt_tpu.tools.demo --image img.jpg --detect \
      --checkpoint vinvl_vg_x152c4.pth --labelmap VG-SGG-dicts.json \
      --conf 0.5 --out det.png
"""
from __future__ import annotations

import argparse
import json

import numpy as np

import jax.numpy as jnp

from cpt_tpu.data.prompts import CROSS_TASK_COLORS, REFCOCO_COLORS
from cpt_tpu.ops.render import paste_rect


def draw_box_outline(img: np.ndarray, box, color, thickness: int = 3
                     ) -> np.ndarray:
    x1, y1, x2, y2 = [int(v) for v in box]
    h, w = img.shape[:2]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, w - 1), min(y2, h - 1)
    out = img.copy()
    c = np.asarray(color[:3], np.uint8)
    out[y1:y1 + thickness, x1:x2 + 1] = c
    out[max(y2 - thickness + 1, 0):y2 + 1, x1:x2 + 1] = c
    out[y1:y2 + 1, x1:x1 + thickness] = c
    out[y1:y2 + 1, max(x2 - thickness + 1, 0):x2 + 1] = c
    return out


# COCODemo's per-class color hash (predictor.py:127: palette constant)
_PALETTE = np.asarray([2 ** 25 - 1, 2 ** 15 - 1, 2 ** 21 - 1],
                      dtype=np.int64)


def colors_for_labels(labels: np.ndarray) -> np.ndarray:
    """Fixed per-class colors (predictor.py:282-288)."""
    return (np.asarray(labels, np.int64)[:, None] * _PALETTE % 255
            ).astype(np.uint8)


def overlay_detections(img: np.ndarray, boxes, labels, scores,
                       class_names=None) -> np.ndarray:
    """Box outlines in per-class colors + "name: score" captions
    (predictor.py:290-311 overlay_boxes + :384-411 overlay_class_names)."""
    from PIL import Image, ImageDraw

    colors = colors_for_labels(labels)
    for box, color in zip(boxes, colors):
        img = draw_box_outline(img, box, color, thickness=2)
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    for box, label, score, color in zip(boxes, labels, scores, colors):
        name = (class_names.get(int(label), str(int(label)))
                if class_names else str(int(label)))
        draw.text((int(box[0]) + 2, max(int(box[1]) - 11, 0)),
                  f"{name}: {score:.2f}", fill=tuple(int(c) for c in color))
    return np.asarray(pil)


def run_detector(args, img: np.ndarray):
    """COCODemo.compute_prediction + select_top_predictions equivalent
    (predictor.py:224-280): RPN-mode detection, confidence filter,
    descending score order."""
    import jax
    import jax.numpy as jnp

    from cpt_tpu.engine.extract import make_detect_fn
    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
    from cpt_tpu.models.detector.config import (VINVL_X152C4,
                                                tiny_detector_config)
    from cpt_tpu.models.detector.convert import load_vinvl_checkpoint
    from cpt_tpu.models.detector.rpn import grid_anchors

    cfg = tiny_detector_config() if args.tiny else VINVL_X152C4
    model = AttrRCNN(cfg, dtype=jnp.bfloat16)
    h = w = cfg.input.pad_h
    canvas = np.zeros((h, w, 3), np.uint8)
    ih, iw = img.shape[:2]
    canvas[: min(ih, h), : min(iw, w)] = img[:h, :w]
    anchors = jnp.asarray(grid_anchors(cfg.rpn, h // 16, w // 16))
    if args.checkpoint:
        params = {"params": load_vinvl_checkpoint(args.checkpoint, cfg)}
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((h, w, 3)), jnp.asarray([h, w]),
            jnp.zeros((cfg.max_force_boxes, 4)),
            jnp.ones((cfg.max_force_boxes,), bool))
        print("WARNING: random detector weights (no --checkpoint)")
    fn = make_detect_fn(model, cfg, with_attributes=False)
    _, boxes, labels, scores, valid, _ = fn(
        params, jnp.asarray(canvas), anchors,
        jnp.asarray([min(ih, h), min(iw, w)], jnp.int32))
    boxes, labels, scores = (np.asarray(boxes), np.asarray(labels),
                             np.asarray(scores))
    keep = np.asarray(valid) & (scores > args.conf)
    order = np.argsort(-scores[keep])
    return boxes[keep][order], labels[keep][order], scores[keep][order]


def run_webcam(args):
    """Live detection loop over a capture device (reference
    ``demo/webcam.py:1-71``): grab frame → detect → overlay → display
    (or write frames when no display is available)."""
    import cv2

    cam = cv2.VideoCapture(args.webcam_device)
    if not cam.isOpened():
        raise RuntimeError(f"cannot open camera {args.webcam_device}")
    n = 0
    try:
        while args.max_frames <= 0 or n < args.max_frames:
            ok, bgr = cam.read()
            if not ok:
                break
            img = bgr[:, :, ::-1]
            boxes, labels, scores = run_detector(args, img)
            vis = overlay_detections(np.ascontiguousarray(img), boxes,
                                     labels, scores)
            if args.out:
                cv2.imwrite(args.out.replace(".png", f"_{n:04d}.png"),
                            vis[:, :, ::-1])
            else:  # pragma: no cover - needs a display
                cv2.imshow("cpt_tpu detections", vis[:, :, ::-1])
                if cv2.waitKey(1) == 27:
                    break
            n += 1
    finally:
        cam.release()
    print(f"processed {n} frames")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", default=None)
    p.add_argument("--boxes", default=None, help="json [[x1,y1,x2,y2],...]")
    p.add_argument("--out", required=True)
    p.add_argument("--pred_box", default=None)
    p.add_argument("--multi_color", action="store_true",
                   help="use the 6-color cross-task palette (one color per "
                        "box) instead of one red copy per box")
    p.add_argument("--detect", action="store_true",
                   help="run the detector and overlay per-class boxes + "
                        "names/scores (COCODemo equivalent)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--labelmap", default=None,
                   help="VG-SGG-dicts json (idx_to_label) for class names")
    p.add_argument("--conf", type=float, default=0.5,
                   help="confidence threshold (predictor.py:139)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--webcam", action="store_true",
                   help="live detection from a capture device (reference "
                        "demo/webcam.py); frames written to --out when "
                        "headless")
    p.add_argument("--webcam_device", type=int, default=0)
    p.add_argument("--max_frames", type=int, default=0,
                   help="stop the webcam loop after N frames (0 = until "
                        "ESC/stream end)")
    args = p.parse_args(argv)

    if args.webcam:
        return run_webcam(args)
    assert args.image, "--image required (or --webcam)"

    from PIL import Image

    img = np.asarray(Image.open(args.image).convert("RGB"))

    if args.detect:
        boxes, labels, scores = run_detector(args, img)
        names = None
        if args.labelmap:
            lm = json.load(open(args.labelmap))
            src = lm.get("idx_to_label", lm)
            names = {int(k): v for k, v in src.items()}
        arr = overlay_detections(img.copy(), boxes, labels, scores, names)
        Image.fromarray(arr).save(args.out)
        print(f"wrote {args.out} ({len(boxes)} detections > {args.conf})")
        return

    assert args.boxes, "--boxes required unless --detect"
    boxes = json.loads(args.boxes)

    outputs = []
    if args.multi_color:
        canvas = jnp.asarray(img)
        for i, box in enumerate(boxes):
            name, rgba = CROSS_TASK_COLORS[i % len(CROSS_TASK_COLORS)]
            canvas = paste_rect(canvas, jnp.asarray(box, jnp.float32),
                                jnp.asarray(rgba, jnp.uint8), inclusive=True)
        outputs.append(("all", np.asarray(canvas)))
    else:
        name, rgba = REFCOCO_COLORS[0]
        for i, box in enumerate(boxes):
            canvas = paste_rect(jnp.asarray(img),
                                jnp.asarray(box, jnp.float32),
                                jnp.asarray(rgba, jnp.uint8))
            outputs.append((f"copy{i}", np.asarray(canvas)))

    for tag, arr in outputs:
        if args.pred_box:
            arr = draw_box_outline(arr, json.loads(args.pred_box),
                                   (0, 255, 0))
        out_path = (args.out if len(outputs) == 1
                    else args.out.replace(".png", f"_{tag}.png"))
        Image.fromarray(arr).save(out_path)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
