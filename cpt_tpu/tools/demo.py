"""Visualization demo: render colored prompts + predicted grounding box.

Mirrors the reference's ``demo/`` visualizers (``color_image.py`` /
``predictor.py``): paints the candidate colored prompts onto an image and
draws the predicted box, writing PNGs.

Usage:
  python -m cpt_tpu.tools.demo --image img.jpg \
      --boxes '[[10,10,120,140],[150,40,300,220]]' --out out.png \
      [--pred_box '[10,10,120,140]']
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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--boxes", required=True, help="json [[x1,y1,x2,y2],...]")
    p.add_argument("--out", required=True)
    p.add_argument("--pred_box", default=None)
    p.add_argument("--multi_color", action="store_true",
                   help="use the 6-color cross-task palette (one color per "
                        "box) instead of one red copy per box")
    args = p.parse_args(argv)

    from PIL import Image

    img = np.asarray(Image.open(args.image).convert("RGB"))
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
