"""Test-time bounding-box augmentation (multi-scale + horizontal flip).

Parity with reference ``engine/bbox_aug.py`` (``TEST.BBOX_AUG``, disabled in
every CPT config but part of the capability surface): detections are
computed for the base image, its horizontal flip, and a set of rescales;
all candidate boxes are pooled (flip-back / scale-back into original
coordinates) and a final NMS + top-k produces the merged detections.

TPU notes: each augmentation is one jitted detector invocation (per-shape
compile cache); the merge is one `nms_padded` over the pooled candidates.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.ops.nms import nms_padded


def hflip_image(image: jnp.ndarray) -> jnp.ndarray:
    return image[:, ::-1]


def hflip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    out = boxes.copy()
    out[:, 0] = width - boxes[:, 2] - 1
    out[:, 2] = width - boxes[:, 0] - 1
    return out


def im_detect_bbox_aug(detect_fn: Callable, image_u8: np.ndarray,
                       image_hw, *, scales: Sequence[float] = (),
                       hflip: bool = True, nms_thresh: float = 0.5,
                       max_dets: int = 100) -> Dict[str, np.ndarray]:
    """``detect_fn(image_u8, hw) -> {boxes, scores, labels, valid}`` runs one
    detection pass; this pools passes over augmentations and merges.

    Returns merged {boxes, scores, labels, valid} (orig coordinates).
    """
    h, w = int(image_hw[0]), int(image_hw[1])
    pooled_boxes: List[np.ndarray] = []
    pooled_scores: List[np.ndarray] = []
    pooled_labels: List[np.ndarray] = []

    def add(out, unmap=None):
        v = np.asarray(out["valid"])
        boxes = np.asarray(out["boxes"])[v]
        if unmap is not None:
            boxes = unmap(boxes)
        pooled_boxes.append(boxes)
        pooled_scores.append(np.asarray(out["scores"])[v])
        pooled_labels.append(np.asarray(out["labels"])[v])

    add(detect_fn(image_u8, (h, w)))
    if hflip:
        flipped = np.asarray(image_u8)[:, ::-1]
        add(detect_fn(flipped, (h, w)),
            unmap=lambda b: hflip_boxes(b, w))
    for s in scales:
        from PIL import Image

        sh, sw = int(round(h * s)), int(round(w * s))
        img = Image.fromarray(np.asarray(image_u8)[:h, :w])
        scaled = np.zeros_like(np.asarray(image_u8))
        arr = np.asarray(img.resize((sw, sh), Image.BILINEAR))
        ch = min(sh, scaled.shape[0])
        cw = min(sw, scaled.shape[1])
        scaled[:ch, :cw] = arr[:ch, :cw]
        add(detect_fn(scaled, (ch, cw)),
            unmap=lambda b, s=s: b / s)

    boxes = np.concatenate(pooled_boxes)
    scores = np.concatenate(pooled_scores)
    labels = np.concatenate(pooled_labels)
    n = len(boxes)
    if n == 0:
        return {"boxes": np.zeros((max_dets, 4), np.float32),
                "scores": np.zeros((max_dets,), np.float32),
                "labels": np.zeros((max_dets,), np.int64),
                "valid": np.zeros((max_dets,), bool)}
    idx, keep = nms_padded(jnp.asarray(boxes, jnp.float32),
                           jnp.asarray(scores, jnp.float32),
                           jnp.ones((n,), bool), nms_thresh,
                           max_out=max_dets)
    idx, keep = np.asarray(idx), np.asarray(keep)
    out_boxes = np.zeros((max_dets, 4), np.float32)
    out_scores = np.zeros((max_dets,), np.float32)
    out_labels = np.zeros((max_dets,), np.int64)
    out_boxes[keep] = boxes[idx[keep]]
    out_scores[keep] = scores[idx[keep]]
    out_labels[keep] = labels[idx[keep]]
    return {"boxes": out_boxes, "scores": out_scores, "labels": out_labels,
            "valid": keep}
