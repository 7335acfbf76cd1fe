"""Region Proposal Network — head, anchors, and static-shape proposal
selection.

Parity with reference ``maskrcnn_benchmark/modeling/rpn``:
  * classic Detectron cell anchors (rounded ratio enumeration around the
    ``(stride-1)``-square window, ``anchor_generator.py:234-289``)
  * single-conv head: 3×3 conv + relu → 1×1 objectness / 1×1 box deltas
    (``rpn.py:74-106``)
  * proposal selection (``rpn/inference.py:64-130``): per-image top-k by
    objectness (pre-NMS), decode with weights (1,1,1,1), clip to image,
    remove small, NMS 0.7, keep post-NMS top-n.

TPU-native: anchors are a host-precomputed static array per padded canvas
size; selection uses fixed-k ``top_k`` + masked NMS so every shape is
static. The true (unpadded) image size enters only through the clip bounds
and validity masks.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.models.detector.config import RPNConfig
from cpt_tpu.ops.nms import nms_padded
from cpt_tpu.structures.boxes import decode_boxes

Array = jax.Array


def cell_anchors(stride: int, sizes, aspect_ratios) -> np.ndarray:
    """Detectron base anchors [A, 4] (x1, y1, x2, y2), rounded enumeration."""
    scales = np.asarray(sizes, np.float64) / stride
    base = np.array([0, 0, stride - 1, stride - 1], np.float64)

    def whctrs(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mkanchors(ws, hs, xc, yc):
        ws, hs = ws[:, None], hs[:, None]
        return np.hstack([xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
                          xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)])

    w, h, xc, yc = whctrs(base)
    ratios = np.asarray(aspect_ratios, np.float64)
    ws = np.round(np.sqrt(w * h / ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = mkanchors(ws, hs, xc, yc)
    out = []
    for a in ratio_anchors:
        w, h, xc, yc = whctrs(a)
        out.append(mkanchors(w * scales, h * scales, xc, yc))
    return np.vstack(out).astype(np.float32)


def grid_anchors(cfg: RPNConfig, feat_h: int, feat_w: int) -> np.ndarray:
    """All anchors for a feature grid: [feat_h * feat_w * A, 4] (host)."""
    base = cell_anchors(cfg.anchor_stride, cfg.anchor_sizes, cfg.aspect_ratios)
    shift_x = np.arange(feat_w, dtype=np.float32) * cfg.anchor_stride
    shift_y = np.arange(feat_h, dtype=np.float32) * cfg.anchor_stride
    sx, sy = np.meshgrid(shift_x, shift_y)                 # [H, W]
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


class RPNHead(nn.Module):
    """SingleConvRPNHead: shared 3×3 conv, 1×1 objectness + 1×1 deltas."""

    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: Array) -> Tuple[Array, Array]:
        t = nn.Conv(feat.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                    name="conv", dtype=self.dtype)(feat)
        t = jax.nn.relu(t)
        logits = nn.Conv(self.num_anchors, (1, 1), name="cls_logits",
                         dtype=self.dtype)(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="bbox_pred",
                         dtype=self.dtype)(t)
        return logits, deltas


def select_proposals(cfg: RPNConfig, objectness: Array, deltas: Array,
                     anchors: Array, image_hw: Array, *, is_train: bool = False
                     ) -> Tuple[Array, Array, Array]:
    """One image's proposal selection with static shapes.

    objectness [H, W, A] · deltas [H, W, 4A] · anchors [H*W*A, 4] ·
    image_hw [2] (true size) → (boxes [post_n, 4], scores [post_n],
    valid [post_n]).

    Ordering matches the reference: flatten as A-major
    (``permute_and_flatten`` puts anchors last → we reshape to [HWA]),
    top-k pre-NMS, decode, clip, NMS.
    """
    pre_n = cfg.pre_nms_top_n_train if is_train else cfg.pre_nms_top_n_test
    post_n = cfg.post_nms_top_n_train if is_train else cfg.post_nms_top_n_test

    scores_flat = jax.nn.sigmoid(
        objectness.astype(jnp.float32)).reshape(-1)        # [H*W*A]
    deltas_flat = deltas.astype(jnp.float32).reshape(-1, 4)

    k = min(pre_n, scores_flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores_flat, k)
    top_deltas = deltas_flat[top_idx]
    top_anchors = anchors[top_idx]

    boxes = decode_boxes(top_deltas, top_anchors, (1.0, 1.0, 1.0, 1.0))
    h, w = image_hw[0].astype(jnp.float32), image_hw[1].astype(jnp.float32)
    x1 = jnp.clip(boxes[:, 0], 0, w - 1)
    y1 = jnp.clip(boxes[:, 1], 0, h - 1)
    x2 = jnp.clip(boxes[:, 2], 0, w - 1)
    y2 = jnp.clip(boxes[:, 3], 0, h - 1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    ws = x2 - x1 + 1
    hs = y2 - y1 + 1
    valid = (ws >= cfg.min_size) & (hs >= cfg.min_size)

    idx, keep = nms_padded(boxes, top_scores, valid, cfg.nms_thresh,
                           max_out=post_n)
    return boxes[idx], top_scores[idx], keep


def rpn_deltas_to_hwA(logits: Array, deltas: Array) -> Tuple[Array, Array]:
    """NHWC conv outputs already lay out as [H, W, A] / [H, W, A*4]; the
    reference's NCHW permute_and_flatten ordering (A-major over spatial)
    corresponds to flattening [H, W, A] row-major — identical index order."""
    return logits, deltas
