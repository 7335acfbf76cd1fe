"""Fixed-shape padded box containers and box ops.

TPU-native replacement for the reference's dynamically-sized ``BoxList``
(reference ``prompt_feat/maskrcnn_benchmark/structures/bounding_box.py:9-251``
and ``boxlist_ops.py``): XLA requires static shapes, so every stage carries
``(max_boxes, 4)`` xyxy arrays plus a boolean validity mask instead of
variable-length tensors with an ``extra_fields`` dict.

Box conventions match the reference exactly: inclusive pixel coordinates with
``TO_REMOVE = 1`` (widths are ``x2 - x1 + 1``, reference
``bounding_box.py:66-70`` / ``boxlist_ops.py:73``) — required for IoU /
area / NMS parity with the PyTorch pipeline.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

TO_REMOVE = 1.0  # reference's +1 box-width convention


@jax.tree_util.register_pytree_node_class
class Boxes:
    """A batch-free set of boxes: ``xyxy (N, 4)`` + validity ``mask (N,)``.

    Extra per-box arrays (scores, labels, features, …) travel alongside in
    plain dicts at the call sites — keeping this a minimal pytree keeps jit
    signatures simple.
    """

    def __init__(self, xyxy: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        self.xyxy = xyxy
        self.mask = mask if mask is not None else jnp.ones(xyxy.shape[:-1], bool)

    # pytree protocol
    def tree_flatten(self):
        return (self.xyxy, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_slots(self) -> int:
        return self.xyxy.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def area(self) -> jnp.ndarray:
        return box_area(self.xyxy)

    def clip_to_image(self, height: int, width: int) -> "Boxes":
        x1 = jnp.clip(self.xyxy[..., 0], 0, width - TO_REMOVE)
        y1 = jnp.clip(self.xyxy[..., 1], 0, height - TO_REMOVE)
        x2 = jnp.clip(self.xyxy[..., 2], 0, width - TO_REMOVE)
        y2 = jnp.clip(self.xyxy[..., 3], 0, height - TO_REMOVE)
        return Boxes(jnp.stack([x1, y1, x2, y2], axis=-1), self.mask)

    def remove_small(self, min_size: float) -> "Boxes":
        w = self.xyxy[..., 2] - self.xyxy[..., 0] + TO_REMOVE
        h = self.xyxy[..., 3] - self.xyxy[..., 1] + TO_REMOVE
        keep = (w >= min_size) & (h >= min_size)
        return Boxes(self.xyxy, self.mask & keep)


def box_area(xyxy: jnp.ndarray) -> jnp.ndarray:
    """Area with the reference's +1 convention (``bounding_box.py:66-70``)."""
    w = jnp.maximum(xyxy[..., 2] - xyxy[..., 0] + TO_REMOVE, 0.0)
    h = jnp.maximum(xyxy[..., 3] - xyxy[..., 1] + TO_REMOVE, 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between ``a (N, 4)`` and ``b (M, 4)`` → ``(N, M)``.

    Matches reference ``boxlist_ops.boxlist_iou:52-91`` (inclusive +1 widths).
    """
    area_a = box_area(a)[..., :, None]
    area_b = box_area(b)[..., None, :]
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-10)


def box_iou_np(a, b):
    """Host-side NumPy twin of :func:`box_iou` (same inclusive +1 widths).

    For data-pipeline loops that would otherwise dispatch unjitted jnp ops
    per record (minutes of per-op round trips on the relay backend).
    """
    import numpy as np

    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    area = lambda x: (np.maximum(x[:, 2] - x[:, 0] + TO_REMOVE, 0.0)
                      * np.maximum(x[:, 3] - x[:, 1] + TO_REMOVE, 0.0))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area(a)[:, None] + area(b)[None, :] - inter,
                              1e-10)


def xywh_iou(a, b) -> float:
    """Host-side scalar IoU over xywh boxes; mirrors the reference's
    ``Oscar/oscar/utils/iou.py::computeIoU`` used by every eval rule."""
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2 = min(a[0] + a[2] - 1, b[0] + b[2] - 1)
    iy2 = min(a[1] + a[3] - 1, b[1] + b[3] - 1)
    iw, ih = max(ix2 - ix1 + 1, 0), max(iy2 - iy1 + 1, 0)
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def encode_boxes(ref: jnp.ndarray, proposals: jnp.ndarray,
                 weights: Tuple[float, float, float, float]) -> jnp.ndarray:
    """Faster-RCNN box encoding (reference ``modeling/box_coder.py:35-65``)."""
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0] + TO_REMOVE
    ex_h = proposals[..., 3] - proposals[..., 1] + TO_REMOVE
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = ref[..., 2] - ref[..., 0] + TO_REMOVE
    gt_h = ref[..., 3] - ref[..., 1] + TO_REMOVE
    gt_cx = ref[..., 0] + 0.5 * gt_w
    gt_cy = ref[..., 1] + 0.5 * gt_h

    tx = wx * (gt_cx - ex_cx) / ex_w
    ty = wy * (gt_cy - ex_cy) / ex_h
    tw = ww * jnp.log(gt_w / ex_w)
    th = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 weights: Tuple[float, float, float, float],
                 bbox_xform_clip: float = 4.135166556742356,  # log(1000/16)
                 ) -> jnp.ndarray:
    """Faster-RCNN box decoding (reference ``modeling/box_coder.py:67-95``).

    ``deltas``: (..., N, 4*k); ``anchors``: (..., N, 4) → (..., N, 4*k) xyxy.
    """
    w = anchors[..., 2] - anchors[..., 0] + TO_REMOVE
    h = anchors[..., 3] - anchors[..., 1] + TO_REMOVE
    cx = anchors[..., 0] + 0.5 * w
    cy = anchors[..., 1] + 0.5 * h

    wx, wy, ww, wh = weights
    dx = deltas[..., 0::4] / wx
    dy = deltas[..., 1::4] / wy
    dw = jnp.clip(deltas[..., 2::4] / ww, max=bbox_xform_clip)
    dh = jnp.clip(deltas[..., 3::4] / wh, max=bbox_xform_clip)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    # reference inclusive-corner decode: x1 = cx - w/2, x2 = cx + w/2 - 1
    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w - TO_REMOVE
    y2 = pred_cy + 0.5 * pred_h - TO_REMOVE
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., N, k, 4)
    return out.reshape(*deltas.shape[:-1], -1)


def pad_boxes(xyxy, max_boxes: int, extra: Optional[dict] = None):
    """Host-side: pad an ``(n, 4)`` array (n ≤ max) to ``(max_boxes, 4)`` + mask."""
    import numpy as np

    n = len(xyxy)
    out = np.zeros((max_boxes, 4), dtype=np.float32)
    out[:n] = np.asarray(xyxy, dtype=np.float32)[:max_boxes]
    mask = np.zeros((max_boxes,), dtype=bool)
    mask[: min(n, max_boxes)] = True
    if extra is None:
        return out, mask
    padded_extra = {}
    for k, v in extra.items():
        v = np.asarray(v)
        buf = np.zeros((max_boxes,) + v.shape[1:], dtype=v.dtype)
        buf[: min(n, max_boxes)] = v[:max_boxes]
        padded_extra[k] = buf
    return out, mask, padded_extra
