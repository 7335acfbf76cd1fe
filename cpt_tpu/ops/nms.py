"""Fixed-shape greedy NMS — TPU-native design.

Replaces the reference's CUDA kernel
(``prompt_feat/maskrcnn_benchmark/csrc/cuda/nms.cu``; runtime-resolved to
``torchvision.ops.nms`` in ``layers/nms.py:4-8``).

Design: instead of the GPU bitmask algorithm (which materializes a K×K/64
suppression matrix and needs dynamic output shapes), we run the greedy loop
directly: at most ``max_out`` iterations of {argmax over unsuppressed
scores → record index → suppress its IoU neighbourhood}. Each iteration
computes ONE IoU row on the fly (O(K) VPU work), so no K² matrix ever
exists, the output shape is static ``[max_out]``, and the loop is a
``fori_loop`` the compiler pipelines.

IoU convention matches torchvision (exclusive: ``w = x2 - x1``), which is
what the reference's NMS actually uses — NOT the +1 convention of its
BoxList ops. ``iou_offset=1.0`` switches to the legacy convention.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e10


def _iou_row(box: Array, boxes: Array, offset: float) -> Array:
    """IoU of one box [4] against boxes [K, 4]."""
    area = jnp.maximum(box[2] - box[0] + offset, 0) * jnp.maximum(
        box[3] - box[1] + offset, 0)
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0] + offset, 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1] + offset, 0)
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(rb - lt + offset, 0)
    inter = wh[:, 0] * wh[:, 1]
    return inter / jnp.maximum(area + areas - inter, 1e-10)


@functools.partial(jax.jit, static_argnames=("max_out", "iou_offset"))
def nms_padded(boxes: Array, scores: Array, valid: Array,
               iou_threshold: float, max_out: int,
               iou_offset: float = 0.0) -> Tuple[Array, Array]:
    """Greedy NMS with static shapes.

    boxes [K, 4] xyxy · scores [K] · valid [K] bool → (indices [max_out],
    keep [max_out] bool). Selected in descending score order (torchvision
    tie-breaking: lower index wins via argmax-first semantics).
    """
    k = boxes.shape[0]
    live_scores = jnp.where(valid, scores, NEG_INF)

    def body(_i, state):
        live, out_idx, out_keep, count = state
        pick = jnp.argmax(live)
        ok = live[pick] > NEG_INF / 2
        iou = _iou_row(boxes[pick], boxes, iou_offset)
        suppress = iou > iou_threshold  # strictly greater (torchvision)
        live = jnp.where(ok & suppress, NEG_INF, live)
        live = live.at[pick].set(NEG_INF)
        out_idx = out_idx.at[count].set(jnp.where(ok, pick, 0))
        out_keep = out_keep.at[count].set(ok)
        return live, out_idx, out_keep, count + ok.astype(jnp.int32)

    init = (live_scores, jnp.zeros((max_out,), jnp.int32),
            jnp.zeros((max_out,), bool), jnp.int32(0))
    _, out_idx, out_keep, _ = jax.lax.fori_loop(0, max_out, body, init)
    return out_idx, out_keep


def nms_indices_list(boxes, scores, iou_threshold: float, max_out: int,
                     iou_offset: float = 0.0):
    """Host-convenience wrapper: returns a python list of kept indices."""
    import numpy as np

    b = jnp.asarray(boxes, jnp.float32)
    s = jnp.asarray(scores, jnp.float32)
    idx, keep = nms_padded(b, s, jnp.ones(s.shape, bool), iou_threshold,
                           max_out, iou_offset)
    idx, keep = np.asarray(idx), np.asarray(keep)
    return idx[keep].tolist()
