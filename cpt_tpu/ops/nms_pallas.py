"""Greedy NMS as a single Pallas kernel — the whole loop in VMEM.

The XLA version (``ops/nms.py``) runs ``max_out`` sequential ``fori_loop``
steps, each a separate HBM-visiting computation. Here the entire greedy
selection runs inside ONE kernel: boxes/scores live in VMEM (6000 × 4 f32 =
96 KB ≪ 16 MB), each iteration is pure VPU work (argmax + one IoU row), and
only the final index/keep vectors are written out.

Numerics identical to ``nms.py`` (torchvision semantics; optional legacy +1
IoU). Used for the RPN's 6000-proposal NMS where the loop-overhead win is
largest; interpret mode covers CPU tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _nms_kernel(boxes_ref, scores_ref, valid_ref, out_idx_ref, out_keep_ref,
                live_ref, *, iou_threshold: float, max_out: int,
                iou_offset: float):
    n = boxes_ref.shape[0]
    x1 = boxes_ref[:, 0]
    y1 = boxes_ref[:, 1]
    x2 = boxes_ref[:, 2]
    y2 = boxes_ref[:, 3]
    areas = jnp.maximum(x2 - x1 + iou_offset, 0.0) * jnp.maximum(
        y2 - y1 + iou_offset, 0.0)

    live_ref[:] = jnp.where(valid_ref[:] != 0, scores_ref[:], NEG_INF)
    out_idx_ref[:] = jnp.zeros((max_out,), jnp.int32)
    out_keep_ref[:] = jnp.zeros((max_out,), jnp.int32)

    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (max_out,), 0)

    def body(i, count):
        live = live_ref[:]
        pick = jnp.argmax(live).astype(jnp.int32)
        ok = jnp.max(live) > NEG_INF / 2

        # dynamic value-indexing is not lowerable on TPU Pallas — select the
        # picked box via masked reductions (pure VPU)
        sel = idx == pick
        bx1 = jnp.max(jnp.where(sel, x1, -jnp.inf))
        by1 = jnp.max(jnp.where(sel, y1, -jnp.inf))
        bx2 = jnp.max(jnp.where(sel, x2, -jnp.inf))
        by2 = jnp.max(jnp.where(sel, y2, -jnp.inf))
        barea = jnp.max(jnp.where(sel, areas, -jnp.inf))
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1)
                         + iou_offset, 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1)
                         + iou_offset, 0.0)
        inter = iw * ih
        iou = inter / jnp.maximum(areas + barea - inter, 1e-10)

        suppress = (iou > iou_threshold) & ok
        live_ref[:] = jnp.where(suppress | sel, NEG_INF, live)

        # one-hot write into the output slot (max_out-length vector op)
        slot = (out_iota == count) & ok
        out_idx_ref[:] = jnp.where(slot, pick, out_idx_ref[:])
        out_keep_ref[:] = jnp.where(slot, 1, out_keep_ref[:])
        return count + ok.astype(jnp.int32)

    jax.lax.fori_loop(0, max_out, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_out",
                                             "iou_offset", "interpret"))
def nms_pallas(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
               iou_threshold: float, max_out: int,
               iou_offset: float = 0.0,
               interpret: bool | None = None) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ``nms.nms_padded`` (same signature/semantics).

    boxes [K, 4] · scores [K] · valid [K] → (indices [max_out],
    keep [max_out] bool).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k = boxes.shape[0]
    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold,
                               max_out=max_out, iou_offset=iou_offset)
    out_idx, out_keep = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((max_out,), jnp.int32),
                   jax.ShapeDtypeStruct((max_out,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((k,), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), scores.astype(jnp.float32),
      valid.astype(jnp.int32))
    return out_idx, out_keep.astype(bool)
