"""RoIPool (legacy max-pooling RoI extractor).

Parity with reference ``csrc/cuda/ROIPool_cuda.cu`` / ``layers/roi_pool.py``
(the pre-RoIAlign extractor kept by the reference as a legacy alternative;
not on any CPT path). Semantics: RoI coordinates rounded, bins are the
integer partition ``[floor(i·h/P), ceil((i+1)·h/P))``, max over each bin.

TPU design: a masked max over the feature map per output bin — static
shapes, no gathers. Cost is O(P²·H·W·C) which is fine for the feature-map
sizes this op is used at; RoIAlign (separable matmuls) remains the fast
path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("pooled", "spatial_scale"))
def roi_pool(features: Array, rois: Array, *, spatial_scale: float,
             pooled: int = 7) -> Array:
    """features [H, W, C]; rois [N, 4] xyxy → [N, pooled, pooled, C]."""
    h, w, c = features.shape

    def one(roi):
        x1 = jnp.round(roi[0] * spatial_scale).astype(jnp.int32)
        y1 = jnp.round(roi[1] * spatial_scale).astype(jnp.int32)
        x2 = jnp.round(roi[2] * spatial_scale).astype(jnp.int32)
        y2 = jnp.round(roi[3] * spatial_scale).astype(jnp.int32)
        roi_w = jnp.maximum(x2 - x1 + 1, 1)
        roi_h = jnp.maximum(y2 - y1 + 1, 1)

        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

        def bin_val(py, px):
            hstart = y1 + (py * roi_h) // pooled
            hend = y1 + -(-((py + 1) * roi_h) // pooled)
            wstart = x1 + (px * roi_w) // pooled
            wend = x1 + -(-((px + 1) * roi_w) // pooled)
            hstart = jnp.clip(hstart, 0, h)
            hend = jnp.clip(hend, 0, h)
            wstart = jnp.clip(wstart, 0, w)
            wend = jnp.clip(wend, 0, w)
            inside = ((ys >= hstart) & (ys < hend)
                      & (xs >= wstart) & (xs < wend))
            empty = ~jnp.any(inside)
            vals = jnp.where(inside[..., None], features, -jnp.inf)
            out = jnp.max(vals, axis=(0, 1))
            return jnp.where(empty, 0.0, out)

        rows = []
        for py in range(pooled):
            cols = [bin_val(py, px) for px in range(pooled)]
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)

    return jax.vmap(one)(rois.astype(jnp.float32))
