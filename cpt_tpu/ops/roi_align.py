"""RoIAlign as separable interpolation matmuls — TPU-native design.

Replaces the reference's CUDA kernel
(``prompt_feat/maskrcnn_benchmark/csrc/cuda/ROIAlign_cuda.cu``, legacy
``aligned=False`` semantics used by ``modeling/poolers.py:45-122``).

Instead of per-sample bilinear gathers (random access — hostile to the TPU
memory system), we exploit that RoIAlign is *separable*: with sample points
``y(p,s) = y0 + (p + (s+.5)/S) * bin_h`` the pooled value is

    out[p_y, p_x, c] = Σ_h Σ_w  Ry[p_y, h] · Rx[p_x, w] · f[h, w, c]

where ``Ry[p, h] = (1/S) Σ_s  w_bilin(y(p,s), h)`` already folds the in-bin
average over the S×S sample grid. Per RoI this is two dense matmuls
(``(P,H)×(H,W·C)`` then ``(P,W)×(W,P·C)``) that run on the MXU, instead of
``P·P·S·S·4`` scattered loads. Everything is static-shape: N RoIs in, N
pooled maps out, invalid RoIs masked by the caller.

Gradients come for free through the einsums (the reference needed a
hand-written backward kernel, ``ROIAlign_cuda.cu`` backward half).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _interp_matrix(starts: Array, bin_sizes: Array, size: int, pooled: int,
                   sampling, dtype, max_sampling: int = 8) -> Array:
    """Build R[n, pooled, size]: folded bilinear+average interpolation rows.

    starts:    [N] RoI start coordinate (already scaled to feature space)
    bin_sizes: [N] RoI bin size (roi_extent / pooled)
    sampling:  static int (fixed grid), or a per-RoI [N] int array — the
               reference's adaptive ``sampling_ratio=0`` (grid =
               ceil(bin_size)), realized with a masked ``max_sampling`` grid.
    """
    n = starts.shape[0]
    adaptive = not isinstance(sampling, int)
    smax = max_sampling if adaptive else sampling
    if adaptive:
        s_n = sampling.astype(jnp.float32)[:, None, None]          # [N,1,1]
    else:
        s_n = jnp.full((n, 1, 1), float(sampling))
    # sample positions: pos[n, p, s] = start + (p + (s+0.5)/S_n) * bin
    p_idx = jnp.arange(pooled, dtype=jnp.float32)[None, :, None]
    s_idx = jnp.arange(smax, dtype=jnp.float32)[None, None, :]
    offs = p_idx + (s_idx + 0.5) / s_n                             # [N,P,S]
    pos = starts[:, None, None] + offs * bin_sizes[:, None, None]
    live = s_idx < s_n                                             # [N,1,S]

    # legacy (aligned=False) clamping: pos < -1 or > size → skip (weight 0);
    # then pos clamped to [0, size-1] with border handling
    in_range = (pos >= -1.0) & (pos <= size) & live
    pos = jnp.clip(pos, 0.0, size - 1)
    low = jnp.floor(pos)
    frac = pos - low
    low = low.astype(jnp.int32)                                    # [N, P, S]
    high = jnp.minimum(low + 1, size - 1)

    # scatter bilinear weights into [N, P, S, size] then reduce S
    grid = jnp.arange(size, dtype=jnp.int32)
    w_low = (1.0 - frac) * in_range
    w_high = frac * in_range
    rows = (
        w_low[..., None] * (grid == low[..., None])
        + w_high[..., None] * (grid == high[..., None])
    )                                                              # [N,P,S,size]
    return (rows.sum(axis=2) / s_n).astype(dtype)                  # [N,P,size]


def interp_matrices(rois: Array, h: int, w: int, *, spatial_scale: float,
                    pooled: int, sampling, max_sampling: int = 8,
                    dtype=jnp.float32):
    """Separable interpolation matrices (Ry [N, P, H], Rx [N, P, W]) for a
    RoI set — the shared front half of ``roi_align`` (also consumed by the
    fused Pallas pooling kernel, ``roi_align_pallas.py``)."""
    scale = jnp.float32(spatial_scale)
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    x2 = rois[:, 2] * scale
    y2 = rois[:, 3] * scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled

    if sampling == 0:
        s_y = jnp.clip(jnp.ceil(bin_h), 1, max_sampling).astype(jnp.int32)
        s_x = jnp.clip(jnp.ceil(bin_w), 1, max_sampling).astype(jnp.int32)
    else:
        s_y = s_x = sampling
    ry = _interp_matrix(y1, bin_h, h, pooled, s_y, dtype,
                        max_sampling)                              # [N,P,H]
    rx = _interp_matrix(x1, bin_w, w, pooled, s_x, dtype,
                        max_sampling)                              # [N,P,W]
    return ry, rx


@functools.partial(jax.jit, static_argnames=("pooled", "sampling",
                                             "spatial_scale", "chunk",
                                             "max_sampling", "contract"))
def roi_align(features: Array, rois: Array, *, spatial_scale: float,
              pooled: int = 14, sampling: int = 2,
              chunk: int = 32, max_sampling: int = 8,
              contract: str = "auto") -> Array:
    """RoIAlign over a single feature map.

    features: [H, W, C] (NHWC, one image)   rois: [N, 4] xyxy in image coords
    returns:  [N, pooled, pooled, C]

    ``sampling > 0``: fixed grid (torchvision ``sampling_ratio=k``).
    ``sampling == 0``: the reference CUDA kernel's adaptive grid
    (``ceil(roi_extent / pooled)`` per axis, capped at ``max_sampling``) —
    exact parity with the VinVL config's ``POOLER_SAMPLING_RATIO = 0``.
    """
    h, w, c = features.shape
    n = rois.shape[0]
    dtype = features.dtype
    ry, rx = interp_matrices(rois, h, w, spatial_scale=spatial_scale,
                             pooled=pooled, sampling=sampling,
                             max_sampling=max_sampling, dtype=dtype)

    # chunked over RoIs to bound the [chunk, P, ·, C] intermediate
    pad = (-n) % chunk
    ry_p = jnp.pad(ry, ((0, pad), (0, 0), (0, 0)))
    rx_p = jnp.pad(rx, ((0, pad), (0, 0), (0, 0)))

    # contract the LARGER spatial dim first so the [chunk, P, other, C]
    # intermediate carries the smaller one — ~1.6x less HBM traffic on
    # the dominant tensor at extraction shapes (W=64 vs H=40); one 5 MB
    # transpose of `features` keeps the first einsum a natural-layout
    # GEMM (round-4 study, bench_roialign.py)
    w_first = w > h if contract == "auto" else contract == "x"
    feats_c = jnp.transpose(features, (1, 0, 2)) if w_first else features

    def body(carry, inputs):
        ry_c, rx_c = inputs                                         # [chunk,P,{H,W}]
        if w_first:
            t = jnp.einsum("nqw,whc->nqhc", rx_c, feats_c,
                           preferred_element_type=jnp.float32)
            out = jnp.einsum("nph,nqhc->npqc", ry_c, t.astype(dtype),
                             preferred_element_type=jnp.float32)
        else:
            t = jnp.einsum("nph,hwc->npwc", ry_c, feats_c,
                           preferred_element_type=jnp.float32)
            out = jnp.einsum("nqw,npwc->npqc", rx_c, t.astype(dtype),
                             preferred_element_type=jnp.float32)
        return carry, out.astype(dtype)

    n_chunks = (n + pad) // chunk
    _, outs = jax.lax.scan(
        body, (),
        (ry_p.reshape(n_chunks, chunk, pooled, h),
         rx_p.reshape(n_chunks, chunk, pooled, w)))
    out = outs.reshape(n_chunks * chunk, pooled, pooled, c)
    return out[:n]


def roi_align_batched(features: Array, rois: Array, roi_batch_idx: Array,
                      **kw) -> Array:
    """Multi-image RoIAlign: features [B, H, W, C], roi_batch_idx [N].

    Gathers each RoI's source image then runs the single-image kernel —
    feature maps are selected per chunk via one-hot matmul to stay static.
    For B small (extraction uses 1-2 images per device) a vmap-over-select
    is cheapest.
    """
    b = features.shape[0]
    if b == 1:
        return roi_align(features[0], rois, **kw)
    onehot = jax.nn.one_hot(roi_batch_idx, b, dtype=features.dtype)  # [N, B]
    # per-roi feature map: contract over batch — avoids dynamic gather of
    # whole feature maps; XLA turns this into selects for small B
    per_roi = jnp.einsum("nb,bhwc->nhwc", onehot, features)
    return jax.vmap(lambda f, r: roi_align(f, r[None], **kw)[0])(per_roi, rois)
