"""Fused batched RoIAlign — Pallas TPU kernel (MEASURED NO-WIN; kept
as an opt-in study, default stays the XLA separable path).

Hypothesis: the XLA path materializes the separable intermediate
``t[n, P, spatial, C]`` to HBM between the two einsums (~115 ms of the
heads phase at C=64 extraction shapes); keeping ``t`` in VMEM — per
(copy, channel-slab, RoI-block) grid cell one row-dense GEMM
``[RB·P, H] × [H, W·CS]`` produces the block's ``t`` and each RoI's
second contraction ``[P, W] × [W, P·CS]`` consumes it in place — should
remove that round-trip.

Measured (composed heads_from_feats A/B on v5e, C=64, M=128, same
session, PERF.md round 4): **pallas LOSES** — 445.4 ms vs 368.0 XLA at
CS=128, 426.5 vs 391.3 at CS=256. The per-RoI ``swapaxes`` relayouts
that the second contraction needs (t_r [P, W, CS] → [W, P, CS], then
the [q, p] → [p, q] output swap) cost more on the VPU than the saved
HBM traffic — the same failure mode as the round-3 slice-dense grouped
conv. Correctness holds (box_features |Δ| at the bf16 floor). Same
adjudication as ``ops/nms_pallas.py`` / ``ops/grouped_conv.py``:
correctness-tested, documented, default OFF (``pooler_impl="auto"``
routes to XLA).

Replaces the same reference op as ``roi_align.py``
(``prompt_feat/maskrcnn_benchmark/csrc/cuda/ROIAlign_cuda.cu``); numerics
match the XLA path up to f32-accumulation order on the MXU (t is cast
to the feature dtype between the contractions in BOTH paths).

Backward: custom VJP routes to the XLA formulation (the kernel targets
the inference extraction path; training pools via the XLA op anyway).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpt_tpu.ops.roi_align import interp_matrices, roi_align

Array = jax.Array

# RoI-block and channel-slab sizes: t [RB*P, W*CS] (f32 dot output +
# bf16 cast) must fit VMEM next to the f slab, the per-RoI transposed
# view, and the double-buffered blocks — ~11 MB at the X152 extraction
# shape with CS=128 (CS=256 measured 21.35M scoped vmem > the 16M
# limit; RB stays 8 so einsum1 keeps 112/128 row fill).
_RB = 8
_CS = 256

# tests flip this to run the kernel under the Pallas interpreter on CPU
_INTERPRET = False


def _pool_kernel(ry_ref, rx_ref, f_ref, out_ref, *, rb, pooled):
    f = f_ref[0]                                      # [H, W, CS]
    h, w, cs = f.shape
    ry = ry_ref[:].reshape(rb * pooled, h)            # [RB*P, H]
    t = jnp.dot(ry, f.reshape(h, w * cs),
                preferred_element_type=jnp.float32)
    # match the XLA path: t cast to feature dtype between contractions
    t = t.astype(out_ref.dtype).reshape(rb, pooled, w, cs)
    outs = []
    for r in range(rb):                               # unrolled RoI loop
        t_r = jnp.swapaxes(t[r], 0, 1)                # [W, P, CS]
        o = jnp.dot(rx_ref[r], t_r.reshape(w, pooled * cs),
                    preferred_element_type=jnp.float32)
        # dot output rows are q (the x pooled index); pooled layout is
        # [p, q, c] — swap back (tiny [P, P, CS] relayout)
        outs.append(jnp.swapaxes(o.reshape(pooled, pooled, cs), 0, 1))
    out_ref[0] = jnp.stack(outs).astype(out_ref.dtype)


def pallas_pool_eligible(b: int, h: int, w: int, c: int, n: int,
                         pooled: int, dtype) -> bool:
    """Shape gate for the fused kernel (VMEM budget + tiling)."""
    if dtype != jnp.bfloat16 or c % _CS or n % _RB:
        return False
    vmem = (h * w * _CS * 2            # f slab (bf16)
            + _RB * pooled * w * _CS * 4   # t (f32 dot output)
            + _RB * pooled * w * _CS * 2   # t (bf16)
            + w * pooled * _CS * 2         # per-RoI transposed view
            + _RB * pooled * pooled * _CS * 2)  # out block
    return vmem < 13 * 2 ** 20


def _pool_pallas(feats: Array, ry: Array, rx: Array, pooled: int) -> Array:
    b, h, w, c = feats.shape
    n = ry.shape[0]
    kern = functools.partial(_pool_kernel, rb=_RB, pooled=pooled)
    return pl.pallas_call(
        kern,
        grid=(b, c // _CS, n // _RB),
        in_specs=[
            pl.BlockSpec((_RB, pooled, h), lambda i, s, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, pooled, w), lambda i, s, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            # f slab: constant across the inner (RoI-block) grid dim →
            # stays resident in VMEM while every RoI block consumes it
            pl.BlockSpec((1, h, w, _CS), lambda i, s, r: (i, 0, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _RB, pooled, pooled, _CS),
                               lambda i, s, r: (i, r, 0, 0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, pooled, pooled, c),
                                       feats.dtype),
        cost_estimate=pl.CostEstimate(
            # einsum1: 2·B·(N·P)·H·(W·C); einsum2: 2·B·N·(P·P·C)·W
            flops=2 * b * n * pooled * w * c * (h + pooled),
            bytes_accessed=b * h * w * c * 2
            + b * n * pooled * pooled * c * 2,
            transcendentals=0,
        ),
        # Mosaic's default scoped-vmem budget is 16 MiB; the unrolled
        # per-RoI transposes put this kernel ~1 MiB over (measured
        # 16.98M at CS=128) — raise the cap, the physical VMEM is larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(ry, rx, feats)


def _xla_pool(feats, rois, *, spatial_scale, pooled, sampling,
              max_sampling):
    return jax.vmap(lambda f: roi_align(
        f, rois, spatial_scale=spatial_scale, pooled=pooled,
        sampling=sampling, max_sampling=max_sampling))(feats)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6))
def batched_roi_align(feats: Array, rois: Array, spatial_scale: float,
                      pooled: int = 14, sampling: int = 0,
                      max_sampling: int = 8,
                      impl: str = "auto") -> Array:
    """RoIAlign of one shared RoI set over a batch of feature maps.

    feats [B, H, W, C] · rois [N, 4] → [B, N, pooled, pooled, C].

    ``impl``: "xla" (vmapped separable einsums), "pallas" (fused VMEM
    kernel), or "auto" — pallas when on TPU and the shape is eligible.
    """
    return _forward(feats, rois, spatial_scale, pooled, sampling,
                    max_sampling, impl)


def _forward(feats, rois, spatial_scale, pooled, sampling, max_sampling,
             impl):
    b, h, w, c = feats.shape
    n = rois.shape[0]
    # "auto" routes to XLA: the fused kernel is a measured no-win on
    # v5e (module docstring); "pallas" stays available for study/future
    # toolchains where Mosaic relayouts get cheaper
    use_pallas = impl == "pallas"
    if not use_pallas:
        return _xla_pool(feats, rois, spatial_scale=spatial_scale,
                         pooled=pooled, sampling=sampling,
                         max_sampling=max_sampling)
    ry, rx = interp_matrices(rois, h, w, spatial_scale=spatial_scale,
                             pooled=pooled, sampling=sampling,
                             max_sampling=max_sampling, dtype=feats.dtype)
    return _pool_pallas(feats, ry, rx, pooled)


def _fwd(feats, rois, spatial_scale, pooled, sampling, max_sampling, impl):
    out = _forward(feats, rois, spatial_scale, pooled, sampling,
                   max_sampling, impl)
    return out, (feats, rois)


def _bwd(spatial_scale, pooled, sampling, max_sampling, impl, res, g):
    feats, rois = res

    def f(fe):
        return _xla_pool(fe, rois, spatial_scale=spatial_scale,
                         pooled=pooled, sampling=sampling,
                         max_sampling=max_sampling)

    (dfeats,) = jax.vjp(f, feats)[1](g)
    return dfeats, jnp.zeros_like(rois)


batched_roi_align.defvjp(_fwd, _bwd)
