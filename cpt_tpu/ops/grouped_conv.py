"""Pallas grouped 3×3 convolution — measured no-win, kept as reference.

XLA's native grouped conv (``feature_group_count``) runs the ResNeXt 32×8d
grouped 3×3 legs at 5.7-14.7 TFLOP/s on v5e, far below the MXU's
lane-underfill ceiling (~49 TF/s at cpg=32). This kernel restructures the
op as per-group im2col matmuls built in VMEM — and LOSES on hardware
(stage1 0.11×, stage2 0.25×, stage3 0.65× vs native; PERF.md "grouped-conv
kernel study"): Mosaic's relayouts for the 9 tap slices + per-group lane
slicing dominate, and the [M, 9·cpg]×[9·cpg, cpg] matmul itself reaches
only ~6.5 TF/s at cpg=32. Alternative formulations measured on device —
offset space-to-depth (exact, 16/9× FLOPs at dense layout), block-diagonal
slice-dense convs (4× FLOPs at dense rates), supergrouping to cpg=128 —
all land between 0.4× and 1.05×. The op stays as a correctness-tested
reference point and a starting skeleton for future Mosaic work; the
production backbone keeps XLA's native grouped conv.

Design (for the record), per-group im2col in VMEM:

* groups are processed in lane-aligned blocks of ``128//cpg`` groups per
  program, so HBM⇄VMEM traffic moves full 128-channel lanes;
* per group, 9 shifted taps of the input tile concatenate into a
  ``[TH·W, 9·cpg]`` patch matrix (VMEM-only; im2col in HBM would be 9×
  input size) and one MXU matmul against the packed ``[9·cpg, cpg]``
  weights produces the tile — K=9·cpg amortizes the MXU much better than
  XLA's tap-by-tap schedule;
* the input tile (with its 1-pixel halo) is DMA'd manually from HBM —
  halo'd tiles cannot be expressed as non-overlapping BlockSpec blocks;
* frozen-BN scale/bias and ReLU fuse into the epilogue (saves two
  elementwise HBM round-trips per conv in the bottleneck).

Reference semantics matched: torch ``Conv2d(groups=G, k=3, pad=1,
stride=s, bias=False)`` as used by ``maskrcnn_benchmark/modeling/backbone/
resnet.py`` bottlenecks (stride in the 3×3, ``STRIDE_IN_1X1=False``).

The custom VJP lowers the backward pass to XLA's conv ops (training-path
throughput is dominated elsewhere; extraction is inference).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round8(v: int) -> int:
    return (v + 7) // 8 * 8


def pack_weights(w33: Array, groups: int) -> Array:
    """HWIO grouped kernel [3, 3, cpg, ch] → [G, 9·cpg, cpg], tap-major
    rows in (ky, kx) order matching the kernel's patch concat order."""
    kh, kw, cpg, ch = w33.shape
    assert (kh, kw) == (3, 3) and ch % groups == 0
    co = ch // groups
    # [3, 3, cpg, G, co] -> [G, 3, 3, cpg, co] -> [G, 9*cpg, co]
    w = w33.reshape(3, 3, cpg, groups, co)
    w = jnp.transpose(w, (3, 0, 1, 2, 4))
    return w.reshape(groups, 9 * cpg, co)


def _pick_tile(h_out: int, w_out: int, cpg: int, gpb: int,
               stride: int) -> int:
    """Output-row tile height: keep the input tile + patches within a few
    MB of VMEM (16 MB/core, double-buffered blocks)."""
    budget = 3 * 1024 * 1024
    for th in (h_out, 64, 32, 16, 8, 4, 2, 1):
        if h_out % th:
            continue
        rows_in = (th - 1) * stride + 3
        w_in = (w_out - 1) * stride + 3
        tile_bytes = rows_in * w_in * gpb * cpg * 2
        patch_bytes = th * w_out * 9 * cpg * 2
        if tile_bytes + patch_bytes <= budget:
            return th
    return 1


def _kernel(x_hbm, w_ref, s_ref, b_ref, out_ref, xtile, sem, *,
            h_out, w_out, cpg, gpb, th, stride, fuse_affine, relu,
            out_dtype):
    n = pl.program_id(0)
    gb = pl.program_id(1)
    ti = pl.program_id(2)

    rows_in = (th - 1) * stride + 3
    # sublane (second-to-last) DMA slice sizes must be 8-aligned
    w_in = _round8((w_out - 1) * stride + 3)
    r0 = ti * th * stride
    c0 = gb * gpb * cpg

    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(r0, rows_in), pl.ds(0, w_in), pl.ds(c0, gpb * cpg)],
        xtile, sem)
    dma.start()
    dma.wait()

    m = th * w_out
    span_r = (th - 1) * stride + 1
    span_c = (w_out - 1) * stride + 1
    s_blk = s_ref[0, pl.ds(pl.multiple_of(gb * gpb * cpg, gpb * cpg),
                           gpb * cpg)]
    b_blk = b_ref[0, pl.ds(pl.multiple_of(gb * gpb * cpg, gpb * cpg),
                           gpb * cpg)]
    for i in range(gpb):
        xg = xtile[:, :, i * cpg:(i + 1) * cpg]
        taps = []
        for ky in range(3):
            for kx in range(3):
                sl = xg[ky:ky + span_r:stride, kx:kx + span_c:stride, :]
                taps.append(sl.reshape(m, cpg))
        patches = jnp.concatenate(taps, axis=1)            # [m, 9*cpg]
        y = jnp.dot(patches, w_ref[i],
                    preferred_element_type=jnp.float32)     # [m, cpg]
        if fuse_affine:
            y = y * s_blk[i * cpg:(i + 1) * cpg] + b_blk[i * cpg:(i + 1) * cpg]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:, :, i * cpg:(i + 1) * cpg] = (
            y.reshape(th, w_out, cpg).astype(out_dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def grouped_conv3x3(x: Array, w33: Array, scale: Optional[Array],
                    bias: Optional[Array], groups: int, stride: int = 1,
                    relu: bool = False) -> Array:
    """Grouped 3×3 conv, pad 1, NHWC (+optional fused affine & ReLU).

    x [N, H, W, ch], w33 [3, 3, ch//groups, ch], scale/bias [ch] or None.
    """
    return _forward(x, w33, scale, bias, groups, stride, relu)


def _forward(x, w33, scale, bias, groups, stride, relu):
    n, h, w, ch = x.shape
    cpg = ch // groups
    h_out = (h + 2 - 3) // stride + 1
    w_out = (w + 2 - 3) // stride + 1
    gpb = max(1, min(groups, 128 // cpg))
    while groups % gpb:
        gpb -= 1
    th = _pick_tile(h_out, w_out, cpg, gpb, stride)

    fuse_affine = scale is not None
    if scale is None:
        scale = jnp.ones((ch,), jnp.float32)
        bias = jnp.zeros((ch,), jnp.float32)

    # pad width to a multiple of 8 so halo'd DMA slices satisfy the
    # (8, 128) sublane/lane tiling alignment
    w_pad = _round8(max(w + 2, (w_out - 1) * stride + 3))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w_pad - w - 1), (0, 0)))
    wt = pack_weights(w33, groups).astype(x.dtype)          # [G, 9cpg, cpg]
    wb = wt.reshape(groups // gpb, gpb, 9 * cpg, cpg)

    rows_in = (th - 1) * stride + 3
    w_in = _round8((w_out - 1) * stride + 3)
    kern = functools.partial(
        _kernel, h_out=h_out, w_out=w_out, cpg=cpg, gpb=gpb, th=th,
        stride=stride, fuse_affine=fuse_affine, relu=relu,
        out_dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(n, groups // gpb, h_out // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),           # x (HBM, halo DMA)
            pl.BlockSpec((None, gpb, 9 * cpg, cpg),
                         lambda ni, gi, ti: (gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # scale [1, ch]
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bias [1, ch]
        ],
        out_specs=pl.BlockSpec(
            (None, th, w_out, gpb * cpg),
            lambda ni, gi, ti: (ni, ti, 0, gi),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, ch), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_in, w_in, gpb * cpg), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h_out * w_out * 9 * ch * cpg,
            bytes_accessed=(n * h * w * ch + n * h_out * w_out * ch) * 2,
            transcendentals=0,
        ),
    )(xp, wb, scale.astype(jnp.float32).reshape(1, ch),
      bias.astype(jnp.float32).reshape(1, ch))
    return out


# ---------------------------------------------------------------------------
# Round-3 formulation: slice-dense tap-accumulate kernel
# ---------------------------------------------------------------------------
#
# The round-2 kernel above loses to Mosaic relayout costs because it slices
# and concatenates along the LANE (channel) dimension — building [m, 9·cpg]
# patch matrices from 9 slices of cpg lanes forces lane shuffles that
# dominate the small matmuls.  This formulation keeps channels lane-aligned
# throughout:
#
# * channels are processed in 128-lane slices (``128//cpg`` whole groups per
#   slice — the ResNeXt cpg of 8/16/32/64 always divides 128);
# * per slice, the grouped weights are densified into block-diagonal
#   [128, 128] matrices per tap (zeros off the group blocks).  The FLOP
#   waste factor (128/cpg) is mathematically identical to the MXU
#   lane-underfill ceiling of the sliced formulation — densification costs
#   nothing relative to the best possible grouped schedule, but runs at
#   dense MXU rates;
# * the 3×3 taps become 9 accumulated [m, 128] × [128, 128] matmuls over
#   shifted views of the input tile.  The kx shifts are SUBLANE shifts only
#   (channels stay put in lanes); they are materialized once per tile into
#   3 scratch copies shared by the 3 ky taps each, so a tile pays 2
#   misaligned-sublane relayouts total instead of 9 lane concats;
# * frozen-BN affine + ReLU fuse into the f32 epilogue as before.
#
# Reference semantics: torch ``Conv2d(groups=G, k=3, pad=1, stride=1,
# bias=False)`` (``maskrcnn_benchmark/modeling/backbone/resnet.py``
# Bottleneck conv2; stride-2 first blocks stay on the XLA path).


def pack_weights_sd(w33: Array, groups: int) -> Array:
    """HWIO grouped kernel [3, 3, cpg, ch] → [n_slices, 9, 128, 128]
    block-diagonal dense tap matrices (tap-major in (ky, kx) order)."""
    kh, kw, cpg, ch = w33.shape
    assert (kh, kw) == (3, 3) and ch % 128 == 0 and 128 % cpg == 0
    gps = 128 // cpg          # groups per 128-lane slice
    n_slices = ch // 128
    # output channel dim is group-major: channel = (s·gps + gi)·cpg + co
    w = w33.reshape(3, 3, cpg, n_slices, gps, cpg)   # [ky,kx,ci,s,gi,co]
    eye = jnp.eye(gps, dtype=w33.dtype)
    # dense[s, ky, kx, gj·cpg+ci, gi·cpg+co] = w[...] · [gj == gi]
    dense = jnp.einsum("yxcsgo,hg->syxhcgo", w, eye)
    return dense.reshape(n_slices, 9, 128, 128)


def _sd_pick_tile(h_out: int, w_out: int, w_in: int,
                  mode: str = "dots9") -> int:
    """Output-row tile height keeping xtile + shifted copies + patch
    matrix + f32 accumulator + out block within ~8 MB of VMEM."""
    budget = 8 * 1024 * 1024
    for th in sorted({d for d in range(1, h_out + 1) if h_out % d == 0},
                     reverse=True):
        need = (2 * (th + 2) * w_in * 128 * 2      # 2-slot xtile (bf16)
                + 3 * (th + 2) * w_out * 128 * 2   # shifted copies
                + th * w_out * 128 * 4             # f32 accumulator
                + 2 * th * w_out * 128 * 2)        # double-buffered out
        if mode == "cat9":
            need += th * w_out * 9 * 128 * 2       # [m, 1152] patches
        if need <= budget:
            return th
    return 1


def _sd_kernel(x_hbm, w_ref, s_ref, b_ref, out_ref, xtile, xs, patches,
               sem, *, w_out, th, w_in, fuse_affine, relu, out_dtype,
               mode):
    """Double-buffered across grid steps: each program prefetches the NEXT
    program's input tile before computing its own, so the HBM→VMEM DMA
    overlaps the 9 accumulated matmuls (grid steps on a TPU core run
    sequentially and scratch persists across them)."""
    i, si, ti = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ns, nt = pl.num_programs(1), pl.num_programs(2)
    p = (i * ns + si) * nt + ti
    num_p = pl.num_programs(0) * ns * nt

    def get_dma(slot, pi):
        ti2 = pi % nt
        si2 = (pi // nt) % ns
        i2 = pi // (nt * ns)
        return pltpu.make_async_copy(
            x_hbm.at[i2, pl.ds(ti2 * th, th + 2), pl.ds(0, w_in),
                     pl.ds(si2 * 128, 128)],
            xtile.at[slot], sem.at[slot])

    @pl.when(p == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(p + 1 < num_p)
    def _():
        get_dma((p + 1) % 2, p + 1).start()

    get_dma(p % 2, p).wait()
    cur = xtile[p % 2]

    # kx sublane shifts materialized once, shared across the 3 ky taps
    for kx in range(3):
        xs[kx] = cur[:, kx:kx + w_out, :]

    m = th * w_out
    if mode == "cat9":
        # one K=1152 matmul per tile: the [m, 9·128] patch matrix built
        # from the 3 shifted copies (MXU rate at K=1152/N=128 measured
        # ~2.5-6x the K=128 rate — see PERF.md round-3 study)
        for ky in range(3):
            for kx in range(3):
                t = ky * 3 + kx
                patches[:, t * 128:(t + 1) * 128] = (
                    xs[kx, ky:ky + th].reshape(m, 128))
        acc = jnp.dot(patches[:], w_ref[0],
                      preferred_element_type=jnp.float32)
    elif mode == "cat3":
        acc = jnp.zeros((m, 128), jnp.float32)
        # one K=384 matmul per kx: lane-concat the 3 ky row-shifts
        for kx in range(3):
            a = jnp.concatenate(
                [xs[kx, ky:ky + th].reshape(m, 128) for ky in range(3)],
                axis=1)
            acc = acc + jnp.dot(a, w_ref[kx],
                                preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((m, 128), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                a = xs[kx, ky:ky + th].reshape(m, 128)
                acc = acc + jnp.dot(a, w_ref[3 * ky + kx],
                                    preferred_element_type=jnp.float32)
    if fuse_affine:
        acc = acc * s_ref[0] + b_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(th, w_out, 128).astype(out_dtype)


def sd_eligible(h: int, w: int, ch: int, cpg: int, stride: int) -> bool:
    """Shapes the slice-dense kernel handles (and wins on): stride 1,
    whole 128-lane slices, 8-aligned width, a usable row-tile divisor."""
    return (stride == 1 and ch % 128 == 0 and 128 % cpg == 0
            and w % 8 == 0 and any(h % th == 0 for th in (8, 4, 5, 2))
            and jax.default_backend() not in ("cpu", "gpu"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def grouped_conv3x3_sd_vjp(x: Array, w33: Array, scale: Array, bias: Array,
                           groups: int, relu: bool = False) -> Array:
    """Differentiable wrapper over the slice-dense kernel (backward via
    the XLA reference formulation, like ``grouped_conv3x3``)."""
    return grouped_conv3x3_sd(x, w33, scale, bias, groups, relu,
                              mode="dots9")


def _sd_fwd(x, w33, scale, bias, groups, relu):
    return grouped_conv3x3_sd_vjp(x, w33, scale, bias, groups, relu), (
        x, w33, scale, bias)


def _sd_bwd(groups, relu, res, g):
    x, w33, scale, bias = res

    def f(x_, w_, s_, b_):
        return reference_grouped_conv3x3(x_, w_, s_, b_, groups, 1, relu)

    return jax.vjp(f, x, w33, scale, bias)[1](g)


grouped_conv3x3_sd_vjp.defvjp(_sd_fwd, _sd_bwd)


def grouped_conv3x3_sd(x: Array, w33: Array, scale: Optional[Array] = None,
                       bias: Optional[Array] = None, groups: int = 32,
                       relu: bool = False,
                       packed: Optional[Array] = None,
                       mode: str = "dots9") -> Array:
    """Grouped 3×3 conv, pad 1, stride 1, NHWC, via slice-dense taps
    (+optional fused frozen-BN affine & ReLU).

    x [N, H, W, ch], w33 [3, 3, ch//groups, ch] (ignored when ``packed``
    — a prepacked ``pack_weights_sd`` output — is given), scale/bias [ch].
    ``mode``: "dots9" (nine accumulated K=128 dots — fastest measured,
    the production default), "cat3" (three K=384), "cat9" (one K=1152
    im2col dot; the patch build eats the rate gain).
    """
    n, h, w, ch = x.shape
    w_out = w
    w_in = _round8(w + 2)
    th = _sd_pick_tile(h, w_out, w_in, mode)
    n_slices = ch // 128

    fuse_affine = scale is not None
    if scale is None:
        scale = jnp.ones((ch,), jnp.float32)
        bias = jnp.zeros((ch,), jnp.float32)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w_in - w - 1), (0, 0)))
    wd = (packed if packed is not None
          else pack_weights_sd(w33, groups)).astype(x.dtype)
    if mode == "cat9":
        # [ns, 9, 128, 128] → [ns, 1, 9·128 (tap-major rows), 128]
        wd = wd.reshape(n_slices, 1, 9 * 128, 128)
        w_spec = pl.BlockSpec((None, 1, 9 * 128, 128),
                              lambda ni, si, ti: (si, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    elif mode == "cat3":
        # [ns, 9(t=ky·3+kx), 128, 128] → [ns, 3(kx), 3·128(ky-major), 128]
        wc = wd.reshape(n_slices, 3, 3, 128, 128)      # [s, ky, kx, i, o]
        wd = jnp.transpose(wc, (0, 2, 1, 3, 4)).reshape(n_slices, 3,
                                                        3 * 128, 128)
        w_spec = pl.BlockSpec((None, 3, 3 * 128, 128),
                              lambda ni, si, ti: (si, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((None, 9, 128, 128),
                              lambda ni, si, ti: (si, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    kern = functools.partial(
        _sd_kernel, w_out=w_out, th=th, w_in=w_in,
        fuse_affine=fuse_affine, relu=relu, out_dtype=x.dtype,
        mode=mode)
    return pl.pallas_call(
        kern,
        grid=(n, n_slices, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x (HBM, halo DMA)
            w_spec,
            pl.BlockSpec((1, 128), lambda ni, si, ti: (0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda ni, si, ti: (0, si),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, th, w_out, 128),
            lambda ni, si, ti: (ni, ti, 0, si),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_out, ch), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, w_in, 128), x.dtype),
            pltpu.VMEM((3, th + 2, w_out, 128), x.dtype),
            pltpu.VMEM((th * w_out, 9 * 128) if mode == "cat9"
                       else (8, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_out * 9 * 128 * ch,
            bytes_accessed=(n * h * w * ch * 2 + n * h * w_out * ch) * 2,
            transcendentals=0,
        ),
    )(xp, wd, scale.astype(jnp.float32).reshape(1, ch),
      bias.astype(jnp.float32).reshape(1, ch))


def grouped_conv3x3_tapdot(x: Array, w33: Array, scale: Optional[Array],
                           bias: Optional[Array], groups: int,
                           relu: bool = False) -> Array:
    """XLA-level slice-dense tap sum: 9 shifted views × block-diagonal
    [128, 128] tap matrices as slice-batched matmuls, accumulated in f32.
    Same densification trade as the Pallas kernel, scheduled by XLA."""
    n, h, w, ch = x.shape
    nsl = ch // 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wd = pack_weights_sd(w33, groups).astype(x.dtype)   # [ns, 9, 128, 128]
    xs = xp.reshape(n, h + 2, w + 2, nsl, 128)
    acc = jnp.zeros((n, h, w, nsl, 128), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            v = xs[:, ky:ky + h, kx:kx + w]
            acc = acc + jnp.einsum(
                "nrcsi,sio->nrcso", v, wd[:, ky * 3 + kx],
                preferred_element_type=jnp.float32)
    y = acc.reshape(n, h, w, ch)
    if scale is not None:
        y = y * scale + bias
    if relu:
        y = jnp.maximum(y, 0)
    return y.astype(x.dtype)


def grouped_conv3x3_im2col(x: Array, w33: Array, scale: Optional[Array],
                           bias: Optional[Array], groups: int,
                           stride: int = 1, relu: bool = False) -> Array:
    """XLA-level im2col + group-batched dot_general (VERDICT r2 ask #1):
    ``conv_general_dilated_patches`` → [.., G, cpg·9] → batched matmul.

    Patch channel order is channel-major (ci·9 + tap), so the packed
    weight is [G, cpg·9, co] with rows in the same (ci, tap) order."""
    n, h, w, ch = x.shape
    cpg = ch // groups
    p = lax.conv_general_dilated_patches(
        x, (3, 3), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = p.shape[1], p.shape[2]
    p = p.reshape(n, ho, wo, groups, cpg * 9)
    # w33 [3,3,ci,G·co] → [G, ci·9, co]
    wt = jnp.transpose(w33.reshape(3, 3, cpg, groups, cpg),
                       (3, 2, 0, 1, 4)).reshape(groups, cpg * 9, cpg)
    y = jnp.einsum("nhwgk,gkc->nhwgc", p, wt.astype(x.dtype))
    y = y.reshape(n, ho, wo, ch)
    if scale is not None:
        y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def reference_grouped_conv3x3(x, w33, scale, bias, groups, stride=1,
                              relu=False):
    """XLA formulation with identical semantics (correctness oracle +
    backward-pass implementation)."""
    y = lax.conv_general_dilated(
        x, w33.astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if scale is not None:
        y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def _fwd(x, w33, scale, bias, groups, stride, relu):
    out = _forward(x, w33, scale, bias, groups, stride, relu)
    return out, (x, w33, scale, bias, out)


def _bwd(groups, stride, relu, res, g):
    x, w33, scale, bias, out = res
    # differentiate the XLA reference formulation (same math)
    def f(x_, w_, s_, b_):
        return reference_grouped_conv3x3(x_, w_, s_, b_, groups, stride,
                                         relu)

    if scale is None:
        def f2(x_, w_):
            return f(x_, w_, None, None)

        dx, dw = jax.vjp(f2, x, w33)[1](g)
        return dx, dw, None, None
    dx, dw, ds, db = jax.vjp(f, x, w33, scale, bias)[1](g)
    return dx, dw, ds, db


grouped_conv3x3.defvjp(_fwd, _bwd)
