"""Fused BERT FFN block — Pallas TPU kernel.

Computes ``LayerNorm(x + (gelu(x·W1 + b1)·W2 + b2))`` (the
``BertLayer`` intermediate/output sub-block, reference
``Oscar/oscar/modeling/modeling_bert.py`` ``BertIntermediate`` +
``BertOutput``) in ONE kernel pass per row tile.

Why: at scoring shapes (B=128, S=128, H=768, F=3072) the [M, F]
intermediate is ~100 MB bf16 per layer — XLA materializes it to HBM
between the two matmuls (matmul→matmul fusion is not a thing), so each
layer pays ~200 MB of avoidable HBM traffic ≈ 12% of the whole forward
at the measured 73%-of-peak utilization. Here the intermediate lives in
VMEM: per M-tile, dot[tm,H]×[H,F] → f32 gelu → dot[tm,F]×[F,H] →
residual add → f32 LayerNorm epilogue. Both matmuls have N ≥ 768, the
shape regime where the v5e MXU runs at full rate (PERF.md round-3 MXU
microbench). W1/W2 (9.4 MB bf16) stay resident in VMEM across tiles.

The custom VJP lowers the backward to the XLA reference formulation
(training throughput is dominated by the backward matmuls anyway; this
kernel targets the serving/scoring path).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _erf_poly(x):
    """float32 erf via Abramowitz & Stegun 7.1.26 (|err| ≤ ~4e-7 in f32
    — far below bf16 output resolution). Mosaic has no erf/erfc
    lowering; the XLA erfc path is also VPU-transcendental-bound, so the
    polynomial is part of why the fused kernel wins."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x, approximate):
    if approximate:
        return jax.nn.gelu(x, approximate=True)   # tanh form, lowers fine
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, lb_ref,
                out_ref, *, eps, approximate):
    x = x_ref[:]
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[0], approximate)
    y = jnp.dot(h.astype(x.dtype), w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[0]
    y = y + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + eps) * g_ref[0] + lb_ref[0]
    out_ref[:] = y.astype(x.dtype)


def _reference_ffn(x, w1, b1, w2, b2, gamma, beta, eps, approximate):
    """XLA formulation with identical semantics (correctness oracle +
    backward implementation). Matches the flax Dense/LayerNorm path:
    params cast to x.dtype for the matmuls, f32 LayerNorm statistics."""
    dt = x.dtype
    h = jnp.dot(x, w1.astype(dt)) + b1.astype(dt)
    h = jax.nn.gelu(h, approximate=approximate)
    y = jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
    y = (y + x).astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ffn(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
              gamma: Array, beta: Array, eps: float = 1e-12,
              approximate: bool = False) -> Array:
    """x [..., M, H] → LayerNorm(x + gelu(x·W1+b1)·W2+b2); w1 [H, F],
    w2 [F, H], biases/LN params [F]/[H] float32."""
    return _forward(x, w1, b1, w2, b2, gamma, beta, eps, approximate)


def _forward(x, w1, b1, w2, b2, gamma, beta, eps, approximate):
    orig_shape = x.shape
    h_dim = orig_shape[-1]
    f_dim = w1.shape[-1]
    m = 1
    for d in orig_shape[:-1]:
        m *= d
    xm = x.reshape(m, h_dim)

    tm = 256
    while m % tm and tm > 8:
        tm //= 2
    if m % tm:
        # pad rows to a tile multiple (rare; static shapes upstream)
        pad = tm - m % tm
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    mp = xm.shape[0]

    dt = x.dtype
    kern = functools.partial(_ffn_kernel, eps=eps, approximate=approximate)
    out = pl.pallas_call(
        kern,
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, h_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, f_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_dim, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, h_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, h_dim), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * h_dim * f_dim,
            bytes_accessed=2 * mp * h_dim * 2 + 2 * h_dim * f_dim * 2,
            transcendentals=mp * f_dim,
        ),
    )(xm, w1.astype(dt), b1.astype(jnp.float32).reshape(1, f_dim),
      w2.astype(dt), b2.astype(jnp.float32).reshape(1, h_dim),
      gamma.astype(jnp.float32).reshape(1, h_dim),
      beta.astype(jnp.float32).reshape(1, h_dim))
    return out[:m].reshape(orig_shape)


def _fwd(x, w1, b1, w2, b2, gamma, beta, eps, approximate):
    out = _forward(x, w1, b1, w2, b2, gamma, beta, eps, approximate)
    return out, (x, w1, b1, w2, b2, gamma, beta)


def _bwd(eps, approximate, res, g):
    x, w1, b1, w2, b2, gamma, beta = res

    def f(x_, w1_, b1_, w2_, b2_, g_, bt_):
        return _reference_ffn(x_, w1_, b1_, w2_, b2_, g_, bt_, eps,
                              approximate)

    return jax.vjp(f, x, w1, b1, w2, b2, gamma, beta)[1](g)


fused_ffn.defvjp(_fwd, _bwd)
