"""Fused BERT attention sub-block — Pallas TPU kernel.

Computes ``LayerNorm(x + OutProj(SDPA(QKV(x))))`` — the whole
``BertSelfAttention`` + post-attention LayerNorm sub-block (reference
``Oscar/oscar/modeling/modeling_bert.py`` BertSelfAttention/BertSelfOutput)
in ONE kernel pass per sequence tile.

Why: at scoring shapes (B=128, S=128, H=768) the XLA path materializes
the [B, 12, S, S] float32 score tensor (f32 softmax is a parity
requirement) plus the QKV/probs/context intermediates to HBM — several
MB of avoidable traffic per sequence per layer, on a forward that is
otherwise at 93% of the chip's matmul ceiling (PERF.md round 3). Here
every intermediate lives in VMEM: per sequence-batch tile, one
[tb·S, H]×[H, 3H] QKV matmul (N=2304 — full-rate MXU shape), a per-head
scores→softmax→context loop (tiny FLOPs, zero HBM), the [tb·S, H]×[H, H]
output projection, residual add, and the f32 LayerNorm epilogue. Only
``x`` is read and the post-LN output written.

Numerics: matmuls accumulate f32 (``preferred_element_type``); scores
are scaled and biased in f32 (the einsum model path computes these in
``dtype`` — differences are at the bf16 noise floor, tested); softmax is
f32 like the model path; LayerNorm statistics f32.

Scope (the eligibility gate lives in ``models/bert/model.py``): key-only
additive bias (2-D attention masks), no KV history, no head mask, no
active dropout. The custom VJP lowers the backward to the XLA reference
formulation, like ``ops/fused_ffn.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g_ref, lb_ref,
                 bias_ref, out_ref, *, num_heads, eps, scale, tb):
    tb_, s_len, h_dim = x_ref.shape
    hd = h_dim // num_heads
    x = x_ref[:].reshape(tb * s_len, h_dim)           # [tb·S, H]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(x.dtype)         # [tb·S, 3H]

    ctx_parts = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, h_dim + h * hd:h_dim + (h + 1) * hd]
        v = qkv[:, 2 * h_dim + h * hd:2 * h_dim + (h + 1) * hd]
        seq_parts = []
        for i in range(tb):
            rows = slice(i * s_len, (i + 1) * s_len)
            s = jax.lax.dot_general(
                q[rows], k[rows], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [S, S]
            s = s * scale + bias_ref[i]               # [1, S] broadcasts
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            seq_parts.append(jnp.dot(p, v[rows],
                                     preferred_element_type=jnp.float32))
        ctx_parts.append(jnp.concatenate(seq_parts, axis=0)
                         if tb > 1 else seq_parts[0])
    ctx = jnp.concatenate(ctx_parts, axis=-1).astype(x.dtype)  # [tb·S, H]

    y = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    y = y + bo_ref[0] + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + eps) * g_ref[0] + lb_ref[0]
    out_ref[:] = y.astype(x.dtype).reshape(tb_, s_len, h_dim)


def reference_attention_block(x, wqkv, bqkv, wo, bo, gamma, beta, key_bias,
                              *, num_heads, eps):
    """XLA formulation with the model path's exact semantics (correctness
    oracle + backward): dtype-cast params, dtype scores + bias, f32
    softmax, f32 LayerNorm statistics."""
    dt = x.dtype
    b, s, h = x.shape
    hd = h // num_heads
    qkv = jnp.dot(x, wqkv.astype(dt)) + bqkv.astype(dt)
    qkv = qkv.reshape(b, s, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(dt)
    scores = scores + key_bias[:, None, None, :].astype(dt)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h)
    y = jnp.dot(ctx, wo.astype(dt)) + bo.astype(dt)
    y = (y + x).astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_attention_block(x: Array, wqkv: Array, bqkv: Array, wo: Array,
                          bo: Array, gamma: Array, beta: Array,
                          key_bias: Array, num_heads: int = 12,
                          eps: float = 1e-12, tb: int = 1) -> Array:
    """x [B, S, H]; wqkv [H, 3H] (column order [q|k|v], head-major within
    each); wo [H, H] (rows head-major); key_bias [B, S] additive f32
    (0 / −10000); biases/LN params f32. Returns the post-LN hidden."""
    return _forward(x, wqkv, bqkv, wo, bo, gamma, beta, key_bias,
                    num_heads, eps, tb)


def _forward(x, wqkv, bqkv, wo, bo, gamma, beta, key_bias, num_heads, eps,
             tb):
    b, s, h = x.shape
    assert b % tb == 0, (b, tb)
    dt = x.dtype
    scale = 1.0 / float(h // num_heads) ** 0.5
    kern = functools.partial(_attn_kernel, num_heads=num_heads, eps=eps,
                             scale=scale, tb=tb)
    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, s, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 3 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, S]: a (tb, 1, S) block keeps the trailing dims legal
            # (dim -2 equals the full array dim)
            pl.BlockSpec((tb, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, s, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * h * (3 * h + h) + 4 * b * num_heads * s * s *
            (h // num_heads),
            bytes_accessed=2 * b * s * h * 2 + 8 * h * h * 2,
            transcendentals=b * num_heads * s * s,
        ),
    )(x, wqkv.astype(dt), bqkv.astype(jnp.float32).reshape(1, 3 * h),
      wo.astype(dt), bo.astype(jnp.float32).reshape(1, h),
      gamma.astype(jnp.float32).reshape(1, h),
      beta.astype(jnp.float32).reshape(1, h),
      key_bias.astype(jnp.float32)[:, None, :])


def _fwd(x, wqkv, bqkv, wo, bo, gamma, beta, key_bias, num_heads, eps, tb):
    out = _forward(x, wqkv, bqkv, wo, bo, gamma, beta, key_bias, num_heads,
                   eps, tb)
    return out, (x, wqkv, bqkv, wo, bo, gamma, beta, key_bias)


def _bwd(num_heads, eps, tb, res, g):
    x, wqkv, bqkv, wo, bo, gamma, beta, key_bias = res

    def f(x_, wqkv_, bqkv_, wo_, bo_, g_, bt_, kb_):
        return reference_attention_block(x_, wqkv_, bqkv_, wo_, bo_, g_,
                                         bt_, kb_, num_heads=num_heads,
                                         eps=eps)

    return jax.vjp(f, x, wqkv, bqkv, wo, bo, gamma, beta, key_bias)[1](g)


fused_attention_block.defvjp(_fwd, _bwd)
