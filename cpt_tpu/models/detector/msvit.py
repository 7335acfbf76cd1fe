"""MsViT backbone with 2-D sliding-chunk (Longformer2D) attention.

Parity with the reference's vision-longformer backbone
(``modeling/backbone/msvit.py``, ``longformer2d.py``,
``slidingchunk_2d.py``; registered as the ViL-C4 builders,
``backbone.py:14-86``):

  * arch string ``"l1,h3,d96,n2,s1,g1,p4,f7,a0_l2,..."`` parsed per stage
    (``msvit.py:313-318``): h=heads, d=dim, n=blocks, s=1 → sliding-chunk
    attention, g=#global tokens, p=patch stride, a=1 → absolute pos embed.
  * Long2DSCSelfAttention (``longformer2d.py:12-200``): the [ny, nx] token
    grid is partitioned into w×w chunks; each query attends to its 3×3
    chunk neighborhood plus the global tokens; global tokens attend to
    everything (separate q/kv/proj for the global branch).
  * pre-norm transformer blocks, GELU MLP (ratio 4), per-stage conv patch
    embedding.

TPU design: the reference's custom sliding-chunk matmul kernels
(``slidingchunk_2d.py``, 366 LoC of chunked bmm + masking) become ONE
gather-free neighborhood stack (pad chunk grid by 1, 9 static shifted
views) and a masked einsum — static shapes, MXU-batched, autodiff
backward. Unused by the shipped VinVL config — backbone-zoo parity.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG = -1e9


def parse_arch(arch: str) -> List[Dict[str, int]]:
    """``msvit.py:313-318`` — '_'-separated stages of 'k<int>' attrs."""
    out = []
    for layer in arch.split("_"):
        cfg = {"l": 1, "h": 3, "d": 192, "n": 1, "s": 1, "g": 1,
               "p": 2, "f": 7, "a": 0}
        for attr in layer.split(","):
            cfg[attr[0]] = int(attr[1:])
        out.append(cfg)
    return out


def sliding_chunk_attention_2d(q: Array, k: Array, v: Array,
                               ny: int, nx: int, w: int) -> Array:
    """q/k/v [B, H, ny*nx, hd] over a [ny, nx] grid → [B, H, ny*nx, hd].

    Each query attends to the 3×3 neighborhood of its w×w chunk
    (``slidingchunk_2d.py`` semantics, exact=0 mode). Pads the grid to
    chunk multiples; padded keys are masked out.
    """
    b, h, _, hd = q.shape
    empty = jnp.zeros((b, h, 0, hd), q.dtype)
    return _local_with_globals(q, k, v, empty, empty, ny, nx, w)


def relative_position_index(w: int) -> np.ndarray:
    """[w², 9w²] index into the (4w−1)² bias table, for the 3×3 chunk
    neighborhood in (dy, dx) raster order (``longformer2d.py:68-101``)."""
    coords = np.stack(np.meshgrid(np.arange(-w, 2 * w),
                                  np.arange(-w, 2 * w), indexing="ij"))
    # [2, 3, 3, w*w] chunk-unfolded (x-major within chunk, like rearrange)
    cu = coords.reshape(2, 3, w, 3, w).transpose(0, 1, 3, 2, 4).reshape(
        2, 3, 3, w * w)
    q = cu[:, 1, 1, :]                                    # [2, w²]
    rel = np.concatenate([
        q[:, :, None] - cu[:, i, j, :][:, None, :]
        for i in (0, 1, 2) for j in (0, 1, 2)
    ], axis=-1)                                           # [2, w², 9w²]
    rel = rel.transpose(1, 2, 0) + (2 * w - 1)
    return (rel[..., 0] * (4 * w - 1) + rel[..., 1]).astype(np.int32)


class Long2DSCAttention(nn.Module):
    """Sliding-chunk attention + global tokens (``longformer2d.py``).
    Input [B, nglo + ny*nx, D]; globals first (``msvit.py`` layout).
    ``rpe`` adds the Swin-style relative position biases (local table
    (4w−1)² per head, g2l/g2g tables)."""

    dim: int
    num_heads: int
    window: int = 7
    nglo: int = 1
    rpe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, ny: int, nx: int) -> Array:
        b, n, _ = x.shape
        h, hd = self.num_heads, self.dim // self.num_heads
        scale = hd ** -0.5
        g = self.nglo
        w = self.window

        local_bias = None
        l2g_bias = None
        g_bias = None
        if self.rpe:
            table = self.param("local_relative_position_bias_table",
                               nn.initializers.normal(0.02),
                               ((4 * w - 1) ** 2, h))
            idx = relative_position_index(w)
            local_bias = table[idx.reshape(-1)].reshape(
                w * w, 9 * w * w, h).transpose(2, 0, 1)    # [H, w², 9w²]
            if g >= 1:
                g2l = self.param("g2l_relative_position_bias",
                                 nn.initializers.normal(0.02), (2, h, g))
                g2g = self.param("g2g_relative_position_bias",
                                 nn.initializers.normal(0.02), (h, g, g))
                l2g_bias = g2l[1].T                        # [g, H] -> l→g
                g_bias = jnp.concatenate(
                    [g2g, jnp.broadcast_to(g2l[0][:, :, None],
                                           (h, g, ny * nx))], axis=-1)

        def heads(t):
            return t.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(self.dim, name="query", dtype=self.dtype)(x))
        kv = nn.Dense(2 * self.dim, name="kv", dtype=self.dtype)(x)
        k = heads(kv[..., :self.dim])
        v = heads(kv[..., self.dim:])

        lq, lk, lv = q[:, :, g:] * scale, k[:, :, g:], v[:, :, g:]

        if g > 0:
            # one exact softmax per local query over its 3×3 chunk
            # neighborhood ∪ the global keys
            local = _local_with_globals(lq, lk, lv, k[:, :, :g],
                                        v[:, :, :g], ny, nx, self.window,
                                        local_bias=local_bias,
                                        l2g_bias=l2g_bias)

            # global queries attend to everything (separate projections,
            # sharew=False default)
            qg = heads(nn.Dense(self.dim, name="query_global",
                                dtype=self.dtype)(x[:, :g])) * scale
            kvg = nn.Dense(2 * self.dim, name="kv_global",
                           dtype=self.dtype)(x)
            kg = heads(kvg[..., :self.dim])
            vg = heads(kvg[..., self.dim:])
            glogits = jnp.einsum("bhqd,bhkd->bhqk", qg, kg)
            if g_bias is not None:
                glogits = glogits + g_bias[None].astype(glogits.dtype)
            gprobs = jax.nn.softmax(glogits.astype(jnp.float32), -1).astype(
                x.dtype)
            gout = jnp.einsum("bhqk,bhkd->bhqd", gprobs, vg)
            out = jnp.concatenate([gout, local], axis=2)
        else:
            b0, h0 = lq.shape[0], lq.shape[1]
            empty = jnp.zeros((b0, h0, 0, hd), lq.dtype)
            out = _local_with_globals(lq, lk, lv, empty, empty, ny, nx,
                                      self.window, local_bias=local_bias)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        glob = nn.Dense(self.dim, name="proj_global", dtype=self.dtype)(
            out[:, :g]) if g > 0 else out[:, :0]
        loc = nn.Dense(self.dim, name="proj", dtype=self.dtype)(out[:, g:])
        return jnp.concatenate([glob, loc], axis=1)


def _local_with_globals(q: Array, k: Array, v: Array, kg: Array, vg: Array,
                        ny: int, nx: int, w: int,
                        local_bias: Optional[Array] = None,
                        l2g_bias: Optional[Array] = None) -> Array:
    """Sliding-chunk attention where every local query additionally sees
    the global keys/values (one exact softmax over neighborhood ∪ globals).
    ``local_bias`` [H, w², 9w²] / ``l2g_bias`` [g, H] are the rpe terms.
    """
    b, h, _, hd = q.shape
    g = kg.shape[2]
    py, px = (-ny) % w, (-nx) % w
    cy, cx = (ny + py) // w, (nx + px) // w

    def to_chunks(t, ch):
        t = t.reshape(b, h, ny, nx, ch)
        t = jnp.pad(t, ((0, 0), (0, 0), (0, py), (0, px), (0, 0)))
        t = t.reshape(b, h, cy, w, cx, w, ch)
        return t.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, h, cy, cx, w * w, ch)

    qc = to_chunks(q, hd)
    kc = to_chunks(k, hd)
    vc = to_chunks(v, hd)
    val = to_chunks(jnp.ones((b, h, ny * nx, 1), q.dtype), 1)[..., 0]

    def neighborhood(t):
        pad = [(0, 0), (0, 0), (1, 1), (1, 1)] + [(0, 0)] * (t.ndim - 4)
        tp = jnp.pad(t, pad)
        views = [tp[:, :, 1 + dy:1 + dy + cy, 1 + dx:1 + dx + cx]
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        return jnp.concatenate(views, axis=4)

    kn = neighborhood(kc)
    vn = neighborhood(vc)
    vmask = neighborhood(val)

    kgb = jnp.broadcast_to(kg[:, :, None, None], (b, h, cy, cx, g, hd))
    vgb = jnp.broadcast_to(vg[:, :, None, None], (b, h, cy, cx, g, hd))
    kn = jnp.concatenate([kn, kgb], axis=4)
    vn = jnp.concatenate([vn, vgb], axis=4)
    vmask = jnp.concatenate(
        [vmask, jnp.ones((b, h, cy, cx, g), q.dtype)], axis=4)

    logits = jnp.einsum("bhyxqd,bhyxkd->bhyxqk", qc, kn)
    if local_bias is not None:
        bias = local_bias
        if l2g_bias is not None and g > 0:
            l2g = jnp.broadcast_to(l2g_bias.T[:, None, :],
                                   (bias.shape[0], bias.shape[1], g))
            bias = jnp.concatenate([bias, l2g], axis=-1)
        elif g > 0:
            bias = jnp.concatenate(
                [bias, jnp.zeros((bias.shape[0], bias.shape[1], g),
                                 bias.dtype)], axis=-1)
        logits = logits + bias[None, :, None, None].astype(logits.dtype)
    logits = jnp.where(vmask[:, :, :, :, None, :] > 0, logits, NEG)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    out = jnp.einsum("bhyxqk,bhyxkd->bhyxqd", probs, vn)
    out = out.reshape(b, h, cy, cx, w, w, hd).transpose(0, 1, 2, 4, 3, 5, 6)
    out = out.reshape(b, h, cy * w, cx * w, hd)[:, :, :ny, :nx]
    return out.reshape(b, h, ny * nx, hd)


class _FullAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, ny: int, nx: int) -> Array:
        b, n, _ = x.shape
        h, hd = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv", dtype=self.dtype)(x)
        q, k, v = (qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(
            x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class _Block(nn.Module):
    dim: int
    num_heads: int
    sparse: bool
    window: int
    nglo: int
    rpe: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, ny: int, nx: int) -> Array:
        attn = (Long2DSCAttention(self.dim, self.num_heads, self.window,
                                  self.nglo, rpe=self.rpe,
                                  dtype=self.dtype, name="attn")
                if self.sparse else
                _FullAttention(self.dim, self.num_heads, self.dtype,
                               name="attn"))
        x = x + attn(nn.LayerNorm(epsilon=1e-6, name="norm1")(x), ny, nx)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1",
                     dtype=self.dtype)(y)
        y = nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype)(
            nn.gelu(y))
        return x + y


class MsViT(nn.Module):
    """Multi-scale vision transformer backbone (``msvit.py:321-560``).
    Returns per-stage [B, Hs, Ws, Ds] feature maps (global tokens dropped,
    like the reference's detection forward)."""

    arch: str = "l1,h3,d96,n1,s1,g1,p4,f7,a0_l2,h3,d192,n2,s1,g1,p2,f7,a0"
    window: int = 7
    rpe: bool = False      # Swin-style biases on the sparse-attention blocks
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        stages = parse_arch(self.arch)
        outs = []
        for i, cfg in enumerate(stages):
            p, d, g = cfg["p"], cfg["d"], cfg["g"]
            x = nn.Conv(d, (p, p), strides=(p, p),
                        name=f"patch_embed{i + 1}", dtype=self.dtype)(x)
            b, hgt, wid, _ = x.shape
            tokens = x.reshape(b, hgt * wid, d)
            if cfg["a"]:
                pos = self.param(f"ape{i + 1}",
                                 nn.initializers.normal(0.02),
                                 (1, hgt * wid, d))
                tokens = tokens + pos
            if g > 0:
                glo = self.param(f"glo{i + 1}",
                                 nn.initializers.normal(0.02), (1, g, d))
                tokens = jnp.concatenate(
                    [jnp.broadcast_to(glo, (b, g, d)), tokens], axis=1)
            for blk in range(cfg["n"]):
                tokens = _Block(d, cfg["h"], sparse=cfg["s"] == 1,
                                window=self.window, nglo=g, rpe=self.rpe,
                                dtype=self.dtype,
                                name=f"layer{i + 1}_block{blk}")(
                    tokens, hgt, wid)
            tokens = nn.LayerNorm(epsilon=1e-6, name=f"norm{i + 1}")(tokens)
            x = tokens[:, g:].reshape(b, hgt, wid, d)
            outs.append(x)
        return outs
