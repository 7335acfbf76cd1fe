"""Deformable convolution (DCN v1/v2) — TPU-native.

Replaces the reference's CUDA kernels ``csrc/cuda/deform_conv_cuda.cu`` /
``deform_conv_kernel_cuda.cu`` and the ``DFConv2d`` wrapper
(``layers/misc.py:114-200``): per output position and kernel tap the sample
point is ``p·stride − pad + tap·dilation + learned offset`` (offset channels
interleaved (dy, dx) per tap), bilinearly interpolated with zeros outside
the feature map, optionally modulated (DCN v2, sigmoid mask), then
contracted with the kernel weights.

TPU design: the irregular sampling becomes one vectorized 4-corner gather
(``take_along_axis`` on the flattened H·W axis) producing a dense
``[B, Ho, Wo, K², C]`` tensor, and the conv itself becomes a single einsum
on the MXU. Backward is free via autodiff (the CUDA backward kernels have
no analogue here). Unused by the shipped VinVL config
(``STAGE_WITH_DCN`` all False) — capability parity.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _bilinear_gather(x: Array, ys: Array, xs: Array) -> Array:
    """x [H, W, C]; ys/xs [...] float sample coords → [..., C] with zeros
    outside (matches the CUDA kernel's boundary handling)."""
    h, w, _ = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    flat = x.reshape(h * w, -1)

    def corner(yc, xc, wgt):
        inb = (yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)
        idx = (jnp.clip(yc, 0, h - 1) * w
               + jnp.clip(xc, 0, w - 1)).astype(jnp.int32)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (flat.shape[-1],))
        return vals * (wgt * inb)[..., None]

    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    return (corner(y0i, x0i, (1 - fy) * (1 - fx))
            + corner(y0i, x0i + 1, (1 - fy) * fx)
            + corner(y0i + 1, x0i, fy * (1 - fx))
            + corner(y0i + 1, x0i + 1, fy * fx))


def deform_conv2d(x: Array, offsets: Array, weight: Array,
                  mask: Optional[Array] = None, *,
                  stride: int = 1, dilation: int = 1,
                  deformable_groups: int = 1,
                  bias: Optional[Array] = None) -> Array:
    """x [B, H, W, C] · offsets [B, Ho, Wo, DG·K²·2] ((dy, dx) per tap) ·
    weight [kh, kw, C, Cout] · mask [B, Ho, Wo, DG·K²] (already sigmoided)
    → [B, Ho, Wo, Cout]. Padding is the reference's fixed
    ``dilation·(k−1)//2`` (same-size at stride 1)."""
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    k2 = kh * kw
    pad = dilation * (kh - 1) // 2
    ho, wo = offsets.shape[1], offsets.shape[2]
    dg = deformable_groups
    assert c % dg == 0

    base_y = (jnp.arange(ho) * stride - pad).astype(jnp.float32)
    base_x = (jnp.arange(wo) * stride - pad).astype(jnp.float32)
    tap_y = (jnp.arange(kh) * dilation).astype(jnp.float32)
    tap_x = (jnp.arange(kw) * dilation).astype(jnp.float32)
    # [Ho, Wo, K2] rigid grid
    gy = (base_y[:, None, None]
          + jnp.repeat(tap_y, kw)[None, None, :]) * jnp.ones((1, wo, 1))
    gx = (base_x[None, :, None]
          + jnp.tile(tap_x, kh)[None, None, :]) * jnp.ones((ho, 1, 1))

    off = offsets.reshape(b, ho, wo, dg, k2, 2)
    ys = gy[None, :, :, None, :] + off[..., 0]                 # [B,Ho,Wo,DG,K2]
    xs = gx[None, :, :, None, :] + off[..., 1]

    xg = x.reshape(b, h, w, dg, c // dg)

    def per_image(xi, yi, xj):
        # xi [H, W, DG, C/DG]; yi/xj [Ho, Wo, DG, K2]
        def per_group(xd, yd, xdx):
            return _bilinear_gather(xd, yd, xdx)               # [Ho,Wo,K2,C/DG]
        return jax.vmap(per_group, in_axes=(2, 2, 2), out_axes=2)(
            xi, yi, xj)                                        # [Ho,Wo,DG,K2,C/DG]

    sampled = jax.vmap(per_image)(xg, ys, xs)                  # [B,Ho,Wo,DG,K2,C/DG]
    if mask is not None:
        sampled = sampled * mask.reshape(b, ho, wo, dg, k2)[..., None]
    sampled = sampled.reshape(b, ho, wo, k2, c)
    out = jnp.einsum("bhwkc,kco->bhwo", sampled,
                     weight.reshape(k2, c, cout))
    if bias is not None:
        out = out + bias
    return out


def deform_roi_pool(features: Array, rois: Array, offsets: Optional[Array],
                    *, spatial_scale: float, out_size: int,
                    sample_per_part: int = 4, trans_std: float = 0.1
                    ) -> Array:
    """Deformable RoI pooling (``csrc/cuda/deform_pool_cuda.cu`` semantics,
    wrapped by ``layers/dcn/deform_pool_module.py``).

    features [H, W, C] · rois [N, 4] xyxy · offsets [N, P, P, 2]
    (normalized (dy, dx) per bin, scaled by trans_std and the RoI extent)
    → [N, P, P, C]. Each bin averages an S×S grid of bilinear samples,
    shifted per-bin by the learned offset. ``offsets=None`` = no_trans.
    """
    n = rois.shape[0]
    p, s = out_size, sample_per_part
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    roi_w = jnp.maximum((rois[:, 2] - rois[:, 0]) * spatial_scale, 0.1)
    roi_h = jnp.maximum((rois[:, 3] - rois[:, 1]) * spatial_scale, 0.1)
    bin_w = roi_w / p
    bin_h = roi_h / p

    bi = jnp.arange(p, dtype=jnp.float32)
    si = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    # sample coords [N, P(bin_y), P(bin_x), S(sy), S(sx)]
    ys = (y1[:, None] + bi[None, :] * bin_h[:, None])[:, :, None, None, None] \
        + (si[None, :] * bin_h[:, None])[:, None, None, :, None]
    xs = (x1[:, None] + bi[None, :] * bin_w[:, None])[:, None, :, None, None] \
        + (si[None, :] * bin_w[:, None])[:, None, None, None, :]
    ys = jnp.broadcast_to(ys, (n, p, p, s, s))
    xs = jnp.broadcast_to(xs, (n, p, p, s, s))
    if offsets is not None:
        dy = offsets[..., 0] * trans_std * roi_h[:, None, None]
        dx = offsets[..., 1] * trans_std * roi_w[:, None, None]
        ys = ys + dy[..., None, None]
        xs = xs + dx[..., None, None]

    vals = _bilinear_gather(features, ys, xs)       # [N,P,P,S,S,C]
    return vals.mean(axis=(3, 4))


class ModulatedDeformRoIPoolingPack(nn.Module):
    """``ModulatedDeformRoIPoolingPack`` (``deform_pool_module.py:89-150``):
    a no-trans pooled pass feeds FC branches predicting per-bin offsets and
    a sigmoid modulation mask; the deformable pass applies both."""

    out_size: int = 7
    spatial_scale: float = 1.0 / 16
    sample_per_part: int = 4
    trans_std: float = 0.1
    deform_fc_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Array, rois: Array) -> Array:
        p = self.out_size
        base = deform_roi_pool(features, rois, None,
                               spatial_scale=self.spatial_scale,
                               out_size=p,
                               sample_per_part=self.sample_per_part)
        n = base.shape[0]
        flat = base.reshape(n, -1)
        h = nn.relu(nn.Dense(self.deform_fc_channels, name="offset_fc1",
                             dtype=self.dtype)(flat))
        h = nn.relu(nn.Dense(self.deform_fc_channels, name="offset_fc2",
                             dtype=self.dtype)(h))
        off = nn.Dense(p * p * 2, name="offset_fc3", dtype=self.dtype,
                       kernel_init=nn.initializers.zeros)(h)
        offsets = off.reshape(n, p, p, 2)
        m = nn.relu(nn.Dense(self.deform_fc_channels, name="mask_fc1",
                             dtype=self.dtype)(flat))
        mask = jax.nn.sigmoid(
            nn.Dense(p * p, name="mask_fc2", dtype=self.dtype,
                     kernel_init=nn.initializers.zeros)(m))
        out = deform_roi_pool(features, rois, offsets,
                              spatial_scale=self.spatial_scale,
                              out_size=p,
                              sample_per_part=self.sample_per_part,
                              trans_std=self.trans_std)
        return out * mask.reshape(n, p, p, 1)


class DFConv2d(nn.Module):
    """Offset-predicting conv + deformable conv (``layers/misc.py:114-200``).

    ``with_modulated_dcn`` selects DCN v2 (offset conv emits DG·K²·3
    channels: 2·K² offsets then K² sigmoid masks) vs v1 (DG·K²·2). The
    offset conv is zero-initialized so the layer starts as a plain conv.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    deformable_groups: int = 1
    with_modulated_dcn: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k2 = self.kernel_size ** 2
        per = 3 if self.with_modulated_dcn else 2
        pad = self.dilation * (self.kernel_size - 1) // 2
        om = nn.Conv(self.deformable_groups * k2 * per,
                     (self.kernel_size,) * 2, strides=(self.stride,) * 2,
                     padding=((pad, pad), (pad, pad)),
                     kernel_dilation=(self.dilation,) * 2,
                     kernel_init=nn.initializers.zeros, name="offset",
                     dtype=self.dtype)(x)
        n_off = self.deformable_groups * k2 * 2
        offsets = om[..., :n_off]
        mask = (jax.nn.sigmoid(om[..., n_off:])
                if self.with_modulated_dcn else None)
        weight = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
            self.dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.dtype) if self.use_bias else None)
        return deform_conv2d(x, offsets, weight, mask, stride=self.stride,
                             dilation=self.dilation,
                             deformable_groups=self.deformable_groups,
                             bias=bias)
