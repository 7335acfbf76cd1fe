"""ResNeXt C4 backbone + C5 RoI head stage — flax, NHWC, frozen BN.

Capability-parity with the reference backbone zoo's VinVL configuration
(``maskrcnn_benchmark/modeling/backbone/resnet.py``): R-152-C4 ResNeXt
32×8d, ``BottleneckWithFixedBatchNorm`` (frozen BN ≡ per-channel affine,
eps=0 fold: ``layers/batch_norm.py:24-27``), stride in the 3×3 conv
(``STRIDE_IN_1X1=False``), stem = 7×7/2 conv + BN + relu + 3×3/2 maxpool.

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), frozen BN
stored pre-folded as ``(scale, bias)`` pairs (one fused multiply-add, no
rsqrt at runtime), bfloat16 activations with float32 params.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from cpt_tpu.models.detector.config import BackboneConfig

Array = jax.Array


class _ConvKernel(nn.Module):
    """nn.Conv's exact param tree ({kernel}, lecun_normal, no bias) —
    lets the grouped 3×3 route through either XLA or the slice-dense
    Pallas kernel without changing checkpoints."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _AffineParams(nn.Module):
    """FrozenBN's param tree ({scale: ones, bias: zeros})."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32),
                self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32))


class FrozenBN(nn.Module):
    """Per-channel affine: y = x·scale + bias (pre-folded frozen BN)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def conv(features: int, kernel: int, stride: int = 1, groups: int = 1,
         name: str = None, dtype=jnp.float32) -> nn.Conv:
    pad = (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=False,
                   feature_group_count=groups, name=name, dtype=dtype)


class Bottleneck(nn.Module):
    """1×1 → grouped 3×3 (stride here) → 1×1, residual add, relu.

    The grouped 3×3 + frozen-BN + relu sub-block routes through the
    slice-dense Pallas kernel (``ops/grouped_conv.py::
    grouped_conv3x3_sd`` — measured 5-7% over XLA's grouped lowering at
    the extraction stage shapes, with the BN affine and relu fused into
    the f32 epilogue) when ``grouped_impl`` allows and the shape is
    eligible; otherwise XLA's ``feature_group_count`` path. Both paths
    share one parameter tree (nn.Conv/FrozenBN layout).
    """

    bottleneck_channels: int
    out_channels: int
    num_groups: int
    stride: int
    stride_in_1x1: bool
    dtype: Any = jnp.float32
    grouped_impl: str = "auto"   # auto | xla | pallas
    precision: str = "bf16"      # bf16 | int8 (W8A8 PTQ, inference only)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from cpt_tpu.ops.grouped_conv import (grouped_conv3x3_sd_vjp,
                                              sd_eligible)

        if self.precision.startswith("int8"):
            return self._int8(x)
        s1, s3 = ((self.stride, 1) if self.stride_in_1x1
                  else (1, self.stride))
        identity = x
        if x.shape[-1] != self.out_channels:
            identity = conv(self.out_channels, 1, self.stride,
                            name="downsample_conv", dtype=self.dtype)(x)
            identity = FrozenBN(self.out_channels, self.dtype,
                                name="downsample_bn")(identity)

        out = conv(self.bottleneck_channels, 1, s1, name="conv1",
                   dtype=self.dtype)(x)
        out = FrozenBN(self.bottleneck_channels, self.dtype, name="bn1")(out)
        out = jax.nn.relu(out)

        bc = self.bottleneck_channels
        cpg = bc // self.num_groups
        k2 = _ConvKernel((3, 3, cpg, bc), name="conv2")()
        s2, b2 = _AffineParams(bc, name="bn2")()
        use_pallas = (self.grouped_impl == "pallas"
                      or (self.grouped_impl == "auto"
                          and sd_eligible(out.shape[1], out.shape[2], bc,
                                          cpg, s3)))
        if use_pallas:
            out = grouped_conv3x3_sd_vjp(out, k2.astype(self.dtype),
                                         s2, b2, self.num_groups, True)
        else:
            out = lax.conv_general_dilated(
                out, k2.astype(self.dtype), (s3, s3), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.num_groups)
            out = out * s2.astype(self.dtype) + b2.astype(self.dtype)
            out = jax.nn.relu(out)

        out = conv(self.out_channels, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBN(self.out_channels, self.dtype, name="bn3")(out)
        return jax.nn.relu(out + identity)

    def _int8(self, x: Array) -> Array:
        """W8A8 path (ops/quant.py). Same parameter tree as the bf16
        branch (checkpoints are interchangeable); the input is quantized
        once and shared by conv1 and the downsample branch; every
        dequant is folded into the frozen-BN per-channel epilogue.
        Residual add + final relu stay in ``self.dtype``.

        ``precision="int8"`` uses dynamic per-tensor activation scales;
        ``"int8:<s>"`` pins a static scale (calibrated mode — removes
        the per-conv amax reduction pass; graph-identical in cost to
        per-layer calibrated constants)."""
        from cpt_tpu.ops.quant import int8_conv, quant_act, static_scale

        sc = static_scale(self.precision)
        s1, s3 = ((self.stride, 1) if self.stride_in_1x1
                  else (1, self.stride))
        bc = self.bottleneck_channels
        cpg = bc // self.num_groups
        cin = x.shape[-1]

        qx = quant_act(x, sc)
        if cin != self.out_channels:
            kd = _ConvKernel((1, 1, cin, self.out_channels),
                             name="downsample_conv")()
            sd, bd = _AffineParams(self.out_channels, name="downsample_bn")()
            identity = int8_conv(qx, kd, self.stride, 0, 1, sd, bd,
                                 relu=False, out_dtype=self.dtype)
        else:
            identity = x

        k1 = _ConvKernel((1, 1, cin, bc), name="conv1")()
        sc1, b1 = _AffineParams(bc, name="bn1")()
        out = int8_conv(qx, k1, s1, 0, 1, sc1, b1, relu=True,
                        out_dtype=self.dtype)

        k2 = _ConvKernel((3, 3, cpg, bc), name="conv2")()
        sc2, b2 = _AffineParams(bc, name="bn2")()
        out = int8_conv(quant_act(out, sc), k2, s3, 1, self.num_groups,
                        sc2, b2, relu=True, out_dtype=self.dtype)

        k3 = _ConvKernel((1, 1, bc, self.out_channels), name="conv3")()
        sc3, b3 = _AffineParams(self.out_channels, name="bn3")()
        out = int8_conv(quant_act(out, sc), k3, 1, 0, 1, sc3, b3,
                        relu=False, out_dtype=self.dtype)
        return jax.nn.relu(out + identity)


class Stem(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32
    precision: str = "bf16"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.precision.startswith("int8"):
            from cpt_tpu.ops.quant import int8_conv, quant_act, static_scale
            k = _ConvKernel((7, 7, x.shape[-1], self.out_channels),
                            name="conv1")()
            s, b = _AffineParams(self.out_channels, name="bn1")()
            x = int8_conv(quant_act(x, static_scale(self.precision)), k,
                          2, 3, 1, s, b, relu=True, out_dtype=self.dtype)
        else:
            x = nn.Conv(self.out_channels, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        name="conv1", dtype=self.dtype)(x)
            x = FrozenBN(self.out_channels, self.dtype, name="bn1")(x)
            x = jax.nn.relu(x)
        # 3×3/2 maxpool, pad 1 (torch semantics: pad with -inf)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return x


class Stage(nn.Module):
    block_count: int
    bottleneck_channels: int
    out_channels: int
    num_groups: int
    first_stride: int
    stride_in_1x1: bool
    dtype: Any = jnp.float32
    grouped_impl: str = "auto"
    precision: str = "bf16"

    def setup(self):
        self.blocks = [
            Bottleneck(self.bottleneck_channels, self.out_channels,
                       self.num_groups,
                       self.first_stride if i == 0 else 1,
                       self.stride_in_1x1, self.dtype,
                       self.grouped_impl, self.precision,
                       name=f"block_{i}")
            for i in range(self.block_count)
        ]

    def apply_block(self, x: Array, i: int) -> Array:
        """Single block — lets the cascaded windowed extractor run
        individual blocks on dirty-region windows."""
        return self.blocks[i](x)

    def __call__(self, x: Array) -> Array:
        for block in self.blocks:
            x = block(x)
        return x


class ResNetC4(nn.Module):
    """Stem + layer1..layerN body; returns the C4 feature map (stride 16).

    ``up_to``/``from_stage`` split the body at a stage boundary for the
    two-level exact windowed extractor (engine/windowed.py): the receptive
    field through stem+layer1+layer2 is only 77 px (vs 645 for the full
    body), so per-copy recompute of the early stages on a halo-160 window
    is exactly equal to full recompute — the late stages then run on the
    patched stride-8 map.
    """

    config: BackboneConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.stem = Stem(c.stem_out_channels, self.dtype,
                         precision=c.precision)
        stages = []
        for i, blocks in enumerate(c.stage_blocks):
            factor = 2 ** i
            stages.append(Stage(
                block_count=blocks,
                bottleneck_channels=c.stage2_bottleneck_channels * factor,
                out_channels=c.res2_out_channels * factor,
                num_groups=c.num_groups,
                first_stride=1 if i == 0 else 2,
                stride_in_1x1=c.stride_in_1x1,
                dtype=self.dtype,
                grouped_impl=c.grouped_conv_impl,
                precision=c.precision,
                name=f"layer{i + 1}",
            ))
        self.stages = stages

    def up_to(self, x: Array, n_stages: int) -> Array:
        """Stem + the first ``n_stages`` stages (stride 4·2^(n-1) map)."""
        x = self.stem(x)
        for st in self.stages[:n_stages]:
            x = st(x)
        return x

    def from_stage(self, x: Array, n_stages: int) -> Array:
        """The remaining stages after ``up_to(x, n_stages)``."""
        for st in self.stages[n_stages:]:
            x = st(x)
        return x

    def __call__(self, x: Array) -> Array:
        return self.from_stage(self.up_to(x, 0), 0)


class ResNetC5Head(nn.Module):
    """layer4 (stage-5) RoI feature head: 14×14 → 7×7, 2048 channels.

    Reference ``ResNet50Conv5ROIFeatureExtractor`` (``roi_box_feature_
    extractors.py:16-61``): stride-2 first block, same bottleneck family.
    """

    config: BackboneConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.config
        idx = len(c.stage_blocks)  # stage index (e.g. 3 stages → layer4)
        factor = 2 ** idx
        return Stage(
            block_count=c.head_blocks,
            bottleneck_channels=c.stage2_bottleneck_channels * factor,
            out_channels=c.res2_out_channels * factor,
            num_groups=c.num_groups,
            first_stride=2,
            stride_in_1x1=c.stride_in_1x1,
            dtype=self.dtype,
            grouped_impl=c.grouped_conv_impl,
            precision=c.precision,
            name=f"layer{idx + 1}",
        )(x)
