"""W8A8 symmetric quantization for TPU int8 inference.

The reference has no quantized path — this targets the v5e MXU's
394 TOP/s int8 mode (2x the 197 TF/s bf16 peak). Measured op-level
speedups at the real extraction shapes (PERF.md "int8 precision
study"): grouped 3x3 legs 1.28-1.49x, dense 1x1 legs 1.37-1.71x,
head-sized matmuls 2.07x. HOWEVER the composed X152 extraction
measures ~28% SLOWER than bf16 on the current toolchain (relayouts +
int32 footprints + dynamic-amax passes — see PERF.md "Composed
verdict"), so production stays bf16; this path is opt-in
(`BackboneConfig.precision="int8"`) and kept correctness-tested for
toolchains/chips where the int8 rate is reachable.

Scheme (standard post-training quantization, inference only):

* weights: static, symmetric, **per-output-channel** scales
  (``amax/127`` over the reduction axes); quantized from the f32
  checkpoint params inside the jitted program — XLA hoists the
  (tiny) weight-quantize out of any scan and it is O(params), not
  O(activations).
* activations: **dynamic per-tensor** scales (abs-max computed on
  device right before each conv). No calibration data needed, and the
  scale follows the actual activation range per input — the safest PTQ
  variant. The quantize epilogue fuses into the preceding BN+relu;
  the conv then reads int8 (half the HBM bytes of bf16).
* accumulation in int32 (``preferred_element_type``), dequantize +
  frozen-BN affine + relu in one fused f32 epilogue, output cast back
  to the model activation dtype.

Gradients: none — ``round`` is a step function. The int8 path is
guarded for inference (extraction / eval); training stays bf16.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_EPS = 1e-8


def static_scale(precision: str):
    """Parse a ``"int8:<s>"`` precision string into a pinned activation
    scale (calibrated mode — the per-conv amax pass disappears and the
    quantize fuses into the preceding epilogue); ``"int8"`` → None
    (dynamic per-tensor scales)."""
    if ":" in precision:
        return jnp.float32(float(precision.split(":", 1)[1]))
    return None


class QuantTensor(NamedTuple):
    """int8 data + the f32 scale such that ``data * scale ~= original``."""

    data: Array   # int8
    scale: Array  # f32; scalar (per-tensor) or vector (per-channel)


def quant_act(x: Array, scale: Optional[Array] = None) -> QuantTensor:
    """Quantize activations to int8 with a per-tensor symmetric scale.

    ``scale=None`` (default) computes the dynamic abs-max scale on
    device; pass a precomputed scalar to pin it (calibrated mode).
    """
    xf = x.astype(jnp.float32)
    if scale is None:
        scale = jnp.maximum(jnp.max(jnp.abs(xf)), _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return QuantTensor(q, scale)


def quant_weight(w: Array, reduce_axes: Sequence[int]) -> QuantTensor:
    """Per-channel symmetric weight quantization.

    ``reduce_axes`` are the non-channel axes (e.g. ``(0, 1, 2)`` for an
    HWIO conv kernel → one scale per output channel).
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=tuple(reduce_axes), keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantTensor(q, scale.reshape(-1))


def int8_conv(qx: QuantTensor, w: Array, stride: int = 1,
              padding: int = 0, groups: int = 1,
              bn_scale: Optional[Array] = None,
              bn_bias: Optional[Array] = None,
              relu: bool = False,
              out_dtype=jnp.bfloat16) -> Array:
    """int8 NHWC conv with fused dequant + frozen-BN affine + relu.

    ``qx`` is a pre-quantized input (quantize once, reuse across the
    convs that share it — e.g. a bottleneck's conv1 and its downsample
    branch). ``w`` is the f32 HWIO checkpoint kernel; it is quantized
    per-output-channel here, inside jit, where XLA constant-folds and
    hoists it relative to the activation work.

    Math: ``y = (conv_int8(x_q, w_q).astype(f32) * (s_x * s_w[c]
    [* bn_scale])) [+ bn_bias]``, i.e. the dequantization multiplier is
    folded into the frozen-BN per-channel affine — one fused
    multiply-add epilogue, exactly the bf16 path's epilogue shape.
    """
    qw = quant_weight(w, (0, 1, 2))
    y = lax.conv_general_dilated(
        qx.data, qw.data, (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    m = qx.scale * qw.scale
    if bn_scale is not None:
        m = m * bn_scale.astype(jnp.float32)
    y = y.astype(jnp.float32) * m
    if bn_bias is not None:
        y = y + bn_bias.astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(out_dtype)


def int8_matmul(qx: QuantTensor, w: Array,
                bias: Optional[Array] = None,
                out_dtype=jnp.bfloat16) -> Array:
    """int8 [M, K] x [K, N] matmul with per-column weight scales.

    For dense (fc) layers: ``w`` is the f32 [K, N] checkpoint matrix.
    """
    qw = quant_weight(w, (0,))
    y = lax.dot_general(qx.data, qw.data, (((qx.data.ndim - 1,), (0,)),
                                           ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (qx.scale * qw.scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
