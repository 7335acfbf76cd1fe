"""W8A8 int8 inference path (ops/quant.py + BackboneConfig.precision).

Beyond-reference perf feature: the reference (maskrcnn_benchmark /
scene_graph_benchmark) has no quantized inference. These tests pin the
quantization math and the checkpoint-interchangeability contract (the
int8 backbone consumes the exact bf16-path parameter tree).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.models.detector.resnet import ResNetC4
from cpt_tpu.ops.quant import int8_conv, int8_matmul, quant_act, quant_weight


def test_quant_act_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16).astype(np.float32)) * 3.0
    q = quant_act(x)
    assert q.data.dtype == jnp.int8
    err = np.abs(np.asarray(q.data, np.float32) * float(q.scale) - x)
    # symmetric per-tensor: worst-case error is scale/2
    assert err.max() <= float(q.scale) * 0.5 + 1e-6
    assert int(np.abs(np.asarray(q.data)).max()) == 127


def test_quant_act_static_scale():
    x = jnp.ones((2, 2)) * 5.0
    q = quant_act(x, scale=jnp.float32(0.1))
    # 5.0/0.1 = 50 → clips nowhere, scale is honored verbatim
    assert np.all(np.asarray(q.data) == 50)
    assert float(q.scale) == pytest.approx(0.1)


def test_quant_weight_per_channel():
    rng = np.random.RandomState(1)
    w = rng.randn(3, 3, 4, 8).astype(np.float32)
    w[..., 3] *= 100.0  # one huge output channel must not poison the rest
    q = quant_weight(jnp.asarray(w), (0, 1, 2))
    assert q.data.dtype == jnp.int8 and q.scale.shape == (8,)
    deq = np.asarray(q.data, np.float32) * np.asarray(q.scale)
    for c in range(8):
        assert np.abs(deq[..., c] - w[..., c]).max() <= \
            float(q.scale[c]) * 0.5 + 1e-6


def test_int8_conv_matches_dequantized_f32_conv():
    """int32 accumulation is exact: the int8 conv must equal the f32 conv
    of the dequantized operands to f32 rounding."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 9, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32))
    qx, qw = quant_act(x), quant_weight(w, (0, 1, 2))
    got = int8_conv(qx, w, stride=1, padding=1, groups=2,
                    out_dtype=jnp.float32)
    ref = lax.conv_general_dilated(
        qx.data.astype(jnp.float32) * qx.scale,
        qw.data.astype(jnp.float32) * qw.scale,
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_int8_conv_bn_relu_epilogue():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 5, 5, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 4, 6).astype(np.float32))
    s = jnp.asarray(rng.rand(6).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(6).astype(np.float32))
    got = int8_conv(quant_act(x), w, bn_scale=s, bn_bias=b, relu=True,
                    out_dtype=jnp.float32)
    plain = int8_conv(quant_act(x), w, out_dtype=jnp.float32)
    ref = jax.nn.relu(plain * s + b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    assert float(np.asarray(got).min()) >= 0.0


def test_int8_matmul_close_to_f32():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(32, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    got = np.asarray(int8_matmul(quant_act(x), w, out_dtype=jnp.float32))
    ref = np.asarray(x) @ np.asarray(w)
    denom = np.linalg.norm(ref)
    assert np.linalg.norm(got - ref) / denom < 0.02


def _backbone_pair():
    cfg = tiny_detector_config()
    bb_f32 = ResNetC4(cfg.backbone, jnp.float32)
    from dataclasses import replace
    cfg8 = replace(cfg.backbone, precision="int8")
    bb_i8 = ResNetC4(cfg8, jnp.float32)
    return bb_f32, bb_i8


def test_int8_backbone_param_tree_identical():
    """Checkpoint interchangeability: both precisions build the same tree."""
    bb_f32, bb_i8 = _backbone_pair()
    x = jnp.zeros((1, 32, 32, 3))
    p32 = jax.jit(bb_f32.init)(jax.random.PRNGKey(0), x)
    p8 = jax.jit(bb_i8.init)(jax.random.PRNGKey(0), x)
    shapes32 = jax.tree.map(lambda a: (a.shape, a.dtype), p32)
    shapes8 = jax.tree.map(lambda a: (a.shape, a.dtype), p8)
    assert jax.tree.structure(shapes32) == jax.tree.structure(shapes8)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, shapes32, shapes8))


def test_int8_static_scale_backbone():
    """'int8:<s>' pins a static activation scale (calibrated mode);
    same param tree, output stays close to f32."""
    from dataclasses import replace

    cfg = tiny_detector_config().backbone
    bb = ResNetC4(cfg, jnp.float32)
    bb8 = ResNetC4(replace(cfg, precision="int8:0.05"), jnp.float32)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    params = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    y32 = np.asarray(jax.jit(bb.apply)(params, x), np.float32).ravel()
    y8 = np.asarray(jax.jit(bb8.apply)(params, x), np.float32).ravel()
    cos = float(y32 @ y8 / (np.linalg.norm(y32) * np.linalg.norm(y8) + 1e-9))
    assert cos > 0.97, cos


def test_int8_backbone_close_to_f32():
    bb_f32, bb_i8 = _backbone_pair()
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    params = jax.jit(bb_f32.init)(jax.random.PRNGKey(0), x)
    y32 = np.asarray(jax.jit(bb_f32.apply)(params, x), np.float32).ravel()
    y8 = np.asarray(jax.jit(bb_i8.apply)(params, x), np.float32).ravel()
    cos = float(y32 @ y8 / (np.linalg.norm(y32) * np.linalg.norm(y8) + 1e-9))
    assert cos > 0.99, cos
