"""Deformable conv v1/v2 vs plain-conv equivalence and a scalar golden."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.ops.deform_conv import DFConv2d, deform_conv2d


def _scalar_deform(x, offsets, weight, mask, stride, dilation):
    """Literal per-output-pixel loop implementing the documented CUDA
    semantics (zero outside, bilinear)."""
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    k2 = kh * kw
    pad = dilation * (kh - 1) // 2
    ho, wo = offsets.shape[1], offsets.shape[2]
    out = np.zeros((b, ho, wo, cout), np.float64)

    def sample(img, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        fy, fx = y - y0, xx - x0
        v = np.zeros(c)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xc = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xc < w:
                    v += wy * wx * img[yy, xc]
        return v

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for i in range(kh):
                    for j in range(kw):
                        k = i * kw + j
                        y = (oy * stride - pad + i * dilation
                             + offsets[bi, oy, ox, 2 * k])
                        xx = (ox * stride - pad + j * dilation
                              + offsets[bi, oy, ox, 2 * k + 1])
                        v = sample(x[bi], y, xx)
                        if mask is not None:
                            v = v * mask[bi, oy, ox, k]
                        out[bi, oy, ox] += v @ weight[i, j]
    return out


def test_zero_offsets_equal_plain_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    off = jnp.zeros((1, 8, 8, 18))
    got = deform_conv2d(x, off, w)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_matches_scalar_golden_with_offsets_and_mask():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 6, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 4).astype(np.float32)
    off = (rng.randn(2, 6, 6, 18) * 1.5).astype(np.float32)
    m = rng.rand(2, 6, 6, 9).astype(np.float32)
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w),
                        jnp.asarray(m))
    want = _scalar_deform(x, off, w, m, 1, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_stride2_shape_and_golden():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 2).astype(np.float32)
    off = (rng.randn(1, 4, 4, 18) * 0.5).astype(np.float32)
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w),
                        stride=2)
    assert got.shape == (1, 4, 4, 2)
    want = _scalar_deform(x, off, w, None, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_dfconv_module_v1_zero_init_is_plain_conv():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 5, 5, 4).astype(np.float32))
    mod = DFConv2d(features=6, with_modulated_dcn=False)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    got = mod.apply(params, x)
    w = params["params"]["kernel"]
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_dfconv_v2_gradients_flow_to_offsets():
    x = jnp.ones((1, 5, 5, 3))
    mod = DFConv2d(features=2, with_modulated_dcn=True)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    def loss(p):
        return (mod.apply(p, x) ** 2).sum()

    g = jax.grad(loss)(params)
    off_g = g["params"]["offset"]["kernel"]
    assert np.isfinite(np.asarray(off_g)).all()
    # modulation-mask gradient path is live (bias grads nonzero)
    assert float(jnp.abs(g["params"]["offset"]["bias"]).sum()) > 0


def _scalar_deform_pool(feat, rois, offsets, scale, p, s, trans_std):
    h, w, c = feat.shape
    n = rois.shape[0]
    out = np.zeros((n, p, p, c), np.float64)

    def sample(y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        fy, fx = y - y0, xx - x0
        v = np.zeros(c)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xc = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xc < w:
                    v += wy * wx * feat[yy, xc]
        return v

    for ri in range(n):
        x1, y1 = rois[ri, 0] * scale, rois[ri, 1] * scale
        rw = max((rois[ri, 2] - rois[ri, 0]) * scale, 0.1)
        rh = max((rois[ri, 3] - rois[ri, 1]) * scale, 0.1)
        bw, bh = rw / p, rh / p
        for i in range(p):
            for j in range(p):
                dy = dx = 0.0
                if offsets is not None:
                    dy = offsets[ri, i, j, 0] * trans_std * rh
                    dx = offsets[ri, i, j, 1] * trans_std * rw
                acc = np.zeros(c)
                for sy in range(s):
                    for sx in range(s):
                        y = y1 + i * bh + (sy + 0.5) / s * bh + dy
                        xx = x1 + j * bw + (sx + 0.5) / s * bw + dx
                        acc += sample(y, xx)
                out[ri, i, j] = acc / (s * s)
    return out


def test_deform_roi_pool_matches_scalar_golden():
    from cpt_tpu.ops.deform_conv import deform_roi_pool

    rng = np.random.RandomState(4)
    feat = rng.randn(12, 14, 3).astype(np.float32)
    rois = np.asarray([[8, 8, 80, 64], [0, 0, 40, 40]], np.float32)
    off = (rng.randn(2, 3, 3, 2) * 0.5).astype(np.float32)
    got = deform_roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                          jnp.asarray(off), spatial_scale=1 / 8,
                          out_size=3, sample_per_part=2, trans_std=0.2)
    want = _scalar_deform_pool(feat, rois, off, 1 / 8, 3, 2, 0.2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    # no_trans path
    got0 = deform_roi_pool(jnp.asarray(feat), jnp.asarray(rois), None,
                           spatial_scale=1 / 8, out_size=3,
                           sample_per_part=2)
    want0 = _scalar_deform_pool(feat, rois, None, 1 / 8, 3, 2, 0.0)
    np.testing.assert_allclose(np.asarray(got0), want0, rtol=1e-3,
                               atol=1e-4)


def test_modulated_deform_pool_pack():
    from cpt_tpu.ops.deform_conv import ModulatedDeformRoIPoolingPack

    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.randn(12, 14, 3).astype(np.float32))
    rois = jnp.asarray([[8, 8, 80, 64]], np.float32)
    mod = ModulatedDeformRoIPoolingPack(out_size=3, spatial_scale=1 / 8,
                                        sample_per_part=2,
                                        deform_fc_channels=16)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), feat, rois)
    out = mod.apply(params, feat, rois)
    assert out.shape == (1, 3, 3, 3)
    # zero-init offset/mask fcs -> mask = sigmoid(0) = 0.5x the base pool
    from cpt_tpu.ops.deform_conv import deform_roi_pool
    base = deform_roi_pool(feat, rois, None, spatial_scale=1 / 8,
                           out_size=3, sample_per_part=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base) * 0.5,
                               rtol=1e-4, atol=1e-5)
