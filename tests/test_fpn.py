"""FPN backbone variant: pyramid shapes, level mapping, multi-level pooling."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.models.detector.fpn import (ResNetFPN, fpn_level_map,
                                         multilevel_roi_align)


@pytest.mark.slow
def test_fpn_pyramid_shapes(rng):
    cfg = tiny_detector_config().backbone
    model = ResNetFPN(cfg, out_channels=32)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    pyr = model.apply(params, x)
    # stem /4, then strides 4, 8, 16 for the 3 stages + extra maxpool level
    assert len(pyr) == 4
    assert pyr[0].shape == (1, 16, 16, 32)
    assert pyr[1].shape == (1, 8, 8, 32)
    assert pyr[2].shape == (1, 4, 4, 32)
    assert pyr[3].shape == (1, 2, 2, 32)
    for p in pyr:
        assert np.isfinite(np.asarray(p)).all()


def test_fpn_level_map():
    boxes = jnp.asarray([
        [0, 0, 55, 55],        # ~56px → level 2 (small)
        [0, 0, 223, 223],      # canonical 224 → level 4
        [0, 0, 900, 900],      # huge → clamped to max
    ], jnp.float32)
    lv = fpn_level_map(boxes, k_min=2, k_max=5)
    assert lv[0] == 0          # k=2 → index 0
    assert lv[1] == 2          # k=4 → index 2
    assert lv[2] == 3          # clamped k=5 → index 3


def test_multilevel_pooling_selects_by_level(rng):
    # two levels with distinguishable constant features
    f0 = jnp.ones((128, 128, 4)) * 1.0   # stride 4 (512px image)
    f1 = jnp.ones((64, 64, 4)) * 2.0     # stride 8
    boxes = jnp.asarray([[0, 0, 40, 40],      # small → level 0
                         [0, 0, 500, 500]],   # large → level 1
                        jnp.float32)
    out = multilevel_roi_align([f0, f1], boxes, scales=(0.25, 0.125),
                               pooled=2, sampling=1)
    np.testing.assert_allclose(np.asarray(out[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), 2.0, atol=1e-5)


@pytest.mark.slow
def test_fpn_detector_composes_end_to_end():
    """ResNetFPN + multi-level pooling + 2-MLP box head compose into a
    working detector forward (the reference's generalized R-*-FPN path)."""
    import flax.linen as nn

    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.models.detector.fpn import (ResNetFPN, multilevel_roi_align)

    cfg = tiny_detector_config()

    class TinyFPNDet(nn.Module):
        @nn.compact
        def __call__(self, x, rois):
            pyramid = ResNetFPN(cfg.backbone, out_channels=32,
                                name="body")(x)
            # P2..P4 from the 3-stage tiny body (+P-extra maxpool)
            scales = [1.0 / 4, 1.0 / 8, 1.0 / 16]
            pooled = multilevel_roi_align([p[0] for p in pyramid[:3]], rois,
                                          scales=scales, pooled=7,
                                          sampling=2)
            f = pooled.reshape(pooled.shape[0], -1)
            f = nn.relu(nn.Dense(64, name="fc6")(f))
            f = nn.relu(nn.Dense(64, name="fc7")(f))
            return (nn.Dense(7, name="cls_score")(f),
                    nn.Dense(7 * 4, name="bbox_pred")(f))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    rois = jnp.asarray(
        np.sort(rng.uniform(0, 60, (5, 2, 2)), axis=1)
        .transpose(0, 2, 1).reshape(5, 4).astype(np.float32))
    model = TinyFPNDet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, rois)
    cls, box = model.apply(params, x, rois)
    assert cls.shape == (5, 7) and box.shape == (5, 28)
    assert np.isfinite(np.asarray(cls)).all()
