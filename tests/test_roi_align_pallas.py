"""Fused Pallas pooling kernel (ops/roi_align_pallas.py) vs the XLA
separable path — interpret-mode parity, autodiff fallback, and the
heads_from_feats config routing."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cpt_tpu.ops.roi_align_pallas as RP
from cpt_tpu.ops.roi_align_pallas import (batched_roi_align,
                                          pallas_pool_eligible)


def _rois(rng, n, lim=600.0):
    r = np.sort(rng.uniform(0, lim, (n, 2, 2)), axis=1)
    return jnp.asarray(r.transpose(0, 2, 1).reshape(n, 4).astype(np.float32))


def test_pallas_pool_matches_xla_interpret():
    """Kernel (interpreter) == XLA separable einsums at bf16 rounding."""
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 40, 64, 512).astype(np.float32)
                        ).astype(jnp.bfloat16)
    rois = _rois(rng, 16)
    a = batched_roi_align(feats, rois, 1 / 16.0, 14, 0, 8, "xla")
    RP._INTERPRET = True
    try:
        b = batched_roi_align(feats, rois, 1 / 16.0, 14, 0, 8, "pallas")
    finally:
        RP._INTERPRET = False
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    err = np.abs(a32 - b32).max()
    assert err <= 0.02 * max(np.abs(a32).max(), 1.0), err


def test_pallas_pool_eligibility_gate():
    # the X152 extraction shape is eligible
    assert pallas_pool_eligible(64, 40, 64, 1024, 128, 14, jnp.bfloat16)
    # wrong dtype / channel tiling / roi multiple → XLA fallback
    assert not pallas_pool_eligible(64, 40, 64, 1024, 128, 14, jnp.float32)
    assert not pallas_pool_eligible(64, 40, 64, 100, 128, 14, jnp.bfloat16)
    assert not pallas_pool_eligible(64, 40, 64, 1024, 3, 14, jnp.bfloat16)
    # VMEM budget: an enormous map is rejected
    assert not pallas_pool_eligible(1, 400, 640, 1024, 128, 14,
                                    jnp.bfloat16)


def test_batched_roi_align_grad_falls_back():
    """custom_vjp backward routes to the XLA formulation regardless of
    impl — gradients defined and equal."""
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    rois = _rois(rng, 4, lim=200.0)

    def loss(fe, impl):
        return batched_roi_align(fe, rois, 1 / 16.0, 7, 2, 8,
                                 impl).astype(jnp.float32).sum()

    g_xla = jax.grad(lambda fe: loss(fe, "xla"))(feats)
    g_auto = jax.grad(lambda fe: loss(fe, "auto"))(feats)
    np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_auto),
                               rtol=1e-5, atol=1e-5)


def test_heads_from_feats_pooler_impl_routing():
    """pooler_impl config reaches the pooling call: on CPU, "auto" and
    "xla" must agree exactly (auto routes to xla off-TPU)."""
    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
    from cpt_tpu.models.detector.config import tiny_detector_config

    rng = np.random.RandomState(2)
    cfg = tiny_detector_config()
    m = cfg.max_force_boxes
    model = AttrRCNN(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)),
        jnp.asarray([64, 64]), jnp.zeros((m, 4)), jnp.ones((m,), bool))
    feats = jnp.asarray(rng.randn(2, 4, 4,
                                  cfg.backbone.out_channels
                                  ).astype(np.float32))
    dets = _rois(rng, m, lim=60.0)
    dv = jnp.ones((m,), bool)

    outs = {}
    for impl in ("auto", "xla"):
        c2 = dataclasses.replace(
            cfg, roi_heads=dataclasses.replace(cfg.roi_heads,
                                               pooler_impl=impl))
        m2 = AttrRCNN(c2)
        outs[impl] = m2.apply(params, feats, dets, dv,
                              method=AttrRCNN.heads_from_feats)
    np.testing.assert_array_equal(
        np.asarray(outs["auto"]["box_features"]),
        np.asarray(outs["xla"]["box_features"]))
