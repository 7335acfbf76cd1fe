"""Fused attention sub-block Pallas kernel (ops/fused_attention.py):
interpret-mode parity vs the XLA reference formulation, VJP parity, the
sequence-tile (tb) variants, and (after wiring) the BertLayer
attention_impl routing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from cpt_tpu.ops.fused_attention import (fused_attention_block,
                                         reference_attention_block)


def _inputs(B=4, S=128, H=128, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, S, H).astype(np.float32) * 0.5)
    wqkv = jnp.asarray(rng.randn(H, 3 * H).astype(np.float32) * 0.05)
    bqkv = jnp.asarray(rng.randn(3 * H).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(H).astype(np.float32) * 0.02)
    gamma = jnp.asarray(rng.rand(H).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    key_bias = jnp.asarray(
        np.where(rng.rand(B, S) > 0.2, 0.0, -10000.0).astype(np.float32))
    return x, wqkv, bqkv, wo, bo, gamma, beta, key_bias


@pytest.mark.parametrize("tb", [1, 2, 4])
def test_interpret_parity(tb):
    args = _inputs()
    ref = reference_attention_block(*args, num_heads=4, eps=1e-12)
    with pltpu.force_tpu_interpret_mode():
        got = fused_attention_block(*args, 4, 1e-12, tb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_fully_masked_rows_finite():
    # a row whose keys are ALL masked (pure padding query) must still
    # produce finite output (softmax of constant -1e4 row)
    args = list(_inputs(B=2))
    kb = np.zeros((2, 128), np.float32)
    kb[1, :] = -10000.0
    args[7] = jnp.asarray(kb)
    ref = reference_attention_block(*args, num_heads=4, eps=1e-12)
    with pltpu.force_tpu_interpret_mode():
        got = fused_attention_block(*args, 4, 1e-12, 1)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_vjp_matches_reference():
    args = _inputs(B=2, S=128, H=128)

    def loss_p(*a):
        with pltpu.force_tpu_interpret_mode():
            return fused_attention_block(*a, 4, 1e-12, 1).sum()

    def loss_r(*a):
        return reference_attention_block(*a, num_heads=4, eps=1e-12).sum()

    gp = jax.grad(loss_p, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-4, rtol=2e-4)


def test_bert_layer_routing():
    """attention_impl='fused' on a BertLayer matches the einsum path and
    leaves the param tree unchanged."""
    from dataclasses import replace

    from cpt_tpu.config.bert import BertConfig
    from cpt_tpu.models.bert.model import BertLayer, extend_attention_mask

    cfg = BertConfig(hidden_size=128, num_attention_heads=4,
                     intermediate_size=256, num_hidden_layers=1,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32) * 0.5)
    mask = jnp.asarray((rng.rand(2, 128) > 0.2).astype(np.float32))
    bias = extend_attention_mask(mask, jnp.float32)

    layer = BertLayer(cfg, jnp.float32)
    params = jax.jit(layer.init)(jax.random.PRNGKey(0), x, bias)
    ref = layer.apply(params, x, bias)

    fused_layer = BertLayer(replace(cfg, attention_impl="fused"),
                            jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_layer.apply(params, x, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)

    # identical param trees
    p2 = jax.jit(fused_layer.init)(jax.random.PRNGKey(0), x, bias)
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(p2)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape
