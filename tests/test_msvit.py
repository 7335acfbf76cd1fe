"""MsViT backbone + 2-D sliding-chunk attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.models.detector.msvit import (MsViT, parse_arch,
                                           sliding_chunk_attention_2d)


def test_parse_arch():
    cfgs = parse_arch("l1,h3,d96,n2,s1,g1,p4,f7,a1_l2,h6,d192,n4,s0,g0,p2")
    assert len(cfgs) == 2
    assert cfgs[0] == {"l": 1, "h": 3, "d": 96, "n": 2, "s": 1, "g": 1,
                       "p": 4, "f": 7, "a": 1}
    assert cfgs[1]["h"] == 6 and cfgs[1]["s"] == 0 and cfgs[1]["p"] == 2
    assert cfgs[1]["f"] == 7  # default fills in


def _full_attn(q, k, v):
    logits = np.einsum("bhqd,bhkd->bhqk", q, k)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_sliding_chunk_equals_full_on_single_chunk():
    """Grid ≤ one chunk → the 3×3 neighborhood is just the grid itself."""
    rng = np.random.RandomState(0)
    ny = nx = 4
    q = rng.randn(1, 2, ny * nx, 8).astype(np.float32)
    k = rng.randn(1, 2, ny * nx, 8).astype(np.float32)
    v = rng.randn(1, 2, ny * nx, 8).astype(np.float32)
    got = sliding_chunk_attention_2d(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), ny, nx, w=4)
    np.testing.assert_allclose(np.asarray(got), _full_attn(q, k, v),
                               rtol=1e-4, atol=1e-5)


def test_sliding_chunk_locality():
    """A key > 1 chunk away must not influence the query."""
    rng = np.random.RandomState(1)
    ny = nx = 12          # 3x3 chunks of w=4
    shape = (1, 1, ny * nx, 4)
    q = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(*shape).astype(np.float32))
    v = jnp.asarray(rng.randn(*shape).astype(np.float32))
    base = np.asarray(sliding_chunk_attention_2d(q, k, v, ny, nx, w=4))
    # perturb the far corner key/value (token index last = (11, 11))
    far = ny * nx - 1
    k2 = k.at[0, 0, far].add(100.0)
    v2 = v.at[0, 0, far].add(100.0)
    pert = np.asarray(sliding_chunk_attention_2d(q, k2, v2, ny, nx, w=4))
    # query at (0, 0) — chunk (0,0), far corner is chunk (2,2): unaffected
    np.testing.assert_allclose(pert[0, 0, 0], base[0, 0, 0], atol=1e-5)
    # query at (11, 0) — chunk (2,0) is adjacent to... (2,2) is NOT in its
    # 3x3 neighborhood either; query in chunk (1,1) IS affected
    center = 5 * nx + 5
    assert np.abs(pert[0, 0, center] - base[0, 0, center]).max() > 1e-3


@pytest.mark.slow
def test_msvit_backbone_shapes_and_grads():
    model = MsViT(arch="l1,h2,d16,n1,s1,g1,p4,f4,a1_l2,h2,d32,n1,s0,g0,p2",
                  window=4)
    x = jnp.ones((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 2
    assert outs[0].shape == (1, 8, 8, 16)     # /4
    assert outs[1].shape == (1, 4, 4, 32)     # /8

    def loss(p):
        return sum((o ** 2).sum() for o in model.apply(p, x))

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_msvit_global_token_sees_everything():
    """Perturbing any grid position changes every output through the
    global token (information highway)."""
    model = MsViT(arch="l1,h2,d16,n2,s1,g1,p4,f2,a0", window=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    base = np.asarray(model.apply(params, x)[0])
    x2 = x.at[0, 15, 15, :].set(5.0)
    pert = np.asarray(model.apply(params, x2)[0])
    # far-away output location (0, 0) changed via the global token
    assert np.abs(pert[0, 0, 0] - base[0, 0, 0]).max() > 1e-6


def test_msvit_rpe_backbone():
    model = MsViT(arch="l1,h2,d16,n1,s1,g1,p4,f4,a0", window=4, rpe=True)
    x = jnp.ones((1, 16, 16, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves(
        params["params"]["layer1_block0"]["attn"])
    # rpe tables present and used
    assert "local_relative_position_bias_table" in \
        params["params"]["layer1_block0"]["attn"]
    out = model.apply(params, x)
    assert np.isfinite(np.asarray(out[0])).all()
