"""Pallas grouped 3×3 conv: interpret-mode parity vs the XLA formulation
(the kernel is a documented no-win on hardware — see its docstring — but
stays correctness-tested)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from cpt_tpu.ops.grouped_conv import (grouped_conv3x3, pack_weights,
                                      reference_grouped_conv3x3)


@pytest.mark.parametrize(
    "n,h,w,ch,g,stride,relu,affine",
    [(2, 8, 12, 64, 8, 1, False, False),
     (2, 8, 12, 64, 8, 1, True, True),
     (1, 16, 16, 32, 4, 2, True, True),
     (2, 8, 8, 128, 32, 1, False, True)])
def test_interpret_parity(n, h, w, ch, g, stride, relu, affine):
    rng = np.random.RandomState(0)
    cpg = ch // g
    x = jnp.asarray(rng.randn(n, h, w, ch).astype(np.float32))
    w33 = jnp.asarray(rng.randn(3, 3, cpg, ch).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.rand(ch).astype(np.float32) + 0.5) if affine else None
    b = jnp.asarray(rng.randn(ch).astype(np.float32)) if affine else None
    ref = reference_grouped_conv3x3(x, w33, s, b, g, stride, relu)
    with pltpu.force_tpu_interpret_mode():
        got = grouped_conv3x3(x, w33, s, b, g, stride, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pack_weights_layout():
    rng = np.random.RandomState(1)
    g, cpg, ch = 4, 8, 32
    w33 = rng.randn(3, 3, cpg, ch).astype(np.float32)
    wt = np.asarray(pack_weights(jnp.asarray(w33), g))
    assert wt.shape == (g, 9 * cpg, cpg)
    # tap (ky, kx) rows hold w33[ky, kx, :, group_cols]
    np.testing.assert_array_equal(wt[2, 4 * cpg: 5 * cpg],
                                  w33[1, 1, :, 2 * cpg: 3 * cpg])


def test_custom_vjp_matches_reference_grad():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    w33 = jnp.asarray(rng.randn(3, 3, 4, 16).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(16).astype(np.float32))

    def loss_p(x_, w_, s_, b_):
        with pltpu.force_tpu_interpret_mode():
            return grouped_conv3x3(x_, w_, s_, b_, 4, 1, True).sum()

    def loss_r(x_, w_, s_, b_):
        return reference_grouped_conv3x3(x_, w_, s_, b_, 4, 1, True).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, w33, s, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, w33, s, b)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)
