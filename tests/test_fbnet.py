"""FBNet mobile backbone (op parser, IRF block, default trunk)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.models.detector.fbnet import (DEFAULT_ARCH, FBNetTrunk,
                                           IRFBlock, parse_op)


def test_parse_op_vocabulary():
    assert parse_op("skip", 6) == {"skip": True}
    p = parse_op("ir_k3", 6)
    assert p["kernel"] == 3 and p["expansion"] == 6 and not p["se"]
    p = parse_op("ir_k5_e3_se", 6)
    assert p["kernel"] == 5 and p["expansion"] == 3 and p["se"]
    p = parse_op("ir_k3_s4", 6)
    assert p["expansion"] == 4 and p["shuffle"]
    p = parse_op("ir_k7", 1)
    assert p["kernel"] == 7 and p["expansion"] == 1
    with pytest.raises(ValueError):
        parse_op("conv_bad", 6)


def test_irf_block_residual_and_stride():
    x = jnp.ones((1, 8, 8, 16))
    blk = IRFBlock(16, expansion=3, stride=1)
    params = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    assert out.shape == (1, 8, 8, 16)

    blk2 = IRFBlock(24, expansion=3, stride=2, se=True)
    params2 = jax.jit(blk2.init)(jax.random.PRNGKey(0), x)
    out2 = blk2.apply(params2, x)
    assert out2.shape == (1, 4, 4, 24)

    blk3 = IRFBlock(32, expansion=4, stride=1, shuffle=True)
    x3 = jnp.ones((1, 8, 8, 32))
    params3 = jax.jit(blk3.init)(jax.random.PRNGKey(0), x3)
    assert blk3.apply(params3, x3).shape == (1, 8, 8, 32)


@pytest.mark.slow
def test_fbnet_default_trunk():
    model = FBNetTrunk()
    x = jnp.ones((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # default arch: first s2, stages strides 1,2,2,2 -> /16, 96 channels
    assert out.shape == (1, 4, 4, 96)
    assert np.isfinite(np.asarray(out)).all()


def test_fbnet_custom_arch_with_skip():
    arch = {
        "block_op_type": [["ir_k3", "skip"], ["ir_k5_se"]],
        "block_cfg": {
            "first": [8, 2],
            "stages": [[[1, 8, 2, 1]], [[6, 16, 1, 2]]],
        },
    }
    model = FBNetTrunk(arch=arch)
    x = jnp.ones((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 8, 8, 16)
