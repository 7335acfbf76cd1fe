"""Fused BERT FFN Pallas kernel (ops/fused_ffn.py): interpret-mode parity
vs the XLA reference formulation, VJP parity, the erf polynomial, and the
BertLayer ffn_impl routing (param tree unchanged)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from cpt_tpu.ops.fused_ffn import _erf_poly, _reference_ffn, fused_ffn


def _inputs(B=2, S=16, H=64, F=256, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, S, H).astype(np.float32) * 0.5),
            jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(F).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(H).astype(np.float32) * 0.1),
            jnp.asarray(rng.rand(H).astype(np.float32) + 0.5),
            jnp.asarray(rng.randn(H).astype(np.float32) * 0.1))


@pytest.mark.parametrize("approximate", [False, True])
def test_interpret_parity(approximate):
    args = _inputs()
    ref = _reference_ffn(*args, 1e-12, approximate)
    with pltpu.force_tpu_interpret_mode():
        got = fused_ffn(*args, approximate=approximate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_erf_poly_accuracy():
    x = jnp.linspace(-5, 5, 2001)
    err = jnp.abs(_erf_poly(x) - jax.scipy.special.erf(x))
    # A&S 7.1.26 claims 1.5e-7 in exact arithmetic; f32 rounding adds a
    # little. Far below bf16 output resolution either way.
    assert float(err.max()) < 5e-7


def test_vjp_matches_reference():
    args = _inputs(B=1, S=8, H=32, F=64)

    def loss_p(*a):
        with pltpu.force_tpu_interpret_mode():
            return fused_ffn(*a).sum()

    def loss_r(*a):
        return _reference_ffn(*a, 1e-12, False).sum()

    gp = jax.grad(loss_p, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)


def test_row_padding_path():
    """M not a multiple of the tile: padded rows don't leak into outputs."""
    args = _inputs(B=1, S=9, H=64, F=128)
    ref = _reference_ffn(*args, 1e-12, False)
    with pltpu.force_tpu_interpret_mode():
        got = fused_ffn(*args)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_bert_layer_param_tree_unchanged_and_paths_agree():
    """The _DenseParams/_LNParams refactor keeps nn.Dense's exact param
    tree, and ffn_impl='dense' matches ffn_impl='fused' (interpret)."""
    import dataclasses

    from cpt_tpu.config.bert import tiny_bert_config
    from cpt_tpu.models.bert.model import BertLayer

    cfg = tiny_bert_config(hidden_size=64, num_attention_heads=4,
                           intermediate_size=128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 64).astype(np.float32) * 0.5)
    bias = jnp.zeros((2, 1, 1, 10), jnp.float32)

    layer_d = BertLayer(dataclasses.replace(cfg, ffn_impl="dense"))
    params = layer_d.init(jax.random.PRNGKey(0), x, bias)
    sub = params["params"]
    assert set(sub["intermediate"]) == {"kernel", "bias"}
    assert sub["intermediate"]["kernel"].shape == (64, 128)
    assert set(sub["output"]) == {"kernel", "bias"}
    assert set(sub["output_LayerNorm"]) == {"scale", "bias"}

    out_d = layer_d.apply(params, x, bias)
    layer_f = BertLayer(dataclasses.replace(cfg, ffn_impl="fused"))
    with pltpu.force_tpu_interpret_mode():
        out_f = layer_f.apply(params, x, bias)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               atol=3e-5, rtol=3e-5)


def test_interpret_parity_bf16():
    """bf16 inputs through the kernel track the bf16 reference path."""
    args = _inputs()
    args = (args[0].astype(jnp.bfloat16), args[1].astype(jnp.bfloat16),
            args[2], args[3].astype(jnp.bfloat16), *args[4:])
    ref = _reference_ffn(*args, 1e-12, False)
    with pltpu.force_tpu_interpret_mode():
        got = fused_ffn(*args)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05)
