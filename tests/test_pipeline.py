"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a pp
mesh axis must reproduce the sequential encoder exactly — forward, grads,
and the full REC_MLM_CPT scoring composition."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.config.bert import tiny_bert_config
from cpt_tpu.models.bert.model import BertEncoder, extend_attention_mask
from cpt_tpu.parallel.pipeline import (make_pp_encoder_fn, make_pp_mesh,
                                       make_pp_scoring_fn,
                                       stack_layer_params,
                                       unstack_layer_params)

CFG = tiny_bert_config(vocab_size=128, hidden_size=64,
                       num_attention_heads=4, intermediate_size=128,
                       num_hidden_layers=4, img_feature_dim=16)
B, S = 8, 10


def _encoder_setup(seed=0):
    rng = np.random.RandomState(seed)
    enc = BertEncoder(CFG)
    hidden = jnp.asarray(rng.randn(B, S, CFG.hidden_size).astype(np.float32))
    mask = np.ones((B, S), np.int32)
    mask[:, -2:] = 0
    bias = extend_attention_mask(jnp.asarray(mask), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), hidden, bias)
    return enc, params, hidden, bias


@pytest.mark.parametrize("dp,pp,n_micro", [(2, 2, 2), (1, 4, 4), (2, 2, 4)])
def test_pp_encoder_matches_sequential(dp, pp, n_micro):
    enc, params, hidden, bias = _encoder_setup()
    want = enc.apply(params, hidden, bias)

    mesh = make_pp_mesh(dp, pp, devices=jax.devices()[: dp * pp])
    stacked = stack_layer_params(params["params"], CFG.num_hidden_layers)
    fn = jax.jit(make_pp_encoder_fn(CFG, mesh, n_micro))
    with mesh:
        got = fn(stacked, hidden, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_stack_roundtrip():
    _, params, _, _ = _encoder_setup()
    stacked = stack_layer_params(params["params"], CFG.num_hidden_layers)
    back = unstack_layer_params(stacked, CFG.num_hidden_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params["params"], back)


def test_pp_encoder_grads_match_sequential():
    """Reverse-mode through scan + ppermute + psum: parameter grads from
    the pipelined program equal the sequential encoder's."""
    enc, params, hidden, bias = _encoder_setup()
    L = CFG.num_hidden_layers
    mesh = make_pp_mesh(2, 2, devices=jax.devices()[:4])
    fn = make_pp_encoder_fn(CFG, mesh, n_micro=2)

    def loss_pp(stacked):
        with mesh:
            return jnp.sum(fn(stacked, hidden, bias) ** 2)

    def loss_seq(p):
        return jnp.sum(enc.apply({"params": p}, hidden, bias) ** 2)

    stacked = stack_layer_params(params["params"], L)
    g_pp = unstack_layer_params(jax.grad(loss_pp)(stacked), L)
    g_seq = jax.grad(loss_seq)(params["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        g_seq, g_pp)


def test_pp_scoring_matches_rec_mlm():
    from cpt_tpu.models.bert.heads import REC_MLM_CPT

    rng = np.random.RandomState(1)
    model = REC_MLM_CPT(CFG)
    txt, img = 8, 4
    ids = jnp.asarray(rng.randint(0, CFG.vocab_size, (B, txt)), jnp.int32)
    tt = jnp.zeros((B, txt), jnp.int32)
    mask = jnp.ones((B, txt + img), jnp.int32)
    feats = jnp.asarray(rng.randn(B, img, CFG.img_feature_dim), jnp.float32)
    mask_pos = jnp.full((B,), 3, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, tt, mask, feats)
    _, want = model.apply(params, ids, tt, mask, feats, mask_pos=mask_pos)

    mesh = make_pp_mesh(2, 2, devices=jax.devices()[:4])
    stacked = stack_layer_params(
        params["params"]["bert"]["encoder"], CFG.num_hidden_layers)
    fn = make_pp_scoring_fn(CFG, mesh, n_micro=2)
    with mesh:
        got = fn(params, stacked, ids, tt, mask, feats, mask_pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
