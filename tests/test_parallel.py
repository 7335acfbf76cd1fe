"""SPMD tests on the 8-virtual-device CPU mesh: param sharding rules,
dp-sharded eval equivalence, dp+tp train step, process_allgather."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cpt_tpu.config.bert import tiny_bert_config
from cpt_tpu.models.bert.heads import REC_MLM_CPT
from cpt_tpu.parallel import mesh as meshlib

CFG = tiny_bert_config(vocab_size=192, num_attention_heads=4, hidden_size=32)


@pytest.fixture(scope="module")
def model_and_params():
    model = REC_MLM_CPT(CFG)
    B, T, R = 8, 10, 4
    ids = jnp.ones((B, T), jnp.int32)
    tt = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T + R), jnp.int32)
    feats = jnp.ones((B, R, CFG.img_feature_dim))
    params = model.init(jax.random.PRNGKey(0), ids, tt, mask, feats)
    return model, params


def test_param_specs_rules(model_and_params):
    _, params = model_and_params
    specs = meshlib.param_specs(params["params"])
    qkv = specs["bert"]["encoder"]["layer_0"]["attention"]["qkv"]["kernel"]
    assert qkv == P(None, None, "tp", None)
    out = specs["bert"]["encoder"]["layer_0"]["attention"]["out"]["kernel"]
    assert out == P("tp", None, None)
    inter = specs["bert"]["encoder"]["layer_0"]["intermediate"]["kernel"]
    assert inter == P(None, "tp")
    # embeddings replicated
    emb = specs["bert"]["embeddings"]["word_embeddings"]["embedding"]
    assert emb == P()


def test_dp_sharded_eval_matches_single(model_and_params, devices8):
    from cpt_tpu.engine.scoring import make_mlm_at_mask_fn

    model, params = model_and_params
    mesh = meshlib.make_mesh(dp=8, tp=1, devices=devices8)
    rng = np.random.RandomState(0)
    B, T, R = 16, 10, 4
    batch = (
        jnp.asarray(rng.randint(0, 150, (B, T)).astype(np.int32)),
        jnp.zeros((B, T), jnp.int32),
        jnp.ones((B, T + R), jnp.int32),
        jnp.asarray(rng.randn(B, R, CFG.img_feature_dim).astype(np.float32)),
        jnp.full((B,), 3, jnp.int32),
    )
    single = make_mlm_at_mask_fn(model)(params, *batch)
    sharded = make_mlm_at_mask_fn(model, mesh=mesh)(params, *batch)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_dp_tp_train_step(model_and_params, devices8):
    from cpt_tpu.engine import train as train_lib

    model, fixture_params = model_and_params
    # never hand the shared fixture params to a donating step
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                    fixture_params)
    mesh = meshlib.make_mesh(dp=4, tp=2, devices=devices8)
    ocfg = train_lib.OptimConfig(learning_rate=1e-3, warmup_steps=1,
                                 num_train_steps=5)
    tx = train_lib.build_optimizer(params, ocfg)
    state = train_lib.create_train_state(params, tx)
    step = train_lib.make_mlm_train_step(model, tx, dropout=False)

    B, T, R = 8, 10, 4
    rng = np.random.RandomState(1)
    batch = (
        jnp.asarray(rng.randint(0, 150, (B, T)).astype(np.int32)),
        jnp.zeros((B, T), jnp.int32),
        jnp.ones((B, T + R), jnp.int32),
        jnp.asarray(rng.randn(B, R, CFG.img_feature_dim).astype(np.float32)),
        jnp.full((B,), 3, jnp.int32),
        jnp.full((B,), 7, jnp.int32),
    )
    def deep_copy(tree):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)

    with mesh:
        # real copies: device_put may alias, and train steps donate their
        # input state
        sharded_params = meshlib.shard_params(deep_copy(params), mesh)
        state_sh = train_lib.TrainState(
            params=sharded_params,
            opt_state=jax.device_put(deep_copy(state.opt_state),
                                     meshlib.replicated(mesh)),
            step=jax.device_put(deep_copy(state.step),
                                meshlib.replicated(mesh)))

    # unsharded baseline
    s0, loss0 = step(state, batch, jax.random.PRNGKey(2))

    with mesh:
        batch_sh = meshlib.shard_batch(batch, mesh)
        s1, loss1 = step(state_sh, batch_sh, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)
    # updated params agree
    l0 = jax.tree_util.tree_leaves(s0.params)[3]
    l1 = jax.tree_util.tree_leaves(s1.params)[3]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               atol=1e-5, rtol=1e-4)


def test_process_allgather_single_process():
    tree = {"a": jnp.arange(3)}
    out = meshlib.process_allgather(tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), [0, 1, 2])


@pytest.mark.slow
def test_fsdp_sharded_train_step_matches(model_and_params, devices8):
    """FSDP-style param sharding: same loss/updates as unsharded."""
    from cpt_tpu.engine import train as train_lib

    model, params = model_and_params
    mesh = meshlib.make_mesh(dp=8, tp=1, devices=devices8)
    ocfg = train_lib.OptimConfig(learning_rate=1e-3, warmup_steps=1,
                                 num_train_steps=5)
    tx = train_lib.build_optimizer(params, ocfg)
    step = train_lib.make_mlm_train_step(model, tx, dropout=False)

    B, T, R = 8, 10, 4
    rng = np.random.RandomState(3)
    batch = (
        jnp.asarray(rng.randint(0, 150, (B, T)).astype(np.int32)),
        jnp.zeros((B, T), jnp.int32),
        jnp.ones((B, T + R), jnp.int32),
        jnp.asarray(rng.randn(B, R, CFG.img_feature_dim).astype(np.float32)),
        jnp.full((B,), 3, jnp.int32),
        jnp.full((B,), 7, jnp.int32),
    )

    def deep_copy(tree):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)

    with mesh:
        fsdp_params = meshlib.shard_params_fsdp(deep_copy(params), mesh,
                                                min_size=256)
        # at least one kernel really is dp-sharded
        specs = meshlib.fsdp_specs(params, 8, min_size=256)
        assert any("dp" in str(s) for s in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda s: s, specs,
                                   is_leaf=lambda x: isinstance(x, P))))
        state_sh = train_lib.create_train_state(fsdp_params, tx)
        batch_sh = meshlib.shard_batch(batch, mesh)

    state = train_lib.create_train_state(deep_copy(params), tx)
    s0, loss0 = step(state, batch, jax.random.PRNGKey(5))
    with mesh:
        s1, loss1 = step(state_sh, batch_sh, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)
    l0 = jax.tree_util.tree_leaves(s0.params)[5]
    l1 = jax.tree_util.tree_leaves(s1.params)[5]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5,
                               rtol=1e-4)


@pytest.mark.slow
def test_sharded_extraction_over_dp_mesh():
    """Copies shard over dp; outputs match the single-device path."""
    import numpy as np

    from cpt_tpu.engine.extract import make_extract_fn, make_sharded_extract_fn
    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.parallel.mesh import make_mesh

    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    m = cfg.max_force_boxes
    h = w = cfg.input.buckets[0][0]
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((h, w, 3)),
        jnp.asarray([h, w]), jnp.zeros((m, 4)), jnp.ones((m,), bool))

    c = 8
    img = jnp.asarray(rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
    rects = jnp.asarray(
        np.sort(rng.uniform(0, h - 8, (c, 1, 2, 2)), axis=2)
        .transpose(0, 1, 3, 2).reshape(c, 1, 4).astype(np.float32))
    rv = jnp.ones((c, 1), bool)
    colors = jnp.asarray(np.tile(np.asarray([240, 0, 30, 127], np.uint8),
                                 (c, 1, 1)))
    cv = jnp.ones((c,), bool)
    masks = jnp.zeros((c, h, w), jnp.uint8)
    mc = jnp.zeros((c, 4), jnp.uint8)
    dets = jnp.asarray(np.sort(rng.uniform(0, h - 4, (m, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(m, 4).astype(np.float32))
    dv = jnp.ones((m,), bool)
    hw = jnp.asarray([h, w])
    args = (params, img, rects, rv, colors, cv, masks, mc, dets, dv, hw)

    single = make_extract_fn(model, cfg)(*args)
    mesh = make_mesh(dp=8)
    sharded = make_sharded_extract_fn(model, cfg, mesh)(*args)
    for s, d in zip(single, sharded):
        np.testing.assert_allclose(np.asarray(s), np.asarray(d),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_extractor_with_mesh_matches_plain():
    import numpy as np

    from cpt_tpu.engine.extract import Extractor, refcoco_task
    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.parallel.mesh import make_mesh

    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    h = w = cfg.input.buckets[0][0]
    rng = np.random.RandomState(3)
    image = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    dets = np.asarray([[4.0, 4.0, 24.0, 24.0], [30.0, 8.0, 50.0, 30.0]],
                      np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((h, w, 3)), jnp.asarray([h, w]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    def mk():
        return refcoco_task("q", image, (h, w), dets, "cap")

    plain = Extractor(model, params, cfg, copies_per_chunk=2)
    pf, pl, ps = plain.extract_task(mk())
    mesh = make_mesh(dp=2, devices=jax.devices()[:2])
    sharded = Extractor(model, params, cfg, copies_per_chunk=2, mesh=mesh)
    sf, sl, ss = sharded.extract_task(mk())
    np.testing.assert_array_equal(pl, sl)
    np.testing.assert_allclose(pf, sf, rtol=2e-3, atol=2e-3)
