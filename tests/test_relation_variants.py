"""IMP / MSDN / GRCNN relation variants + learned RelPN."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.models.detector.relation_variants import (
    GRCNNHead, IMPHead, MSDNHead, Relationshipness, incidence_maps,
    relpn_select_pairs)

N, P, F = 6, 8, 32
RNG = np.random.RandomState(0)
OBJ = jnp.asarray(RNG.randn(N, F).astype(np.float32))
PRED = jnp.asarray(RNG.randn(P, F).astype(np.float32))
PAIRS = jnp.asarray(RNG.randint(0, N, (P, 2)).astype(np.int32))
OV = jnp.ones((N,), bool)
PV = jnp.asarray([True] * 6 + [False] * 2)


def test_incidence_maps():
    s, o = incidence_maps(PAIRS, N, PV)
    assert s.shape == (N, P) and o.shape == (N, P)
    # each valid pair contributes exactly one subject and one object
    np.testing.assert_array_equal(np.asarray(s.sum(0)),
                                  np.asarray(PV, np.float32))
    assert float(s[:, 6].sum()) == 0.0  # invalid pair zeroed


@pytest.mark.parametrize("cls,kw", [
    (IMPHead, dict(dim=16, update_step=2)),
    (MSDNHead, dict(dim=16, update_step=2)),
    (GRCNNHead, dict(dim=16, feat_update_step=1, score_update_step=1)),
])
@pytest.mark.slow
def test_variant_shapes_and_grads(cls, kw):
    head = cls(num_obj_classes=7, num_rel_classes=5, **kw)
    params = jax.jit(head.init)(jax.random.PRNGKey(0), OBJ, PRED, PAIRS,
                                OV, PV)
    obj_logits, rel_logits = head.apply(params, OBJ, PRED, PAIRS, OV, PV)
    assert obj_logits.shape == (N, 7) and rel_logits.shape == (P, 5)
    assert np.isfinite(np.asarray(obj_logits)).all()

    def loss(p):
        o, r = head.apply(p, OBJ, PRED, PAIRS, OV, PV)
        return (o ** 2).sum() + (r ** 2).sum()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_message_passing_actually_passes_messages():
    """Perturbing one object's features must move a connected pair's
    relation logits (through the graph, not just the readout)."""
    head = IMPHead(num_obj_classes=7, num_rel_classes=5, dim=16,
                   update_step=1)
    pairs = jnp.asarray([[0, 1]] + [[2, 3]] * 7, np.int32)
    params = jax.jit(head.init)(jax.random.PRNGKey(0), OBJ, PRED, pairs,
                                OV, PV)
    _, r1 = head.apply(params, OBJ, PRED, pairs, OV, PV)
    obj2 = OBJ.at[0].add(3.0)
    _, r2 = head.apply(params, obj2, PRED, pairs, OV, PV)
    # pair 0 involves object 0 -> changed; pair 1 does not -> unchanged
    assert float(jnp.abs(r1[0] - r2[0]).max()) > 1e-5
    np.testing.assert_allclose(np.asarray(r1[1]), np.asarray(r2[1]),
                               atol=1e-5)


def test_relationshipness_and_relpn_select():
    model = Relationshipness(pos_encoding=True)
    boxes = jnp.asarray(np.sort(RNG.uniform(0, 60, (N, 2, 2)), axis=1)
                        .transpose(0, 2, 1).reshape(N, 4).astype(np.float32))
    hw = jnp.asarray([64.0, 64.0])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), OBJ, boxes, hw)
    rel = model.apply(params, OBJ, boxes, hw)
    assert rel.shape == (N, N)
    assert float(rel.min()) >= 0.0 and float(rel.max()) <= 1.0

    # select: force a known maximum, mask an object out
    relness = jnp.full((N, N), 0.1).at[2, 4].set(0.9).at[0, 0].set(1.0)
    ov = jnp.asarray([True, True, True, True, True, False])
    pairs, scores, valid = relpn_select_pairs(relness, ov, top_k=3)
    assert pairs.shape == (3, 2)
    np.testing.assert_array_equal(np.asarray(pairs[0]), [2, 4])  # diag excl.
    assert not any((a == b) for a, b in np.asarray(pairs))
    assert 5 not in np.asarray(pairs)  # invalid object never selected


def _motif_inputs():
    head = __import__("cpt_tpu.models.detector.motif",
                      fromlist=["NeuralMotifHead"])
    rng = np.random.RandomState(3)
    obj = jnp.asarray(rng.randn(N, F).astype(np.float32))
    dists = jax.nn.softmax(jnp.asarray(rng.randn(N, 7).astype(np.float32)))
    boxes = jnp.asarray(np.sort(rng.uniform(0, 60, (N, 2, 2)), axis=1)
                        .transpose(0, 2, 1).reshape(N, 4).astype(np.float32))
    hw = jnp.asarray([64.0, 64.0])
    ov = jnp.asarray([True] * 5 + [False])
    uf = jnp.asarray(rng.randn(P, F).astype(np.float32))
    pairs = jnp.asarray(rng.randint(0, 5, (P, 2)).astype(np.int32))
    pv = jnp.ones((P,), bool)
    return head, obj, dists, boxes, hw, ov, uf, pairs, pv


@pytest.mark.slow
def test_motif_head_eval_and_teacher_forcing():
    mod, obj, dists, boxes, hw, ov, uf, pairs, pv = _motif_inputs()
    head = mod.NeuralMotifHead(num_obj_classes=7, num_rel_classes=5,
                               obj_dim=F, hidden_dim=16)
    params = jax.jit(head.init)(jax.random.PRNGKey(0), obj, dists, boxes,
                                hw, ov, uf, pairs, pv)
    o, r, preds = head.apply(params, obj, dists, boxes, hw, ov, uf, pairs, pv)
    assert o.shape == (N, 7) and r.shape == (P, 5) and preds.shape == (N,)
    assert np.isfinite(np.asarray(r)).all()
    # greedy decode never emits background for valid slots
    assert (np.asarray(preds)[:5] >= 1).all()

    gt = jnp.asarray([1, 2, 3, 4, 5, 0], jnp.int32)

    def loss(p):
        ologits, rlogits, _ = head.apply(p, obj, dists, boxes, hw, ov, uf,
                                         pairs, pv, gt)
        return (ologits ** 2).sum() + (rlogits ** 2).sum()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_motif_sort_orders():
    from cpt_tpu.models.detector.motif import sort_rois

    boxes = jnp.asarray([[10, 0, 20, 10], [0, 0, 4, 4], [30, 0, 50, 40]],
                        jnp.float32)
    valid = jnp.asarray([True, True, True])
    perm, inv = sort_rois(boxes, valid, order="leftright")
    np.testing.assert_array_equal(np.asarray(perm), [1, 0, 2])
    np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)],
                                  [0, 1, 2])
    perm_s, _ = sort_rois(boxes, valid, order="size")
    assert int(perm_s[0]) == 2  # biggest first
    # invalid slots always last
    perm_v, _ = sort_rois(boxes, jnp.asarray([True, False, True]),
                          order="leftright")
    assert int(perm_v[-1]) == 1


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["sg_imp", "sg_msdn", "sg_grcnn", "sg_nm"])
def test_scene_parser_algorithm_switch(algo):
    """Every relation algorithm plugs into SceneParser end to end."""
    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.models.detector.scene_parser import SceneParser

    from cpt_tpu.models.detector.rpn import grid_anchors

    cfg = tiny_detector_config()
    sp = SceneParser(cfg, num_rel_classes=5, max_rel_dets=4,
                     algorithm=algo)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32) * 10)
    hw = jnp.asarray([60, 60])
    anchors = jnp.asarray(grid_anchors(cfg.rpn, 4, 4))
    params = jax.jit(sp.init)(jax.random.PRNGKey(0), img, hw, anchors)
    out = sp.apply(params, img, hw, anchors)
    assert out["rel_logits"].shape == (12, 5)        # 4*3 ordered pairs
    assert np.isfinite(np.asarray(out["rel_logits"])).all()


def test_relpn_loss():
    from cpt_tpu.models.detector.relation_variants import relpn_loss

    n = 4
    relness = jnp.full((n, n), 0.5)
    adj = jnp.zeros((n, n)).at[0, 1].set(1.0)
    ov = jnp.asarray([True, True, True, False])
    loss = relpn_loss(relness, adj, ov)
    # all off-diagonal valid cells have BCE(-log 0.5); uniform prediction
    assert float(loss) == pytest.approx(float(np.log(2.0)), abs=1e-5)
    # perfect prediction -> ~0
    perfect = jnp.where(adj > 0, 1 - 1e-7, 1e-7)
    assert float(relpn_loss(perfect, adj, ov)) < 1e-5
    # gradients finite
    g = jax.grad(lambda r: relpn_loss(r, adj, ov))(relness)
    assert np.isfinite(np.asarray(g)).all()
