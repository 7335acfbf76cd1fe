"""RelDN relation head: spatial features, pairing, frequency bias, loss,
and a learnability check."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.models.detector.relation_head import (RelDNHead, all_pairs,
                                                   boxes_union,
                                                   match_pair_labels,
                                                   relation_loss,
                                                   spatial_pair_features)

CFG = tiny_detector_config()
D = CFG.backbone.out_channels * 2  # stage-5 output dim


def test_boxes_union():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[5.0, -2.0, 20.0, 8.0]])
    np.testing.assert_allclose(np.asarray(boxes_union(a, b)),
                               [[0, -2, 20, 10]])


def test_spatial_features_shape_and_values():
    subj = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 20.0, 20.0]])
    obj = jnp.asarray([[10.0, 0.0, 20.0, 10.0], [0.0, 0.0, 30.0, 30.0]])
    feats = spatial_pair_features(subj, obj, jnp.asarray([64, 64]))
    assert feats.shape == (2, 28)
    # box-feature block: subject x1/w
    np.testing.assert_allclose(float(feats[0, 18]), 0.0, atol=1e-6)
    assert np.isfinite(np.asarray(feats)).all()


def test_all_pairs():
    p = all_pairs(3)
    assert p.shape == (6, 2)
    assert not any(int(a) == int(b) for a, b in np.asarray(p))


def test_match_pair_labels():
    det = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                       [50, 50, 60, 60]], jnp.float32)
    gt_boxes = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    gt_rels = jnp.asarray([[0, 1, 7]])  # gt0 --pred7--> gt1
    pairs = all_pairs(3)
    labels = match_pair_labels(pairs, det, gt_rels, gt_boxes,
                               jnp.asarray([True]))
    lab = dict(zip([tuple(p) for p in np.asarray(pairs).tolist()],
                   np.asarray(labels).tolist()))
    assert lab[(0, 1)] == 7          # matched relation
    assert lab[(1, 0)] == 0          # reversed direction = background
    assert lab[(0, 2)] == 0          # unmatched object


@pytest.fixture(scope="module")
def head_setup(rng):
    model = RelDNHead(CFG, num_rel_classes=6)
    n = 4
    feat_map = jnp.asarray(rng.randn(8, 8, CFG.backbone.out_channels)
                           .astype(np.float32))
    det_boxes = jnp.asarray(rng.uniform(0, 60, (n, 4)).astype(np.float32))
    det_boxes = det_boxes.at[:, 2:].set(det_boxes[:, :2] + 20)
    det_labels = jnp.asarray([1, 2, 3, 1])
    box_feats = jnp.asarray(rng.randn(n, D).astype(np.float32))
    pairs = all_pairs(n)
    valid = jnp.ones((pairs.shape[0],), bool)
    hw = jnp.asarray([64, 64])
    freq = jnp.asarray(rng.rand(CFG.roi_heads.num_classes,
                                CFG.roi_heads.num_classes, 6)
                       .astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), feat_map, det_boxes,
                                 det_labels, box_feats, pairs, valid, hw,
                                 freq)
    return model, params, (feat_map, det_boxes, det_labels, box_feats,
                           pairs, valid, hw, freq)


def test_reldn_forward_shapes(head_setup):
    model, params, args = head_setup
    logits = model.apply(params, *args)
    assert logits.shape == (12, 6)
    assert np.isfinite(np.asarray(logits)).all()


def test_reldn_frequency_bias_shifts_logits(head_setup):
    model, params, args = head_setup
    with_freq = model.apply(params, *args)
    without = model.apply(params, *args[:-1], None)
    assert not np.allclose(np.asarray(with_freq), np.asarray(without))


def test_reldn_learns(head_setup):
    model, params, args = head_setup
    feat_map, det_boxes, det_labels, box_feats, pairs, valid, hw, freq = args
    # synthetic rule: pair (0, 1) is predicate 2, everything else background
    labels = np.zeros((pairs.shape[0],), np.int32)
    labels[0] = 2  # pairs[0] == (0, 1)
    labels = jnp.asarray(labels)

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, *args)
            return relation_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt2 = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt2, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    logits = model.apply(params, *args)
    assert int(jnp.argmax(logits[0])) == 2


@pytest.mark.slow
def test_scene_parser_inference_and_training(rng):
    from cpt_tpu.models.detector.rpn import grid_anchors
    from cpt_tpu.models.detector.scene_parser import (SceneParser,
                                                      triplet_predictions)

    cfg = tiny_detector_config()
    model = SceneParser(cfg, num_rel_classes=6, max_rel_dets=4)
    image = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32) * 10)
    hw = jnp.asarray([60, 60])
    anchors = jnp.asarray(grid_anchors(cfg.rpn, 4, 4))
    freq = jnp.asarray(rng.rand(cfg.roi_heads.num_classes,
                                cfg.roi_heads.num_classes, 6)
                       .astype(np.float32))

    params = jax.jit(model.init)(jax.random.PRNGKey(0), image, hw, anchors,
                                 freq)
    out = model.apply(params, image, hw, anchors, freq)
    assert out["rel_logits"].shape == (4 * 3, 6)
    preds = triplet_predictions(out)
    for key, lg in preds.items():
        s, o = key.split("_")
        assert s != o and lg.shape == (6,)

    # relation training loss with forced boxes + frozen detector semantics
    det_boxes = jnp.asarray([[4, 4, 24, 24], [30, 8, 50, 30],
                             [10, 34, 40, 58], [2, 2, 10, 10]], jnp.float32)
    det_labels = jnp.asarray([1, 2, 3, 1])
    det_valid = jnp.asarray([True, True, True, False])
    gt_rels = jnp.asarray([[0, 1, 2]])
    loss = model.apply(params, image, hw, det_boxes, det_labels, det_valid,
                       gt_rels, det_boxes[:2], jnp.asarray([True, True]),
                       freq, method=model.relation_train_loss)
    assert np.isfinite(float(loss))


def test_balanced_pair_sample():
    from cpt_tpu.models.detector.relation_head import balanced_pair_sample

    labels = jnp.asarray([3, 5, 0, 0, 0, 0, 0, 0, -1, -1])
    keep = balanced_pair_sample(labels, jax.random.PRNGKey(0),
                                batch_size=6, positive_fraction=0.5)
    kept = np.asarray(labels)[np.asarray(keep)]
    assert (kept >= 0).all()                      # ignores never sampled
    assert (kept >= 1).sum() <= 3                  # <= bs * frac positives
    assert keep.sum() <= 6
    # all positives kept when under the cap
    assert (kept >= 1).sum() == 2


@pytest.mark.slow
def test_reldn_contrastive_losses():
    from cpt_tpu.models.detector.relation_head import (
        _grouped_margin_loss, reldn_contrastive_losses)

    # hand-computed group case: anchor 0 has pos affinity .9 / neg .3
    # -> loss max(0, .2 - (.9 - .3)) = 0; anchor 1 pos .4 / neg .5 ->
    # max(0, .2 - (-.1)) = .3; mean over (2 valid groups + dummy) = .1
    aff = jnp.asarray([0.9, 0.3, 0.4, 0.5])
    gid = jnp.asarray([0, 0, 1, 1])
    pos = jnp.asarray([True, False, True, False])
    neg = jnp.asarray([False, True, False, True])
    loss = _grouped_margin_loss(aff, gid, pos, neg, 2, 0.2)
    assert float(loss) == pytest.approx(0.3 / 3, abs=1e-6)

    # full API: shapes + finiteness + all six losses present
    rng = np.random.RandomState(0)
    n, p, r, c = 6, 12, 5, 7
    logits = jnp.asarray(rng.randn(p, r).astype(np.float32))
    pairs = jnp.asarray(rng.randint(0, n, (p, 2)).astype(np.int32))
    labels = jnp.asarray(rng.randint(0, r, (p,)).astype(np.int32))
    det_labels = jnp.asarray(rng.randint(1, c, (n,)).astype(np.int32))
    out = reldn_contrastive_losses(logits, pairs, labels,
                                   jnp.ones((p,), bool), det_labels, n,
                                   num_obj_classes=c, num_rel_classes=r)
    assert set(out) == {
        "loss_contrastive_sbj", "loss_contrastive_obj",
        "loss_so_contrastive_sbj", "loss_so_contrastive_obj",
        "loss_p_contrastive_sbj", "loss_p_contrastive_obj"}
    assert all(np.isfinite(float(v)) and float(v) >= 0
               for v in out.values())

    # gradient flows
    def f(lg):
        return sum(reldn_contrastive_losses(
            lg, pairs, labels, jnp.ones((p,), bool), det_labels, n,
            num_obj_classes=c, num_rel_classes=r).values())

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
