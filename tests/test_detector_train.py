"""Detector-training tests: matcher/sampler/losses semantics, solver
schedule, checkpoint roundtrip, and a short end-to-end training run."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.engine import solver as solver_lib
from cpt_tpu.engine.detector_train import do_train, freeze_mask
from cpt_tpu.engine.train import TrainState
from cpt_tpu.models.detector import losses as L
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN, AttrRCNNTrainer
from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.models.detector.rpn import grid_anchors
from cpt_tpu.utils import checkpoint as ckpt_lib


def test_matcher_thresholds():
    iou = jnp.asarray([[0.8, 0.4, 0.1, 0.0],
                       [0.2, 0.6, 0.35, 0.0]])
    out = L.match_proposals(iou, high=0.5, low=0.3)
    assert out.tolist() == [0, 1, L.BETWEEN, L.BELOW_LOW]


def test_matcher_allow_low_quality():
    iou = jnp.asarray([[0.2, 0.1], [0.05, 0.28]])
    strict = L.match_proposals(iou, 0.5, 0.3)
    assert strict.tolist() == [L.BELOW_LOW, L.BELOW_LOW]
    lax_match = L.match_proposals(iou, 0.5, 0.3, allow_low_quality=True)
    # each gt's best prediction is force-matched
    assert lax_match.tolist() == [0, 1]


def test_balanced_sample_counts():
    matches = jnp.asarray([0, 1, -1, -1, -1, -1, 2, -2])
    pos, neg = L.balanced_sample(matches, jax.random.PRNGKey(0),
                                 batch_size=4, positive_fraction=0.5)
    assert int(pos.sum()) == 2  # min(3 positives, 4*0.5)
    assert int(neg.sum()) == 2  # batch_size - num_pos
    assert not bool((pos & neg).any())
    # BETWEEN (-2) never sampled
    assert not bool(pos[7]) and not bool(neg[7])


def test_smooth_l1_values():
    out = L.smooth_l1(jnp.asarray([0.0, 2.0]), jnp.asarray([0.05, 0.0]),
                      beta=1.0)
    np.testing.assert_allclose(np.asarray(out), [0.5 * 0.05 ** 2, 1.5],
                               rtol=1e-5)


def test_rpn_loss_finite(rng):
    a = grid_anchors(tiny_detector_config().rpn, 4, 4)
    n = a.shape[0]
    obj = jnp.asarray(rng.randn(n).astype(np.float32))
    deltas = jnp.asarray(rng.randn(n, 4).astype(np.float32) * 0.1)
    gt = jnp.asarray([[4.0, 4.0, 30.0, 30.0], [0, 0, 0, 0]])
    gt_valid = jnp.asarray([True, False])
    lo, lb = L.rpn_loss(obj, deltas, jnp.asarray(a), gt, gt_valid,
                        jax.random.PRNGKey(1))
    assert np.isfinite(float(lo)) and np.isfinite(float(lb))


def test_attribute_loss_soft_targets():
    logits = jnp.asarray(np.zeros((2, 5), np.float32))
    gt_attrs = jnp.asarray([[1, 3, 0], [0, 0, 0]])
    valid = jnp.asarray([True, True])
    loss = L.attribute_loss(logits, gt_attrs, valid)
    # uniform logits → CE = log(5) for the box with attributes; other box 0
    np.testing.assert_allclose(float(loss), np.log(5) / 2, rtol=1e-5)


def test_warmup_multistep_schedule():
    cfg = solver_lib.SolverConfig(base_lr=1.0, warmup_iters=10,
                                  warmup_factor=0.5, steps=(100, 200),
                                  gamma=0.1)
    sched = solver_lib.warmup_multistep_lr(cfg)
    assert abs(float(sched(0)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(150)) - 0.1) < 1e-6
    assert abs(float(sched(250)) - 0.01) < 1e-7


@pytest.mark.slow
def test_freeze_mask_structure():
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), image, jnp.asarray([60, 60]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))
    mask = freeze_mask(params, freeze_conv_body_at=2)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]

    def lookup(*frags):
        return [v for kp, v in flat
                if all(any(f in str(getattr(k, "key", k)) for k in kp)
                       for f in frags)]

    assert not any(lookup("backbone", "stem"))
    assert not any(lookup("backbone", "layer1"))
    assert any(lookup("backbone", "layer2", "conv1"))
    assert not any(lookup("layer2", "bn1"))      # BN affines always frozen
    assert all(lookup("rpn", "conv", "kernel"))


@pytest.mark.slow
def test_detector_training_reduces_loss(tmp_path):
    cfg = tiny_detector_config()
    trainer = AttrRCNNTrainer(cfg)
    rngs = np.random.RandomState(0)
    image = jnp.asarray(rngs.randn(64, 64, 3).astype(np.float32) * 20)
    hw = jnp.asarray([64, 64])
    gt_boxes = jnp.asarray([[8.0, 8.0, 30.0, 30.0], [34.0, 30.0, 60.0, 58.0]])
    gt_labels = jnp.asarray([1, 3])
    gt_valid = jnp.asarray([True, True])
    gt_attrs = jnp.asarray([[1, 0], [2, 4]])
    anchors = jnp.asarray(grid_anchors(cfg.rpn, 4, 4))

    params = jax.jit(trainer.init)(
        jax.random.PRNGKey(0), image, hw, gt_boxes, gt_labels, gt_valid,
        gt_attrs, anchors, jax.random.PRNGKey(1))

    batch = (image, hw, gt_boxes, gt_labels, gt_valid, gt_attrs, anchors)
    solver = solver_lib.SolverConfig(base_lr=0.02, warmup_iters=2,
                                     steps=(1000,), max_iter=12,
                                     weight_decay=0.0)
    logs = []
    state = do_train(trainer, params, iter([batch] * 12), solver=solver,
                     checkpoint_dir=str(tmp_path / "ckpt"),
                     checkpoint_period=6, log_period=4,
                     logger=logs.append)
    assert int(state.step) == 12
    assert ckpt_lib.has_checkpoint(str(tmp_path / "ckpt"))
    assert ckpt_lib.last_checkpoint_name(str(tmp_path / "ckpt")) == "model_final"
    assert any("loss" in line for line in logs)

    # inference params and trainer params share one tree: run inference
    model = AttrRCNN(cfg)
    out = model.apply(state.params, image, hw,
                      jnp.asarray([[8.0, 8.0, 30.0, 30.0]] * cfg.max_force_boxes),
                      jnp.ones((cfg.max_force_boxes,), bool))
    assert out["boxes"].shape == (cfg.max_force_boxes, 4)


def test_checkpoint_roundtrip(tmp_path):
    state = TrainState(
        params={"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}},
        opt_state={"m": jnp.zeros(3)},
        step=jnp.asarray(7, jnp.int32))
    ckpt_lib.save_checkpoint(str(tmp_path), "model_0000007", state)
    blank = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = ckpt_lib.restore_checkpoint(str(tmp_path), blank)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["a"]),
                                  np.arange(4.0))

    # keep_last pruning
    ckpt_lib.save_checkpoint(str(tmp_path), "model_0000008", state)
    ckpt_lib.save_checkpoint(str(tmp_path), "model_0000009", state,
                             keep_last=2)
    assert len(ckpt_lib.list_checkpoints(str(tmp_path))) == 2


@pytest.mark.slow
def test_train_detector_cli(tmp_path):
    from cpt_tpu.tools.train_detector import main

    state = main(["--tiny", "--synthetic", "1", "--max_iter", "3",
                  "--steps", "100", "--warmup_iters", "1",
                  "--checkpoint_period", "3",
                  "--output_dir", str(tmp_path / "ck"),
                  "--dtype", "float32"])
    assert int(state.step) == 3
    from cpt_tpu.utils import checkpoint as ckpt_lib

    assert ckpt_lib.has_checkpoint(str(tmp_path / "ck"))


def test_save_load_model_roundtrip(tmp_path):
    import jax.numpy as jnp
    from cpt_tpu.config.bert import tiny_bert_config
    from cpt_tpu.utils import checkpoint as ckpt_lib

    params = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
    ckpt_lib.save_model(str(tmp_path), params, tiny_bert_config())
    blank = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = ckpt_lib.load_model(str(tmp_path), blank)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    import os
    assert os.path.exists(tmp_path / "config.json")


@pytest.mark.slow
def test_batched_dp_sharded_train_step():
    """Image-batched detector training sharded over a dp mesh: loss is
    finite and params update; matches the unsharded batched step."""
    from cpt_tpu.engine.detector_train import (
        TrainState, build_detector_optimizer, freeze_mask,
        make_detector_train_step_batched)
    from cpt_tpu.engine.solver import SolverConfig
    from cpt_tpu.models.detector.attr_rcnn import AttrRCNNTrainer
    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.models.detector.rpn import grid_anchors
    from cpt_tpu.parallel.mesh import make_mesh

    cfg = tiny_detector_config()
    model = AttrRCNNTrainer(cfg)
    rng = np.random.RandomState(0)
    b, g = 4, 3
    h = w = 64
    anchors = jnp.asarray(grid_anchors(cfg.rpn, 4, 4))
    imgs = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    hws = jnp.tile(jnp.asarray([60, 60]), (b, 1))
    gtb = jnp.asarray(np.sort(rng.uniform(0, 56, (b, g, 2, 2)), axis=2)
                      .transpose(0, 1, 3, 2).reshape(b, g, 4)
                      .astype(np.float32))
    gtl = jnp.asarray(rng.randint(1, 6, (b, g)).astype(np.int32))
    gtv = jnp.ones((b, g), bool)
    gta = jnp.zeros((b, g, cfg.attributes.max_num_attr_per_obj), jnp.int32)
    batch = (imgs, hws, gtb, gtl, gtv, gta, anchors)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[0], hws[0],
                                 gtb[0], gtl[0], gtv[0], gta[0], anchors,
                                 jax.random.PRNGKey(1))
    solver = SolverConfig(base_lr=0.01, max_iter=4)
    tx = build_detector_optimizer(params, solver)
    trainable = freeze_mask(params, 2)

    import copy

    def fresh_state():
        p = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        return TrainState(p, tx.init(p), jnp.zeros((), jnp.int32))

    plain = make_detector_train_step_batched(model, tx, trainable)
    s1, t1, _ = plain(fresh_state(), batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(t1))

    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    sharded = make_detector_train_step_batched(model, tx, trainable, mesh)
    s2, t2, _ = sharded(fresh_state(), batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-4)
