"""Detector training loop (``do_train`` parity).

Reference ``maskrcnn_benchmark/engine/trainer.py:44-``: iteration-based loop,
loss-dict sum, AMP (bf16 — no GradScaler needed on TPU), MetricLogger with
ETA, periodic checkpointing. Layer freezing reproduces
``FREEZE_CONV_BODY_AT=2`` (stem + layer1) plus the always-frozen BN affines
(reference FrozenBatchNorm buffers never train).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cpt_tpu.engine.solver import SolverConfig, build_detector_optimizer
from cpt_tpu.engine.train import TrainState
from cpt_tpu.utils import checkpoint as ckpt_lib
from cpt_tpu.utils.metrics import MetricLogger, Timer


def _path_has(kp, *names) -> bool:
    parts = [str(getattr(k, "key", k)) for k in kp]
    return any(n in parts for n in names)


def freeze_mask(params: Any, freeze_conv_body_at: int = 2) -> Any:
    """True = trainable. Freezes stem/layer1.. (per config) and every
    frozen-BN affine."""
    frozen_stages = ["stem"] + [f"layer{i}"
                                for i in range(1, freeze_conv_body_at)]

    def fn(kp, _leaf):
        parts = [str(getattr(k, "key", k)) for k in kp]
        if "backbone" in parts and any(s in parts for s in frozen_stages):
            return False
        # FrozenBN affines: bn*/downsample_bn scopes
        if any(p.startswith("bn") or p.endswith("_bn") for p in parts):
            return False
        return True

    return jax.tree_util.tree_map_with_path(fn, params)


def make_detector_train_step(trainer_model, tx, trainable: Any):
    """Jitted step: grads of the summed loss dict, frozen leaves zeroed."""

    def loss_fn(params, batch, rng):
        image, hw, gt_boxes, gt_labels, gt_valid, gt_attrs, anchors = batch
        losses = trainer_model.apply(params, image, hw, gt_boxes, gt_labels,
                                     gt_valid, gt_attrs, anchors, rng)
        total = sum(losses.values())
        return total, losses

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        grads = jax.tree_util.tree_map(
            lambda g, t: g if t else jnp.zeros_like(g), grads, trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), total, losses

    return step


def do_train(trainer_model, params, data_iter: Iterable, *,
             solver: SolverConfig, checkpoint_dir: Optional[str] = None,
             checkpoint_period: int = 10000, log_period: int = 20,
             freeze_conv_body_at: int = 2, seed: int = 0,
             logger: Optional[Callable[[str], None]] = print,
             metrics_jsonl: Optional[str] = None) -> TrainState:
    """Iteration-based training over ``data_iter`` yielding batch tuples
    (image, hw, gt_boxes, gt_labels, gt_valid, gt_attributes, anchors)."""
    tx = build_detector_optimizer(params, solver)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    if checkpoint_dir and ckpt_lib.has_checkpoint(checkpoint_dir):
        state = ckpt_lib.restore_checkpoint(checkpoint_dir, state)
        logger(f"resumed from {ckpt_lib.last_checkpoint_name(checkpoint_dir)}")

    trainable = freeze_mask(params, freeze_conv_body_at)
    step_fn = make_detector_train_step(trainer_model, tx, trainable)
    meters = MetricLogger()
    timer = Timer()
    rng = jax.random.PRNGKey(seed)
    jsonl = None
    if metrics_jsonl:
        from cpt_tpu.utils.metrics import JSONLLogger

        jsonl = JSONLLogger(metrics_jsonl)

    it = int(state.step)
    for batch in data_iter:
        if it >= solver.max_iter:
            break
        timer.tic()
        rng, sub = jax.random.split(rng)
        state, total, losses = step_fn(state, batch, sub)
        total.block_until_ready()
        meters.update(time=timer.toc(average=False), loss=float(total),
                      **{k: float(v) for k, v in losses.items()})
        it += 1
        if it % log_period == 0:
            logger(meters.log_line(it, solver.max_iter))
            if jsonl is not None:
                jsonl.log(it, loss=float(total),
                          **{k: float(v) for k, v in losses.items()})
        if checkpoint_dir and it % checkpoint_period == 0:
            ckpt_lib.save_checkpoint(checkpoint_dir, f"model_{it:07d}", state)
    if checkpoint_dir:
        ckpt_lib.save_checkpoint(checkpoint_dir, "model_final", state)
    return state


def make_detector_train_step_batched(trainer_model, tx, trainable: Any,
                                     mesh=None):
    """Image-batched (and optionally dp-sharded) detector train step: the
    reference's multi-GPU ``IMS_PER_BATCH`` + DDP gradient averaging
    becomes one jit over a batch with images sharded over the mesh's
    ``dp`` axis (gradient psums inserted by XLA). Batch tuple leaves carry
    a leading image axis; per-image RNGs are split inside."""

    def loss_fn(params, batch, rng):
        image, hw, gt_boxes, gt_labels, gt_valid, gt_attrs, anchors = batch
        b = image.shape[0]
        rngs = jax.random.split(rng, b)

        def one(img, h, gb, gl, gv, ga, anc, r):
            losses = trainer_model.apply(params, img, h, gb, gl, gv, ga,
                                         anc, r)
            return sum(losses.values()), losses

        totals, losses = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, None, 0)
                                  )(image, hw, gt_boxes, gt_labels,
                                    gt_valid, gt_attrs, anchors, rngs)
        mean_losses = jax.tree_util.tree_map(lambda x: x.mean(), losses)
        return totals.mean(), mean_losses

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        grads = jax.tree_util.tree_map(
            lambda g, t: g if t else jnp.zeros_like(g), grads, trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), total, losses

    if mesh is None:
        return step

    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def sharded_step(state, batch, rng):
        image, hw, gt_boxes, gt_labels, gt_valid, gt_attrs, anchors = batch
        per_image = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dp),
            (image, hw, gt_boxes, gt_labels, gt_valid, gt_attrs))
        anchors = jax.device_put(anchors, rep)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state)
        return step(state, per_image + (anchors,),
                    jax.device_put(rng, rep))

    return sharded_step
