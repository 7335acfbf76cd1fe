"""Detector-training solver: SGD with bias doubling + WarmupMultiStepLR.

Parity with reference ``maskrcnn_benchmark/solver``:
  * ``build.py:9-21`` — SGD(momentum 0.9) with per-param overrides: biases
    get ``lr × BIAS_LR_FACTOR (2)`` and ``WEIGHT_DECAY_BIAS (0)``
  * ``build.py:24-80`` — optional AdamW with full-model grad clipping
  * ``lr_scheduler.py:10-52`` — WarmupMultiStepLR: linear warmup then ×γ
    step decays at milestones
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    base_lr: float = 0.01
    bias_lr_factor: float = 2.0
    momentum: float = 0.9
    weight_decay: float = 1e-4
    weight_decay_bias: float = 0.0
    gamma: float = 0.1
    steps: Tuple[int, ...] = (49000, 65000)
    max_iter: int = 90000
    warmup_factor: float = 1.0 / 3
    warmup_iters: int = 500
    warmup_method: str = "linear"       # linear | constant
    optimizer: str = "SGD"              # SGD | ADAMW
    clip_gradients: float = 0.0         # 0 disables (ADAMW path uses 5.0)


def warmup_multistep_lr(cfg: SolverConfig):
    steps = jnp.asarray(cfg.steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n_decays = jnp.sum(step >= steps.astype(jnp.float32))
        factor = cfg.gamma ** n_decays
        if cfg.warmup_method == "linear":
            alpha = step / max(cfg.warmup_iters, 1)
            wf = cfg.warmup_factor * (1 - alpha) + alpha
        else:
            wf = jnp.asarray(cfg.warmup_factor, jnp.float32)
        warm = jnp.where(step < cfg.warmup_iters, wf, 1.0)
        return cfg.base_lr * warm * factor

    return schedule


def _is_bias(path: Tuple[str, ...]) -> bool:
    return path[-1] in ("bias",) or "bn" in path[-2:] and path[-1] == "scale"


def build_detector_optimizer(params: Any, cfg: SolverConfig
                             ) -> optax.GradientTransformation:
    sched = warmup_multistep_lr(cfg)

    def label(path_pred):
        return jax.tree_util.tree_map_with_path(
            lambda kp, _: path_pred(
                tuple(getattr(k, "key", str(k)) for k in kp)), params)

    bias_tree = label(_is_bias)

    if cfg.optimizer == "ADAMW":
        def adamw(wd):
            return optax.adamw(sched, weight_decay=wd)

        tx = optax.multi_transform(
            {True: adamw(cfg.weight_decay_bias), False: adamw(cfg.weight_decay)},
            bias_tree)
        clip = cfg.clip_gradients or 5.0
        return optax.chain(optax.clip_by_global_norm(clip), tx)

    def sgd(lr_mul, wd):
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(lambda s: sched(s) * lr_mul, momentum=cfg.momentum),
        )

    tx = optax.multi_transform(
        {True: sgd(cfg.bias_lr_factor, cfg.weight_decay_bias),
         False: sgd(1.0, cfg.weight_decay)},
        bias_tree)
    if cfg.clip_gradients > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_gradients), tx)
    return tx
