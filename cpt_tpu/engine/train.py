"""Prompt-tuning / fine-tuning training engine.

Optax-based replacement for the reference's per-script torch loops
(``Oscar/oscar/fewshot/refcoco_cpt.py:225-255``, ``gqa_cpt.py:320-555``):

  * ``warmup_linear`` LR schedule with the 1e-8 floor
    (reference ``Oscar/oscar/utils/optim_sched.py:16-44``)
  * AdamW with BERT-style no-decay on bias/LayerNorm params and a separate
    ``lr_mul`` multiplier for classifier-head params (the two × two param
    groups of reference ``refcoco_cpt.py:318-343``)
  * gradient accumulation via ``optax.MultiSteps`` — covers the GQA
    "one optimizer step = full train set" recipe (``gqa_cpt.py:328-334``)
  * jitted train step with donated optimizer state; masked-LM labels are
    scattered on device from (labels, mask_pos)

The train step is mesh-ready: under a ``Mesh`` context the caller shards the
batch over the data axis and replicates params; XLA inserts the gradient
psum. No explicit collectives needed.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 3e-5
    weight_decay: float = 0.05
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-8
    warmup_steps: int = 0
    num_train_steps: int = 1000
    lr_mul: float = 1.0              # classifier-head LR multiplier
    grad_accum_steps: int = 1
    max_grad_norm: Optional[float] = None
    scheduler: str = "linear"        # linear | constant (after warmup)
    optim: str = "adamw"             # adamw | adamax (run_nlvr.py:403-405)


def warmup_linear(step, warmup_steps: int, total_steps: int):
    """BERT schedule with the reference's 1e-8 floor."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / jnp.maximum(warmup_steps, 1)
    decay = (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
    factor = jnp.where(step < warmup_steps, warm, jnp.maximum(decay, 0.0))
    return jnp.maximum(factor, 1e-8 / 1.0)


def warmup_constant(step, warmup_steps: int):
    """Reference ``WarmupConstantSchedule`` (--scheduler constant): linear
    ramp over warmup, then flat 1."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / jnp.maximum(warmup_steps, 1)
    return jnp.where(step < warmup_steps, warm, 1.0)


def make_lr_schedule(cfg: OptimConfig, mul: float = 1.0):
    def sched(step):
        if cfg.scheduler == "constant":
            f = warmup_constant(step, cfg.warmup_steps)
        else:
            f = warmup_linear(step, cfg.warmup_steps, cfg.num_train_steps)
        return jnp.maximum(cfg.learning_rate * mul * f, 1e-8)

    return sched


def _is_no_decay(path: Tuple[str, ...]) -> bool:
    """bias / LayerNorm params are excluded from weight decay."""
    leaf = path[-1]
    return leaf == "bias" or any("LayerNorm" in p for p in path) or leaf == "scale"


def _path_strs(params) -> Any:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def key_str(kp):
        return tuple(getattr(k, "key", str(k)) for k in kp)

    return [key_str(kp) for kp, _ in flat]


def build_optimizer(params, cfg: OptimConfig,
                    classifier_pred: Optional[Callable[[Tuple[str, ...]], bool]] = None
                    ) -> optax.GradientTransformation:
    """AdamW with no-decay masking and classifier lr_mul param groups."""

    def label_tree(group_fn):
        return jax.tree_util.tree_map_with_path(
            lambda kp, _: group_fn(tuple(getattr(k, "key", str(k)) for k in kp)),
            params)

    decay_mask = label_tree(lambda p: not _is_no_decay(p))

    def adamw(mul: float) -> optax.GradientTransformation:
        if cfg.optim == "adamax":
            # the reference's Adamax branch is torch.optim.Adamax
            # (run_nlvr.py:54,405) whose weight decay is COUPLED L2 —
            # wd*param is added to the gradient before the infinity-norm
            # moment update — not AdamW-style decoupled decay
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
                optax.adamax(learning_rate=make_lr_schedule(cfg, mul),
                             b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps))
        return optax.adamw(
            learning_rate=make_lr_schedule(cfg, mul),
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay, mask=decay_mask)

    if classifier_pred is None:
        tx = adamw(1.0)
    else:
        labels = label_tree(lambda p: "head" if classifier_pred(p) else "body")
        tx = optax.multi_transform(
            {"head": adamw(cfg.lr_mul), "body": adamw(1.0)}, labels)

    if cfg.max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def freeze_params(tx: optax.GradientTransformation,
                  substring: str) -> optax.GradientTransformation:
    """Zero the update of every parameter whose tree path contains
    ``substring`` — the JAX equivalent of the reference's
    ``requires_grad = False`` freezing (e.g. ``--freeze_embedding``,
    ``modeling_bert.py:622-625`` freezes ``word_embeddings``)."""

    def mask_of(params):
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        return jax.tree_util.tree_unflatten(
            treedef,
            [substring in jax.tree_util.keystr(p) for p, _ in flat])

    return optax.chain(tx, optax.masked(optax.set_to_zero(), mask_of))


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def scatter_mlm_labels(labels: jnp.ndarray, mask_pos: jnp.ndarray,
                       seq_len: int) -> jnp.ndarray:
    """[N] gt token ids (−1 = padded slot) + [N] mask positions →
    [N, seq_len] masked-LM label array (−1 everywhere else)."""
    n = labels.shape[0]
    full = jnp.full((n, seq_len), -1, jnp.int32)
    safe_pos = jnp.clip(mask_pos, 0, seq_len - 1)
    scattered = full.at[jnp.arange(n), safe_pos].set(labels)
    return jnp.where(labels[:, None] >= 0, scattered, full)


def make_mlm_train_step(model, tx, *, dropout: bool = True):
    """Jitted MLM prompt-tuning step for REC_MLM_CPT-style models."""

    def loss_fn(params, batch, rng):
        input_ids, segment_ids, attention_mask, img_feats, mask_pos, labels = batch
        rngs = {"dropout": rng} if dropout else {}
        # fast path: CPT losses live only at the [MASK] position, so score
        # (and backprop) the vocab projection at the gathered position only —
        # same math as full-sequence MLM CE with ignore_index=-1
        _, at_mask = model.apply(params, input_ids, segment_ids, attention_mask,
                                 img_feats=img_feats, mask_pos=mask_pos,
                                 deterministic=not dropout, rngs=rngs)
        from cpt_tpu.models.bert.heads import cross_entropy_ignore_index

        return cross_entropy_ignore_index(at_mask, labels)

    # donate the train state: params/opt buffers are updated in place on
    # device (halves peak memory vs copy-on-update)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def make_nsp_train_step(model, tx, *, head: Optional[str] = None,
                        dropout: bool = True):
    """Jitted NSP-scoring step for NSPCPT / VCRQAR_NSPCPT models."""
    kwargs = {} if head is None else {"head": head}

    def loss_fn(params, batch, rng):
        input_ids, segment_ids, attention_mask, img_feats, labels = batch
        rngs = {"dropout": rng} if dropout else {}
        loss, _ = model.apply(params, input_ids, segment_ids, attention_mask,
                              img_feats=img_feats, next_sentence_label=labels,
                              deterministic=not dropout, rngs=rngs, **kwargs)
        return loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def make_cls_train_step(model, tx, *, dropout: bool = True):
    """Jitted pooled-classifier step (ImageBertForSequenceClassification);
    the model computes its own loss from ``labels`` (xe/kl/bce by config).
    Reference FT baselines train this way (``fewshot/gqa_ft.py:426-440``,
    ``modeling_gqa.py:65-76``)."""

    def loss_fn(params, batch, rng):
        input_ids, segment_ids, attention_mask, img_feats, labels = batch
        rngs = {"dropout": rng} if dropout else {}
        loss, _ = model.apply(params, input_ids, segment_ids, attention_mask,
                              img_feats=img_feats, labels=labels,
                              deterministic=not dropout, rngs=rngs)
        return loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def batch_arrays_mlm(flat_batch) -> Tuple[jnp.ndarray, ...]:
    t = flat_batch.tensors
    return (jnp.asarray(t.input_ids), jnp.asarray(t.segment_ids),
            jnp.asarray(t.attention_mask), jnp.asarray(t.img_feats),
            jnp.asarray(t.mask_pos), jnp.asarray(flat_batch.labels))
