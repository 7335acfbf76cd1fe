"""Self-critical sequence training (SCST) for captioning.

Parity with the reference's SCST finetune path (``run_captioning.py``
``--scst`` + ``ScstRewardCriterion``, ``utils/caption_evaluate.py:115-158``):
sample ``sample_n`` captions per image (``--sc_train_sample_n``, reference
default 5), baseline either the greedy decode (``--sc_baseline_type
greedy``) or the leave-one-out mean of the other samples' rewards
(``'sample'``: ``(sum - self)/(n-1)``, ``caption_evaluate.py:143-144``),
reward = CIDEr-D, loss = mean over samples of −(r − baseline)·logP(sample).
The sampling/greedy rollouts run as jitted scans (``engine/generation``);
the reward computation is host-side.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.engine.generation import (GenerationConfig, decode_caption,
                                       greedy_or_sample)
from cpt_tpu.utils.cider import CiderD


def sequence_logprob_fn(model, cfg: GenerationConfig):
    """Jitted teacher-forced caption log-prob: fn(params, tokens [B, La],
    segment_ids, attn, img_feats) → [B] sum log P(token_t | <t)."""

    @jax.jit
    def fn(params, tokens, segment_ids, attn, img_feats, base_ids=None):
        b, la = tokens.shape
        s = segment_ids.shape[1]

        def body(carry, step):
            total = carry
            canvas = (jnp.zeros((b, s), jnp.int32) if base_ids is None
                      else base_ids.astype(jnp.int32))
            canvas = canvas.at[:, :la].set(tokens)
            canvas = canvas.at[:, step].set(cfg.mask_token_id)
            pos = jnp.full((b, 1), step, jnp.int32)
            _, logits = model.apply(params, canvas, attn, segment_ids,
                                    img_feats=img_feats, masked_pos=pos)
            logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), -1)
            tgt = tokens[:, step]
            tok_logp = jnp.take_along_axis(logp, tgt[:, None], 1)[:, 0]
            live = tgt != cfg.pad_token_id
            return total + jnp.where(live, tok_logp, 0.0), ()

        total, _ = jax.lax.scan(body, jnp.zeros((b,)), jnp.arange(1, la))
        return total

    return fn


def scst_advantages(sample_scores: np.ndarray,
                    greedy_scores: np.ndarray | None,
                    baseline_type: str = "greedy") -> np.ndarray:
    """[B, n] sample rewards → [B, n] advantages (reference
    ``ScstRewardCriterion.forward``, ``caption_evaluate.py:133-150``).

    ``'greedy'``: baseline = the image's greedy reward. ``'sample'``:
    leave-one-out mean of the OTHER samples, ``(sum − self)/(n − 1)``
    (``:143-144``) — per image the advantages then sum to zero."""
    s = np.asarray(sample_scores, np.float32)
    if baseline_type == "greedy":
        assert greedy_scores is not None and len(greedy_scores) == s.shape[0]
        base = np.asarray(greedy_scores, np.float32)[:, None]
    elif baseline_type == "sample":
        assert s.shape[1] >= 2, "sample baseline needs sample_n >= 2"
        base = (s.sum(1, keepdims=True) - s) / (s.shape[1] - 1)
    else:
        raise ValueError(f"unknown baseline_type {baseline_type!r}")
    return s - base


def scst_step(model, params, opt_update, cfg: GenerationConfig,
              scorer: CiderD, tokenizer, batch, image_ids: Sequence[str],
              rng, sample_n: int = 1, baseline_type: str = "greedy",
              baseline_beams: int = 1) -> Tuple[dict, float, float]:
    """One SCST update. batch = (segment_ids, attn, img_feats).

    ``sample_n`` rollouts per image (tiled contiguously, matching the
    reference's ``gt_idx = i // seq_per_img``); baseline per
    ``scst_advantages``. ``baseline_beams > 1`` decodes the greedy
    baseline with beam search instead (the reference's ``--sc_beam_size``,
    run_captioning.py:543). Returns (grads, mean sampled reward, mean
    baseline reward). ``batch`` may carry a 4th element ``base_ids``
    (od-label context ids for the decode canvas)."""
    segment_ids, attn, img_feats = batch[:3]
    base_ids = batch[3] if len(batch) > 3 else None
    import dataclasses

    b = segment_ids.shape[0]
    ctx = (segment_ids, attn, img_feats)
    if sample_n > 1:
        ctx = tuple(jnp.repeat(x, sample_n, axis=0) for x in ctx)
        base_rep = (None if base_ids is None
                    else jnp.repeat(base_ids, sample_n, axis=0))
    else:
        base_rep = base_ids

    sample_cfg = dataclasses.replace(cfg, do_sample=True)
    sampled, _ = greedy_or_sample(model, params, sample_cfg, *ctx, rng,
                                  base_ids=base_rep)

    def tokens_to_words(row):
        return decode_caption(tokenizer, row, cfg).split()

    ids_rep = [i for i in image_ids for _ in range(sample_n)]
    r_sample = np.asarray([scorer.score(i, tokens_to_words(t))
                           for i, t in zip(ids_rep, np.asarray(sampled))]
                          ).reshape(b, sample_n)
    if baseline_type == "greedy":
        if baseline_beams > 1:
            from cpt_tpu.engine.generation import beam_search

            beam_cfg = dataclasses.replace(cfg, do_sample=False,
                                           num_beams=baseline_beams,
                                           num_keep_best=1)
            toks, _ = beam_search(model, params, beam_cfg, segment_ids,
                                  attn, img_feats, base_ids=base_ids)
            greedy = toks[:, 0]
        else:
            greedy, _ = greedy_or_sample(model, params, cfg, segment_ids,
                                         attn, img_feats, base_ids=base_ids)
        r_base = np.asarray([scorer.score(i, tokens_to_words(t))
                             for i, t in zip(image_ids, np.asarray(greedy))])
    else:
        r_base = None
    advantage = jnp.asarray(
        scst_advantages(r_sample, r_base, baseline_type).reshape(-1))

    logprob_fn = sequence_logprob_fn(model, cfg)

    def loss_fn(p):
        logp = logprob_fn(p, sampled, *ctx, base_rep)
        return -jnp.mean(advantage * logp)

    grads = jax.grad(loss_fn)(params)
    base_mean = (float(np.mean(r_base)) if r_base is not None
                 else float(r_sample.mean()))
    return grads, float(r_sample.mean()), base_mean
