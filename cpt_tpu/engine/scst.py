"""Self-critical sequence training (SCST) for captioning.

Parity with the reference's SCST finetune path (``run_captioning.py``
``--scst``, rewards via the vendored CIDEr scorer): sample a caption per
image, decode a greedy baseline, reward = CIDEr-D(sample) − CIDEr-D(greedy),
loss = −reward · logP(sample). The sampling/greedy rollouts run as jitted
scans (``engine/generation``); the reward computation is host-side.
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
    def fn(params, tokens, segment_ids, attn, img_feats):
        b, la = tokens.shape
        s = segment_ids.shape[1]

        def body(carry, step):
            total = carry
            canvas = jnp.zeros((b, s), jnp.int32).at[:, :la].set(tokens)
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


def scst_step(model, params, opt_update, cfg: GenerationConfig,
              scorer: CiderD, tokenizer, batch, image_ids: Sequence[str],
              rng) -> Tuple[dict, float, float]:
    """One SCST update. batch = (segment_ids, attn, img_feats).

    Returns (grads, mean sampled reward, mean greedy reward)."""
    segment_ids, attn, img_feats = batch
    import dataclasses

    sample_cfg = dataclasses.replace(cfg, do_sample=True)
    sampled, _ = greedy_or_sample(model, params, sample_cfg, segment_ids,
                                  attn, img_feats, rng)
    greedy, _ = greedy_or_sample(model, params, cfg, segment_ids, attn,
                                 img_feats)

    def tokens_to_words(row):
        return decode_caption(tokenizer, row, cfg).split()

    r_sample = np.asarray([scorer.score(i, tokens_to_words(t))
                           for i, t in zip(image_ids, np.asarray(sampled))])
    r_greedy = np.asarray([scorer.score(i, tokens_to_words(t))
                           for i, t in zip(image_ids, np.asarray(greedy))])
    advantage = jnp.asarray(r_sample - r_greedy, jnp.float32)

    logprob_fn = sequence_logprob_fn(model, cfg)

    def loss_fn(p):
        logp = logprob_fn(p, sampled, segment_ids, attn, img_feats)
        return -jnp.mean(advantage * logp)

    grads = jax.grad(loss_fn)(params)
    return grads, float(r_sample.mean()), float(r_greedy.mean())
