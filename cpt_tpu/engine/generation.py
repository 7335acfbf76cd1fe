"""Caption generation: greedy / sampling / beam search on a fixed canvas.

Replaces the reference's ``CaptionPreTrainedModel.generate`` + KV-cache
slicing machinery (``Oscar/oscar/modeling/modeling_utils.py:21-678``,
``modeling_bert.py:658-913``) with a TPU-native design: one jitted step
function over the FULL static canvas — step t writes a [MASK] at caption
position t, runs the seq2seq-masked forward, and reads logits at t. No
dynamic shapes, no cache reordering; at caption lengths ≤40 the extra
recompute is cheaper than the reference's per-step host logic.

Features ported: eos/pad handling, repetition penalty, length penalty,
per-example ``num_keep_best`` beams, temperature/top-k/top-p sampling.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG = -1e9


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_seq_a_len: int = 40          # caption canvas (incl CLS/SEP slots)
    bos_token_id: int = 101          # [CLS]
    eos_token_id: int = 102          # [SEP]
    pad_token_id: int = 0
    mask_token_id: int = 103
    num_beams: int = 1
    num_keep_best: int = 1
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0


def _apply_repetition_penalty(logits: Array, tokens: Array,
                              penalty: float) -> Array:
    if penalty == 1.0:
        return logits
    vocab = logits.shape[-1]
    counts = jax.vmap(lambda t: jnp.zeros(vocab).at[t].add(1.0))(tokens)
    seen = counts > 0
    return jnp.where(seen, jnp.where(logits > 0, logits / penalty,
                                     logits * penalty), logits)


def _filter_top_k_top_p(logits: Array, top_k: int, top_p: float) -> Array:
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, NEG, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_count = jnp.sum(cum - probs < top_p, axis=-1, keepdims=True)
        kth = jnp.take_along_axis(sorted_logits,
                                  jnp.maximum(cutoff_count - 1, 0), axis=-1)
        logits = jnp.where(logits < kth, NEG, logits)
    return logits


def make_step_logits_fn(model, cfg: GenerationConfig):
    """fn(params, caption_tokens [B, La], step, context) → logits [B, V].

    ``context`` = (segment_ids [B, S], attn [B, S, S], img_feats) with the
    caption canvas occupying the first La slots of S.
    """

    def fn(params, tokens, step, segment_ids, attn, img_feats):
        b, la = tokens.shape
        s = segment_ids.shape[1]
        canvas = jnp.zeros((b, s), jnp.int32)
        canvas = canvas.at[:, :la].set(tokens)
        canvas = canvas.at[:, step].set(cfg.mask_token_id)
        pos = jnp.full((b, 1), step, jnp.int32)
        _, logits = model.apply(params, canvas, attn, segment_ids,
                                img_feats=img_feats, masked_pos=pos)
        return logits[:, 0].astype(jnp.float32)

    return fn


def greedy_or_sample(model, params, cfg: GenerationConfig, segment_ids,
                     attn, img_feats, rng: Optional[Array] = None
                     ) -> Tuple[Array, Array]:
    """→ (tokens [B, La], logprob_sums [B]). Greedy unless cfg.do_sample."""
    step_fn = make_step_logits_fn(model, cfg)
    b = segment_ids.shape[0]
    la = cfg.max_seq_a_len
    tokens0 = jnp.full((b, la), cfg.pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(cfg.bos_token_id)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    @jax.jit
    def run(params, segment_ids, attn, img_feats, rng):
        def body(carry, step):
            tokens, finished, score, rng = carry
            logits = step_fn(params, tokens, step, segment_ids, attn,
                             img_feats)
            logits = _apply_repetition_penalty(logits, tokens,
                                               cfg.repetition_penalty)
            if cfg.do_sample:
                logits_t = _filter_top_k_top_p(logits / cfg.temperature,
                                               cfg.top_k, cfg.top_p)
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(sub, logits_t, axis=-1)
            else:
                nxt = jnp.argmax(logits, axis=-1)
            logp = jax.nn.log_softmax(logits, axis=-1)
            tok_logp = jnp.take_along_axis(logp, nxt[:, None], 1)[:, 0]
            nxt = jnp.where(finished, cfg.pad_token_id, nxt)
            score = score + jnp.where(finished, 0.0, tok_logp)
            tokens = tokens.at[:, step].set(nxt)
            finished = finished | (nxt == cfg.eos_token_id)
            return (tokens, finished, score, rng), ()

        init = (tokens0, jnp.zeros((b,), bool), jnp.zeros((b,)), rng)
        (tokens, _f, score, _r), _ = jax.lax.scan(
            body, init, jnp.arange(1, la))
        return tokens, score

    return run(params, segment_ids, attn, img_feats, rng)


def beam_search(model, params, cfg: GenerationConfig, segment_ids, attn,
                img_feats) -> Tuple[Array, Array]:
    """→ (tokens [B, num_keep_best, La], scores [B, num_keep_best]) with
    length-penalty-normalized log-prob scores."""
    k = cfg.num_beams
    step_fn = make_step_logits_fn(model, cfg)
    b = segment_ids.shape[0]
    la = cfg.max_seq_a_len

    def expand(x):
        return jnp.repeat(x, k, axis=0)

    seg_e, attn_e, img_e = expand(segment_ids), expand(attn), expand(img_feats)
    tokens0 = jnp.full((b * k, la), cfg.pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(cfg.bos_token_id)
    # first beam active, others start at -inf so step 1 fans out
    beam_scores0 = jnp.tile(jnp.asarray([0.0] + [NEG] * (k - 1)), (b,))

    @jax.jit
    def run(params, seg_e, attn_e, img_e):
        def body(carry, step):
            tokens, beam_scores, finished = carry
            logits = step_fn(params, tokens, step, seg_e, attn_e, img_e)
            logits = _apply_repetition_penalty(logits, tokens,
                                               cfg.repetition_penalty)
            logp = jax.nn.log_softmax(logits, axis=-1)        # [B*K, V]
            vocab = logp.shape[-1]
            # finished beams only extend with PAD at zero cost
            pad_only = jnp.full((vocab,), NEG).at[cfg.pad_token_id].set(0.0)
            logp = jnp.where(finished[:, None], pad_only[None], logp)
            cand = beam_scores[:, None] + logp                # [B*K, V]
            cand = cand.reshape(b, k * vocab)
            top_scores, top_idx = jax.lax.top_k(cand, k)      # [B, K]
            src_beam = top_idx // vocab                        # [B, K]
            tok = (top_idx % vocab).astype(jnp.int32)
            flat_src = (src_beam + jnp.arange(b)[:, None] * k).reshape(-1)
            tokens = tokens[flat_src]
            finished = finished[flat_src]
            tok_flat = tok.reshape(-1)
            tok_flat = jnp.where(finished, cfg.pad_token_id, tok_flat)
            tokens = tokens.at[:, step].set(tok_flat)
            finished = finished | (tok_flat == cfg.eos_token_id)
            return (tokens, top_scores.reshape(-1), finished), ()

        init = (tokens0, beam_scores0, jnp.zeros((b * k,), bool))
        (tokens, scores, finished), _ = jax.lax.scan(
            body, init, jnp.arange(1, la))
        # length-penalty normalization over generated length
        lengths = jnp.sum(tokens != cfg.pad_token_id, axis=1)
        norm = scores / (lengths.astype(jnp.float32) ** cfg.length_penalty)
        return tokens.reshape(b, k, la), norm.reshape(b, k)

    tokens, norm = run(params, seg_e, attn_e, img_e)
    nb = min(cfg.num_keep_best, k)
    best_scores, best_idx = jax.lax.top_k(norm, nb)
    best_tokens = jnp.take_along_axis(tokens, best_idx[..., None], axis=1)
    return best_tokens, best_scores


def decode_caption(tokenizer, token_row: np.ndarray, cfg: GenerationConfig
                   ) -> str:
    """Token ids → caption text (strips BOS, stops at EOS)."""
    out = []
    for t in np.asarray(token_row).tolist()[1:]:
        if t in (cfg.eos_token_id, cfg.pad_token_id):
            break
        out.append(int(t))
    toks = tokenizer.convert_ids_to_tokens(out)
    text = " ".join(toks).replace(" ##", "")
    return text
