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
                              penalty: float,
                              pad_id: Optional[int] = None) -> Array:
    """CTRL-style repetition penalty over the tokens generated so far.
    ``pad_id`` slots are excluded — the fixed canvas is PAD-filled beyond
    the current step, but the reference penalizes only emitted tokens."""
    if penalty == 1.0:
        return logits
    vocab = logits.shape[-1]
    counts = jax.vmap(lambda t: jnp.zeros(vocab).at[t].add(1.0))(tokens)
    seen = counts > 0
    if pad_id is not None:
        seen = seen.at[:, pad_id].set(False)
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
    caption canvas occupying the first La slots of S. ``base_ids``
    ([B, S], optional) carries the CONTEXT token ids beyond the caption
    canvas — the od-label segment; without it those slots decode as PAD
    and the model loses the tag conditioning.
    """

    def fn(params, tokens, step, segment_ids, attn, img_feats,
           base_ids=None):
        b, la = tokens.shape
        s = segment_ids.shape[1]
        canvas = (jnp.zeros((b, s), jnp.int32) if base_ids is None
                  else base_ids.astype(jnp.int32))
        canvas = canvas.at[:, :la].set(tokens)
        canvas = canvas.at[:, step].set(cfg.mask_token_id)
        pos = jnp.full((b, 1), step, jnp.int32)
        _, logits = model.apply(params, canvas, attn, segment_ids,
                                img_feats=img_feats, masked_pos=pos)
        return logits[:, 0].astype(jnp.float32)

    return fn


def greedy_or_sample(model, params, cfg: GenerationConfig, segment_ids,
                     attn, img_feats, rng: Optional[Array] = None,
                     base_ids: Optional[Array] = None
                     ) -> Tuple[Array, Array]:
    """→ (tokens [B, La], logprob_sums [B]). Greedy unless cfg.do_sample.
    ``base_ids`` [B, S]: context (od-label) token ids beyond the caption
    canvas (see make_step_logits_fn)."""
    step_fn = make_step_logits_fn(model, cfg)
    b = segment_ids.shape[0]
    la = cfg.max_seq_a_len
    tokens0 = jnp.full((b, la), cfg.pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(cfg.bos_token_id)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    @jax.jit
    def run(params, segment_ids, attn, img_feats, rng, base_ids):
        def body(carry, step):
            tokens, finished, score, rng = carry
            logits = step_fn(params, tokens, step, segment_ids, attn,
                             img_feats, base_ids)
            logits = _apply_repetition_penalty(
                logits, tokens, cfg.repetition_penalty, cfg.pad_token_id)
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

    return run(params, segment_ids, attn, img_feats, rng, base_ids)


def beam_search(model, params, cfg: GenerationConfig, segment_ids, attn,
                img_feats, base_ids: Optional[Array] = None
                ) -> Tuple[Array, Array]:
    """→ (tokens [B, num_keep_best, La], scores [B, num_keep_best]) with
    length-penalty-normalized log-prob scores.

    Reference-exact semantics (``Oscar/oscar/modeling/modeling_utils.py``
    ``_generate_beam_search`` + ``BeamHypotheses``), restructured for
    static shapes: each step takes the top ``2K`` candidates in sorted
    order; EOS candidates encountered before the K-th live continuation
    are banked as hypotheses (score ``sum_logprobs / cur_len**penalty``
    over the prefix WITHOUT the EOS, whose logprob IS in the sum); the
    first K non-EOS candidates become the live beams. On the final step
    every candidate is banked. A batch row is done once the bank holds
    ``num_keep_best`` hypotheses none of the live paths can beat
    (``worst >= best / (La-1)**penalty``). Output hypotheses get EOS
    appended, exactly as the reference's decode step writes it."""
    k = cfg.num_beams
    nb = cfg.num_keep_best
    step_fn = make_step_logits_fn(model, cfg)
    b = segment_ids.shape[0]
    la = cfg.max_seq_a_len

    def expand(x):
        return jnp.repeat(x, k, axis=0)

    seg_e, attn_e, img_e = expand(segment_ids), expand(attn), expand(img_feats)
    base_e = None if base_ids is None else expand(base_ids)
    tokens0 = jnp.full((b, k, la), cfg.pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(cfg.bos_token_id)
    # first beam active, others start at -inf so step 1 fans out
    scores0 = jnp.tile(jnp.asarray([0.0] + [NEG] * (k - 1)), (b, 1))
    max_norm_len = float(la - 1) ** cfg.length_penalty

    @jax.jit
    def run(params, seg_e, attn_e, img_e, base_e):
        def body(carry, step):
            live_tok, live_sc, bank_tok, bank_sc, bank_len, done = carry
            logits = step_fn(params, live_tok.reshape(b * k, la), step,
                             seg_e, attn_e, img_e, base_e)
            logits = _apply_repetition_penalty(
                logits, live_tok.reshape(b * k, la), cfg.repetition_penalty,
                cfg.pad_token_id)
            logp = jax.nn.log_softmax(logits, axis=-1)        # [B*K, V]
            vocab = logp.shape[-1]
            cand = (live_sc.reshape(-1)[:, None] + logp).reshape(b, k * vocab)
            top_sc, top_idx = jax.lax.top_k(cand, 2 * k)      # sorted desc
            src = top_idx // vocab                             # [B, 2K]
            word = (top_idx % vocab).astype(jnp.int32)
            is_last = step == la - 1

            # done BEFORE processing, using this step's best candidate
            # (BeamHypotheses.is_done, early_stopping=False)
            bank_full = bank_sc[:, nb - 1] > NEG / 2
            new_done = done | (bank_full
                               & (bank_sc[:, nb - 1]
                                  >= top_sc[:, 0] / max_norm_len))

            eos_cand = (word == cfg.eos_token_id) | is_last
            noneos = ~eos_cand
            nrank = jnp.cumsum(noneos, axis=1)                # 1-indexed
            # index of the K-th non-EOS candidate (the loop breaks there)
            kth = jnp.argmax((nrank == k) & noneos, axis=1)
            pos = jnp.arange(2 * k)[None, :]
            banked = eos_cand & jnp.where(is_last, True, pos < kth[:, None])
            banked = banked & ~new_done[:, None]

            # bank merge: normalized score over the prefix (length = step
            # tokens incl. BOS, excl. the EOS being added)
            norm = top_sc / (step.astype(jnp.float32) ** cfg.length_penalty)
            cand_sc = jnp.where(banked, norm, NEG)
            prefix = jnp.take_along_axis(live_tok, src[..., None], axis=1)
            merged_sc = jnp.concatenate([bank_sc, cand_sc], axis=1)
            merged_tok = jnp.concatenate([bank_tok, prefix], axis=1)
            merged_len = jnp.concatenate(
                [bank_len, jnp.full((b, 2 * k), step, jnp.int32)], axis=1)
            bank_sc, keep = jax.lax.top_k(merged_sc, nb)      # old-first ties
            bank_tok = jnp.take_along_axis(merged_tok, keep[..., None],
                                           axis=1)
            bank_len = jnp.take_along_axis(merged_len, keep, axis=1)

            # live update: first K non-EOS candidates in sorted order
            order = jnp.argsort(jnp.where(noneos, pos, 2 * k + pos), axis=1)
            chosen = order[:, :k]                              # [B, K]
            new_sc = jnp.take_along_axis(top_sc, chosen, axis=1)
            new_src = jnp.take_along_axis(src, chosen, axis=1)
            new_word = jnp.take_along_axis(word, chosen, axis=1)
            new_tok = jnp.take_along_axis(live_tok, new_src[..., None],
                                          axis=1)
            new_tok = new_tok.at[:, :, step].set(new_word)
            keep_old = new_done[:, None] | is_last
            live_tok = jnp.where(keep_old[..., None], live_tok, new_tok)
            live_sc = jnp.where(keep_old, live_sc, new_sc)
            return (live_tok, live_sc, bank_tok, bank_sc, bank_len,
                    new_done), ()

        bank_tok0 = jnp.full((b, nb, la), cfg.pad_token_id, jnp.int32)
        bank_sc0 = jnp.full((b, nb), NEG)
        bank_len0 = jnp.ones((b, nb), jnp.int32)
        init = (tokens0, scores0, bank_tok0, bank_sc0, bank_len0,
                jnp.zeros((b,), bool))
        (_, _, bank_tok, bank_sc, bank_len, _), _ = jax.lax.scan(
            body, init, jnp.arange(1, la))
        # append EOS at the end of each hypothesis (reference decode step)
        is_eos_slot = (jnp.arange(la)[None, None, :]
                       == bank_len[..., None])
        in_prefix = jnp.arange(la)[None, None, :] < bank_len[..., None]
        bank_tok = jnp.where(
            in_prefix, bank_tok,
            jnp.where(is_eos_slot, cfg.eos_token_id, cfg.pad_token_id))
        return bank_tok, bank_sc

    tokens, scores = run(params, seg_e, attn_e, img_e, base_e)
    return tokens[:, :cfg.num_keep_best], scores[:, :cfg.num_keep_best]


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
