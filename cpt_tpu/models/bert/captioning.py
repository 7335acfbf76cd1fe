"""Image captioning on the Oscar stack.

Capability-parity with reference ``BertForImageCaptioning``
(``Oscar/oscar/modeling/modeling_bert.py:575-913``) and
``CaptionTensorizer`` (``run_captioning.py:198-326``):

  * sequence layout ``[CLS] caption [SEP] (pad to max_seq_a) od_labels
    [SEP]`` + image features
  * seq2seq attention: triangular caption→caption, full caption→context,
    context blocks do NOT attend back to the caption
  * training: BERT-style random caption-token masking (80/10/10), loss =
    label-smoothed KL with optional drop-worst
    (``BertCaptioningLoss:575-600``)

TPU-first: the full [S, S] attention-mask matrix is precomputed once per
example (the model already supports 3-D masks); decoding (see
``engine/generation``) re-runs the jitted forward per step over the fixed
canvas instead of the reference's KV-cache slicing/reordering — at caption
lengths ≤40 this is both simpler and faster than dynamic-shape caching.
"""
from __future__ import annotations

import dataclasses
import random
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.config.bert import BertConfig
from cpt_tpu.models.bert.heads import BertLMPredictionHead
from cpt_tpu.models.bert.model import BertImgModel

Array = jax.Array


class BertForImageCaptioning(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertImgModel(self.config, self.dtype, name="bert")
        # decoder/embedding tying follows config.tie_weights
        # (modeling_bert.py:616-625; the reference caption recipes default
        # to an UNTIED decoder)
        self.mlm_head = BertLMPredictionHead(self.config, self.dtype,
                                             tied=self.config.tie_weights,
                                             name="mlm_head")

    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 img_feats=None, masked_pos=None, masked_ids=None,
                 label_smoothing: float = 0.1,
                 drop_worst_ratio: float = 0.0, deterministic=True):
        """Training/scoring forward.

        attention_mask: [B, S, S] seq2seq mask. With ``masked_pos``
        ([B, M] positions) returns (loss, logits at masked positions);
        without, returns (None, full caption logits).
        ``drop_worst_ratio``: fraction of highest-loss slots excluded
        (reference ``BertCaptioningLoss``, ``modeling_bert.py:575-600``;
        activation after ``--drop_worst_after`` steps is the caller's
        job)."""
        seq, _ = self.bert(input_ids, token_type_ids, attention_mask,
                           img_feats=img_feats, deterministic=deterministic)
        table = self.bert.variables["params"]["embeddings"][
            "word_embeddings"]["embedding"]
        if masked_pos is None:
            return None, self.mlm_head(seq, table)
        gathered = jnp.take_along_axis(
            seq, masked_pos[..., None], axis=1)            # [B, M, H]
        logits = self.mlm_head(gathered, table)
        if masked_ids is None:
            return None, logits
        loss = smoothed_caption_loss(logits, masked_ids, label_smoothing,
                                     drop_worst_ratio)
        return loss, logits


def smoothed_caption_loss(logits: Array, targets: Array,
                          label_smoothing: float = 0.1,
                          drop_worst_ratio: float = 0.0) -> Array:
    """Label-smoothed KL loss over masked slots; ``targets == 0`` (the PAD
    id) marks padding slots and is excluded, matching the reference's
    ``masked_ids[masked_ids != 0]`` (``modeling_bert.py:647-649``)."""
    logits = logits.astype(jnp.float32).reshape(-1, logits.shape[-1])
    targets = targets.reshape(-1)
    n_class = logits.shape[-1]
    eps = label_smoothing
    one_hot = jax.nn.one_hot(targets, n_class)
    smooth = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_slot = jnp.sum(smooth * (jnp.log(jnp.maximum(smooth, 1e-20)) - logp),
                       axis=-1)
    valid = targets != 0
    if drop_worst_ratio > 0:
        k = int(per_slot.shape[0] * (1 - drop_worst_ratio))
        per_slot = -jax.lax.top_k(-jnp.where(valid, per_slot, jnp.inf), k)[0]
        valid = jnp.isfinite(per_slot)
        per_slot = jnp.where(valid, per_slot, 0.0)
    return jnp.sum(jnp.where(valid, per_slot, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


def caption_attention_mask(max_seq_a: int, od_len: int, img_len: int,
                           seq_a_len: int, od_valid: int, img_valid: int
                           ) -> np.ndarray:
    """[S, S] mask (reference ``run_captioning.py:300-318``): triangular
    caption block (rows/cols < seq_a_len), full context blocks, caption
    attends to context, context does not attend to caption."""
    s = max_seq_a + od_len + img_len
    m = np.zeros((s, s), np.int32)
    tri = np.tril(np.ones((seq_a_len, seq_a_len), np.int32))
    m[:seq_a_len, :seq_a_len] = tri
    l0, l1 = max_seq_a, max_seq_a + od_valid
    r0, r1 = max_seq_a + od_len, max_seq_a + od_len + img_valid
    m[l0:l1, l0:l1] = 1
    m[r0:r1, r0:r1] = 1
    m[:seq_a_len, l0:l1] = 1
    m[:seq_a_len, r0:r1] = 1
    m[l0:l1, r0:r1] = 1
    m[r0:r1, l0:l1] = 1
    return m


@dataclasses.dataclass
class CaptionTensorizer:
    """Host-side example builder (reference ``CaptionTensorizer``)."""

    tokenizer: Any
    max_img_seq_len: int = 50
    max_seq_len: int = 70
    max_seq_a_len: int = 40
    mask_prob: float = 0.15
    max_masked_tokens: int = 3
    is_train: bool = True

    def tensorize(self, text_a: str, img_feats: np.ndarray,
                  text_b: Optional[str] = None,
                  rng: Optional[random.Random] = None):
        tok = self.tokenizer
        rng = rng or random.Random(0)
        if self.is_train:
            tokens_a = tok.tokenize(text_a)[: self.max_seq_a_len - 2]
        else:
            tokens_a = ["[MASK]"] * (self.max_seq_a_len - 2)
        tokens = ["[CLS]"] + tokens_a + ["[SEP]"]
        segment_ids = [0] * len(tokens)
        seq_a_len = len(tokens)
        if text_b is not None:
            tokens += ["[PAD]"] * (self.max_seq_a_len - seq_a_len)
            segment_ids += [0] * (self.max_seq_a_len - seq_a_len)
            tokens_b = tok.tokenize(text_b)[: self.max_seq_len - len(tokens) - 1]
            tokens += tokens_b + ["[SEP]"]
            segment_ids += [1] * (len(tokens_b) + 1)

        # fixed-slot masking: positions [max_masked_tokens] (pad 0) + target
        # ids (pad 0 → excluded by the loss), replacing the reference's
        # dynamic boolean gather
        masked_pos = np.zeros(self.max_masked_tokens, np.int32)
        masked_ids = np.zeros(self.max_masked_tokens, np.int32)
        if self.is_train:
            candidates = list(range(1, seq_a_len))
            rng.shuffle(candidates)
            num = int(min(max(round(self.mask_prob * seq_a_len), 1),
                          self.max_masked_tokens))
            chosen = sorted(candidates[:num])
            for j, pos in enumerate(chosen):
                masked_ids[j] = tok.convert_tokens_to_ids(tokens[pos])
                masked_pos[j] = pos
                r = rng.random()
                if r <= 0.8:
                    tokens[pos] = "[MASK]"
                elif r <= 0.9:
                    tokens[pos] = rng.choice(list(tok.vocab.keys()))

        ids = tok.convert_tokens_to_ids(tokens)
        while len(ids) < self.max_seq_len:
            ids.append(0)
            segment_ids.append(0)
        od_len = self.max_seq_len - self.max_seq_a_len
        od_valid = (len(tokens) - self.max_seq_a_len
                    if text_b is not None else 0)
        img_valid = min(img_feats.shape[0], self.max_img_seq_len)
        attn = caption_attention_mask(self.max_seq_a_len, od_len,
                                      self.max_img_seq_len, seq_a_len,
                                      max(od_valid, 0), img_valid)
        feats = np.zeros((self.max_img_seq_len, img_feats.shape[1]),
                         np.float32)
        feats[:img_valid] = img_feats[:img_valid]
        return (np.asarray(ids, np.int32), np.asarray(segment_ids, np.int32),
                attn, feats, masked_pos, masked_ids, seq_a_len)
