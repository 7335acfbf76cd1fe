"""Task heads and task models over ``BertImgModel``.

Capability-parity with the reference head zoo:
  * ``BertLMPredictionHead`` — transform (dense+gelu+LN) + decoder tied to the
    word embeddings + bias (vendored ``pytorch_transformers`` head used by
    ``REC_MLM_CPT``, reference ``Oscar/oscar/modeling/modeling_rec.py:100-152``)
  * ``REC_MLM_CPT`` / ``NSPCPT`` / ``VCRQAR_NSPCPT`` — the CPT scoring models
    (reference ``modeling_rec.py`` / ``modeling_vcr.py:79-129,194-251``)
  * fine-tune baselines ``REC_FT`` / ``NSPFT`` / ``VCR_QAR_NSPFT`` /
    ``ImageBertForSequenceClassification`` (xe/kl/bce losses, linear/mlp
    classifier; reference ``modeling_bert.py:290-354``) and
    ``ImageBertForMultipleChoice`` (``modeling_bert.py:357-…``)
  * ``BertImgForPreTraining`` — MLM + NSP heads (reference
    ``modeling_bert.py:927-1021``; MLM-only loss, NSP zeroed)

Weight tying is explicit: the LM decoder receives the word-embedding table at
call time (functional tying — no parameter aliasing needed in a pytree).
Losses use -1 as ignore-index, matching ``CrossEntropyLoss(ignore_index=-1)``.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cpt_tpu.config.bert import BertConfig
from cpt_tpu.models.bert.model import ACT, BertImgModel

Array = jax.Array


def cross_entropy_ignore_index(logits: Array, labels: Array,
                               ignore_index: int = -1) -> Array:
    """Mean CE over positions where ``labels != ignore_index`` (torch parity:
    mean over non-ignored elements; 0 if none)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


class BertPredictionHeadTransform(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.config
        x = nn.Dense(c.hidden_size, name="dense", dtype=self.dtype)(x)
        x = ACT[c.hidden_act](x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(x)


class BertLMPredictionHead(nn.Module):
    """MLM head; decoder weight tied to the embedding table (passed in).

    ``tied=False`` gives the head its own ``decoder`` table — the
    reference captioning model's ``config.tie_weights=False`` default,
    where a finetuned checkpoint's decoder has diverged from the
    embeddings (``modeling_bert.py:616-625``). Pretraining/CPT heads tie
    unconditionally (``:980-1000``)."""

    config: BertConfig
    dtype: Any = jnp.float32
    tied: bool = True

    @nn.compact
    def __call__(self, hidden: Array, word_embedding_table: Array) -> Array:
        c = self.config
        x = BertPredictionHeadTransform(c, self.dtype, name="transform")(hidden)
        if self.tied:
            table = word_embedding_table
        else:
            table = self.param(
                "decoder",
                nn.initializers.normal(stddev=c.initializer_range),
                (c.vocab_size, c.hidden_size), jnp.float32)
        logits = jnp.einsum("...h,vh->...v", x, table.astype(self.dtype))
        bias = self.param("bias", nn.initializers.zeros, (c.vocab_size,),
                          jnp.float32)
        return logits + bias.astype(self.dtype)


class SeqRelationshipHead(nn.Module):
    """NSP head: Linear(hidden → num_classes)."""

    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: Array) -> Array:
        return nn.Dense(self.num_classes, name="dense", dtype=self.dtype)(pooled)


class BertImgForPreTraining(nn.Module):
    """Pretraining wrapper: BertImgModel + MLM head + NSP head.

    The CPT drivers load checkpoint-2000000 into this model then copy
    submodules into the task model (reference ``refcoco_cpt.py:492-502``).
    Here the task models *are* this module with different loss plumbing, so
    "copy_from_pretraining_model" is just parameter-subtree reuse.
    """

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertImgModel(self.config, self.dtype, name="bert")
        self.mlm_head = BertLMPredictionHead(self.config, self.dtype,
                                             name="mlm_head")
        self.nsp_head = SeqRelationshipHead(self.config.num_contrast_classes,
                                            self.dtype, name="nsp_head")

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, masked_lm_labels=None,
                 next_sentence_label=None, deterministic=True):
        seq, pooled = self.bert(input_ids, token_type_ids, attention_mask,
                                img_feats=img_feats,
                                deterministic=deterministic)
        table = self.bert.variables["params"]["embeddings"][
            "word_embeddings"]["embedding"]
        mlm_logits = self.mlm_head(seq, table)
        nsp_logits = self.nsp_head(pooled)
        loss = None
        if masked_lm_labels is not None:
            # reference zeroes the NSP loss (`modeling_bert.py:1013-1017`)
            loss = cross_entropy_ignore_index(mlm_logits, masked_lm_labels)
        return loss, mlm_logits, nsp_logits


class REC_MLM_CPT(nn.Module):
    """RefCOCO / GQA / VG CPT model: masked-LM color-word scoring."""

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertImgModel(self.config, self.dtype, name="bert")
        self.mlm_head = BertLMPredictionHead(self.config, self.dtype,
                                             name="mlm_head")

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, masked_lm_labels=None, mask_pos=None,
                 deterministic=True):
        """``mask_pos`` (TPU fast path): [N] or [N, k] positions — the MLM
        head (incl. the vocab projection, ~20% of total FLOPs) runs only on
        the gathered hidden states instead of every position. Identical math
        to full scoring at those positions."""
        seq, _ = self.bert(input_ids, token_type_ids, attention_mask,
                           img_feats=img_feats, deterministic=deterministic)
        table = self.bert.variables["params"]["embeddings"][
            "word_embeddings"]["embedding"]
        if mask_pos is not None:
            idx = mask_pos[:, None] if mask_pos.ndim == 1 else mask_pos
            gathered = jnp.take_along_axis(seq, idx[..., None], axis=1)
            logits = self.mlm_head(gathered, table)  # [N, k, vocab]
            if mask_pos.ndim == 1:
                logits = logits[:, 0]
            return None, logits
        logits = self.mlm_head(seq, table)
        if masked_lm_labels is None:
            return None, logits
        return cross_entropy_ignore_index(logits, masked_lm_labels), logits


class NSPCPT(nn.Module):
    """VCR CPT model: pretrained NSP head scores each candidate pair."""

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertImgModel(self.config, self.dtype, name="bert")
        self.nsp_head = SeqRelationshipHead(self.config.num_contrast_classes,
                                            self.dtype, name="nsp_head")

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, next_sentence_label=None, deterministic=True):
        _, pooled = self.bert(input_ids, token_type_ids, attention_mask,
                              img_feats=img_feats, deterministic=deterministic)
        logits = self.nsp_head(pooled)
        if next_sentence_label is None:
            return None, logits
        return cross_entropy_ignore_index(logits, next_sentence_label), logits


class VCRQAR_NSPCPT(nn.Module):
    """VCR q→ar: twin NSP heads ("ans"/"rat"), head selected per call.

    ``head`` is a static argument (0=ans, 1=rat) so each variant jits to its
    own specialization — no data-dependent control flow inside jit.
    """

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertImgModel(self.config, self.dtype, name="bert")
        self.cls_ans = SeqRelationshipHead(self.config.num_contrast_classes,
                                           self.dtype, name="cls_ans")
        self.cls_rat = SeqRelationshipHead(self.config.num_contrast_classes,
                                           self.dtype, name="cls_rat")

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, next_sentence_label=None, head: str = "ans",
                 deterministic=True):
        _, pooled = self.bert(input_ids, token_type_ids, attention_mask,
                              img_feats=img_feats, deterministic=deterministic)
        # evaluate both heads so init creates both; static select, XLA drops
        # the dead branch under jit
        logits = {"ans": self.cls_ans(pooled), "rat": self.cls_rat(pooled)}[head]
        if next_sentence_label is None:
            return None, logits
        return cross_entropy_ignore_index(logits, next_sentence_label), logits


class REC_FT(nn.Module):
    """RefCOCO full-finetune baseline: per-box scorer over image hiddens.

    Reference ``modeling_rec.py:22-97``: MLP(hidden→hidden, GELU, LN,
    hidden→1) over the image-region hidden states (positions
    ``txt_seq_len : txt_seq_len+num_boxes``), CE over candidate boxes.
    TPU-native: fixed ``num_boxes`` slots + validity mask instead of
    per-sample variable box counts.
    """

    config: BertConfig
    txt_seq_len: int = 70
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, box_mask=None, target_idx=None,
                 deterministic=True):
        c = self.config
        seq, _ = BertImgModel(c, self.dtype, name="bert")(
            input_ids, token_type_ids, attention_mask,
            img_feats=img_feats, deterministic=deterministic)
        img_hidden = seq[:, self.txt_seq_len:]
        x = nn.Dense(c.hidden_size, name="cls_dense", dtype=self.dtype)(img_hidden)
        x = ACT["gelu"](x)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="cls_LayerNorm")(x)
        scores = nn.Dense(1, name="cls_out", dtype=self.dtype)(x)[..., 0]
        if box_mask is not None:
            scores = jnp.where(box_mask, scores, ATTN_FILL)
        loss = None
        if target_idx is not None:
            loss = cross_entropy_ignore_index(scores, target_idx)
        return loss, scores, jnp.argmax(scores, axis=-1)


ATTN_FILL = -1e4


class NSPFT(nn.Module):
    """VCR finetune baseline: fresh Linear(hidden→2) on pooled output."""

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertImgModel(self.config, self.dtype, name="bert")
        self.classifier = SeqRelationshipHead(2, self.dtype, name="classifier")

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, next_sentence_label=None, deterministic=True):
        _, pooled = self.bert(input_ids, token_type_ids, attention_mask,
                              img_feats=img_feats, deterministic=deterministic)
        logits = self.classifier(pooled)
        if next_sentence_label is None:
            return None, logits
        return cross_entropy_ignore_index(logits, next_sentence_label), logits


class VCR_QAR_NSPFT(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertImgModel(self.config, self.dtype, name="bert")
        self.classifier_ans = SeqRelationshipHead(2, self.dtype,
                                                  name="classifier_ans")
        self.classifier_rat = SeqRelationshipHead(2, self.dtype,
                                                  name="classifier_rat")

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, next_sentence_label=None, head: str = "ans",
                 deterministic=True):
        _, pooled = self.bert(input_ids, token_type_ids, attention_mask,
                              img_feats=img_feats, deterministic=deterministic)
        logits = {"ans": self.classifier_ans(pooled),
                  "rat": self.classifier_rat(pooled)}[head]
        if next_sentence_label is None:
            return None, logits
        return cross_entropy_ignore_index(logits, next_sentence_label), logits


class VGFT(nn.Module):
    """VG relation finetune baseline: pairwise region classifier.

    Reference ``modeling_vg.py:23-73``: gather the subject/object image
    hiddens (sequence positions ``txt_seq_len + pair_idx``), classify the
    concatenation with a fresh ``Linear(2·hidden → 51)``, CE over
    predicates. TPU-native: pairs are fixed ``[B, P, 2]`` slots; padded
    slots carry ``rel_labels == ignore_index`` and drop out of the mean,
    matching the reference's flattened variable-length pair lists.
    """

    config: BertConfig
    num_rel_classes: int = 51
    txt_seq_len: int = 70
    dtype: Any = jnp.float32

    def setup(self):
        self.bert = BertImgModel(self.config, self.dtype, name="bert")
        self.classifier = nn.Dense(self.num_rel_classes, name="classifier",
                                   dtype=self.dtype)

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, pairs=None, rel_labels=None,
                 deterministic=True):
        seq, _ = self.bert(input_ids, token_type_ids, attention_mask,
                           img_feats=img_feats, deterministic=deterministic)
        img_hidden = seq[:, self.txt_seq_len:]                  # [B, R, H]
        subs = jnp.take_along_axis(
            img_hidden, pairs[..., 0][..., None], axis=1)       # [B, P, H]
        objs = jnp.take_along_axis(img_hidden, pairs[..., 1][..., None], axis=1)
        logits = self.classifier(
            jnp.concatenate([subs, objs], axis=-1))             # [B, P, 51]
        if rel_labels is None:
            return None, logits
        return cross_entropy_ignore_index(logits, rel_labels, -100), logits


class ImageBertForSequenceClassification(nn.Module):
    """GQA/VQA/retrieval classifier (reference ``modeling_bert.py:290-354``).

    ``loss_type``: "xe" (CE), "kl" (KLDiv over log-softmax, VQA soft labels),
    "bce" (instance BCE × num_labels, VQA).
    """

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.bert = BertImgModel(c, self.dtype, name="bert")
        self.cls_dropout = nn.Dropout(c.hidden_dropout_prob)
        if c.classifier == "mlp":
            self.cls_hidden = nn.Dense(c.hidden_size * c.cls_hidden_scale,
                                       name="cls_hidden", dtype=self.dtype)
            self.cls_out = nn.Dense(c.num_labels, name="cls_out",
                                    dtype=self.dtype)
        else:
            self.cls_out = nn.Dense(c.num_labels, name="cls_out",
                                    dtype=self.dtype)
            self.cls_hidden = None

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, labels=None, deterministic=True):
        c = self.config
        _, pooled = self.bert(input_ids, token_type_ids, attention_mask,
                              img_feats=img_feats, deterministic=deterministic)
        # classifier-input dropout (modeling_bert.py:303,331 — the
        # reference drops the pooled output before the classifier)
        x = self.cls_dropout(pooled, deterministic=deterministic)
        if self.cls_hidden is not None:
            x = jax.nn.relu(self.cls_hidden(x))
        logits = self.cls_out(x)
        if labels is None:
            return None, logits
        lf32 = logits.astype(jnp.float32)
        if c.loss_type == "kl":
            logp = jax.nn.log_softmax(lf32, axis=-1)
            loss = jnp.sum(labels * (jnp.where(labels > 0, jnp.log(
                jnp.maximum(labels, 1e-12)), 0.0) - logp)) / labels.shape[0]
        elif c.loss_type == "bce":
            p = jax.nn.log_sigmoid(lf32)
            n = jax.nn.log_sigmoid(-lf32)
            loss = -jnp.mean(labels * p + (1 - labels) * n) * labels.shape[1]
        else:
            loss = cross_entropy_ignore_index(lf32, labels)
        return loss, logits


class ImageBertForMultipleChoice(nn.Module):
    """NLVR2-style multiple choice (reference ``modeling_bert.py:357-434``):
    flatten [B, num_choices, ...] → [B*nc, ...], encode each choice, then
    classify the CONCATENATION of the per-choice pooled outputs
    ([B, nc·hidden] → num_labels) — the classifier sees both choices
    jointly, exactly as the reference's ``reshaped_pool_output`` path.
    ``classifier="mlp"`` is Linear→ReLU→(LayerNorm when
    ``use_img_layernorm``)→Linear, matching the reference's variants."""

    config: BertConfig
    num_choices: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.bert = BertImgModel(c, self.dtype, name="bert")
        self.cls_dropout = nn.Dropout(c.hidden_dropout_prob)
        if c.classifier == "mlp":
            self.cls_hidden = nn.Dense(c.hidden_size * c.cls_hidden_scale,
                                       name="cls_hidden", dtype=self.dtype)
            self.cls_LayerNorm = (nn.LayerNorm(epsilon=c.layer_norm_eps,
                                               dtype=self.dtype,
                                               name="cls_LayerNorm")
                                  if c.use_img_layernorm else None)
        else:
            self.cls_hidden = None
            self.cls_LayerNorm = None
        self.cls_out = nn.Dense(c.num_labels, name="cls_out", dtype=self.dtype)

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 img_feats=None, labels=None, deterministic=True):
        b, nc = input_ids.shape[:2]
        flat = lambda x: None if x is None else x.reshape((b * nc,) + x.shape[2:])
        _, pooled = self.bert(flat(input_ids), flat(token_type_ids),
                              flat(attention_mask), img_feats=flat(img_feats),
                              deterministic=deterministic)
        # pooled-output dropout before the joint classifier
        # (modeling_bert.py:374,417)
        pooled = self.cls_dropout(pooled, deterministic=deterministic)
        x = pooled.reshape(b, -1)               # [B, nc·hidden]
        if self.cls_hidden is not None:
            x = jax.nn.relu(self.cls_hidden(x))
            if self.cls_LayerNorm is not None:
                x = self.cls_LayerNorm(x)
        logits = self.cls_out(x)                # [B, num_labels]
        if labels is None:
            return None, logits
        return cross_entropy_ignore_index(logits, labels), logits
