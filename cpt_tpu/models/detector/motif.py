"""Neural-Motif relation head — TPU-native (scan-based LSTM contexts).

Parity with ``scene_graph_benchmark/relation_head/neural_motif/``:

  * ``roi_sorter.py``: orders RoIs (leftright = box center-x, confidence,
    size) before the context LSTMs.
  * ``context_encoder.py:43-323``: object context = LSTM over sorted
    [box feats; soft label embedding (detector prob-dist @ GloVe table);
    position embedding], decoder RNN greedily predicts labels feeding the
    previous label's embedding back in; edge context = second LSTM over
    [predicted-label embedding; object context].
  * ``neuralmotif.py:90-182``: ``post_lstm_fc`` splits the edge context
    into subject/object representations; the edge representation is
    ``subj[s] * obj[o] * union_visual_feats`` (eqn 6), optional tanh, then
    the predicate classifier.

TPU design: pack-padded-sequence + per-image python loops become ONE
``lax.scan`` over the sorted, validity-masked slot axis (state frozen on
invalid slots); the sequential greedy label decode is a scan carrying
(LSTM state, previous label). Sorting is a static ``argsort`` with invalid
slots pushed to the end. The GloVe tables the reference loads from disk are
injectable via ``embed_init`` (random-normal by default). The reference's
``BatchNorm1d(4)`` on the position input is replaced by LayerNorm (no
cross-batch state under jit).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def sort_rois(boxes: Array, valid: Array, scores: Optional[Array] = None,
              order: str = "leftright") -> Tuple[Array, Array]:
    """→ (perm [N], inv_perm [N]); invalid slots sort last
    (``roi_sorter.py``: 'leftright' = center-x, 'confidence', 'size')."""
    if order == "leftright":
        key = (boxes[:, 0] + boxes[:, 2]) / 2.0
    elif order == "confidence":
        key = -scores
    elif order == "size":
        key = -((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
    else:                                   # 'random' — fixed under jit
        key = jnp.arange(boxes.shape[0], dtype=jnp.float32)
    big = jnp.abs(key).max() + 1.0
    key = jnp.where(valid, key, big + jnp.arange(key.shape[0]))
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    return perm, inv


class _MaskedLSTMCell(nn.Module):
    """LSTMCell step that freezes state on invalid slots (the reference's
    pack_padded_sequence). Scanned with ``nn.scan``."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, inp):
        x, m = inp                                   # x [D], m scalar bool
        cell = nn.LSTMCell(self.hidden, name="cell", dtype=self.dtype)
        new_c, y = cell(carry, x[None])
        keep = lambda a, b: jnp.where(m, a, b)
        c2 = jax.tree_util.tree_map(keep, new_c, carry)
        return c2, jnp.where(m, y[0], 0.0)


class _DecoderCell(nn.Module):
    """One greedy label-decoding step: LSTM on [ctx; embed(prev label)],
    argmax over foreground classes, optional teacher forcing."""

    num_obj_classes: int
    embed_dim: int
    hidden: int
    teacher_forcing: bool
    embed_init: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, state, inp):
        c, prev = state
        x, m, forced = inp
        table = self.param("embed", self.embed_init,
                           (self.num_obj_classes + 1, self.embed_dim))
        xin = jnp.concatenate([x, table[prev]])
        cell = nn.LSTMCell(self.hidden, name="cell", dtype=self.dtype)
        new_c, y = cell(c, xin[None])
        logits = nn.Dense(self.num_obj_classes, name="out",
                          dtype=self.dtype)(y[0])
        pred = (jnp.argmax(logits[1:]) + 1).astype(jnp.int32)  # never bg
        nxt = forced if self.teacher_forcing else pred
        keep = lambda a, b: jnp.where(m, a, b)
        c2 = jax.tree_util.tree_map(keep, new_c, c)
        return ((c2, jnp.where(m, nxt, prev)),
                (jnp.where(m, logits, 0.0), jnp.where(m, pred, 0)))


_SCAN_KW = dict(variable_broadcast="params", split_rngs={"params": False},
                in_axes=0, out_axes=0)


class MotifContext(nn.Module):
    """Object + edge context encoder (``context_encoder.py``)."""

    num_obj_classes: int
    obj_dim: int = 2048
    embed_dim: int = 200
    pos_embed_dim: int = 128
    hidden_dim: int = 256
    order: str = "leftright"
    embed_init: Any = nn.initializers.normal(1.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_feats: Array, obj_dists: Array, boxes: Array,
                 image_hw: Array, valid: Array,
                 gt_labels: Optional[Array] = None):
        """obj_feats [N, obj_dim] · obj_dists [N, C] (detector prob dists) ·
        boxes [N, 4] xyxy · image_hw [2] · valid [N] bool →
        (obj_logits [N, C], obj_preds [N], edge_ctx [N, hidden])."""
        n = obj_feats.shape[0]
        embed_table = self.param("obj_embed", self.embed_init,
                                 (self.num_obj_classes, self.embed_dim))
        soft_embed = obj_dists @ embed_table                    # [N, E]

        h, w = image_hw[0], image_hw[1]
        pos_in = jnp.stack([boxes[:, 0] / w, boxes[:, 1] / h,
                            boxes[:, 2] / w, boxes[:, 3] / h], -1)
        pos_in = nn.LayerNorm(name="pos_norm")(pos_in)
        pos = nn.relu(nn.Dense(self.pos_embed_dim, name="pos_embed",
                               dtype=self.dtype)(pos_in))

        obj_pre = jnp.concatenate([obj_feats, soft_embed, pos], -1)

        perm, inv = sort_rois(boxes, valid, obj_dists.max(-1), self.order)
        seq = obj_pre[perm]
        mask = valid[perm]

        # --- object context LSTM
        obj_rnn = nn.scan(_MaskedLSTMCell, **_SCAN_KW)(
            self.hidden_dim, dtype=self.dtype, name="obj_ctx_rnn")
        carry = nn.LSTMCell(self.hidden_dim).initialize_carry(
            jax.random.PRNGKey(0), (1, seq.shape[-1]))
        _, obj_ctx_sorted = obj_rnn(carry, (seq, mask))

        # --- greedy decoder RNN: previous label embedding feeds forward
        gt_sorted = (gt_labels[perm].astype(jnp.int32)
                     if gt_labels is not None
                     else jnp.zeros((n,), jnp.int32))
        decoder = nn.scan(_DecoderCell, **_SCAN_KW)(
            self.num_obj_classes, self.embed_dim, self.hidden_dim,
            teacher_forcing=gt_labels is not None,
            embed_init=self.embed_init, dtype=self.dtype,
            name="decoder_rnn")
        dec_carry = nn.LSTMCell(self.hidden_dim).initialize_carry(
            jax.random.PRNGKey(0), (1, self.hidden_dim + self.embed_dim))
        start = jnp.asarray(self.num_obj_classes, jnp.int32)  # 'start' token
        _, (obj_logits_sorted, obj_preds_sorted) = decoder(
            (dec_carry, start), (obj_ctx_sorted, mask, gt_sorted))

        labels_for_edges = (gt_sorted if gt_sorted is not None
                            else obj_preds_sorted)

        # --- edge context LSTM over [label embedding; obj ctx]
        embed2 = self.param("obj_embed2", self.embed_init,
                            (self.num_obj_classes, self.embed_dim))
        edge_in = jnp.concatenate(
            [embed2[jnp.clip(labels_for_edges, 0, self.num_obj_classes - 1)],
             obj_ctx_sorted], -1)
        edge_rnn = nn.scan(_MaskedLSTMCell, **_SCAN_KW)(
            self.hidden_dim, dtype=self.dtype, name="edge_ctx_rnn")
        ecarry = nn.LSTMCell(self.hidden_dim).initialize_carry(
            jax.random.PRNGKey(0), (1, edge_in.shape[-1]))
        _, edge_ctx_sorted = edge_rnn(ecarry, (edge_in, mask))

        return (obj_logits_sorted[inv], obj_preds_sorted[inv],
                edge_ctx_sorted[inv])


class NeuralMotifHead(nn.Module):
    """Full motif predicate head (``neuralmotif.py:103-182``)."""

    num_obj_classes: int
    num_rel_classes: int = 51
    obj_dim: int = 2048
    hidden_dim: int = 256
    use_tanh: bool = True
    order: str = "leftright"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_feats: Array, obj_dists: Array, boxes: Array,
                 image_hw: Array, obj_valid: Array, union_feats: Array,
                 pairs: Array, pair_valid: Array,
                 gt_labels: Optional[Array] = None):
        """union_feats [P, obj_dim] (union-box pooled features) · pairs
        [P, 2] → (obj_logits [N, C], rel_logits [P, R], obj_preds [N])."""
        ctx = MotifContext(self.num_obj_classes, obj_dim=self.obj_dim,
                           hidden_dim=self.hidden_dim, order=self.order,
                           dtype=self.dtype, name="context")
        obj_logits, obj_preds, edge_ctx = ctx(obj_feats, obj_dists, boxes,
                                              image_hw, obj_valid, gt_labels)

        edge_rep = nn.Dense(
            self.obj_dim * 2, name="post_lstm_fc", dtype=self.dtype,
            kernel_init=nn.initializers.normal(
                10.0 * (1.0 / self.hidden_dim) ** 0.5))(edge_ctx)
        edge_rep = edge_rep.reshape(-1, 2, self.obj_dim)
        subj_rep, obj_rep = edge_rep[:, 0], edge_rep[:, 1]

        prod = subj_rep[pairs[:, 0]] * obj_rep[pairs[:, 1]] * union_feats
        if self.use_tanh:
            prod = jnp.tanh(prod)
        rel_logits = nn.Dense(self.num_rel_classes, name="pred_predictor",
                              dtype=self.dtype)(prod)
        rel_logits = rel_logits * pair_valid[:, None]
        return obj_logits, rel_logits, obj_preds
