"""Scene-graph relation-head variants: IMP, MSDN, GRCNN, learned RelPN.

Parity with the reference's non-RelDN algorithms
(``scene_graph_benchmark/relation_head/``):

  * IMP (``imp/imp.py:17-126``): gated message passing between object nodes
    and predicate edges with GRU updates, shared gates across steps.
  * MSDN (``msdn/msdn.py``, ``msdn_base.py``): message-passing units
    (v1: sigmoid(W·[unary; pair]).mean gate) + a linear "GRU" unit with
    residual updates.
  * GRCNN (``grcnn/grcnn.py`` + ``agcn/agcn.py``): attentional GCN collect
    (relu(W·source), incidence-normalized) / additive update, run at the
    feature level then again at the score level.
  * RelPN relationshipness (``relpn/relationshipness.py:9-54``): bilinear
    64-d subject/object scorer (+ optional 6-d box position encoders),
    sigmoid; used to select top-K candidate pairs instead of all pairs.

TPU-native design: the per-edge ``index_select``/``scatter_`` loops become
static one-hot incidence matrices ([N, P] subject/object maps) and plain
matmuls; pair counts are padded with validity masks; update loops are
unrolled (update_step is a small static constant). Feature inputs are the
same pooled box features / union-box features the RelDN head uses
(``relation_head.py``) — these modules consume [N, F] / [P, F] directly.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def incidence_maps(pairs: Array, num_objs: int, pair_valid: Array
                   ) -> Tuple[Array, Array]:
    """pairs [P, 2] → (subj_map [N, P], obj_map [N, P]) 0/1 incidence
    (the reference's ``_get_map_idxs`` scatter, built densely)."""
    v = pair_valid.astype(jnp.float32)
    subj = jax.nn.one_hot(pairs[:, 0], num_objs).T * v[None, :]
    obj = jax.nn.one_hot(pairs[:, 1], num_objs).T * v[None, :]
    return subj, obj


def _mlp2(x: Array, dim: int, name: str, dtype=jnp.float32) -> Array:
    x = nn.Dense(dim, name=f"{name}_fc1", dtype=dtype)(x)
    return nn.Dense(dim, name=f"{name}_fc2", dtype=dtype)(nn.relu(x))


class IMPHead(nn.Module):
    """Iterative message passing (``imp/imp.py``). obj/pred features in,
    (obj_logits [N, C], rel_logits [P, R]) out."""

    num_obj_classes: int
    num_rel_classes: int = 51
    dim: int = 512
    update_step: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_feats: Array, pred_feats: Array, pairs: Array,
                 obj_valid: Array, pair_valid: Array):
        n = obj_feats.shape[0]
        subj_map, obj_map = incidence_maps(pairs, n, pair_valid)
        h_obj = _mlp2(obj_feats, self.dim, "obj_embedding", self.dtype)
        h_edge = _mlp2(pred_feats, self.dim, "pred_embedding", self.dtype)

        node_gru = nn.GRUCell(self.dim, name="node_gru", dtype=self.dtype)
        edge_gru = nn.GRUCell(self.dim, name="edge_gru", dtype=self.dtype)
        gates = {k: nn.Dense(1, name=f"{k}_gate", dtype=self.dtype)
                 for k in ("subj_node", "obj_node", "subj_edge", "obj_edge")}

        for _ in range(self.update_step):
            sub_vert = h_obj[pairs[:, 0]]
            obj_vert = h_obj[pairs[:, 1]]
            g_ps = jax.nn.sigmoid(
                gates["subj_node"](jnp.concatenate([sub_vert, h_edge], 1)))
            g_po = jax.nn.sigmoid(
                gates["obj_node"](jnp.concatenate([obj_vert, h_edge], 1)))
            node_msg = (subj_map @ (g_ps * h_edge)
                        / (subj_map.sum(1, keepdims=True) + 1e-5)
                        + obj_map @ (g_po * h_edge)
                        / (obj_map.sum(1, keepdims=True) + 1e-5)) / 2.0
            h_obj, _ = node_gru(h_obj, node_msg)

            g_sp = jax.nn.sigmoid(
                gates["subj_edge"](jnp.concatenate([sub_vert, h_edge], 1)))
            g_op = jax.nn.sigmoid(
                gates["obj_edge"](jnp.concatenate([obj_vert, h_edge], 1)))
            edge_msg = (g_sp * sub_vert + g_op * obj_vert) / 2.0
            h_edge, _ = edge_gru(h_edge, edge_msg)

        obj_logits = nn.Dense(self.num_obj_classes, name="obj_predictor",
                              dtype=self.dtype)(h_obj)
        rel_logits = nn.Dense(self.num_rel_classes, name="pred_predictor",
                              dtype=self.dtype)(h_edge)
        return obj_logits, rel_logits


class _MPU(nn.Module):
    """Message_Passing_Unit_v1 (``msdn_base.py:38-63``): mean-sigmoid gate
    on [unary; pair], scales the pair term."""

    filter_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unary: Array, pair: Array) -> Array:
        gate = nn.Dense(self.filter_size, name="w", dtype=self.dtype)(
            nn.relu(jnp.concatenate([unary, pair], 1)))
        return pair * jax.nn.sigmoid(gate).mean(1, keepdims=True)


class _LinearGRU(nn.Module):
    """Gated_Recurrent_Unit (``msdn_base.py:66-78``):
    W_ih·relu(x) + W_hh·relu(h)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, h: Array) -> Array:
        return (nn.Dense(self.dim, name="wih", dtype=self.dtype)(nn.relu(x))
                + nn.Dense(self.dim, name="whh", dtype=self.dtype)(
                    nn.relu(h)))


class MSDNHead(nn.Module):
    """Multi-level scene description network (``msdn/msdn.py``)."""

    num_obj_classes: int
    num_rel_classes: int = 51
    dim: int = 1024
    update_step: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_feats: Array, pred_feats: Array, pairs: Array,
                 obj_valid: Array, pair_valid: Array):
        n = obj_feats.shape[0]
        subj_map, obj_map = incidence_maps(pairs, n, pair_valid)
        x_obj = _mlp2(obj_feats, self.dim, "obj_embedding", self.dtype)
        x_pred = _mlp2(pred_feats, self.dim, "rel_embedding", self.dtype)

        g_p2s = _MPU(name="gate_pred2sub", dtype=self.dtype)
        g_p2o = _MPU(name="gate_pred2obj", dtype=self.dtype)
        g_s2p = _MPU(name="gate_sub2pred", dtype=self.dtype)
        g_o2p = _MPU(name="gate_obj2pred", dtype=self.dtype)
        gru_obj = _LinearGRU(self.dim, name="gru_object", dtype=self.dtype)
        gru_pred = _LinearGRU(self.dim, name="gru_pred", dtype=self.dtype)

        for _ in range(self.update_step):
            sub_vert = x_obj[pairs[:, 0]]
            obj_vert = x_obj[pairs[:, 1]]
            # per-edge gated messages, averaged over incident edges
            m_sub = g_p2s(sub_vert, x_pred)
            m_obj = g_p2o(obj_vert, x_pred)
            obj_in = ((subj_map @ m_sub)
                      / (subj_map.sum(1, keepdims=True) + 1e-5)
                      + (obj_map @ m_obj)
                      / (obj_map.sum(1, keepdims=True) + 1e-5)) / 2.0
            x_obj_new = x_obj + gru_obj(obj_in, x_obj)

            pred_in = (g_s2p(x_pred, sub_vert) / 2.0
                       + g_o2p(x_pred, obj_vert) / 2.0)
            x_pred = x_pred + gru_pred(pred_in, x_pred)
            x_obj = x_obj_new

        obj_logits = nn.Dense(self.num_obj_classes, name="obj_predictor",
                              dtype=self.dtype)(x_obj)
        rel_logits = nn.Dense(self.num_rel_classes, name="pred_predictor",
                              dtype=self.dtype)(x_pred)
        return obj_logits, rel_logits


class _Collect(nn.Module):
    """_Collection_Unit (``agcn.py:18-30``): incidence-normalized
    attention @ relu(W·source)."""

    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source: Array, attention: Array) -> Array:
        fc = nn.relu(nn.Dense(self.dim_out, name="fc", dtype=self.dtype,
                              kernel_init=nn.initializers.normal(0.01)
                              )(source))
        out = attention @ fc
        return out / (attention.sum(1, keepdims=True) + 1e-7)


class GRCNNHead(nn.Module):
    """Graph R-CNN attentional GCN (``grcnn/grcnn.py``): feature-level
    message rounds then score-level rounds. ``obj_scores_all`` are the
    detector's per-class scores ([N, C], the ``scores_all`` field)."""

    num_obj_classes: int
    num_rel_classes: int = 51
    dim: int = 1024
    feat_update_step: int = 2
    score_update_step: int = 2
    dtype: Any = jnp.float32

    def _round(self, x_obj, x_pred, units, maps):
        subj_map, obj_map, obj_obj = maps
        src_obj = units["obj_from_obj"](x_obj, obj_obj)
        src_sub = units["obj_from_rel_s"](x_pred, subj_map)
        src_o = units["obj_from_rel_o"](x_pred, obj_map)
        new_obj = x_obj + (src_obj + src_sub + src_o) / 3.0
        src_s2r = units["rel_from_obj_s"](x_obj, subj_map.T)
        src_o2r = units["rel_from_obj_o"](x_obj, obj_map.T)
        new_pred = x_pred + (src_s2r + src_o2r) / 2.0
        return new_obj, new_pred

    @nn.compact
    def __call__(self, obj_feats: Array, pred_feats: Array, pairs: Array,
                 obj_valid: Array, pair_valid: Array,
                 obj_scores_all: Optional[Array] = None):
        n = obj_feats.shape[0]
        subj_map, obj_map = incidence_maps(pairs, n, pair_valid)
        ov = obj_valid.astype(jnp.float32)
        obj_obj = (1.0 - jnp.eye(n)) * ov[:, None] * ov[None, :]
        maps = (subj_map, obj_map, obj_obj)

        x_obj = _mlp2(obj_feats, self.dim, "obj_embedding", self.dtype)
        x_pred = _mlp2(pred_feats, self.dim, "rel_embedding", self.dtype)

        feat_units = {
            "obj_from_rel_s": _Collect(self.dim, name="feat_c0"),
            "obj_from_rel_o": _Collect(self.dim, name="feat_c1"),
            "rel_from_obj_s": _Collect(self.dim, name="feat_c2"),
            "rel_from_obj_o": _Collect(self.dim, name="feat_c3"),
            "obj_from_obj": _Collect(self.dim, name="feat_c4"),
        }
        for _ in range(self.feat_update_step):
            x_obj, x_pred = self._round(x_obj, x_pred, feat_units, maps)

        obj_logits = nn.Dense(self.num_obj_classes, name="obj_predictor",
                              dtype=self.dtype)(x_obj)
        rel_logits = nn.Dense(self.num_rel_classes, name="pred_predictor",
                              dtype=self.dtype)(x_pred)

        score_units = {
            "obj_from_rel_s": _Collect(self.num_obj_classes, name="score_c0"),
            "obj_from_rel_o": _Collect(self.num_obj_classes, name="score_c1"),
            "rel_from_obj_s": _Collect(self.num_rel_classes, name="score_c2"),
            "rel_from_obj_o": _Collect(self.num_rel_classes, name="score_c3"),
            "obj_from_obj": _Collect(self.num_obj_classes, name="score_c4"),
        }
        for _ in range(self.score_update_step):
            obj_logits, rel_logits = self._round(obj_logits, rel_logits,
                                                 score_units, maps)
        return obj_logits, rel_logits


class Relationshipness(nn.Module):
    """RelPN pair scorer (``relpn/relationshipness.py``): [N, N] sigmoid
    relationshipness from 64-d subject/object projections (+ optional box
    position encoders over normalized (x1, y1, x2, y2, cx, cy))."""

    pos_encoding: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, boxes: Optional[Array] = None,
                 image_hw: Optional[Array] = None) -> Array:
        s = _mlp2(x, 64, "subj_proj", self.dtype)
        o = _mlp2(x, 64, "obj_proj", self.dtype)
        scores = s @ o.T
        if self.pos_encoding:
            h, w = image_hw[0], image_hw[1]
            pos = jnp.stack([boxes[:, 0] / w, boxes[:, 1] / h,
                             boxes[:, 2] / w, boxes[:, 3] / h,
                             (boxes[:, 0] + boxes[:, 2]) / 2 / w,
                             (boxes[:, 1] + boxes[:, 3]) / 2 / h], -1)
            ps = _mlp2(pos, 64, "sub_pos_encoder", self.dtype)
            po = _mlp2(pos, 64, "obj_pos_encoder", self.dtype)
            scores = scores + ps @ po.T
        return jax.nn.sigmoid(scores)


def relpn_select_pairs(relness: Array, obj_valid: Array, top_k: int
                       ) -> Tuple[Array, Array, Array]:
    """Top-K off-diagonal pairs by relationshipness (``relpn.py`` proposal
    selection, static shapes): → (pairs [K, 2], scores [K], valid [K])."""
    n = relness.shape[0]
    ov = obj_valid
    ok = ov[:, None] & ov[None, :] & ~jnp.eye(n, dtype=bool)
    flat = jnp.where(ok.reshape(-1), relness.reshape(-1), -1.0)
    k = min(top_k, n * n)
    scores, idx = jax.lax.top_k(flat, k)
    pairs = jnp.stack([idx // n, idx % n], -1)
    return pairs, scores, scores >= 0.0


def relpn_loss(relness: Array, gt_adjacency: Array, obj_valid: Array
               ) -> Array:
    """RelPN training loss (``relpn/relpn.py:147-160``): BCE between the
    [N, N] relationshipness matrix and the gt pair adjacency (1 where a
    gt relation connects the two detections). Diagonal and invalid slots
    are masked out."""
    n = relness.shape[0]
    ov = obj_valid
    ok = ov[:, None] & ov[None, :] & ~jnp.eye(n, dtype=bool)
    r = jnp.clip(relness.astype(jnp.float32), 1e-7, 1 - 1e-7)
    y = gt_adjacency.astype(jnp.float32)
    bce = -(y * jnp.log(r) + (1 - y) * jnp.log(1 - r))
    return jnp.where(ok, bce, 0.0).sum() / jnp.maximum(ok.sum(), 1)
