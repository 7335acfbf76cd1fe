"""Scene-graph relation head — RelDN (the VinVL relation-training algorithm).

Parity-scoped implementation of reference
``scene_graph_benchmark/relation_head`` with the ``sg_reldn`` algorithm
(``reldn/reldn.py``), the configuration VinVL's relation pretraining used
("vrdvgvrd" checkpoints). Components:

  * union-box visual feature: own RoIAlign + stage-5 extractor over the
    subject∪object box, avg-pooled (``roi_relation_feature_extractors``)
  * relation embedding MLP over [subj_feat ‖ union_feat ‖ obj_feat]
    (3d → 3d/2 → d, LeakyReLU 0.1)
  * three visual predictors (subject / object / predicate linears) summed
  * 28-d spatial pair features → MLP(28→64→64, LeakyReLU 0.1) → linear
    (``reldn/spatial.py``)
  * frequency bias ``log(freq_prior[subj_label, obj_label] + 1e-3)``
    (``sparse_targets.FrequencyBias``)
  * final logits = visual + spatial + semantic

Pairing: static all-pairs enumeration over the detection slots (the
``sg_baseline`` pairing; the reference's learned RelPN is a documented
simplification — pairs are masked by detection validity). Losses: predicate
CE with ignore −1 (``relation_head/loss.py`` core term).

The IMP/MSDN/MOTIF/GRCNN algorithm variants remain documented gaps
(unused by VinVL's shipped models).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cpt_tpu.models.bert.heads import cross_entropy_ignore_index
from cpt_tpu.models.detector.config import DetectorConfig
from cpt_tpu.models.detector.resnet import ResNetC5Head
from cpt_tpu.ops.roi_align import roi_align
from cpt_tpu.structures.boxes import encode_boxes

Array = jax.Array


def leaky(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def boxes_union(a: Array, b: Array) -> Array:
    return jnp.stack([jnp.minimum(a[..., 0], b[..., 0]),
                      jnp.minimum(a[..., 1], b[..., 1]),
                      jnp.maximum(a[..., 2], b[..., 2]),
                      jnp.maximum(a[..., 3], b[..., 3])], axis=-1)


def _pair_delta(a: Array, b: Array) -> Array:
    """bbox_transform_inv with unit weights (``reldn/spatial.py:16-48``)."""
    return encode_boxes(b, a, (1.0, 1.0, 1.0, 1.0))


def spatial_pair_features(subj: Array, obj: Array, image_hw: Array) -> Array:
    """[P, 28] spatial features (``spatial.py:_get_spt_features``)."""
    h = image_hw[0].astype(jnp.float32)
    w = image_hw[1].astype(jnp.float32)
    union = boxes_union(subj, obj)

    def box_feat(bx):
        area = ((bx[:, 2] - bx[:, 0] + 1) * (bx[:, 3] - bx[:, 1] + 1)
                / (w * h))
        return jnp.stack([bx[:, 0] / w, bx[:, 1] / h, bx[:, 2] / w,
                          bx[:, 3] / h, area], axis=1)

    d12 = _pair_delta(subj, obj)
    d21 = _pair_delta(obj, subj)[:, :2]
    d1u = jnp.concatenate([_pair_delta(subj, union),
                           _pair_delta(union, subj)[:, :2]], axis=1)
    du2 = jnp.concatenate([_pair_delta(union, obj),
                           _pair_delta(obj, union)[:, :2]], axis=1)
    return jnp.concatenate([jnp.concatenate([d12, d21], axis=1), d1u, du2,
                            box_feat(subj), box_feat(obj)], axis=1)


def all_pairs(num_slots: int) -> Array:
    """Static (i, j) index pairs, i ≠ j → [num_slots·(num_slots−1), 2]."""
    import numpy as np

    pairs = [(i, j) for i in range(num_slots) for j in range(num_slots)
             if i != j]
    return jnp.asarray(np.asarray(pairs, np.int32))


class RelDNHead(nn.Module):
    config: DetectorConfig
    num_rel_classes: int = 51
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_map: Array, det_boxes: Array,
                 det_labels: Array, box_features: Array, pairs: Array,
                 pair_valid: Array, image_hw: Array,
                 freq_prior: Optional[Array] = None) -> Array:
        """→ relation logits [P, num_rel_classes].

        feature_map [h, w, C4] · det_boxes [N, 4] · det_labels [N] ·
        box_features [N, D] (the box head's pooled features) · pairs [P, 2] ·
        freq_prior [num_obj_classes, num_obj_classes, num_rel_classes].
        """
        c = self.config
        rh = c.roi_heads
        d = box_features.shape[-1]

        subj_boxes = det_boxes[pairs[:, 0]]
        obj_boxes = det_boxes[pairs[:, 1]]
        union = boxes_union(subj_boxes, obj_boxes)

        pooled = roi_align(feature_map, union,
                           spatial_scale=rh.pooler_scale,
                           pooled=rh.pooler_resolution,
                           sampling=rh.pooler_sampling_ratio)
        x_pred = ResNetC5Head(c.backbone, self.dtype,
                              name="pred_feature_extractor")(pooled)
        x_pred = jnp.mean(x_pred, axis=(1, 2))            # [P, D]

        subj_feat = box_features[pairs[:, 0]].astype(self.dtype)
        obj_feat = box_features[pairs[:, 1]].astype(self.dtype)

        x_rel = jnp.concatenate([subj_feat, x_pred, obj_feat], axis=1)
        x_rel = nn.Dense(3 * d // 2, name="rel_embedding_0",
                         dtype=self.dtype)(x_rel)
        x_rel = leaky(x_rel)
        x_rel = nn.Dense(d, name="rel_embedding_1", dtype=self.dtype)(x_rel)
        x_rel = leaky(x_rel)

        vis = (nn.Dense(self.num_rel_classes, name="rel_pred_predictor",
                        dtype=self.dtype)(x_rel)
               + nn.Dense(self.num_rel_classes, name="rel_subj_predictor",
                          dtype=self.dtype)(subj_feat)
               + nn.Dense(self.num_rel_classes, name="rel_obj_predictor",
                          dtype=self.dtype)(obj_feat))

        spt = spatial_pair_features(subj_boxes, obj_boxes, image_hw)
        spt = leaky(nn.Dense(64, name="spatial_0", dtype=self.dtype)(
            spt.astype(self.dtype)))
        spt = leaky(nn.Dense(64, name="spatial_1", dtype=self.dtype)(spt))
        spt_logits = nn.Dense(self.num_rel_classes, name="rel_spt_predictor",
                              dtype=self.dtype)(spt)

        logits = vis.astype(jnp.float32) + spt_logits.astype(jnp.float32)
        if freq_prior is not None:
            sem = jnp.log(freq_prior + 1e-3)[det_labels[pairs[:, 0]],
                                             det_labels[pairs[:, 1]]]
            logits = logits + sem
        return jnp.where(pair_valid[:, None], logits, 0.0)


def relation_loss(rel_logits: Array, rel_labels: Array) -> Array:
    """Predicate CE with ignore −1 (sampled-pair loss core,
    ``relation_head/loss.py``)."""
    return cross_entropy_ignore_index(rel_logits, rel_labels)


def match_pair_labels(pairs: Array, det_boxes: Array, gt_rels: Array,
                      gt_boxes: Array, gt_valid: Array,
                      iou_thresh: float = 0.5) -> Array:
    """Assign predicate labels to detection pairs: a pair (i, j) gets gt
    relation (s, o, p)'s predicate if box_i matches gt_s and box_j matches
    gt_o at IoU ≥ thresh; 0 (background) otherwise; −1 for invalid gt rows
    handled by masking. gt_rels [R, 3] = (subj gt idx, obj gt idx,
    predicate); ``gt_valid`` is the per-RELATION-ROW validity mask
    (length ≥ R — padded rel rows must be marked invalid here).
    """
    from cpt_tpu.structures.boxes import box_iou

    iou = box_iou(det_boxes, gt_boxes)                   # [N, G]
    best_gt = jnp.argmax(iou, axis=1)
    matched = jnp.max(iou, axis=1) >= iou_thresh

    subj_gt = best_gt[pairs[:, 0]]
    obj_gt = best_gt[pairs[:, 1]]
    subj_ok = matched[pairs[:, 0]]
    obj_ok = matched[pairs[:, 1]]

    labels = jnp.zeros((pairs.shape[0],), jnp.int32)
    for_rel = gt_rels.astype(jnp.int32)                  # [R, 3]
    hit = ((subj_gt[:, None] == for_rel[None, :, 0])
           & (obj_gt[:, None] == for_rel[None, :, 1])
           & subj_ok[:, None] & obj_ok[:, None]
           & gt_valid[None, : for_rel.shape[0]])
    # first matching gt relation wins
    any_hit = jnp.any(hit, axis=1)
    first = jnp.argmax(hit, axis=1)
    labels = jnp.where(any_hit, for_rel[first, 2], 0)
    return labels


def balanced_pair_sample(pair_labels: Array, rng: Array, batch_size: int,
                         positive_fraction: float) -> Array:
    """Fixed-proportion pair subsampling
    (``balanced_positive_negative_pair_sampler.py``): labels −1 = ignore,
    0 = negative, ≥1 = positive → bool keep-mask with ≤ bs·frac positives
    and positives + negatives ≤ bs. Static shapes (mask, not indices)."""
    import jax

    n = pair_labels.shape[0]
    pos = pair_labels >= 1
    neg = pair_labels == 0
    k_pos, k_neg = jax.random.split(rng)

    def pick(mask, limit, key):
        pri = jax.random.uniform(key, (n,)) + (~mask) * 10.0
        order = jnp.argsort(pri)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        return mask & (rank < limit)

    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(pos), max_pos)
    pos_mask = pick(pos, num_pos, k_pos)
    num_neg = jnp.minimum(jnp.sum(neg), batch_size - num_pos)
    neg_mask = pick(neg, num_neg, k_neg)
    return pos_mask | neg_mask


def _grouped_margin_loss(affinity: Array, group_ids: Array, pos: Array,
                         neg: Array, num_groups: int, margin: float
                         ) -> Array:
    """RelDN contrastive core (``relation_head/loss.py:529-552``): per
    group, rank the MIN positive affinity above the MAX negative affinity
    with a margin; mean over groups that have both (+1 dummy zero-loss
    element, matching the reference's seeded batch)."""
    import jax

    inf = jnp.inf
    pos_min = jax.ops.segment_min(jnp.where(pos, affinity, inf), group_ids,
                                  num_segments=num_groups)
    neg_max = jax.ops.segment_max(jnp.where(neg, affinity, -inf), group_ids,
                                  num_segments=num_groups)
    has_pos = jax.ops.segment_max(pos.astype(jnp.float32), group_ids,
                                  num_segments=num_groups) > 0
    has_neg = jax.ops.segment_max(neg.astype(jnp.float32), group_ids,
                                  num_segments=num_groups) > 0
    ok = has_pos & has_neg
    per = jnp.maximum(margin - (pos_min - neg_max), 0.0)
    return jnp.where(ok, per, 0.0).sum() / (ok.sum() + 1)


def reldn_contrastive_losses(rel_logits: Array, pairs: Array,
                             pair_labels: Array, pair_valid: Array,
                             det_labels: Array, num_objs: int, *,
                             num_obj_classes: int, num_rel_classes: int,
                             margin: float = 0.2,
                             so_margin: float = 0.2,
                             p_margin: float = 0.2) -> dict:
    """RelDN graphical contrastive losses
    (``relation_head/loss.py:398-527``, VRD configs `CONTRASTIVE_LOSS
    USE_FLAG True`): for anchor groups of pairs sharing a subject (resp.
    object) detection, rank true-relation affinity (1 − p(no-relation))
    above non-relation affinity.

      * node: groups = anchor detection alone
      * SO-aware: groups further split by the OTHER endpoint's class
      * P-aware: groups split by the positives' gt predicate; affinity for
        that predicate's probability

    pair_labels [P] int (0 = no relation, ≥1 = gt predicate; −1 ignored).
    """
    import jax

    probs = jax.nn.softmax(rel_logits.astype(jnp.float32), axis=-1)
    affinity = 1.0 - probs[:, 0]
    valid = pair_valid & (pair_labels >= 0)
    pos = valid & (pair_labels >= 1)
    neg = valid & (pair_labels == 0)

    out = {}
    for name, anchor, other in (("sbj", pairs[:, 0], pairs[:, 1]),
                                ("obj", pairs[:, 1], pairs[:, 0])):
        out[f"loss_contrastive_{name}"] = _grouped_margin_loss(
            affinity, anchor, pos, neg, num_objs, margin)
        # SO-aware: split anchor groups by the other endpoint's class
        so_ids = anchor * num_obj_classes + jnp.clip(
            det_labels[other], 0, num_obj_classes - 1)
        out[f"loss_so_contrastive_{name}"] = _grouped_margin_loss(
            affinity, so_ids, pos, neg, num_objs * num_obj_classes,
            so_margin)
        # P-aware: positives grouped by gt predicate, negatives by the
        # DETECTED predicate (loss.py:628,645); affinity unchanged
        det_prd = jnp.argmax(probs[:, 1:], axis=-1) + 1
        prd_of_pair = jnp.where(pos, pair_labels, det_prd)
        p_ids = anchor * num_rel_classes + jnp.clip(
            prd_of_pair, 0, num_rel_classes - 1)
        out[f"loss_p_contrastive_{name}"] = _grouped_margin_loss(
            affinity, p_ids, pos, neg, num_objs * num_rel_classes,
            p_margin)
    return out
