"""Detector training losses — matcher, balanced sampling, RPN / FastRCNN /
attribute losses, all static-shape.

Parity with reference ``maskrcnn_benchmark/modeling``:
  * ``matcher.py:121`` — IoU matcher with BELOW_LOW (−1) / BETWEEN (−2)
    sentinels and allow-low-quality gt force-matching
  * ``balanced_positive_negative_sampler.py:68`` — per-image pos/neg
    minibatch sampling (positive_fraction)
  * ``rpn/loss.py:157`` — objectness BCE + smooth-L1(β=1/9) over sampled
    anchors
  * ``roi_heads/box_head/loss.py:227`` — CE + per-class smooth-L1(β=1)
    box regression, normalized by the number of sampled proposals
  * ``scene_graph_benchmark/attribute_head/loss.py`` — soft-target CE over
    attribute logits (uniform over each box's gt attributes)

TPU-native: no index lists — everything is computed as fixed-shape masks;
"sampling" ranks a random priority among eligible entries and keeps the
top-k (identical distribution to torch's randperm subset).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cpt_tpu.structures.boxes import box_iou, encode_boxes

Array = jax.Array

BELOW_LOW = -1
BETWEEN = -2


def match_proposals(iou: Array, high: float, low: float,
                    allow_low_quality: bool = False,
                    gt_valid: Optional[Array] = None) -> Array:
    """iou [num_gt, num_pred] → matches [num_pred] (gt index, or −1/−2)."""
    if gt_valid is not None:
        iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_vals = jnp.max(iou, axis=0)
    matches = jnp.argmax(iou, axis=0).astype(jnp.int32)
    out = jnp.where(matched_vals < low, BELOW_LOW,
                    jnp.where(matched_vals < high, BETWEEN, matches))
    if allow_low_quality:
        # for each gt, any prediction achieving its max IoU is forced matched
        gt_max = jnp.max(iou, axis=1, keepdims=True)          # [num_gt, 1]
        is_best = (iou == gt_max) & (gt_max > 0)
        force = jnp.any(is_best, axis=0)
        out = jnp.where(force, matches, out)
    return out


def balanced_sample(matches: Array, rng: Array, batch_size: int,
                    positive_fraction: float, valid: Optional[Array] = None
                    ) -> Tuple[Array, Array]:
    """→ (pos_mask, neg_mask) with |pos| ≤ bs·frac, |pos|+|neg| ≤ bs."""
    pos = matches >= 0
    neg = matches == BELOW_LOW
    if valid is not None:
        pos &= valid
        neg &= valid
    n = matches.shape[0]
    k_pos, k_neg = jax.random.split(rng)

    def pick(mask, limit, key):
        # rank random priorities among eligible; keep the top `limit`
        pri = jax.random.uniform(key, (n,)) + (~mask) * 10.0
        order = jnp.argsort(pri)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        return mask & (rank < limit)

    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(pos), max_pos)
    pos_mask = pick(pos, num_pos, k_pos)
    num_neg = jnp.minimum(jnp.sum(neg), batch_size - num_pos)
    neg_mask = pick(neg, num_neg, k_neg)
    return pos_mask, neg_mask


def smooth_l1(pred: Array, target: Array, beta: float) -> Array:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def rpn_loss(objectness: Array, box_deltas: Array, anchors: Array,
             gt_boxes: Array, gt_valid: Array, rng: Array, *,
             fg_iou: float = 0.7, bg_iou: float = 0.3,
             batch_size_per_image: int = 256, positive_fraction: float = 0.5,
             anchor_visible: Optional[Array] = None
             ) -> Tuple[Array, Array]:
    """Single image. objectness [A], box_deltas [A, 4], anchors [A, 4],
    gt_boxes [G, 4] (+ gt_valid [G]) → (objectness_loss, box_loss)."""
    iou = box_iou(gt_boxes, anchors)
    matches = match_proposals(iou, fg_iou, bg_iou, allow_low_quality=True,
                              gt_valid=gt_valid)
    if anchor_visible is not None:
        matches = jnp.where(anchor_visible, matches, BETWEEN)
    pos, neg = balanced_sample(matches, rng, batch_size_per_image,
                               positive_fraction)
    sampled = pos | neg
    n_sampled = jnp.maximum(jnp.sum(sampled), 1)

    labels = (matches >= 0).astype(jnp.float32)
    logits = objectness.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    objectness_loss = jnp.sum(jnp.where(sampled, bce, 0.0)) / n_sampled

    matched_gt = gt_boxes[jnp.maximum(matches, 0)]
    targets = encode_boxes(matched_gt, anchors, (1.0, 1.0, 1.0, 1.0))
    l1 = smooth_l1(box_deltas.astype(jnp.float32), targets, beta=1.0 / 9)
    box_loss = jnp.sum(jnp.where(pos[:, None], l1, 0.0)) / n_sampled
    return objectness_loss, box_loss


def subsample_proposals(proposals: Array, proposal_valid: Array,
                        gt_boxes: Array, gt_labels: Array, gt_valid: Array,
                        rng: Array, *, batch_size_per_image: int = 384,
                        positive_fraction: float = 0.5, fg_iou: float = 0.5,
                        bg_iou: float = 0.5):
    """FastRCNN train-time proposal subsampling
    (``box_head/loss.py`` prepare_targets + subsample): returns per-proposal
    (labels [P] (0 = bg), reg_targets [P, 4], pos_mask, sampled_mask)."""
    iou = box_iou(gt_boxes, proposals)
    matches = match_proposals(iou, fg_iou, bg_iou, allow_low_quality=False,
                              gt_valid=gt_valid)
    pos, neg = balanced_sample(matches, rng, batch_size_per_image,
                               positive_fraction, valid=proposal_valid)
    labels = jnp.where(pos, gt_labels[jnp.maximum(matches, 0)], 0)
    matched_gt = gt_boxes[jnp.maximum(matches, 0)]
    reg_targets = encode_boxes(matched_gt, proposals, (10.0, 10.0, 5.0, 5.0))
    return labels, reg_targets, pos, pos | neg


def fast_rcnn_loss(class_logits: Array, box_deltas: Array, labels: Array,
                   reg_targets: Array, pos_mask: Array, sampled_mask: Array,
                   *, num_classes: int) -> Tuple[Array, Array]:
    """class_logits [P, C], box_deltas [P, C*4] → (cls_loss, box_loss)."""
    n_sampled = jnp.maximum(jnp.sum(sampled_mask), 1)
    logp = jax.nn.log_softmax(class_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    cls_loss = jnp.sum(jnp.where(sampled_mask, nll, 0.0)) / n_sampled

    deltas = box_deltas.astype(jnp.float32).reshape(
        box_deltas.shape[0], num_classes, 4)
    per_label = jnp.take_along_axis(
        deltas, labels[:, None, None].repeat(4, axis=2), axis=1)[:, 0]
    l1 = smooth_l1(per_label, reg_targets, beta=1.0)
    box_loss = jnp.sum(jnp.where(pos_mask[:, None], l1, 0.0)) / n_sampled
    return cls_loss, box_loss


def attribute_loss(attr_logits: Array, gt_attributes: Array,
                   valid: Array, *, loss_weight: float = 1.0) -> Array:
    """Soft-target CE (reference ``attribute_head/loss.py:48-64``):
    gt_attributes [P, K] attribute ids (0 = none); target = uniform over a
    box's nonzero attributes; boxes with none contribute 0."""
    n, num_attr = attr_logits.shape
    present = gt_attributes > 0                                 # [P, K]
    counts = jnp.sum(present, axis=1)                           # [P]
    onehots = jax.nn.one_hot(gt_attributes, num_attr) * present[..., None]
    soft = jnp.sum(onehots, axis=1) / jnp.maximum(counts, 1)[:, None]
    logp = jax.nn.log_softmax(attr_logits.astype(jnp.float32), axis=-1)
    per_box = -jnp.sum(soft * logp, axis=1)
    per_box = jnp.where(valid & (counts > 0), per_box, 0.0)
    # reference takes the mean over all (real) proposals; padded slots are
    # excluded from the denominator here
    return loss_weight * jnp.sum(per_box) / jnp.maximum(jnp.sum(valid), 1)
