"""Mask, keypoint and RetinaNet heads — upstream maskrcnn capability parity.

These heads are unused by the CPT/VinVL pipelines but part of the reference
framework's capability surface:

  * Mask head: ``roi_heads/mask_head/roi_mask_feature_extractors.py`` (conv
    3x3 stack), ``roi_mask_predictors.py:10-31`` (MaskRCNNC4Predictor:
    deconv 2x2 s2 + relu + 1x1 per-class logits), ``loss.py`` (BCE at the
    matched gt class on positives), ``inference.py`` (class-select +
    ``paste_mask_in_image:119-159``: pad 1, expand box by (M+2)/M, bilinear
    resize to the box, threshold 0.5, clipped paste).
  * Keypoint head: ``roi_keypoint_feature_extractors.py`` (conv3x3 x8 @512),
    ``roi_keypoint_predictors.py:8-33`` (deconv k4 s2 + 2x bilinear),
    ``inference.py:heatmaps_to_keypoints`` (per-keypoint argmax -> image
    coords).
  * RetinaNet: ``rpn/retinanet/retinanet.py:13-86`` (shared 4-conv cls/bbox
    towers over FPN levels, prior-prob bias init), ``loss.py`` (sigmoid
    focal + smooth L1, normalized by #fg), ``inference.py`` (per-level
    top-k + decode, cross-level NMS).

TPU-native design: everything is static-shaped and vmapped. Mask pasting is
a single vectorized bilinear gather per box on device (no per-box python
crops — the reference loops on CPU per instance, ``inference.py:172-180``).
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.models.detector.losses import match_proposals, smooth_l1
from cpt_tpu.ops.focal_loss import sigmoid_focal_loss
from cpt_tpu.ops.nms import nms_padded
from cpt_tpu.structures.boxes import box_iou, decode_boxes, encode_boxes

Array = jax.Array


# ---------------------------------------------------------------- mask head


class MaskHead(nn.Module):
    """Conv stack + MaskRCNNC4Predictor on pooled RoI features.

    [N, P, P, C] -> [N, 2P, 2P, num_classes] mask logits. With
    ``conv_layers=()`` this is the C4 flavor (stage-5 features straight into
    the predictor); non-empty ``conv_layers`` is the FPN flavor.
    """

    num_classes: int
    conv_layers: Tuple[int, ...] = ()
    dim_reduced: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, ch in enumerate(self.conv_layers):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"mask_fcn{i + 1}", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.dim_reduced, (2, 2), strides=(2, 2),
                             name="conv5_mask", dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), name="mask_fcn_logits",
                       dtype=self.dtype)(x)


def mask_loss(mask_logits: Array, gt_masks: Array, labels: Array,
              valid: Array) -> Array:
    """BCE at the matched gt-class channel, positives only
    (``mask_head/loss.py:112-125``).

    mask_logits [N, M, M, K] · gt_masks [N, M, M] (0/1) · labels [N]
    (0 = bg) · valid [N] bool.
    """
    n, m, _, k = mask_logits.shape
    cls = jnp.clip(labels, 0, k - 1)
    sel = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=3)[..., 0]   # [N, M, M]
    sel = sel.astype(jnp.float32)
    per_px = (jnp.maximum(sel, 0) - sel * gt_masks
              + jnp.log1p(jnp.exp(-jnp.abs(sel))))
    fg = valid & (labels > 0)
    per_roi = per_px.mean(axis=(1, 2))
    denom = jnp.maximum(fg.sum(), 1)
    return jnp.where(fg, per_roi, 0.0).sum() / denom


def select_class_masks(mask_logits: Array, labels: Array) -> Array:
    """sigmoid + gather the predicted class channel
    (``mask_head/inference.py:38-45``): [N, M, M, K], [N] -> [N, M, M]."""
    prob = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    k = mask_logits.shape[-1]
    cls = jnp.clip(labels, 0, k - 1)
    return jnp.take_along_axis(prob, cls[:, None, None, None], axis=3)[..., 0]


def paste_masks(masks: Array, boxes: Array, im_h: int, im_w: int, *,
                threshold: float = 0.5, padding: int = 1) -> Array:
    """Paste [N, M, M] mask probs into [N, im_h, im_w] binary maps.

    Matches ``paste_mask_in_image`` semantics (pad ``padding``, expand the
    box by (M+2p)/M, bilinear sample with align_corners=False, threshold,
    zero outside the clipped box) but runs as ONE vectorized bilinear gather
    on device instead of a per-instance host loop.
    """
    n, m, _ = masks.shape
    mp = m + 2 * padding
    padded = jnp.pad(masks, ((0, 0), (padding, padding), (padding, padding)))
    scale = mp / m

    # expanded boxes (reference expand_boxes, then int cast)
    w_half = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    h_half = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    xc = (boxes[:, 2] + boxes[:, 0]) * 0.5
    yc = (boxes[:, 3] + boxes[:, 1]) * 0.5
    x0 = jnp.floor(xc - w_half)
    y0 = jnp.floor(yc - h_half)
    x1 = jnp.floor(xc + w_half)
    y1 = jnp.floor(yc + h_half)
    bw = jnp.maximum(x1 - x0 + 1, 1.0)
    bh = jnp.maximum(y1 - y0 + 1, 1.0)

    ys = jnp.arange(im_h, dtype=jnp.float32)
    xs = jnp.arange(im_w, dtype=jnp.float32)

    def paste_one(pm, px0, py0, pbw, pbh, px1, py1):
        # image pixel center -> mask coords (align_corners=False)
        u = (xs - px0 + 0.5) / pbw * mp - 0.5                   # [W]
        v = (ys - py0 + 0.5) / pbh * mp - 0.5                   # [H]

        def sample_axis(coord, size):
            lo = jnp.clip(jnp.floor(coord), 0, size - 1)
            hi = jnp.clip(lo + 1, 0, size - 1)
            frac = jnp.clip(coord - lo, 0.0, 1.0)
            return lo.astype(jnp.int32), hi.astype(jnp.int32), frac

        vy0, vy1, fy = sample_axis(v, mp)
        ux0, ux1, fx = sample_axis(u, mp)
        top = pm[vy0][:, ux0] * (1 - fx)[None, :] + pm[vy0][:, ux1] * fx[None, :]
        bot = pm[vy1][:, ux0] * (1 - fx)[None, :] + pm[vy1][:, ux1] * fx[None, :]
        val = top * (1 - fy)[:, None] + bot * fy[:, None]       # [H, W]
        inside = ((xs[None, :] >= jnp.maximum(px0, 0))
                  & (xs[None, :] < jnp.minimum(px1 + 1, im_w))
                  & (ys[:, None] >= jnp.maximum(py0, 0))
                  & (ys[:, None] < jnp.minimum(py1 + 1, im_h)))
        return (val > threshold) & inside

    return jax.vmap(paste_one)(padded, x0, y0, bw, bh, x1, y1)


# ------------------------------------------------------------ keypoint head


class KeypointHead(nn.Module):
    """KeypointRCNNFeatureExtractor + KeypointRCNNPredictor.

    [N, P, P, C] -> conv3x3 stack -> deconv k4 s2 -> 2x bilinear upsample ->
    [N, 4P, 4P, num_keypoints] heatmap logits.
    """

    num_keypoints: int = 17
    conv_layers: Tuple[int, ...] = (512,) * 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, ch in enumerate(self.conv_layers):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"conv_fcn{i + 1}", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             name="kps_score_lowres", dtype=self.dtype)(x)
        n, h, w, k = x.shape
        return jax.image.resize(x, (n, 2 * h, 2 * w, k), method="bilinear")


def heatmaps_to_keypoints(heatmaps: Array, rois: Array
                          ) -> Tuple[Array, Array]:
    """Per-keypoint argmax -> image coords + score
    (``keypoint_head/inference.py:40-?``): [N, H, H, K], [N, 4] xyxy ->
    (xy [N, K, 2], score [N, K])."""
    n, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(n, h * w, k)
    idx = jnp.argmax(flat, axis=1)                              # [N, K]
    score = jnp.max(flat, axis=1)
    yi = (idx // w).astype(jnp.float32)
    xi = (idx % w).astype(jnp.float32)
    bw = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)[:, None]
    bh = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)[:, None]
    x = rois[:, 0:1] + (xi + 0.5) * bw / w
    y = rois[:, 1:2] + (yi + 0.5) * bh / h
    return jnp.stack([x, y], axis=-1), score


# --------------------------------------------------------------- RetinaNet


def retinanet_cell_anchors(stride: int, base_size: float,
                           aspect_ratios: Sequence[float],
                           scales_per_octave: int) -> np.ndarray:
    """[A, 4] anchors centered at (0, 0): octave scales x aspect ratios
    (``anchor_generator.py:make_anchor_generator_retinanet``)."""
    out = []
    for octave in range(scales_per_octave):
        size = base_size * 2.0 ** (octave / scales_per_octave)
        area = size * size
        for ratio in aspect_ratios:
            w = math.sqrt(area / ratio)
            h = w * ratio
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    del stride
    return np.asarray(out, np.float32)


def retinanet_grid_anchors(feat_shapes: Sequence[Tuple[int, int]],
                           strides: Sequence[int],
                           aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
                           scales_per_octave: int = 3,
                           octave_base: float = 4.0) -> np.ndarray:
    """Concatenated anchors over all pyramid levels: [sum(HiWiA), 4]."""
    grids = []
    for (h, w), stride in zip(feat_shapes, strides):
        cell = retinanet_cell_anchors(stride, octave_base * stride,
                                      aspect_ratios, scales_per_octave)
        sx = (np.arange(w) * stride)[None, :, None]
        sy = (np.arange(h) * stride)[:, None, None]
        shift = np.stack([np.broadcast_to(sx, (h, w, 1)),
                          np.broadcast_to(sy, (h, w, 1))] * 2, -1)
        grids.append((shift + cell[None, None]).reshape(-1, 4))
    return np.concatenate(grids, 0).astype(np.float32)


class RetinaNetHead(nn.Module):
    """Shared cls/bbox towers applied to every FPN level
    (``retinanet.py:13-86``). Returns per-level [B, H, W, A*C] cls logits
    and [B, H, W, A*4] deltas. The cls bias starts at the focal prior
    −log((1−π)/π), π=0.01."""

    num_classes: int            # foreground classes (NUM_CLASSES − 1)
    num_anchors: int = 9
    num_convs: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.cls_tower = [
            nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                    name=f"cls_tower{i}", dtype=self.dtype)
            for i in range(self.num_convs)]
        self.bbox_tower = [
            nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                    name=f"bbox_tower{i}", dtype=self.dtype)
            for i in range(self.num_convs)]
        prior = 0.01
        bias0 = -math.log((1 - prior) / prior)
        self.cls_logits = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3),
            padding=((1, 1), (1, 1)), name="cls_logits", dtype=self.dtype,
            bias_init=nn.initializers.constant(bias0))
        self.bbox_pred = nn.Conv(self.num_anchors * 4, (3, 3),
                                 padding=((1, 1), (1, 1)), name="bbox_pred",
                                 dtype=self.dtype)

    def __call__(self, features: Sequence[Array]):
        logits, deltas = [], []
        for f in features:
            c = f
            for conv in self.cls_tower:
                c = nn.relu(conv(c))
            logits.append(self.cls_logits(c))
            b = f
            for conv in self.bbox_tower:
                b = nn.relu(conv(b))
            deltas.append(self.bbox_pred(b))
        return logits, deltas


RETINANET_CODER = (10.0, 10.0, 5.0, 5.0)


def _flatten_levels(per_level: Sequence[Array], last_dim: int) -> Array:
    return jnp.concatenate(
        [x.reshape(x.shape[0], -1, last_dim) for x in per_level], axis=1)


def retinanet_loss(cls_logits: Sequence[Array], box_deltas: Sequence[Array],
                   anchors: Array, gt_boxes: Array, gt_labels: Array,
                   gt_valid: Array, *, num_classes: int,
                   fg_iou: float = 0.5, bg_iou: float = 0.4):
    """Focal cls loss + smooth-L1 reg loss, both normalized by #fg
    (``rpn/retinanet/loss.py``). Single image; vmap for a batch."""
    cls = _flatten_levels(cls_logits, num_classes)[0]           # [A, C]
    reg = _flatten_levels(box_deltas, 4)[0]                     # [A, 4]
    iou = box_iou(gt_boxes, anchors)
    matches = match_proposals(iou, fg_iou, bg_iou,
                              allow_low_quality=True, gt_valid=gt_valid)
    fg = matches >= 0
    safe = jnp.clip(matches, 0)
    labels = jnp.where(fg, gt_labels[safe], 0)                  # 0 = bg
    ignore = matches == -2
    per_elem = sigmoid_focal_loss(cls, jnp.where(ignore, -1, labels))
    n_fg = jnp.maximum(fg.sum(), 1)
    cls_loss = per_elem.sum() / n_fg

    target = encode_boxes(gt_boxes[safe], anchors, RETINANET_CODER)
    reg_per = smooth_l1(reg, target, 1.0 / 9).sum(-1)
    reg_loss = jnp.where(fg, reg_per, 0.0).sum() / n_fg
    return {"loss_retina_cls": cls_loss, "loss_retina_reg": reg_loss}


def retinanet_select(cls_logits: Sequence[Array],
                     box_deltas: Sequence[Array],
                     level_anchors: Sequence[Array], *, num_classes: int,
                     image_size: Tuple[int, int],
                     pre_nms_top_n: int = 1000, score_thresh: float = 0.05,
                     nms_thresh: float = 0.4, max_det: int = 100):
    """Per-level top-k + decode, then one cross-level NMS
    (``rpn/retinanet/inference.py``). Single image; static shapes.

    Returns (boxes [max_det, 4], scores [max_det], labels [max_det],
    keep [max_det] bool)."""
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for logit, delta, anchors in zip(cls_logits, box_deltas, level_anchors):
        scores = jax.nn.sigmoid(
            logit.reshape(-1, num_classes).astype(jnp.float32))  # [HWA, C]
        deltas = delta.reshape(-1, 4)
        k = min(pre_nms_top_n, scores.shape[0] * num_classes)
        flat = scores.reshape(-1)
        top, idx = jax.lax.top_k(flat, k)
        a_idx = idx // num_classes
        cls_id = idx % num_classes + 1
        boxes = decode_boxes(deltas[a_idx], anchors[a_idx], RETINANET_CODER)
        h, w = image_size
        boxes = jnp.stack([boxes[:, 0].clip(0, w - 1),
                           boxes[:, 1].clip(0, h - 1),
                           boxes[:, 2].clip(0, w - 1),
                           boxes[:, 3].clip(0, h - 1)], -1)
        all_boxes.append(boxes)
        all_scores.append(top)
        all_labels.append(cls_id)
        all_valid.append(top > score_thresh)
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    labels = jnp.concatenate(all_labels)
    valid = jnp.concatenate(all_valid)
    # class-aware NMS via the coordinate-offset trick
    offset = labels.astype(jnp.float32)[:, None] * (max(image_size) + 1)
    idx, keep = nms_padded(boxes + offset, scores, valid, nms_thresh,
                           max_det)
    return boxes[idx], scores[idx], labels[idx], keep
