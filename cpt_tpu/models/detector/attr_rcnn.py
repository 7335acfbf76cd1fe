"""AttrRCNN — the VinVL detector assembled (backbone → RPN → box head →
post-processing → attribute head).

Parity with reference ``scene_graph_benchmark/AttrRCNN.py:15-110``:
  * ``force_boxes`` extraction mode: proposals are the given candidate boxes
    (``AttrRCNN.py:72-82``); the DDP "null RPN loss" hack is unnecessary
    under jit
  * otherwise RPN proposals
  * box head runs on proposals; post-processing is force-boxes attach or
    ``filter_results_fast``
  * attribute head re-pools the FINAL detections with its own stage-5
    feature extractor and classifies attributes conditioned on the
    predicted labels (``attribute_head.py:22-66``)

Static-shape contract: one image per call (extraction batches vmap over
images), fixed proposal/detection slot counts with validity masks.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cpt_tpu.models.detector.config import DetectorConfig
from cpt_tpu.models.detector.heads import (AttributePredictor,
                                           BoxFeatureExtractor,
                                           FastRCNNPredictor,
                                           postprocess_fast,
                                           postprocess_force_boxes)
from cpt_tpu.models.detector.resnet import ResNetC4, ResNetC5Head
from cpt_tpu.models.detector.rpn import RPNHead, select_proposals
from cpt_tpu.ops.roi_align import roi_align

Array = jax.Array


class AttrRCNN(nn.Module):
    config: DetectorConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.backbone = ResNetC4(c.backbone, self.dtype, name="backbone")
        self.rpn_head = RPNHead(c.rpn.num_anchors, self.dtype, name="rpn")
        self.box_extractor = BoxFeatureExtractor(c, self.dtype,
                                                 name="box_extractor")
        self.box_predictor = FastRCNNPredictor(c, self.dtype,
                                               name="box_predictor")
        self.attr_extractor = BoxFeatureExtractor(c, self.dtype,
                                                  name="attr_extractor")
        self.attr_predictor = AttributePredictor(c, self.dtype,
                                                 name="attr_predictor")

    def features(self, image: Array) -> Array:
        """image [H, W, 3] (BGR255, mean-subtracted) → C4 map [h, w, 1024]."""
        return self.backbone(image[None])[0]

    def forward_batch_force(self, images: Array, image_hw: Array,
                            force_boxes: Array, force_valid: Array,
                            with_attributes: bool = False) -> Dict[str, Array]:
        """Batched force-boxes extraction: all C image copies go through the
        backbone and heads together (the per-copy ``lax.map`` serialization
        costs ~2-3× on TPU — batching keeps the MXU fed).

        images [C, H, W, 3] · shared force_boxes [M, 4]/[M] →
        dict of [C, M, ...] outputs.
        """
        feats = self.backbone(images)                       # [C, h, w, 1024]
        return self.heads_from_feats(feats, force_boxes, force_valid,
                                     with_attributes=with_attributes)

    def heads_from_feats(self, feats: Array, force_boxes: Array,
                         force_valid: Array,
                         with_attributes: bool = False) -> Dict[str, Array]:
        """Force-boxes heads over precomputed per-copy C4 feature maps
        [C, h, w, 1024] (used by the windowed-recompute extractor, which
        patches copies of a cached base map instead of re-running the
        backbone on full canvases)."""
        from cpt_tpu.ops.roi_align_pallas import batched_roi_align

        c_cfg = self.config
        rh = c_cfg.roi_heads
        n_copies = feats.shape[0]
        m = force_boxes.shape[0]

        self.rpn_head(feats[:1, :1, :1, :])                 # param coverage

        def run_chunk(boxes_chunk):
            """Pool + stage5 + predict for one chunk of RoI slots — the
            pooled [C, ck, 14, 14, 1024] tensor is the peak-memory hog of
            extraction (3.3 GB at C=64/M=128); chunking caps it so larger
            copy batches fit HBM (``roi_heads.head_chunk``)."""
            ck = boxes_chunk.shape[0]
            pooled = batched_roi_align(
                feats, boxes_chunk, rh.pooler_scale, rh.pooler_resolution,
                rh.pooler_sampling_ratio, 8,
                rh.pooler_impl)                             # [C, ck, P, P, ch]
            flat = pooled.reshape((n_copies * ck,) + pooled.shape[2:])
            x = self.box_extractor.run_head(flat)           # stage5
            cls_logits, _deltas, pooled_vec = self.box_predictor(x)
            prob = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
            fg = prob[:, 1:]
            scores = jnp.max(fg, axis=-1).reshape(n_copies, ck)
            labels = (jnp.argmax(fg, axis=-1) + 1).reshape(n_copies, ck)
            res = (scores, labels, pooled_vec.reshape(n_copies, ck, -1),
                   prob.reshape(n_copies, ck, -1))
            if with_attributes:
                apooled = batched_roi_align(
                    feats, boxes_chunk, rh.pooler_scale,
                    rh.pooler_resolution, rh.pooler_sampling_ratio, 8,
                    rh.pooler_impl)
                ax = self.attr_extractor.run_head(
                    apooled.reshape((n_copies * ck,) + apooled.shape[2:]))
                attr_logits, _ = self.attr_predictor(ax, labels.reshape(-1))
                res += (attr_logits.astype(jnp.float32).reshape(
                    n_copies, ck, -1),)
            return res

        ck = rh.head_chunk
        if ck and m > ck and m % ck == 0:
            parts = [run_chunk(force_boxes[i:i + ck])
                     for i in range(0, m, ck)]
            merged = tuple(jnp.concatenate(t, axis=1) for t in zip(*parts))
        else:
            merged = run_chunk(force_boxes)
        scores, labels, box_features, scores_all = merged[:4]
        out = {
            "boxes": jnp.broadcast_to(force_boxes, (n_copies, m, 4)),
            "scores": jnp.where(force_valid[None], scores, 0.0),
            "labels": jnp.where(force_valid[None], labels, 0),
            "box_features": box_features,
            "scores_all": scores_all,
            "valid": jnp.broadcast_to(force_valid, (n_copies, m)),
        }
        if with_attributes:
            out["attr_logits"] = merged[4]
        return out

    def __call__(self, image: Array, image_hw: Array,
                 force_boxes: Optional[Array] = None,
                 force_valid: Optional[Array] = None,
                 anchors: Optional[Array] = None,
                 with_attributes: bool = True) -> Dict[str, Array]:
        """Single-image inference.

        image     [H, W, 3] preprocessed pixels (padded canvas)
        image_hw  [2] true (unpadded) image size
        force_boxes/force_valid: [M, 4]/[M] — extraction mode when given
        anchors   [h*w*A, 4] precomputed grid anchors (RPN mode)
        """
        c = self.config
        feat = self.features(image)

        if force_boxes is not None:
            proposals, prop_valid = force_boxes, force_valid
            # touch the RPN head on a 1×1 slice so its params exist in every
            # mode (single param tree regardless of extraction/detection path)
            self.rpn_head(feat[None, :1, :1, :])
        else:
            assert anchors is not None, "RPN mode needs precomputed anchors"
            logits, deltas = self.rpn_head(feat[None])
            proposals, _scores, prop_valid = select_proposals(
                c.rpn, logits[0], deltas[0], anchors, image_hw)

        x = self.box_extractor(feat, proposals)
        cls_logits, box_deltas, pooled = self.box_predictor(x)

        if force_boxes is not None:
            out = postprocess_force_boxes(cls_logits, pooled, proposals,
                                          prop_valid)
        elif c.roi_heads.nms_filter == 0:
            from cpt_tpu.models.detector.heads import postprocess_per_class

            out = postprocess_per_class(c, cls_logits, box_deltas, pooled,
                                        proposals, prop_valid, image_hw)
        elif c.roi_heads.nms_filter == 1:
            from cpt_tpu.models.detector.heads import postprocess_peter

            out = postprocess_peter(c, cls_logits, box_deltas, pooled,
                                    proposals, prop_valid, image_hw)
        else:
            out = postprocess_fast(c, cls_logits, box_deltas, pooled,
                                   proposals, prop_valid, image_hw)

        if with_attributes:
            ax = self.attr_extractor(feat, out["boxes"])
            attr_logits, _ = self.attr_predictor(ax, out["labels"])
            out["attr_logits"] = attr_logits.astype(jnp.float32)
        return out


def _gather_top(mask: Array, k: int) -> Array:
    """Indices of up to k True entries of ``mask`` (padded with argsort
    order) — static-shape subset selection."""
    order = jnp.argsort(~mask)  # True entries first, stable
    return order[:k]


class AttrRCNNTrainer(nn.Module):
    """Training-mode forward producing the reference loss dict
    (``engine/trainer.py:92-114`` sums these):

    loss_objectness / loss_rpn_box_reg (``rpn/loss.py``),
    loss_classifier / loss_box_reg (``box_head/loss.py``),
    loss_attribute (``attribute_head/loss.py``).

    Shares every parameter with ``AttrRCNN`` (same submodule names).
    """

    config: DetectorConfig
    dtype: Any = jnp.float32

    setup = AttrRCNN.setup

    def __call__(self, image: Array, image_hw: Array, gt_boxes: Array,
                 gt_labels: Array, gt_valid: Array, gt_attributes: Array,
                 anchors: Array, rng: Array) -> Dict[str, Array]:
        from cpt_tpu.models.detector import losses as L
        from cpt_tpu.models.detector.rpn import select_proposals

        c = self.config
        rng_rpn, rng_roi = jax.random.split(rng)
        feat = self.backbone(image[None])[0]
        logits, deltas = self.rpn_head(feat[None])
        obj = logits[0].reshape(-1)
        del_flat = deltas[0].reshape(-1, 4)

        loss_obj, loss_rpn_box = L.rpn_loss(
            obj, del_flat, anchors, gt_boxes, gt_valid, rng_rpn,
            fg_iou=c.rpn.fg_iou_threshold, bg_iou=c.rpn.bg_iou_threshold,
            batch_size_per_image=c.rpn.batch_size_per_image,
            positive_fraction=c.rpn.positive_fraction)

        proposals, _scores, prop_valid = select_proposals(
            c.rpn, logits[0], deltas[0], anchors, image_hw, is_train=True)
        # append gt boxes to the proposal pool (reference add_gt_proposals)
        proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
        prop_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

        labels, reg_targets, pos, sampled = L.subsample_proposals(
            proposals, prop_valid, gt_boxes, gt_labels, gt_valid, rng_roi,
            batch_size_per_image=c.roi_heads.batch_size_per_image,
            positive_fraction=c.roi_heads.positive_fraction)

        k = c.roi_heads.batch_size_per_image
        idx = _gather_top(sampled, k)
        rois = proposals[idx]
        x = self.box_extractor(feat, rois)
        cls_logits, box_deltas, _pooled = self.box_predictor(x)
        loss_cls, loss_box = L.fast_rcnn_loss(
            cls_logits, box_deltas, labels[idx], reg_targets[idx],
            pos[idx] & sampled[idx], sampled[idx],
            num_classes=c.roi_heads.num_classes)

        out = {"loss_objectness": loss_obj, "loss_rpn_box_reg": loss_rpn_box,
               "loss_classifier": loss_cls, "loss_box_reg": loss_box}

        # attribute head trains on positive sampled proposals with matched
        # gt attributes
        from cpt_tpu.structures.boxes import box_iou

        iou = box_iou(gt_boxes, rois)
        matched = jnp.argmax(jnp.where(gt_valid[:, None], iou, -1.0), axis=0)
        ax = self.attr_extractor(feat, rois)
        attr_logits, _ = self.attr_predictor(ax, labels[idx])
        out["loss_attribute"] = L.attribute_loss(
            attr_logits, gt_attributes[matched],
            valid=pos[idx] & sampled[idx])
        return out


def geometry_features(boxes: Array, image_hw: Array) -> Array:
    """The 6 normalized box-geometry dims appended to the 2048-d pooled
    feature (reference ``engine/inference_ref.py:263-274``):
    (x1/W, y1/H, x2/W, y2/H, (x2-x1)/W, (y2-y1)/H) — exclusive extents."""
    h = image_hw[0].astype(jnp.float32)
    w = image_hw[1].astype(jnp.float32)
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    return jnp.stack([x1 / w, y1 / h, x2 / w, y2 / h,
                      (x2 - x1) / w, (y2 - y1) / h], axis=-1)


def region_features_2054(pooled_2048: Array, boxes: Array,
                         image_hw: Array) -> Array:
    """Concatenate pooled features with geometry → the 2054-d TSV features."""
    return jnp.concatenate(
        [pooled_2048, geometry_features(boxes, image_hw).astype(pooled_2048.dtype)],
        axis=-1)
