"""SceneParser — detection + scene-graph relation meta-architecture.

Parity-scoped equivalent of reference
``scene_graph_benchmark/scene_parser.py`` (the VinVL relation-training
meta-arch): a (typically frozen) AttrRCNN produces detections; the RelDN
relation head scores predicates over detection pairs. Inference emits
relation triplets in the layout ``engine/evaluate.vg_recall_eval`` consumes;
training freezes the detector (the reference freezes det weights,
``scene_parser.py``) and optimizes the relation losses.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import DetectorConfig
from cpt_tpu.models.detector.relation_head import (RelDNHead, all_pairs,
                                                   match_pair_labels,
                                                   relation_loss)

Array = jax.Array


class SceneParser(nn.Module):
    """``algorithm`` selects the relation head, mirroring the reference's
    ``MODEL.ROI_RELATION_HEAD.ALGORITHM`` registry (``relation_head.py``):
    'sg_reldn' → RelDN (default), 'sg_imp' / 'sg_msdn' / 'sg_grcnn' /
    'sg_nm' (Neural Motif) → the message-passing variants
    (``relation_variants.py`` / ``motif.py``), fed by the shared union-box
    stage-5 extractor."""

    config: DetectorConfig
    num_rel_classes: int = 51
    max_rel_dets: int = 16            # top detections considered for pairing
    algorithm: str = "sg_reldn"
    dtype: Any = jnp.float32

    def setup(self):
        # shares the AttrRCNN param layout (same converter applies)
        self.detector = AttrRCNN(self.config, self.dtype, name="detector")
        if self.algorithm == "sg_reldn":
            self.relation = RelDNHead(self.config, self.num_rel_classes,
                                      self.dtype, name="relation")
            return
        from cpt_tpu.models.detector.motif import NeuralMotifHead
        from cpt_tpu.models.detector.relation_variants import (GRCNNHead,
                                                               IMPHead,
                                                               MSDNHead)
        from cpt_tpu.models.detector.resnet import ResNetC5Head

        self.pred_feature_extractor = ResNetC5Head(
            self.config.backbone, self.dtype, name="pred_feature_extractor")
        n_cls = self.config.roi_heads.num_classes
        kw = dict(num_obj_classes=n_cls,
                  num_rel_classes=self.num_rel_classes, dtype=self.dtype,
                  name="relation")
        heads = {
            "sg_imp": lambda: IMPHead(**kw),
            "sg_msdn": lambda: MSDNHead(**kw),
            "sg_grcnn": lambda: GRCNNHead(**kw),
            "sg_nm": lambda: NeuralMotifHead(obj_dim=self._obj_dim(), **kw),
        }
        self.relation = heads[self.algorithm]()

    def _obj_dim(self) -> int:
        # stage-5 output channels = res2_out_channels * 8 (C4 convention)
        return self.config.backbone.res2_out_channels * 8

    def _union_feats(self, feat_map: Array, det_boxes: Array,
                     pairs: Array) -> Array:
        from cpt_tpu.models.detector.relation_head import boxes_union
        from cpt_tpu.ops.roi_align import roi_align

        rh = self.config.roi_heads
        union = boxes_union(det_boxes[pairs[:, 0]], det_boxes[pairs[:, 1]])
        pooled = roi_align(feat_map, union, spatial_scale=rh.pooler_scale,
                           pooled=rh.pooler_resolution,
                           sampling=rh.pooler_sampling_ratio)
        return jnp.mean(self.pred_feature_extractor(pooled), axis=(1, 2))

    def _relation_logits(self, feat_map: Array, det: Dict[str, Array],
                         boxes: Array, labels: Array, feats: Array,
                         valid: Array, pairs: Array, pair_valid: Array,
                         image_hw: Array,
                         freq_prior: Optional[Array]) -> Array:
        if self.algorithm == "sg_reldn":
            return self.relation(feat_map, boxes, labels, feats, pairs,
                                 pair_valid, image_hw, freq_prior)
        union = self._union_feats(feat_map, boxes, pairs)
        if self.algorithm == "sg_nm":
            k = boxes.shape[0]
            dists = det["scores_all"][:k].astype(self.dtype)
            _obj_logits, rel_logits, _preds = self.relation(
                feats.astype(self.dtype), dists, boxes,
                image_hw.astype(jnp.float32), valid, union, pairs,
                pair_valid)
            return rel_logits
        _obj_logits, rel_logits = self.relation(
            feats.astype(self.dtype), union, pairs, valid, pair_valid)
        return rel_logits

    def __call__(self, image: Array, image_hw: Array, anchors: Array,
                 freq_prior: Optional[Array] = None) -> Dict[str, Array]:
        """Inference: detections + relation logits over top-k pairs."""
        det = self.detector(image, image_hw, anchors=anchors,
                            with_attributes=False)
        k = self.max_rel_dets
        boxes = det["boxes"][:k]
        labels = det["labels"][:k]
        feats = det["box_features"][:k]
        valid = det["valid"][:k]

        feat_map = self.detector.features(image)
        pairs = all_pairs(k)
        pair_valid = valid[pairs[:, 0]] & valid[pairs[:, 1]]
        rel_logits = self._relation_logits(feat_map, det, boxes, labels,
                                           feats, valid, pairs, pair_valid,
                                           image_hw, freq_prior)
        return {**det, "pairs": pairs, "pair_valid": pair_valid,
                "rel_logits": rel_logits}

    def relation_train_loss(self, image: Array, image_hw: Array,
                            det_boxes: Array, det_labels: Array,
                            det_valid: Array, gt_rels: Array,
                            gt_boxes: Array, gt_valid: Array,
                            freq_prior: Optional[Array] = None) -> Array:
        """Training loss with gt/forced detections (the sg-training recipe
        runs relation training over provided object boxes; detector frozen
        by the caller's gradient mask)."""
        det = self.detector(image, image_hw, det_boxes, det_valid,
                            with_attributes=False)
        k = min(self.max_rel_dets, det_boxes.shape[0])
        feat_map = self.detector.features(image)
        pairs = all_pairs(k)
        pair_valid = det_valid[pairs[:, 0]] & det_valid[pairs[:, 1]]
        rel_logits = self._relation_logits(
            feat_map, det, det_boxes[:k], det_labels[:k],
            det["box_features"][:k], det_valid[:k], pairs, pair_valid,
            image_hw, freq_prior)
        labels = match_pair_labels(pairs, det_boxes[:k], gt_rels, gt_boxes,
                                   gt_valid)
        labels = jnp.where(pair_valid, labels, -1)
        return relation_loss(rel_logits, labels)


def triplet_predictions(out: Dict[str, Array]) -> Dict[str, Any]:
    """Inference output → {"<s>_<o>" pair key: predicate logits} in the
    ``vg_recall_eval`` prediction layout (host-side)."""
    import numpy as np

    pairs = np.asarray(out["pairs"])
    valid = np.asarray(out["pair_valid"])
    logits = np.asarray(out["rel_logits"])
    preds = {}
    for p, v, lg in zip(pairs, valid, logits):
        if v:
            preds[f"{int(p[0])}_{int(p[1])}"] = lg
    return preds
