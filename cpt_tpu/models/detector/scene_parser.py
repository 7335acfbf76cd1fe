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
    config: DetectorConfig
    num_rel_classes: int = 51
    max_rel_dets: int = 16            # top detections considered for pairing
    dtype: Any = jnp.float32

    def setup(self):
        # shares the AttrRCNN param layout (same converter applies)
        self.detector = AttrRCNN(self.config, self.dtype, name="detector")
        self.relation = RelDNHead(self.config, self.num_rel_classes,
                                  self.dtype, name="relation")

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
        rel_logits = self.relation(feat_map, boxes, labels, feats, pairs,
                                   pair_valid, image_hw, freq_prior)
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
        rel_logits = self.relation(feat_map, det_boxes[:k], det_labels[:k],
                                   det["box_features"][:k], pairs,
                                   pair_valid, image_hw, freq_prior)
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
