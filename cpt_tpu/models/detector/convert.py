"""VinVL detector checkpoint (.pth) → flax params.

Maps the maskrcnn_benchmark state_dict naming
(``backbone.body.*``, ``rpn.head.*``, ``roi_heads.box.*``, ``attribute.*``)
onto the ``cpt_tpu.models.detector`` param tree:

  * conv OIHW → HWIO; grouped convs keep channel order
  * FrozenBatchNorm (weight, bias, running_mean, running_var) folded into
    (scale, bias) with eps=0 (reference ``layers/batch_norm.py:24-27``)
  * Linear (out,in) → (in,out); embeddings copied directly

BGR note: the checkpoint's conv1 expects BGR255 mean-subtracted input
(``vinvl_x152c4.yaml:28``); this framework keeps the BGR convention in its
input pipeline, so no channel reorder happens here.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from cpt_tpu.models.detector.config import DetectorConfig


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w))


def _fold_bn(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    weight = sd[prefix + ".weight"]
    bias = sd[prefix + ".bias"]
    mean = sd[prefix + ".running_mean"]
    var = sd[prefix + ".running_var"]
    scale = weight / np.sqrt(var)  # eps = 0 (reference FrozenBatchNorm2d)
    return {"scale": scale.astype(np.float32),
            "bias": (bias - mean * scale).astype(np.float32)}


def _bottleneck(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = {"kernel": _conv(sd[f"{prefix}.conv{i}.weight"])}
        p[f"bn{i}"] = _fold_bn(sd, f"{prefix}.bn{i}")
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample_conv"] = {"kernel": _conv(sd[f"{prefix}.downsample.0.weight"])}
        p["downsample_bn"] = _fold_bn(sd, f"{prefix}.downsample.1")
    return p


def _stage(sd: Mapping[str, np.ndarray], prefix: str, blocks: int) -> Dict[str, Any]:
    return {f"block_{i}": _bottleneck(sd, f"{prefix}.{i}") for i in range(blocks)}


def _stage5(sd: Mapping[str, np.ndarray], prefix: str, cfg: DetectorConfig
            ) -> Dict[str, Any]:
    layer = f"layer{len(cfg.backbone.stage_blocks) + 1}"
    return {"head": {layer: _stage(sd, f"{prefix}.head.{layer}",
                                   cfg.backbone.head_blocks)}}


def convert_detector_state_dict(sd: Mapping[str, np.ndarray],
                                cfg: DetectorConfig) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}

    # backbone
    bb: Dict[str, Any] = {
        "stem": {"conv1": {"kernel": _conv(sd["backbone.body.stem.conv1.weight"])},
                 "bn1": _fold_bn(sd, "backbone.body.stem.bn1")},
    }
    for i, blocks in enumerate(cfg.backbone.stage_blocks):
        name = f"layer{i + 1}"
        bb[name] = _stage(sd, f"backbone.body.{name}", blocks)
    params["backbone"] = bb

    # rpn
    if "rpn.head.conv.weight" in sd:
        params["rpn"] = {
            "conv": {"kernel": _conv(sd["rpn.head.conv.weight"]),
                     "bias": sd["rpn.head.conv.bias"]},
            "cls_logits": {"kernel": _conv(sd["rpn.head.cls_logits.weight"]),
                           "bias": sd["rpn.head.cls_logits.bias"]},
            "bbox_pred": {"kernel": _conv(sd["rpn.head.bbox_pred.weight"]),
                          "bias": sd["rpn.head.bbox_pred.bias"]},
        }

    # box head
    params["box_extractor"] = _stage5(sd, "roi_heads.box.feature_extractor", cfg)
    params["box_predictor"] = {
        "cls_score": {"kernel": _dense(sd["roi_heads.box.predictor.cls_score.weight"]),
                      "bias": sd["roi_heads.box.predictor.cls_score.bias"]},
        "bbox_pred": {"kernel": _dense(sd["roi_heads.box.predictor.bbox_pred.weight"]),
                      "bias": sd["roi_heads.box.predictor.bbox_pred.bias"]},
    }

    # attribute head
    if "attribute.predictor.attr_score.weight" in sd:
        params["attr_extractor"] = _stage5(sd, "attribute.feature_extractor", cfg)
        params["attr_predictor"] = {
            "cls_embedding": {"embedding": sd["attribute.predictor.cls_embedding.weight"]},
            "fc_attr": {"kernel": _dense(sd["attribute.predictor.fc_attr.weight"]),
                        "bias": sd["attribute.predictor.fc_attr.bias"]},
            "attr_score": {"kernel": _dense(sd["attribute.predictor.attr_score.weight"]),
                           "bias": sd["attribute.predictor.attr_score.bias"]},
        }
    return params


def load_vinvl_checkpoint(path: str, cfg: DetectorConfig) -> Dict[str, Any]:
    from cpt_tpu.utils.convert import load_torch_file

    return convert_detector_state_dict(load_torch_file(path), cfg)
