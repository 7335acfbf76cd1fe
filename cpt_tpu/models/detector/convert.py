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
    from cpt_tpu.utils.convert import align_state_dict, load_torch_file

    sd = load_torch_file(path)
    try:
        return convert_detector_state_dict(sd, cfg)
    except KeyError:
        # checkpoint keys carry a different nesting (e.g. "module." DDP
        # wrapper) — suffix-align onto the canonical VinVL layout first
        # (reference model_serialization.py:35 align_and_update_state_dicts)
        aligned = align_state_dict(sd, random_vinvl_state_dict(cfg))
        return convert_detector_state_dict(aligned, cfg)


def random_vinvl_state_dict(cfg: DetectorConfig, seed: int = 0
                            ) -> Dict[str, np.ndarray]:
    """Random state dict in the exact VinVL ``.pth`` key layout (maskrcnn
    naming, raw FrozenBN running stats). Lets the checkpoint pipeline —
    torch.save → load → convert → forward — dry-run end-to-end before the
    real ``vinvl_vg_x152c4.pth`` is available (``tools/
    validate_checkpoints.py --dryrun``)."""
    rng = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}

    def r(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = (rng.rand(n) * 0.5 + 0.75).astype(np.float32)
        sd[f"{prefix}.bias"] = r(n)
        sd[f"{prefix}.running_mean"] = r(n)
        sd[f"{prefix}.running_var"] = (rng.rand(n) + 0.5).astype(np.float32)

    def bottleneck(prefix, cin, cb, cout, groups):
        sd[f"{prefix}.conv1.weight"] = r(cb, cin, 1, 1)
        bn(f"{prefix}.bn1", cb)
        sd[f"{prefix}.conv2.weight"] = r(cb, cb // groups, 3, 3)
        bn(f"{prefix}.bn2", cb)
        sd[f"{prefix}.conv3.weight"] = r(cout, cb, 1, 1)
        bn(f"{prefix}.bn3", cout)
        if cin != cout:
            sd[f"{prefix}.downsample.0.weight"] = r(cout, cin, 1, 1)
            bn(f"{prefix}.downsample.1", cout)

    def stage(prefix, cin, cb, cout, blocks, groups):
        for j in range(blocks):
            bottleneck(f"{prefix}.{j}", cin if j == 0 else cout, cb, cout,
                       groups)

    bb = cfg.backbone
    sd["backbone.body.stem.conv1.weight"] = r(bb.stem_out_channels, 3, 7, 7)
    bn("backbone.body.stem.bn1", bb.stem_out_channels)
    cin = bb.stem_out_channels
    for i, blocks in enumerate(bb.stage_blocks):
        f = 2 ** i
        stage(f"backbone.body.layer{i + 1}", cin,
              bb.stage2_bottleneck_channels * f, bb.res2_out_channels * f,
              blocks, bb.num_groups)
        cin = bb.res2_out_channels * f

    fs = 2 ** len(bb.stage_blocks)
    layer = f"layer{len(bb.stage_blocks) + 1}"
    for prefix in ("roi_heads.box.feature_extractor",
                   "attribute.feature_extractor"):
        stage(f"{prefix}.head.{layer}", cin,
              bb.stage2_bottleneck_channels * fs, bb.res2_out_channels * fs,
              bb.head_blocks, bb.num_groups)
    c5 = bb.res2_out_channels * fs

    a = cfg.rpn.num_anchors
    sd["rpn.head.conv.weight"] = r(cin, cin, 3, 3)
    sd["rpn.head.conv.bias"] = r(cin)
    sd["rpn.head.cls_logits.weight"] = r(a, cin, 1, 1)
    sd["rpn.head.cls_logits.bias"] = r(a)
    sd["rpn.head.bbox_pred.weight"] = r(a * 4, cin, 1, 1)
    sd["rpn.head.bbox_pred.bias"] = r(a * 4)

    nc = cfg.roi_heads.num_classes
    sd["roi_heads.box.predictor.cls_score.weight"] = r(nc, c5)
    sd["roi_heads.box.predictor.cls_score.bias"] = r(nc)
    sd["roi_heads.box.predictor.bbox_pred.weight"] = r(nc * 4, c5)
    sd["roi_heads.box.predictor.bbox_pred.bias"] = r(nc * 4)

    at = cfg.attributes
    sd["attribute.predictor.cls_embedding.weight"] = r(nc, at.cls_emd_dim)
    sd["attribute.predictor.fc_attr.weight"] = r(at.attr_emd_dim,
                                                 c5 + at.cls_emd_dim)
    sd["attribute.predictor.fc_attr.bias"] = r(at.attr_emd_dim)
    sd["attribute.predictor.attr_score.weight"] = r(at.num_attributes,
                                                    at.attr_emd_dim)
    sd["attribute.predictor.attr_score.bias"] = r(at.num_attributes)
    return sd
