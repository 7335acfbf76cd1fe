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

    if path.endswith(".pkl"):
        # legacy Detectron/Caffe2 blob file (DetectronCheckpointer's
        # ``.pkl`` branch, reference checkpoint.py:85-96)
        return load_caffe2_pickle(path, cfg)
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


def rename_c2_keys(keys):
    """Caffe2/Detectron blob names → maskrcnn-benchmark torch names.

    Same transformation chain as the reference's legacy importer
    (``prompt_feat/maskrcnn_benchmark/utils/c2_model_loading.py:13-62``):
    underscores to dots with the weight/bias/bn fixups, res{N} stages to
    torchvision layer{N-1}, branch2{a,b,c} to conv1/2/3, branch1 to the
    downsample pair, and the RPN head names. Returns {c2_key: torch_key}.
    """
    # the blanket-replace chain, in the reference's exact order (incl.
    # the .biasranch/.biasbox fixups its own blanket ".b" replace needs)
    chain = [
        ("_", "."), (".w", ".weight"), (".bn", "_bn"), (".b", ".bias"),
        ("_bn.s", "_bn.scale"), (".biasranch", ".branch"),
        ("bbox.pred", "bbox_pred"), ("cls.score", "cls_score"),
        ("res.conv1_", "conv1_"), (".biasbox", ".bbox"),
        ("conv.rpn", "rpn.conv"), ("rpn.bbox.pred", "rpn.bbox_pred"),
        ("rpn.cls.logits", "rpn.cls_logits"),
        ("_bn.scale", "_bn.weight"), ("conv1_bn.", "bn1."),
        ("res2.", "layer1."), ("res3.", "layer2."), ("res4.", "layer3."),
        ("res5.", "layer4."),
        (".branch2a.", ".conv1."), (".branch2a_bn.", ".bn1."),
        (".branch2b.", ".conv2."), (".branch2b_bn.", ".bn2."),
        (".branch2c.", ".conv3."), (".branch2c_bn.", ".bn3."),
        (".branch1.", ".downsample.0."), (".branch1_bn.", ".downsample.1."),
        ("rpn.", "rpn.head."),
    ]
    out = {}
    for orig in keys:
        k = "fc1000_w" if orig == "pred_w" else (
            "fc1000_b" if orig == "pred_b" else orig)
        for a, b in chain:
            k = k.replace(a, b)
        out[orig] = k
    return out


def load_caffe2_pickle(path: str, cfg: DetectorConfig) -> Dict[str, Any]:
    """Legacy Detectron/Caffe2 ``.pkl`` checkpoint → flax params
    (reference ``c2_model_loading.py::load_c2_format`` +
    DetectronCheckpointer). Caffe2 AffineChannel has no running stats, so
    each ``*_bn`` gets identity stats (mean 0, var 1) before the frozen-BN
    fold — matching the reference's FrozenBatchNorm2d defaults. Heads
    absent from the blob file keep their fresh initialization (reference
    ``skip_unmatched_layers`` semantics)."""
    import pickle

    with open(path, "rb") as f:
        blobs = pickle.load(f, encoding="latin1")
    if "blobs" in blobs:
        blobs = blobs["blobs"]
    blobs = {k: v for k, v in blobs.items()
             if "momentum" not in k and isinstance(v, np.ndarray)}
    renamed = {}
    for c2k, tk in rename_c2_keys(blobs.keys()).items():
        renamed[tk] = np.asarray(blobs[c2k])
    # synthesize identity running stats for every affine-only BN
    # (bn1/2/3, the stem bn1, downsample.1)
    import re

    bn_pat = re.compile(r"(\.bn\d|\.downsample\.1|^bn1)\.weight$")
    for k in list(renamed):
        if bn_pat.search(k):
            base = k[: -len(".weight")]
            renamed.setdefault(base + ".running_mean",
                               np.zeros_like(renamed[k]))
            renamed.setdefault(base + ".running_var",
                               np.ones_like(renamed[k]))
    from cpt_tpu.utils.convert import align_state_dict

    base_sd = random_vinvl_state_dict(cfg)
    base_sd.update(align_state_dict(renamed, base_sd))
    return convert_detector_state_dict(base_sd, cfg)
