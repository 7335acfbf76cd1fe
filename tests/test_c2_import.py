"""Caffe2/Detectron legacy pickle import (reference
``c2_model_loading.py:1-208`` + DetectronCheckpointer)."""
import pickle

import numpy as np

from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.models.detector.convert import (convert_detector_state_dict,
                                             load_caffe2_pickle,
                                             random_vinvl_state_dict,
                                             rename_c2_keys)


def test_rename_c2_keys_chain():
    m = rename_c2_keys([
        "conv1_w", "res_conv1_bn_s", "res2_0_branch2a_w",
        "res2_0_branch2a_bn_s", "res2_0_branch2a_bn_b",
        "res2_0_branch1_w", "res2_0_branch1_bn_s",
        "conv_rpn_w", "rpn_cls_logits_b", "rpn_bbox_pred_w",
        "cls_score_w", "bbox_pred_b", "pred_w",
    ])
    assert m["conv1_w"] == "conv1.weight"
    assert m["res_conv1_bn_s"] == "bn1.weight"
    assert m["res2_0_branch2a_w"] == "layer1.0.conv1.weight"
    assert m["res2_0_branch2a_bn_s"] == "layer1.0.bn1.weight"
    assert m["res2_0_branch2a_bn_b"] == "layer1.0.bn1.bias"
    assert m["res2_0_branch1_w"] == "layer1.0.downsample.0.weight"
    assert m["res2_0_branch1_bn_s"] == "layer1.0.downsample.1.weight"
    assert m["conv_rpn_w"] == "rpn.head.conv.weight"
    assert m["rpn_cls_logits_b"] == "rpn.head.cls_logits.bias"
    assert m["rpn_bbox_pred_w"] == "rpn.head.bbox_pred.weight"
    assert m["cls_score_w"] == "cls_score.weight"
    assert m["bbox_pred_b"] == "bbox_pred.bias"
    assert m["pred_w"] == "fc1000.weight"


def _tree_allclose(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            _tree_allclose(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=path)


def test_load_caffe2_pickle_roundtrip(tmp_path):
    """A synthetic Detectron blob file converts to the same flax params
    as the torch-layout converter given identity running stats (Caffe2
    AffineChannel carries none)."""
    cfg = tiny_detector_config()
    sd = random_vinvl_state_dict(cfg)
    sd = {k: (np.zeros_like(v) if k.endswith(".running_mean") else
              np.ones_like(v) if k.endswith(".running_var") else v)
          for k, v in sd.items()}
    expected = convert_detector_state_dict(sd, cfg)

    c2 = {}

    def put_bn(c2p, tp):
        c2[c2p + "_s"] = sd[tp + ".weight"]
        c2[c2p + "_b"] = sd[tp + ".bias"]

    c2["conv1_w"] = sd["backbone.body.stem.conv1.weight"]
    put_bn("res_conv1_bn", "backbone.body.stem.bn1")
    branches = [(1, "branch2a"), (2, "branch2b"), (3, "branch2c")]

    def put_stage(res_idx, torch_prefix, blocks):
        for b in range(blocks):
            tp = f"{torch_prefix}.{b}"
            cp = f"res{res_idx}_{b}"
            for j, br in branches:
                c2[f"{cp}_{br}_w"] = sd[f"{tp}.conv{j}.weight"]
                put_bn(f"{cp}_{br}_bn", f"{tp}.bn{j}")
            if f"{tp}.downsample.0.weight" in sd:
                c2[f"{cp}_branch1_w"] = sd[f"{tp}.downsample.0.weight"]
                put_bn(f"{cp}_branch1_bn", f"{tp}.downsample.1")

    for si, blocks in enumerate(cfg.backbone.stage_blocks):
        put_stage(si + 2, f"backbone.body.layer{si + 1}", blocks)
    nl = len(cfg.backbone.stage_blocks) + 1
    put_stage(nl + 1, f"roi_heads.box.feature_extractor.head.layer{nl}",
              cfg.backbone.head_blocks)
    for name in ("conv_rpn", "rpn_cls_logits", "rpn_bbox_pred"):
        tk = {"conv_rpn": "rpn.head.conv",
              "rpn_cls_logits": "rpn.head.cls_logits",
              "rpn_bbox_pred": "rpn.head.bbox_pred"}[name]
        c2[name + "_w"] = sd[tk + ".weight"]
        c2[name + "_b"] = sd[tk + ".bias"]
    for name in ("cls_score", "bbox_pred"):
        c2[name + "_w"] = sd[f"roi_heads.box.predictor.{name}.weight"]
        c2[name + "_b"] = sd[f"roi_heads.box.predictor.{name}.bias"]

    path = tmp_path / "model_final.pkl"
    with open(path, "wb") as f:
        pickle.dump({"blobs": c2}, f)

    got = load_caffe2_pickle(str(path), cfg)
    # everything C2 provides must match the torch-layout conversion;
    # heads absent from detectron (attributes) keep their fresh init
    for key in ("backbone", "rpn", "box_predictor", "box_extractor"):
        _tree_allclose(got[key], expected[key], key)
    assert "attr_predictor" in got
