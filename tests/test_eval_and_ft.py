"""Detection mAP eval, expected-results assertion, FT baseline drivers."""
import json

import numpy as np
import pytest

from cpt_tpu.engine.detection_eval import (check_expected_results,
                                           eval_detection_voc, voc_ap)


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == pytest.approx(1.0)


def test_eval_detection_voc_basic():
    gts = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
            "labels": np.array([1, 2])}]
    # perfect predictions
    preds = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
              "labels": np.array([1, 2]), "scores": np.array([0.9, 0.8])}]
    out = eval_detection_voc(preds, gts, num_classes=3)
    assert out["mAP"] == pytest.approx(1.0)
    # one wrong class
    preds_bad = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
                  "labels": np.array([1, 1]), "scores": np.array([0.9, 0.8])}]
    out_bad = eval_detection_voc(preds_bad, gts, num_classes=3)
    assert out_bad["AP/1"] == pytest.approx(1.0)   # extra FP after the TP
    assert out_bad["AP/2"] == 0.0
    assert out_bad["mAP"] == pytest.approx(0.5)


def test_eval_detection_duplicate_detections_penalized():
    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([1])}]
    preds = [{"boxes": np.array([[0, 0, 10, 10], [1, 1, 11, 11]]),
              "labels": np.array([1, 1]), "scores": np.array([0.9, 0.8])}]
    out = eval_detection_voc(preds, gts, num_classes=2)
    # second detection is a duplicate FP; AP stays 1.0 since TP comes first
    assert out["AP/1"] == pytest.approx(1.0)
    # a disjoint high-scoring box is an FP ranked first → AP < 1
    preds2 = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]]),
               "labels": np.array([1, 1]), "scores": np.array([0.8, 0.9])}]
    out2 = eval_detection_voc(preds2, gts, num_classes=2)
    assert out2["AP/1"] < 1.0


def test_check_expected_results(capsys):
    results = {"mAP": 0.65}
    assert check_expected_results(results, [("mAP", 0.64, 0.02)])
    assert not check_expected_results(results, [("mAP", 0.60, 0.02)])


@pytest.mark.slow
def test_refcoco_ft_driver_learns(tmp_path):
    from cpt_tpu.data.synthetic import generate_refcoco_fixture
    from cpt_tpu.tools.refcoco_ft import main

    # reuse the refcoco fixture; FT reads the first copy's boxlist, and the
    # candidate boxes live in det rects — build a simple plain fixture instead
    from cpt_tpu.utils.tsv import encode_feature, tsv_writer

    rng = np.random.RandomState(0)
    rows, anns = [], []
    for q in range(6):
        correct = q % 3
        boxlist = []
        for b in range(3):
            feat = rng.randn(24).astype(np.float32) * 0.1
            if b == correct:
                feat[0] = 3.0
            boxlist.append({
                "rect": [30.0 * b, 0.0, 30.0 * b + 19.0, 19.0],
                "class": "dog", "conf": 0.9,
                "feature": encode_feature(feat)})
        rows.append([str(q), json.dumps({"objects": boxlist})])
        anns.append({"id": str(q), "caption": "the red dog",
                     "bbox": [30.0 * correct, 0.0, 20.0, 20.0]})
    tsv_writer(rows, str(tmp_path / "plain.tsv"))
    json.dump(anns, open(tmp_path / "ann.json", "w"))

    acc = main([
        "--data_file", str(tmp_path / "plain.tsv"),
        "--ann_file", str(tmp_path / "ann.json"),
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--img_feature_dim", "24", "--max_seq_length", "16",
        "--max_img_seq_length", "4", "--num_train_epochs", "40",
        "--learning_rate", "5e-3", "--per_gpu_train_batch_size", "6",
        "--per_gpu_eval_batch_size", "6",
    ])
    assert acc >= 66.0, f"REC_FT failed to learn: {acc}"


def test_vcr_ft_variant_runs(tmp_path_factory):
    from cpt_tpu.data.synthetic import generate_vcr_fixture
    from cpt_tpu.tools.vcr_nsp_cpt import main

    root = str(tmp_path_factory.mktemp("vcr_ft"))
    paths = generate_vcr_fixture(root, n_questions=4, n_choices=2,
                                 feat_dim=24)
    acc = main([
        "--feat_file", paths["feat_file"], "--examples", paths["examples"],
        "--model_variant", "ft", "--hidden_size", "32",
        "--num_hidden_layers", "1", "--img_feature_dim", "24",
        "--max_seq_length", "24", "--max_img_seq_length", "6",
        "--per_gpu_eval_batch_size", "4",
    ])
    assert 0.0 <= acc <= 100.0


@pytest.mark.slow
def test_run_gqa_wrapper(tmp_path):
    from cpt_tpu.utils.tsv import encode_feature, tsv_writer
    from cpt_tpu.tools.run_gqa import main

    rng = np.random.RandomState(1)
    rows, examples = [], []
    for q in range(6):
        label = q % 2
        feats = rng.randn(3, 24).astype(np.float32) * 0.1
        feats[:, 0] = 2.0 * label
        rows.append([f"im{q}", json.dumps({"objects": [
            {"rect": [0, 0, 5, 5], "class": "dog", "conf": 0.9,
             "feature": encode_feature(f)} for f in feats]})])
        examples.append({"q_id": f"q{q}", "img_id": f"im{q}",
                         "question": "what is it",
                         "label_scores": {str(label): 1.0}})
    tsv_writer(rows, str(tmp_path / "p.tsv"))
    json.dump(examples, open(tmp_path / "ex.json", "w"))
    acc = main([
        "--feat_file", str(tmp_path / "p.tsv"),
        "--examples", str(tmp_path / "ex.json"), "--num_labels", "2",
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--img_feature_dim", "24", "--max_seq_length", "12",
        "--max_img_seq_length", "4", "--num_train_epochs", "25",
        "--learning_rate", "5e-3", "--per_gpu_train_batch_size", "6",
    ])
    assert acc >= 75.0


def test_coco_map_perfect_and_degraded():
    from cpt_tpu.engine.detection_eval import eval_detection_coco

    gt = [{"boxes": np.asarray([[10, 10, 50, 50], [60, 60, 100, 120]]),
           "labels": np.asarray([1, 2])}]
    perfect = [{"boxes": gt[0]["boxes"].copy(),
                "scores": np.asarray([0.9, 0.8]),
                "labels": np.asarray([1, 2])}]
    r = eval_detection_coco(perfect, gt)
    assert r["AP"] == pytest.approx(1.0, abs=1e-6)
    assert r["AP50"] == pytest.approx(1.0, abs=1e-6)
    # 40x40 and 40x60 boxes are both "medium"; small/large have no gts
    assert r["AP_medium"] == pytest.approx(1.0, abs=1e-6)
    assert np.isnan(r["AP_small"]) and np.isnan(r["AP_large"])

    # slightly shifted boxes: pass at 0.5 IoU, fail at 0.95
    shifted = [{"boxes": gt[0]["boxes"] + 6.0,
                "scores": np.asarray([0.9, 0.8]),
                "labels": np.asarray([1, 2])}]
    r2 = eval_detection_coco(shifted, gt)
    assert r2["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert r2["AP"] < r2["AP50"]

    # a confident false positive before the true positive lowers AP
    fp_first = [{"boxes": np.vstack([[200, 200, 240, 240],
                                     gt[0]["boxes"][0]]),
                 "scores": np.asarray([0.95, 0.9]),
                 "labels": np.asarray([1, 1])}]
    gt1 = [{"boxes": gt[0]["boxes"][:1], "labels": np.asarray([1])}]
    r3 = eval_detection_coco(fp_first, gt1)
    assert 0.0 < r3["AP50"] < 1.0


def test_model_size_large_preset():
    """--model_size large selects the VinVL_L encoder geometry."""
    import argparse

    from cpt_tpu.tools._common import add_common_args, model_config

    args = add_common_args(argparse.ArgumentParser()).parse_args(
        ["--model_size", "large"])
    cfg = model_config(args)
    assert (cfg.hidden_size, cfg.num_hidden_layers,
            cfg.num_attention_heads, cfg.intermediate_size) == (
        1024, 24, 16, 4096)
    # base stays the default
    args_b = add_common_args(argparse.ArgumentParser()).parse_args([])
    assert model_config(args_b).hidden_size == 768
