"""VG-TSV / od-TSV detection dataset loaders (reference
``prompt_feat/maskrcnn_benchmark/data/datasets/{tsv_dataset,od_tsv,
vg_tsv}.py`` + ``utils/label_loader.py``) and the detector train/eval
tools' --tsv path."""
import json

import numpy as np
import pytest

from cpt_tpu.data.vg_tsv import (DetectionTSVDataset, VGTSVDataset,
                                 _box_filter, write_detection_tsv)

LABELMAP = {
    "label_to_idx": {"cat": 1, "dog": 2, "car": 3},
    "attribute_to_idx": {"red": 1, "furry": 2},
    "predicate_to_idx": {"on": 1, "near": 2, "to the left of": 3},
}


@pytest.fixture(scope="module")
def tsv_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vgtsv")
    rng = np.random.RandomState(0)
    images, labels = {}, {}
    yy, xx = np.mgrid[0:96, 0:128]
    for i in range(4):
        key = f"im{i}"
        # smooth gradient (JPEG-friendly) + per-image offset
        images[key] = np.stack([(yy * 2 + i * 10) % 256,
                                (xx * 2) % 256,
                                ((yy + xx) // 2) % 256],
                               axis=-1).astype(np.uint8)
        labels[key] = {
            "objects": [
                {"rect": [4, 4, 40, 40], "class": "cat",
                 "attributes": ["red"]},
                {"rect": [30, 10, 90, 80], "class": "dog",
                 "attributes": ["furry", "red"]},
                {"rect": [200, 5, 300, 50], "class": "car",
                 "attributes": []},              # clips to image width
            ],
            "relations": [
                {"subj_id": 0, "obj_id": 1, "class": "on"},
                {"subj_id": 1, "obj_id": 2, "class": "to the left of"},
            ],
        }
    yaml_path = write_detection_tsv(str(root), "train", images, labels,
                                    LABELMAP)
    return root, yaml_path, images


def test_image_roundtrip_and_keys(tsv_root):
    root, yaml_path, images = tsv_root
    ds = DetectionTSVDataset(yaml_path, attribute_on=True)
    assert len(ds) == 4
    assert ds.get_img_key(0) == "im0"
    img = ds.get_image(0)
    assert img.shape == (96, 128, 3)
    # JPEG-lossy but close
    assert np.abs(img.astype(int) - images["im0"].astype(int)).mean() < 20
    info = ds.get_img_info(2)
    assert (info["height"], info["width"]) == (96, 128)


def test_label_loader_semantics(tsv_root):
    _, yaml_path, _ = tsv_root
    ds = DetectionTSVDataset(yaml_path, attribute_on=True)
    # background injected at 0 (od_tsv.py:31)
    assert ds.class_to_ind["__background__"] == 0
    t = ds.get_target(0)
    np.testing.assert_array_equal(t["labels"], [1, 2, 3])
    # clip_to_image with TO_REMOVE=1: x clamped to w-1=127
    np.testing.assert_allclose(t["boxes"][2], [127, 5, 127, 50])
    # attributes padded to 16 slots (label_loader.py:69-74)
    assert t["attributes"].shape == (3, 16)
    np.testing.assert_array_equal(t["attributes"][1][:2], [2, 1])
    assert t["attributes"][2].sum() == 0
    # remove_empty drops the degenerate clipped box
    t2 = ds.get_target(0, remove_empty=True)
    assert len(t2["boxes"]) == 2


def test_vg_relations_and_ignore_list(tsv_root):
    _, yaml_path, _ = tsv_root
    ds = VGTSVDataset(yaml_path, attribute_on=True, relation_on=True)
    assert ds.split == "train"
    t = ds.get_target(0)
    # "to the left of" filtered (vg_tsv.py:58 ignore_rel)
    np.testing.assert_array_equal(t["relation_triplets"], [[0, 1, 1]])
    assert t["pred_labels"][0, 1] == 1
    assert t["pred_labels"][1, 2] == 0
    assert t["pred_labels"].shape == (3, 3)


def test_freq_prior(tsv_root):
    _, yaml_path, _ = tsv_root
    ds = VGTSVDataset(yaml_path)
    prob = ds.compute_freq_prior()
    n_cls = len(ds.class_to_ind)
    n_rel = len(ds.relation_to_ind)
    assert prob.shape == (n_cls, n_cls, n_rel)
    np.testing.assert_allclose(prob.sum(-1), 1.0, rtol=1e-5)
    # cat-on-dog seen 4x: "on" dominates among real predicates (channel 0
    # is the background/no-relation prior, reference vg_tsv.py:66-70)
    assert prob[1, 2, 1:].argmax() + 1 == ds.relation_to_ind["on"]
    assert prob[1, 2, ds.relation_to_ind["on"]] > prob[1, 2, 2]


def test_linelist_subset(tsv_root):
    root, yaml_path, _ = tsv_root
    (root / "sub.linelist").write_text("1\n3\n")
    with open(yaml_path) as f:
        desc = f.read()
    sub_yaml = root / "sub_train.yaml"
    sub_yaml.write_text(desc + "linelist: sub.linelist\n")
    ds = DetectionTSVDataset(str(sub_yaml), attribute_on=False)
    assert len(ds) == 2
    assert ds.get_img_key(0) == "im1" and ds.get_img_key(1) == "im3"


def test_box_filter():
    boxes = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [50, 50, 60, 60]],
                       np.float32)
    pairs = _box_filter(boxes, must_overlap=True)
    assert sorted(map(tuple, pairs)) == [(0, 1), (1, 0)]
    pairs_all = _box_filter(boxes, must_overlap=False)
    assert len(pairs_all) == 6
    # no overlapping boxes -> falls back to all pairs (vg_tsv.py:26-29)
    apart = np.asarray([[0, 0, 5, 5], [50, 50, 60, 60]], np.float32)
    assert len(_box_filter(apart, must_overlap=True)) == 2


@pytest.mark.slow
def test_detector_tools_on_tsv(tsv_root, tmp_path):
    """train_detector --tsv trains (loss finite, steps advance) and
    test_detector --tsv evaluates mAP on the same fixture."""
    _, yaml_path, _ = tsv_root
    from cpt_tpu.tools.test_detector import main as test_main
    from cpt_tpu.tools.train_detector import main as train_main

    state = train_main(["--tsv", yaml_path, "--tiny", "--dtype", "float32",
                        "--max_iter", "3", "--steps", "2",
                        "--warmup_iters", "1", "--freeze_conv_body_at", "0",
                        "--output_dir", str(tmp_path / "ckpt")])
    assert int(state.step) == 3
    ok = test_main(["--tsv", yaml_path, "--tiny", "--dtype", "float32",
                    "--output", str(tmp_path / "eval.pk")])
    assert ok


@pytest.mark.slow
def test_test_detector_sg_eval(tsv_root, tmp_path):
    """test_detector --sg runs SceneParser relation eval over the VG-TSV
    and reports both recall protocols."""
    _, yaml_path, _ = tsv_root
    from cpt_tpu.tools.test_detector import main as test_main

    results, ok = test_main(["--tsv", yaml_path, "--tiny",
                             "--dtype", "float32", "--sg",
                             "--max_rel_dets", "4",
                             "--output", str(tmp_path / "sg.pk")])
    assert ok
    keys = [k for k in results if k.startswith("sg_")]
    assert any("rowan" in k for k in keys)
    assert any("danfei" in k for k in keys)
    assert all(0 <= results[k] <= 1 for k in keys)


def test_concat_detection_dataset(tsv_root, tmp_path):
    """ConcatDetectionDataset: DATASETS.TRAIN-tuple semantics
    (index routing, keys, targets across the boundary)."""
    from cpt_tpu.data.vg_tsv import ConcatDetectionDataset

    _, yaml_path, _ = tsv_root
    a = DetectionTSVDataset(yaml_path, attribute_on=True)
    b = DetectionTSVDataset(yaml_path, attribute_on=True)
    cat = ConcatDetectionDataset([a, b])
    assert len(cat) == len(a) + len(b)
    assert cat.get_img_key(0) == a.get_img_key(0)
    assert cat.get_img_key(len(a)) == b.get_img_key(0)
    np.testing.assert_array_equal(cat.get_target(len(a) + 1)["labels"],
                                  b.get_target(1)["labels"])
    img, target, idx = cat[len(a) + 2]
    assert img.shape == (96, 128, 3)
    import pytest as _pytest

    with _pytest.raises(IndexError):
        cat._locate(len(cat))


@pytest.mark.slow
def test_train_detector_concat_tsv(tsv_root, tmp_path):
    """train_detector --tsv a.yaml,b.yaml trains over the concatenation."""
    _, yaml_path, _ = tsv_root
    from cpt_tpu.tools.train_detector import main as train_main

    state = train_main(["--tsv", f"{yaml_path},{yaml_path}", "--tiny",
                        "--dtype", "float32", "--max_iter", "2",
                        "--steps", "2", "--warmup_iters", "1",
                        "--freeze_conv_body_at", "0",
                        "--output_dir", str(tmp_path / "ckpt")])
    assert int(state.step) == 2


@pytest.mark.slow
def test_train_detector_sg_relation_training(tsv_root, tmp_path):
    """train_detector --sg: relation-head training over the VG-TSV
    (detector frozen, predicate CE finite and decreasing-capable)."""
    _, yaml_path, _ = tsv_root
    from cpt_tpu.tools.train_detector import main as train_main

    params, loss = train_main(["--tsv", yaml_path, "--tiny",
                               "--dtype", "float32", "--sg",
                               "--max_rel_dets", "4", "--max_rels", "8",
                               "--max_iter", "3", "--warmup_iters", "1",
                               "--base_lr", "0.01",
                               "--output_dir", str(tmp_path / "sg")])
    assert np.isfinite(loss)
    assert "relation" in params["params"]


@pytest.mark.slow
def test_detector_attr_eval_cli(tsv_root, tmp_path):
    """test_detector --attr_eval: force-box attribute mAP end-to-end on
    the TSV fixture (random tiny weights — checks the protocol runs and
    emits sane keys, reference test_sg_net.py:115 recipe)."""
    import json

    from cpt_tpu.tools.test_detector import main

    root, yaml_path, _ = tsv_root
    out = tmp_path / "attr_results.json"
    results = main(["--tsv", yaml_path, "--tiny", "--attr_eval",
                    "--output", str(out)])
    assert 0.0 <= results["attr_mAP"] <= 1.0
    assert "attr_weighted_mAP" in results
    blob = json.load(open(out))
    assert blob["attr_mAP"] == pytest.approx(results["attr_mAP"])
