"""Sweep driver: shots × seeds orchestration over real task drivers
(reference ``Oscar/cmds/refcoco/fsl/run.sh`` protocol) on synthetic data."""
import json
import os
import pickle

import numpy as np
import pytest

from cpt_tpu.tools.sweep import _fill, _split_templates, main as sweep_main
from cpt_tpu.utils.tsv import encode_feature, tsv_writer

D = 16
N_QUERIES = 4
N_COPIES = 2


def test_split_templates():
    own, ext, st2 = _split_templates(
        ["--task", "refcoco", "--shots", "1", "2",
         "--extract", "--", "--n_shot", "{shot}",
         "--stage2", "--", "--seed", "{seed}"])
    assert own == ["--task", "refcoco", "--shots", "1", "2"]
    assert ext == ["--n_shot", "{shot}"]
    assert st2 == ["--seed", "{seed}"]
    own2, ext2, st2b = _split_templates(["--results_dir", "x",
                                         "--stage2", "--a", "b"])
    assert ext2 is None and st2b == ["--a", "b"]


def test_fill_placeholders():
    assert _fill(["--n_shot", "{shot}", "--rand_seed", "{seed}",
                  "--b", "{batch}"],
                 {"shot": 4, "seed": 1, "batch": 4}) == [
        "--n_shot", "4", "--rand_seed", "1", "--b", "4"]


def _gt_box(q):
    return [10.0 * q, 10.0, 10.0 * q + 19.0, 29.0]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweep_refcoco")
    rng = np.random.RandomState(0)
    rows, anns = [], []
    for q in range(N_QUERIES):
        objs, colors, rects = [], [], []
        correct = q % N_COPIES
        for c in range(N_COPIES):
            boxes = []
            feats = rng.randn(3, D).astype(np.float32) * 0.1
            if c == correct:
                feats[:, 0] = 3.0
            for b in range(3):
                boxes.append({"rect": [0, 0, 5, 5],
                              "class": "dog" if b else "cat",
                              "conf": 0.9,
                              "feature": encode_feature(feats[b])})
            objs.append(boxes)
            colors.append(["red"])
            cand = _gt_box(q) if c == correct else [200.0 + 30 * c, 200.0,
                                                    229.0 + 30 * c, 229.0]
            rects.append([cand])
        payload = {"objects": [objs, f"the red dog {q}", colors, rects]}
        rows.append([str(q), json.dumps(payload)])
        gt = _gt_box(q)
        anns.append({"id": str(q),
                     "bbox": [gt[0], gt[1], gt[2] - gt[0] + 1,
                              gt[3] - gt[1] + 1]})
    tsv_writer(rows, str(root / "predictions.tsv"))
    json.dump(anns, open(root / "ann.json", "w"))
    json.dump({str(q): ["cat", "dog", "dog"] for q in range(N_QUERIES)},
              open(root / "det.json", "w"))
    return root


@pytest.mark.slow
def test_refcoco_sweep_end_to_end(fixture_dir, tmp_path):
    """2 shots × 2 seeds: runs the real refcoco_cpt driver per cell, writes
    fewshot_eval-format pickles, and reports the mean±std table."""
    res = tmp_path / "results"
    tsv = str(fixture_dir / "predictions.tsv")
    results = sweep_main([
        "--task", "refcoco", "--shots", "1", "2", "--seeds", "0", "1",
        "--results_dir", str(res),
        "--stage2", "--",
        "--data_file", tsv, "--ann_file", str(fixture_dir / "ann.json"),
        "--det_file", str(fixture_dir / "det.json"),
        "--train_data_file", tsv,
        "--num_train_epochs", "1",
        "--per_gpu_train_batch_size", "{batch}",
        "--per_gpu_eval_batch_size", "4",
        "--seed", "{seed}",
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--img_feature_dim", str(D), "--dtype", "float32",
    ])
    assert set(results) == {1, 2}
    assert set(results[1]) == {0, 1}
    for shot in (1, 2):
        for seed in (0, 1):
            pk = res / f"refcoco_shot{shot}_seed{seed}.pk"
            assert pk.exists()
            blob = pickle.load(open(pk, "rb"))
            assert blob["accuracy"] == results[shot][seed]

    # resume path: cached cells short-circuit
    results2 = sweep_main([
        "--task", "refcoco", "--shots", "1", "--seeds", "0", "--resume",
        "--results_dir", str(res),
        "--stage2", "--", "--data_file", tsv,
        "--ann_file", str(fixture_dir / "ann.json"),
        "--det_file", str(fixture_dir / "det.json"),
    ])
    assert results2[1][0] == results[1][0]

    # fewshot_eval consumes the sweep's output directory directly
    from cpt_tpu.tools.fewshot_eval import main as fe_main

    fe = fe_main(["--results_dir", str(res)])
    assert set(fe) == {1, 2}


def test_extract_stage_template_threading(fixture_dir, tmp_path, monkeypatch):
    """The {shot}/{seed} placeholders thread into the stage-1 extraction
    call and its --output feeds the stage-2 {train_tsv} slot."""
    calls = {}

    def fake_extract(argv):
        calls["extract"] = argv

    def fake_stage2(argv):
        calls["stage2"] = argv
        return 50.0

    import cpt_tpu.tools.extract_features as xf
    import cpt_tpu.tools.refcoco_cpt as rc

    monkeypatch.setattr(xf, "main", fake_extract)
    monkeypatch.setattr(rc, "main", fake_stage2)
    sweep_main([
        "--task", "refcoco", "--shots", "4", "--seeds", "7",
        "--results_dir", str(tmp_path),
        "--extract", "--", "--n_shot", "{shot}", "--rand_seed", "{seed}",
        "--output", str(tmp_path / "train_shot{shot}_seed{seed}.tsv"),
        "--stage2", "--", "--train_data_file", "{train_tsv}",
        "--per_gpu_train_batch_size", "{batch}",
    ])
    assert calls["extract"][:4] == ["--n_shot", "4", "--rand_seed", "7"]
    out = calls["extract"][5]
    assert out.endswith("train_shot4_seed7.tsv")
    assert calls["stage2"] == ["--train_data_file", out,
                               "--per_gpu_train_batch_size", "4"]
    assert os.path.exists(tmp_path / "refcoco_shot4_seed7.pk")
