"""Report CLIs: fewshot seed-sweep, GQA ensemble, shard merge, extraction
memoization/sharding flags."""
import json
import pickle

import numpy as np
import pytest

from cpt_tpu.utils.tsv import TSVFile, tsv_writer


def test_fewshot_eval_cli(tmp_path, capsys):
    from cpt_tpu.tools.fewshot_eval import main

    for shot in (1, 4):
        for seed in (8, 88):
            pickle.dump({"accuracy": 50.0 + shot + seed % 8},
                        open(tmp_path / f"rc_shot{shot}_seed{seed}.pk", "wb"))
    results = main(["--results_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "shot 1" in out and "shot 4" in out and "±" in out
    assert set(results[1]) == {8, 88}


def test_show_ensemble_cli(tmp_path):
    from cpt_tpu.tools.show_ensemble import main

    pt = {"results": {"q0": {"pred": 0, "scores": np.array([2.0, 1.0])},
                      "q1": {"pred": 1, "scores": np.array([0.0, 1.0])}}}
    cpt = {"results": {"q0": {"pred": 1, "scores": np.array([0.0, 9.0])},
                       "q1": {"pred": 1, "scores": np.array([0.0, 1.0])}}}
    pickle.dump(pt, open(tmp_path / "pt.pk", "wb"))
    pickle.dump(cpt, open(tmp_path / "cpt.pk", "wb"))
    json.dump({"q0": 1, "q1": 1}, open(tmp_path / "labels.json", "w"))
    # 3:1 weights: q0 → 3*[2,1] + [0,9] = [6, 12] → pred 1 (correct)
    acc = main(["--pt_results", str(tmp_path / "pt.pk"),
                "--cpt_results", str(tmp_path / "cpt.pk"),
                "--labels", str(tmp_path / "labels.json")])
    assert acc == 100.0
    # pt-only would get q0 wrong
    acc2 = main(["--pt_results", str(tmp_path / "pt.pk"),
                 "--cpt_results", str(tmp_path / "cpt.pk"),
                 "--labels", str(tmp_path / "labels.json"),
                 "--pt_weight", "1.0", "--cpt_weight", "0.0"])
    assert acc2 == 50.0


def test_show_ensemble_vcr_and_qar(tmp_path):
    """--task vcr (gt stored in the pickles) and --task vcr_qar (both
    heads must be right — eval/vcr/show_ensemble_results.py:17-22)."""
    from cpt_tpu.tools.show_ensemble import main

    def res(scores_by_q, gts):
        return {q: {"pred": int(np.argmax(s)), "scores": np.asarray(s),
                    "gt": gts[q]}
                for q, s in scores_by_q.items()}

    gts = {"q0": 1, "q1": 0}
    pt_s = {"q0": [2.0, 1.0], "q1": [3.0, 0.0]}     # q0 wrong alone
    cpt_s = {"q0": [0.0, 9.0], "q1": [1.0, 0.0]}    # rescues q0 at 3:1
    pickle.dump({"results": res(pt_s, gts)}, open(tmp_path / "p.pk", "wb"))
    pickle.dump({"results": res(cpt_s, gts)},
                open(tmp_path / "c.pk", "wb"))
    acc = main(["--task", "vcr", "--pt_results", str(tmp_path / "p.pk"),
                "--cpt_results", str(tmp_path / "c.pk")])
    assert acc == 100.0

    # qar: answer head right for both qs, rationale head wrong on q1 →
    # joint accuracy 50
    r_gts = {"q0": 0, "q1": 1}
    r_pt = {"q0": [5.0, 0.0], "q1": [5.0, 0.0]}
    r_cpt = {"q0": [5.0, 0.0], "q1": [5.0, 0.0]}
    pickle.dump({"results": {"qa": res(pt_s, gts), "qar": res(r_pt, r_gts)}},
                open(tmp_path / "pq.pk", "wb"))
    pickle.dump({"results": {"qa": res(cpt_s, gts),
                             "qar": res(r_cpt, r_gts)}},
                open(tmp_path / "cq.pk", "wb"))
    acc = main(["--task", "vcr_qar",
                "--pt_results", str(tmp_path / "pq.pk"),
                "--cpt_results", str(tmp_path / "cq.pk")])
    assert acc == 50.0


def test_merge_shards_cli(tmp_path):
    from cpt_tpu.tools.merge_shards import main

    for i in range(3):
        tsv_writer([[f"k{i}_{j}", "v"] for j in range(2)],
                   str(tmp_path / f"pred.tsv.shard{i}"))
    main(["--shards", str(tmp_path / "pred.tsv.shard*"),
          "--output", str(tmp_path / "merged.tsv")])
    f = TSVFile(str(tmp_path / "merged.tsv"))
    assert len(f) == 6
    assert f.seek(0)[0] == "k0_0" and f.seek(5)[0] == "k2_1"


def test_extract_memoization(tmp_path, capsys):
    from cpt_tpu.tools.extract_features import main

    out = str(tmp_path / "predictions.tsv")
    tsv_writer([["existing", "row"]], out)
    main(["--tiny", "--synthetic", "1", "--output", out])
    assert "skipping" in capsys.readouterr().out
    # untouched
    assert TSVFile(out).seek(0)[0] == "existing"


def test_ext_objects_cli(tmp_path):
    from cpt_tpu.tools.ext_objects import main
    from cpt_tpu.utils.tsv import encode_feature
    import numpy as np

    rows = [["im0", json.dumps({"objects": [
        {"rect": [1, 2, 3, 4], "class": "dog", "conf": 0.9,
         "feature": encode_feature(np.zeros(4, np.float32))}]})]]
    tsv_writer(rows, str(tmp_path / "p.tsv"))
    main(["--tsv", str(tmp_path / "p.tsv"),
          "--output", str(tmp_path / "objects.json")])
    objs = json.load(open(tmp_path / "objects.json"))
    assert objs["im0"][0]["class"] == "dog"
    assert "feature" not in objs["im0"][0]
    main(["--tsv", str(tmp_path / "p.tsv"),
          "--output", str(tmp_path / "det.json"), "--classes_only"])
    assert json.load(open(tmp_path / "det.json")) == {"im0": ["dog"]}


def test_extract_yaml_descriptor(tmp_path, capsys):
    """--yaml descriptor fills ann/det/image_root (reference data yamls)."""
    import yaml

    from cpt_tpu.tools.extract_features import build_args, main

    yaml.safe_dump({"ann": "a.json", "det": "d.json",
                    "image_root": "imgs"}, open(tmp_path / "task.yaml", "w"))
    # memoization path exits before data loading — output pre-created
    tsv_writer([["x", "y"]], str(tmp_path / "out.tsv"))
    main(["--yaml", str(tmp_path / "task.yaml"),
          "--output", str(tmp_path / "out.tsv"), "--tiny"])
    assert "skipping" in capsys.readouterr().out


def test_img_info_cli(tmp_path):
    from PIL import Image

    from cpt_tpu.tools.img_info import main

    d = tmp_path / "imgs"
    d.mkdir()
    Image.new("RGB", (32, 20)).save(d / "a.jpg")
    Image.new("RGB", (8, 6)).save(d / "b.png")
    out = tmp_path / "img_info.json"
    infos = main(["--image_dir", str(d), "--output", str(out),
                  "--shard_count", "4",
                  "--cnt_path", str(tmp_path / "cnt.pk")])
    assert infos["a.jpg"] == {"width": 32, "height": 20}
    assert infos["b.png"] == {"width": 8, "height": 6}
    assert json.load(open(out)) == infos
    assert pickle.load(open(tmp_path / "cnt.pk", "rb")) == 4


def test_img_bbox_colors_and_upper_bound(tmp_path):
    """create_img_bbox / all-color probe images / refcoco detection
    upper-bound parity helpers (prompt_feat tools+other one-offs)."""
    from cpt_tpu.tools.img_info import main
    from cpt_tpu.utils.tsv import encode_feature

    rows = [["im0", json.dumps({"objects": [
        {"rect": [1, 2, 3, 4], "class": "dog", "conf": 0.9,
         "feature": encode_feature(np.zeros(4, np.float32))},
        {"rect": [0, 0, 10, 10], "class": "cat", "conf": 0.5,
         "feature": encode_feature(np.zeros(4, np.float32))}]})]]
    tsv_writer(rows, str(tmp_path / "p.tsv"))
    main(["--bbox_from", str(tmp_path / "p.tsv")])
    bb = pickle.load(open(tmp_path / "bbox.pk", "rb"))
    assert bb["im0"].shape == (2, 4) and bb["im0"].dtype == np.float32
    assert bb["im0"][0].tolist() == [1, 2, 3, 4]

    main(["--all_color_imgs", str(tmp_path / "colors"),
          "--color_step", "128"])
    cb = pickle.load(open(tmp_path / "colors" / "bbox.pk", "rb"))
    assert len(cb) == 8 and (tmp_path / "colors" / "0_0_128.jpg").exists()
    assert cb["0_0_0.jpg"].tolist() == [[0, 0, 128, 128]]

    anns = [{"file_name": "COCO_train2014_000000000042.jpg",
             "bbox": [10, 10, 20, 20]},
            {"file_name": "COCO_train2014_000000000007.jpg",
             "bbox": [0, 0, 5, 5]}]
    dets = {"42": [{"box": [11, 11, 20, 20]}, {"box": [100, 100, 5, 5]}],
            "7": [{"box": [50, 50, 4, 4]}]}
    json.dump(anns, open(tmp_path / "a.json", "w"))
    json.dump(dets, open(tmp_path / "d.json", "w"))
    from cpt_tpu.tools.img_info import refcoco_upper_bound
    assert refcoco_upper_bound(str(tmp_path / "a.json"),
                               str(tmp_path / "d.json")) == 0.5


@pytest.mark.slow
def test_detector_eval_cli(tmp_path, capsys):
    """test_detector synthetic mode: RPN-mode eval + VOC & COCO metrics +
    expected-results assertion."""
    from cpt_tpu.tools.test_detector import main

    out = str(tmp_path / "det_results.pk")
    results, ok = main(["--tiny", "--synthetic", "2", "--dtype", "float32",
                        "--coco_eval", "--output", out,
                        "--expected_results", '[["mAP", 0.0, 1.0]]'])
    assert ok
    assert "mAP" in results and "coco_AP" in results
    stdout = capsys.readouterr().out
    assert "COCO AP" in stdout
    saved = pickle.load(open(out, "rb"))
    assert len(saved["predictions"]) == 2


def test_explore_cli_template_sweep(tmp_path, capsys):
    """explore.py ranks ZSL templates by zero-shot accuracy (synthetic)."""
    from cpt_tpu.data.synthetic import generate_refcoco_fixture
    from cpt_tpu.tools.explore import main

    paths = generate_refcoco_fixture(str(tmp_path), n_queries=2,
                                     feat_dim=134)
    results = main(["--synthetic", "--mode", "templates",
                    "--templates", "1,2",
                    "--data_file", paths["data_file"],
                    "--ann_file", paths["ann_file"],
                    "--det_file", paths["det_file"],
                    "--output", str(tmp_path / "sweep.json")])
    assert set(results) == {"template1", "template2"}
    assert all(0.0 <= v <= 100.0 for v in results.values())
    assert "best:" in capsys.readouterr().out
    assert json.load(open(tmp_path / "sweep.json")) == results


def test_explore_cli_soft_prompt(tmp_path, capsys):
    """explore.py soft mode — the continuous-template search of the
    reference's sgd_to_explore_template.py (which cannot run there: its
    CheatTemplateTSVDataset import doesn't exist in the tree). Trainable
    [unusedN] slot embeddings around [MASK], AdamW on ONLY those
    word-embedding rows, accuracy before/after, nearest-token readout.
    Asserts the frozen parameters really stayed frozen and only the slot
    rows moved."""
    import jax

    from cpt_tpu.data.synthetic import generate_refcoco_fixture
    from cpt_tpu.tools.explore import _setup, build_args, main

    paths = generate_refcoco_fixture(str(tmp_path), n_queries=3,
                                     feat_dim=134)
    argv = ["--synthetic", "--mode", "soft", "--soft_slots", "2,2",
            "--soft_steps", "8", "--train_batch_size", "4",
            "--data_file", paths["data_file"],
            "--ann_file", paths["ann_file"],
            "--det_file", paths["det_file"],
            "--output", str(tmp_path / "soft.json")]
    before = _setup(build_args().parse_args(argv), paths["data_file"])[1]
    results = main(argv)
    assert 0.0 <= results["soft_after"] <= 100.0
    assert len(results["soft_readout"]) == 4
    assert all(len(slot) == 20 for slot in results["soft_readout"])
    out = capsys.readouterr().out
    assert "slot 1:" in out

    # frozen-parameter check: retrain and compare against the pristine
    # init — only word_embeddings rows 1..4 may differ
    from cpt_tpu.data.refcoco import RefcocoCPTData, iter_train_batches
    from cpt_tpu.engine import train as train_lib
    from cpt_tpu.tools.explore import soft_prompt_optimizer
    from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

    args = build_args().parse_args(argv)
    model, params, tok, data_for = _setup(args, paths["data_file"])
    data = data_for(None, soft_slots=(2, 2))
    tx = soft_prompt_optimizer(tok.convert_tokens_to_ids(
        [f"[unused{i}]" for i in range(1, 5)]), 0.02)
    state = train_lib.create_train_state(params, tx)
    step = train_lib.make_mlm_train_step(model, tx, dropout=False)
    fb = next(iter_train_batches(data, 4, seed=0))
    state, _ = step(state, train_lib.batch_arrays_mlm(fb),
                    jax.random.PRNGKey(0))
    flat_a = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(state.params)[0]
    moved = 0
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        key = jax.tree_util.keystr(pa)
        a, b = np.asarray(a), np.asarray(b)
        if "word_embeddings" in key:
            assert np.array_equal(a[0], b[0]) and np.array_equal(
                a[5:], b[5:]), "frozen embedding rows moved"
            moved += int(not np.array_equal(a[1:5], b[1:5]))
        else:
            assert np.array_equal(a, b), f"frozen param moved: {key}"
    assert moved == 1, "slot rows did not train"

    # real-BERT vocab layout guard: [unused0]=1 so [unused1]..[unused4]
    # are ids 2..5, NOT 1..4 — the optimizer must mask the rows the
    # tokenizer actually maps the slot tokens to (regression: an
    # off-by-one trained row 1 and skipped the last slot).
    real_layout = {"[PAD]": 0}
    for i in range(99):
        real_layout[f"[unused{i}]"] = i + 1
    real_layout.update({"[UNK]": 100, "[CLS]": 101, "[SEP]": 102,
                        "[MASK]": 103})
    real_tok = BertTokenizer(real_layout)
    ids = real_tok.convert_tokens_to_ids(
        [f"[unused{i}]" for i in range(1, 5)])
    assert ids == [2, 3, 4, 5]
    tx2 = soft_prompt_optimizer(ids, 0.02)
    # the first donating step deleted `params`' device buffers — rebuild
    # the tree from the pristine host-side copy (donation gotcha)
    params2 = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x)), before)
    state2 = train_lib.create_train_state(params2, tx2)
    step2 = train_lib.make_mlm_train_step(model, tx2, dropout=False)
    state2, _ = step2(state2, train_lib.batch_arrays_mlm(fb),
                      jax.random.PRNGKey(0))
    for (pa, a), (_, b) in zip(flat_a,
                               jax.tree_util.tree_flatten_with_path(
                                   state2.params)[0]):
        if "word_embeddings" in jax.tree_util.keystr(pa):
            a, b = np.asarray(a), np.asarray(b)
            assert np.array_equal(a[:2], b[:2]) and np.array_equal(
                a[6:], b[6:]), "rows outside slot ids moved"
            assert not np.array_equal(a[2:6], b[2:6]), \
                "slot rows (real layout) did not train"


@pytest.mark.slow
def test_explore_cli_color_sweep(tmp_path):
    """explore.py colors mode: one predictions.tsv per color."""
    from cpt_tpu.data.synthetic import generate_refcoco_fixture
    from cpt_tpu.tools.explore import main

    p1 = generate_refcoco_fixture(str(tmp_path / "red"), n_queries=2,
                                  feat_dim=134)
    p2 = generate_refcoco_fixture(str(tmp_path / "blue"), n_queries=2,
                                  feat_dim=134, seed=1)
    json.dump({"red": p1["data_file"], "blue": p2["data_file"]},
              open(tmp_path / "colors.json", "w"))
    results = main(["--synthetic", "--mode", "colors",
                    "--color_data", str(tmp_path / "colors.json"),
                    "--ann_file", p1["ann_file"],
                    "--det_file", p1["det_file"]])
    assert set(results) == {"red", "blue"}
