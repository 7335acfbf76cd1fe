"""Scene-graph triplet evaluation (engine/sg_eval.py): unit semantics +
true parity against the reference's own evaluator
(``evaluation/sg/evaluator.py``, imported and executed via
reference_stubs)."""
import sys

import numpy as np
import pytest

from cpt_tpu.engine.sg_eval import (SceneGraphEvaluator,
                                    compute_average_precision,
                                    compute_precision_recall,
                                    compute_recall_at_k, do_sg_evaluation,
                                    evaluate_danfei, eval_per_class,
                                    intersect_2d, iou_exclusive,
                                    iou_inclusive,
                                    openimages_vrd_relation_eval)


def _random_entry(rng, n_gt=5, n_pred=8, n_rel=6, n_classes=6, n_preds=4,
                  canvas=200):
    def boxes(n):
        # sort the two corner points coordinate-wise -> valid xyxy
        b = np.sort(rng.uniform(0, canvas, (n, 2, 2)), axis=1)
        return b.reshape(n, 4).round()

    gt_boxes = boxes(n_gt)
    gt_classes = rng.randint(1, n_classes, n_gt)
    pairs = [(i, j) for i in range(n_gt) for j in range(n_gt) if i != j]
    sel = rng.choice(len(pairs), size=min(n_rel, len(pairs)), replace=False)
    gt_rels = np.asarray([[pairs[s][0], pairs[s][1],
                           rng.randint(1, n_preds)] for s in sel])
    # predictions: half the boxes jittered copies of gt (should match)
    pred_boxes = np.concatenate([
        gt_boxes[: n_pred // 2] + rng.uniform(-3, 3, (n_pred // 2, 4)),
        boxes(n_pred - n_pred // 2)])
    pred_classes = np.concatenate([gt_classes[: n_pred // 2],
                                   rng.randint(1, n_classes,
                                               n_pred - n_pred // 2)])
    obj_scores = rng.uniform(0.3, 1.0, n_pred)
    ppairs = [(i, j) for i in range(n_pred) for j in range(n_pred) if i != j]
    psel = rng.choice(len(ppairs), size=min(12, len(ppairs)), replace=False)
    pred_rel_inds = np.asarray([ppairs[s] for s in psel])
    rel_scores = rng.uniform(0, 1, (len(psel), n_preds))
    gt_entry = {"gt_relations": gt_rels, "gt_boxes": gt_boxes,
                "gt_classes": gt_classes}
    pred_entry = {"pred_boxes": pred_boxes, "pred_classes": pred_classes,
                  "obj_scores": obj_scores, "pred_rel_inds": pred_rel_inds,
                  "rel_scores": rel_scores}
    return gt_entry, pred_entry


def test_perfect_predictions_hit_full_recall():
    rng = np.random.RandomState(0)
    gt_entry, _ = _random_entry(rng)
    pred_entry = {
        "pred_boxes": gt_entry["gt_boxes"],
        "pred_classes": gt_entry["gt_classes"],
        "obj_scores": np.ones(len(gt_entry["gt_boxes"])),
        "pred_rel_inds": gt_entry["gt_relations"][:, :2],
        "rel_scores": np.eye(5)[gt_entry["gt_relations"][:, 2]] * 0.9 + 0.05,
    }
    ev = SceneGraphEvaluator("sgdet")
    ev.evaluate_scene_graph_entry(gt_entry, pred_entry)
    assert ev.means()[100] == 1.0
    # predcls substitutes gt boxes/classes
    ev2 = SceneGraphEvaluator("predcls")
    ev2.evaluate_scene_graph_entry(gt_entry, pred_entry)
    assert ev2.means()[100] == 1.0


def test_empty_predictions_zero_recall():
    rng = np.random.RandomState(1)
    gt_entry, _ = _random_entry(rng)
    ev = SceneGraphEvaluator("sgdet")
    ev.evaluate_scene_graph_entry(
        gt_entry, {"pred_boxes": np.zeros((0, 4)),
                   "pred_classes": np.zeros(0),
                   "obj_scores": np.zeros(0),
                   "pred_rel_inds": np.zeros((0, 2), int),
                   "rel_scores": np.zeros((0, 5))})
    assert ev.means() == {20: 0.0, 50: 0.0, 100: 0.0}


@pytest.mark.parametrize("mode", ["sgdet", "sgcls", "predcls"])
def test_parity_with_reference_evaluator(mode):
    """Our recalls equal the reference's own evaluator.py on random
    entries — executed via the sg package itself."""
    # Load the reference's sg evaluator directly as a synthetic package —
    # importing through maskrcnn_benchmark's package __init__ chain pulls
    # old-torch code (torch._six) unrelated to the evaluator itself.
    import importlib.util
    import types

    sg_dir = ("/root/reference/prompt_feat/maskrcnn_benchmark/data/"
              "datasets/evaluation/sg")
    if "refsg" not in sys.modules:
        pkg = types.ModuleType("refsg")
        pkg.__path__ = [sg_dir]
        sys.modules["refsg"] = pkg
        spec = importlib.util.spec_from_file_location(
            "refsg.evaluator", sg_dir + "/evaluator.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsg.evaluator"] = mod
        spec.loader.exec_module(mod)
    BasicSceneGraphEvaluator = sys.modules[
        "refsg.evaluator"].BasicSceneGraphEvaluator

    rng = np.random.RandomState(7)
    ref_ev = BasicSceneGraphEvaluator(mode)
    our_ev = SceneGraphEvaluator(mode)
    for trial in range(8):
        n_gt = 4 + trial % 3
        # sgcls/predcls predict over the gt boxes: rel inds must index them
        n_pred = 6 + trial % 4 if mode == "sgdet" else n_gt
        gt_entry, pred_entry = _random_entry(rng, n_gt=n_gt, n_pred=n_pred)
        ref_ev.evaluate_scene_graph_entry(gt_entry, pred_entry)
        our_ev.evaluate_scene_graph_entry(gt_entry, pred_entry)
    ref = {k: float(np.mean(v))
           for k, v in ref_ev.result_dict[mode + "_recall"].items()}
    np.testing.assert_allclose(
        [our_ev.means()[k] for k in (20, 50, 100)],
        [ref[k] for k in (20, 50, 100)], atol=1e-12)


def test_do_sg_evaluation_both_protocols():
    rng = np.random.RandomState(3)
    entries = []
    for _ in range(4):
        gt_entry, pred_entry = _random_entry(rng)
        n = len(gt_entry["gt_boxes"])
        mat = np.zeros((n, n), np.int64)
        for s, o, p in gt_entry["gt_relations"]:
            mat[s, o] = p
        gt_entry["pred_label_matrix"] = mat
        entries.append((gt_entry, pred_entry))
    out = do_sg_evaluation(entries)
    assert set(out) == {"rowan_metric", "danfei_metric"}
    for metric in out.values():
        assert set(metric) == {"sgdet20", "sgdet50", "sgdet100"}
        assert all(0 <= v <= 1 for v in metric.values())
    # recall non-decreasing in K
    rm = out["rowan_metric"]
    assert rm["sgdet20"] <= rm["sgdet50"] <= rm["sgdet100"]


def test_danfei_perfect_recall():
    gt_boxes = np.array([[0, 0, 50, 50], [60, 60, 120, 120],
                         [10, 80, 70, 150]], float)
    gt_classes = np.array([1, 2, 3])
    mat = np.zeros((3, 3), np.int64)
    mat[0, 1] = 1
    mat[1, 2] = 2
    result = {"sgdet_recall": {20: [], 50: [], 100: []}}
    rel_inds = np.array([[0, 1], [1, 2]])
    rel_scores = np.array([[0.1, 0.8, 0.1], [0.1, 0.1, 0.8]])
    evaluate_danfei(gt_classes, gt_boxes, mat, gt_boxes,
                    np.ones(3), gt_classes, rel_inds, rel_scores, result)
    assert result["sgdet_recall"][20] == [1.0]


def test_iou_conventions_differ():
    a = [0, 0, 9, 9]
    # inclusive: area 100; exclusive: area 81
    assert iou_inclusive(np.asarray([a]), np.asarray([a]))[0, 0] == 1.0
    assert iou_exclusive(a, a) == 1.0
    b = [5, 0, 14, 9]
    inc = iou_inclusive(np.asarray([a]), np.asarray([b]))[0, 0]
    exc = iou_exclusive(a, b)
    assert abs(inc - 50 / 150) < 1e-9
    assert abs(exc - 36 / 126) < 1e-9


def test_openimages_vrd_eval():
    cls = (1, 2, 1)  # (subj, obj, predicate)
    gt = {cls: {"im0": [{"subject_rect": [0, 0, 50, 50],
                         "object_rect": [60, 60, 120, 120]}],
                "im1": [{"subject_rect": [0, 0, 30, 30],
                         "object_rect": [40, 40, 80, 80]}]}}
    pred = {cls: {"im0": [{"score": 0.9,
                           "subject_rect": [1, 1, 51, 51],
                           "object_rect": [61, 61, 121, 121]},
                          {"score": 0.5,
                           "subject_rect": [200, 200, 250, 250],
                           "object_rect": [260, 260, 300, 300]}],
                  "im1": [{"score": 0.8,
                           "subject_rect": [100, 100, 130, 130],
                           "object_rect": [140, 140, 180, 180]}]}}
    out = openimages_vrd_relation_eval(gt, pred)
    # 1 TP at score .9, FPs at .5/.8 -> P=[1,.5,1/3], R=[.5,.5,.5]
    assert out["recall@50"] == pytest.approx(0.5)
    assert out["map"] == pytest.approx(0.5)  # interpolated AP
    # phrase mode: union boxes
    gtp = {cls: {"im0": [{"rect": [0, 0, 120, 120]}]}}
    predp = {cls: {"im0": [{"score": 0.9, "rect": [1, 1, 119, 119]}]}}
    outp = openimages_vrd_relation_eval(gtp, predp, eval_phrase=True)
    assert outp["map"] == pytest.approx(1.0)


def test_ap_helpers():
    scores = np.array([0.9, 0.8, 0.7])
    labels = np.array([True, False, True])
    p, r = compute_precision_recall(scores, labels, 2)
    np.testing.assert_allclose(p, [1.0, 0.5, 2 / 3])
    np.testing.assert_allclose(r, [0.5, 0.5, 1.0])
    ap = compute_average_precision(p, r)
    assert 0.5 < ap <= 1.0
    assert compute_recall_at_k([np.array([1, 0]), np.array([1])], 3, 1) == (
        pytest.approx(2 / 3))


def test_intersect_2d():
    a = np.array([[1, 2], [3, 4]])
    b = np.array([[3, 4], [1, 2], [5, 6]])
    np.testing.assert_array_equal(
        intersect_2d(a, b), [[False, True, False], [True, False, False]])


def test_danfei_parity_with_reference():
    """Our IMP/Danfei recall equals the reference's own
    sg_tsv_eval.evaluate on random entries (reference module executed
    directly with import stubs for its TSV helper)."""
    import importlib.util
    import types

    import torch

    from cpt_tpu.engine.sg_eval import evaluate_danfei

    sg_dir = ("/root/reference/prompt_feat/maskrcnn_benchmark/data/"
              "datasets/evaluation/sg")
    if "refsg" not in sys.modules:
        pkg = types.ModuleType("refsg")
        pkg.__path__ = [sg_dir]
        sys.modules["refsg"] = pkg
    if "refsg.evaluator" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "refsg.evaluator", sg_dir + "/evaluator.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsg.evaluator"] = mod
        spec.loader.exec_module(mod)
    if "refsg.sg_tsv_eval" not in sys.modules:
        # stub the tsv helper import the eval functions never touch
        mb = types.ModuleType("maskrcnn_benchmark")
        st = types.ModuleType("maskrcnn_benchmark.structures")
        ops = types.ModuleType("maskrcnn_benchmark.structures.tsv_file_ops")
        ops.tsv_reader = lambda *a, **k: iter(())
        sys.modules.setdefault("maskrcnn_benchmark", mb)
        sys.modules.setdefault("maskrcnn_benchmark.structures", st)
        sys.modules["maskrcnn_benchmark.structures.tsv_file_ops"] = ops
        spec = importlib.util.spec_from_file_location(
            "refsg.sg_tsv_eval", sg_dir + "/sg_tsv_eval.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsg.sg_tsv_eval"] = mod
        spec.loader.exec_module(mod)
    ref_eval = sys.modules["refsg.sg_tsv_eval"].evaluate

    rng = np.random.RandomState(11)
    mode = "sgdet"
    ours = {mode + "_recall": {20: [], 50: [], 100: []}}
    ref = {mode + "_recall": {20: [], 50: [], 100: []}}
    for trial in range(6):
        gt_entry, pred_entry = _random_entry(rng, n_gt=4 + trial % 3,
                                             n_pred=6 + trial % 3)
        n = len(gt_entry["gt_boxes"])
        mat = np.zeros((n, n), np.int64)
        for s, o, p in gt_entry["gt_relations"]:
            mat[s, o] = p
        rel_inds = pred_entry["pred_rel_inds"]
        rel_scores = pred_entry["rel_scores"]
        evaluate_danfei(gt_entry["gt_classes"], gt_entry["gt_boxes"], mat,
                        pred_entry["pred_boxes"], pred_entry["obj_scores"],
                        pred_entry["pred_classes"], rel_inds, rel_scores,
                        ours, mode)
        ref_eval(torch.as_tensor(gt_entry["gt_classes"]),
                 torch.as_tensor(gt_entry["gt_boxes"]),
                 torch.as_tensor(mat),
                 torch.as_tensor(pred_entry["pred_boxes"]),
                 torch.as_tensor(pred_entry["obj_scores"]),
                 torch.as_tensor(pred_entry["pred_classes"]),
                 torch.as_tensor(rel_inds),
                 torch.as_tensor(rel_scores),
                 [20, 50, 100], ref, mode)
    for k in (20, 50, 100):
        np.testing.assert_allclose(ours[mode + "_recall"][k],
                                   ref[mode + "_recall"][k], atol=1e-12)


def test_oi_vrd_helpers_parity_with_reference():
    """AP/recall helpers equal the reference's eval_utils (pure numpy,
    loaded directly)."""
    import importlib.util

    path = ("/root/reference/prompt_feat/maskrcnn_benchmark/data/datasets/"
            "evaluation/openimages_vrd/eval_utils.py")
    spec = importlib.util.spec_from_file_location("ref_eval_utils", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.RandomState(13)
    for _ in range(5):
        n = rng.randint(3, 12)
        scores = rng.uniform(0, 1, n)
        labels = rng.rand(n) > 0.5
        num_gt = int(labels.sum()) + rng.randint(0, 3)
        if num_gt == 0:
            num_gt = 1
        p_ref, r_ref = ref.compute_precision_recall(scores, labels, num_gt)
        p_our, r_our = compute_precision_recall(scores, labels, num_gt)
        np.testing.assert_allclose(p_our, p_ref)
        np.testing.assert_allclose(r_our, r_ref)
        np.testing.assert_allclose(
            compute_average_precision(p_our, r_our),
            ref.compute_average_precision(p_ref, r_ref))
    # IoU convention (exclusive areas)
    for _ in range(20):
        ax, ay = np.sort(rng.uniform(0, 100, 2)), np.sort(rng.uniform(0, 100, 2))
        bx, by = np.sort(rng.uniform(0, 100, 2)), np.sort(rng.uniform(0, 100, 2))
        a = [ax[0], ay[0], ax[1], ay[1]]
        b = [bx[0], by[0], bx[1], by[1]]
        assert abs(iou_exclusive(a, b) - ref.IoU(a, b)) < 1e-12
    # recall@k
    tp_fp = [np.asarray([1, 0, 1]), np.asarray([0, 1])]
    assert compute_recall_at_k(tp_fp, 5, 2) == ref.compute_recall_at_k(
        tp_fp, 5, 2)
