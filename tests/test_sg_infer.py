"""SceneParser → sg_eval bridge: end-to-end scene-graph evaluation on a
VG-TSV fixture (the reference test_sg_net.py → do_sg_evaluation path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.engine.sg_infer import sg_gt_entry, sg_pred_entry


def test_sg_pred_entry_layout():
    out = {
        "boxes": np.asarray([[0, 0, 10, 10], [20, 20, 40, 40],
                             [5, 5, 15, 15]], np.float32),
        "labels": np.asarray([1, 2, 3]),
        "scores": np.asarray([0.9, 0.8, 0.7]),
        "valid": np.asarray([True, True, True]),
        "pairs": np.asarray([[0, 1], [1, 0], [0, 2]]),
        "pair_valid": np.asarray([True, True, False]),
        "rel_logits": np.asarray([[0.0, 2.0, 1.0]] * 3, np.float32),
    }
    e = sg_pred_entry(out)
    assert e["pred_rel_inds"].shape == (2, 2)      # invalid pair dropped
    assert e["rel_scores"].shape == (2, 3)
    np.testing.assert_allclose(e["rel_scores"].sum(-1), 1.0, rtol=1e-6)
    assert e["pred_boxes"].shape[0] == 3


def test_sg_gt_entry_from_tsv_target():
    target = {
        "boxes": np.asarray([[0, 0, 5, 5], [7, 7, 12, 12]], np.float32),
        "labels": np.asarray([1, 2]),
        "relation_triplets": np.asarray([[0, 1, 1]]),
        "pred_labels": np.asarray([[0, 1], [0, 0]]),
    }
    g = sg_gt_entry(target)
    assert g["gt_relations"].tolist() == [[0, 1, 1]]
    assert g["pred_label_matrix"][0, 1] == 1


@pytest.mark.slow
def test_scene_graph_eval_end_to_end(tmp_path):
    """Tiny SceneParser over a VG-TSV fixture → both recall protocols."""
    from cpt_tpu.data.vg_tsv import VGTSVDataset, write_detection_tsv
    from cpt_tpu.engine.sg_infer import evaluate_scene_graphs
    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.models.detector.rpn import grid_anchors
    from cpt_tpu.models.detector.scene_parser import SceneParser

    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:64, 0:64]
    images, labels = {}, {}
    for i in range(2):
        images[f"im{i}"] = np.stack(
            [(yy * 3 + i * 20) % 256, (xx * 3) % 256, (yy + xx) % 256],
            axis=-1).astype(np.uint8)
        labels[f"im{i}"] = {
            "objects": [
                {"rect": [4, 4, 28, 28], "class": "cat", "attributes": []},
                {"rect": [30, 30, 60, 60], "class": "dog",
                 "attributes": []},
            ],
            "relations": [{"subj_id": 0, "obj_id": 1, "class": "on"}],
        }
    labelmap = {"label_to_idx": {"cat": 1, "dog": 2},
                "attribute_to_idx": {"red": 1},
                "predicate_to_idx": {"on": 1, "near": 2}}
    yaml_path = write_detection_tsv(str(tmp_path), "val", images, labels,
                                    labelmap)
    ds = VGTSVDataset(yaml_path, attribute_on=False, relation_on=True)

    cfg = tiny_detector_config()
    n_rel = len(ds.relation_to_ind)
    model = SceneParser(cfg, num_rel_classes=n_rel, algorithm="sg_reldn",
                        max_rel_dets=4)
    h = w = cfg.input.pad_h
    anchors = jnp.asarray(grid_anchors(cfg.rpn, h // 16, w // 16))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((h, w, 3)), jnp.asarray([h, w]),
                                 anchors)
    out = evaluate_scene_graphs(model, params, ds, anchors, (h, w))
    assert set(out) == {"rowan_metric", "danfei_metric"}
    for metric in out.values():
        assert all(np.isfinite(v) and 0 <= v <= 1
                   for v in metric.values()), metric
