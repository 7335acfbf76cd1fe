"""Scene-graph inference driver: SceneParser → sg_eval entries.

Bridges ``SceneParser`` inference output to the evaluation protocols in
``engine/sg_eval.py`` — the reference's ``test_sg_net.py`` →
``do_sg_evaluation`` path (``sg_tsv_eval.py:14-99``): per image, the
detector's kept detections become pred_boxes/classes/obj_scores and the
relation head's pair logits become ``rel_scores`` rows (softmax over
predicates, background column included).
"""
from __future__ import annotations

from typing import Dict, Iterable, Tuple

import numpy as np


def sg_pred_entry(out: Dict) -> Dict[str, np.ndarray]:
    """SceneParser inference dict → sg_eval pred_entry."""
    valid = np.asarray(out["valid"])
    k = np.asarray(out["pairs"]).max() + 1 if len(out["pairs"]) else 0
    pair_valid = np.asarray(out["pair_valid"])
    logits = np.asarray(out["rel_logits"], np.float32)
    ex = np.exp(logits - logits.max(-1, keepdims=True))
    probs = ex / ex.sum(-1, keepdims=True)
    keep = pair_valid
    return {
        "pred_boxes": np.asarray(out["boxes"])[:k],
        "pred_classes": np.asarray(out["labels"])[:k],
        "obj_scores": np.asarray(out["scores"])[:k],
        "pred_rel_inds": np.asarray(out["pairs"])[keep],
        "rel_scores": probs[keep],
    }


def sg_gt_entry(target: Dict) -> Dict[str, np.ndarray]:
    """VGTSVDataset target → sg_eval gt_entry."""
    return {
        "gt_boxes": np.asarray(target["boxes"], float),
        "gt_classes": np.asarray(target["labels"]),
        "gt_relations": np.asarray(target["relation_triplets"], int),
        "pred_label_matrix": np.asarray(target["pred_labels"]),
    }


def evaluate_scene_graphs(model, params, dataset, anchors, canvas_hw,
                          freq_prior=None) -> Dict[str, Dict[str, float]]:
    """Run SceneParser over a VG-TSV dataset and evaluate both SG recall
    protocols (reference ``test_sg_net.py`` inference +
    ``do_sg_evaluation``)."""
    import jax
    import jax.numpy as jnp

    from cpt_tpu.engine.sg_eval import do_sg_evaluation

    h, w = canvas_hw

    @jax.jit
    def infer(params, image, hw):
        return model.apply(params, image, hw, anchors,
                           freq_prior=freq_prior)

    entries = []
    for i in range(len(dataset)):
        img, target, _ = dataset[i]
        if target is None or not len(target.get("relation_triplets", [])):
            continue
        canvas = np.zeros((h, w, 3), np.float32)
        ih, iw = img.shape[:2]
        canvas[: min(ih, h), : min(iw, w)] = img[:h, :w]
        out = infer(params, jnp.asarray(canvas),
                    jnp.asarray([min(ih, h), min(iw, w)], jnp.int32))
        entries.append((sg_gt_entry(target),
                        sg_pred_entry({k: np.asarray(v)
                                       for k, v in out.items()})))
    return do_sg_evaluation(entries)
