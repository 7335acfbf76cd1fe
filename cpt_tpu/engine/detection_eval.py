"""Detection evaluation: VOC-style mAP (VG convention) + expected-results
assertion.

Parity with reference
``data/datasets/evaluation/vg/vg_eval.py`` (``eval_detection_voc:104``,
``calc_detection_voc_prec_rec:177``, ``voc_ap:301``): per-class greedy
matching at IoU ≥ 0.5 with the +1 box-extent convention, difficult-gt
exclusion, continuous-interpolation AP (or the 11-point VOC07 metric), and
the ``TEST.EXPECTED_RESULTS`` σ-tolerance regression check
(``evaluation/coco/coco_eval.py:377`` / ``defaults.py:476-477``).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _iou_plus_one(box: np.ndarray, gts: np.ndarray) -> np.ndarray:
    ixmin = np.maximum(gts[:, 0], box[0])
    iymin = np.maximum(gts[:, 1], box[1])
    ixmax = np.minimum(gts[:, 2], box[2])
    iymax = np.minimum(gts[:, 3], box[3])
    iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
    ih = np.maximum(iymax - iymin + 1.0, 0.0)
    inter = iw * ih
    union = ((box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
             + (gts[:, 2] - gts[:, 0] + 1.0) * (gts[:, 3] - gts[:, 1] + 1.0)
             - inter)
    return inter / np.maximum(union, 1e-10)


def voc_ap(rec: np.ndarray, prec: np.ndarray,
           use_07_metric: bool = False) -> float:
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(prec[rec >= t]) if np.any(rec >= t) else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate([[0.0], rec, [1.0]])
    mpre = np.concatenate([[0.0], prec, [0.0]])
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def eval_detection_voc(pred_per_image: Sequence[dict],
                       gt_per_image: Sequence[dict],
                       num_classes: int, iou_thresh: float = 0.5,
                       use_07_metric: bool = False) -> Dict[str, float]:
    """pred_per_image: [{"boxes" [N,4], "labels" [N], "scores" [N]}];
    gt_per_image: [{"boxes" [M,4], "labels" [M], "difficult" [M]?}].
    Classes are 1-indexed (0 = background, skipped).
    Returns {"mAP": ..., "AP/<c>": ...} (classes with no gt excluded)."""
    aps = {}
    for c in range(1, num_classes):
        scores: List[float] = []
        matched: List[bool] = []
        n_pos = 0
        for preds, gts in zip(pred_per_image, gt_per_image):
            gt_sel = np.asarray(gts["labels"]) == c
            gt_boxes = np.asarray(gts["boxes"], np.float64)[gt_sel]
            difficult = np.asarray(
                gts.get("difficult", np.zeros(len(gts["labels"]))))[gt_sel]
            n_pos += int((~difficult.astype(bool)).sum())
            p_sel = np.asarray(preds["labels"]) == c
            p_boxes = np.asarray(preds["boxes"], np.float64)[p_sel]
            p_scores = np.asarray(preds["scores"], np.float64)[p_sel]
            order = np.argsort(-p_scores, kind="stable")
            taken = np.zeros(len(gt_boxes), bool)
            for pi in order:
                scores.append(p_scores[pi])
                ok = False
                if len(gt_boxes):
                    ious = _iou_plus_one(p_boxes[pi], gt_boxes)
                    best = int(np.argmax(ious))
                    if ious[best] >= iou_thresh:
                        if difficult.astype(bool)[best]:
                            scores.pop()   # difficult gt: ignore detection
                            continue
                        if not taken[best]:
                            taken[best] = True
                            ok = True
                matched.append(ok)
        if n_pos == 0:
            continue
        if not scores:
            aps[f"AP/{c}"] = 0.0
            continue
        order = np.argsort(-np.asarray(scores), kind="stable")
        tp = np.cumsum(np.asarray(matched)[order])
        fp = np.cumsum(~np.asarray(matched)[order])
        rec = tp / n_pos
        prec = tp / np.maximum(tp + fp, 1e-10)
        aps[f"AP/{c}"] = voc_ap(rec, prec, use_07_metric)
    out = {"mAP": float(np.mean(list(aps.values()))) if aps else 0.0}
    out.update(aps)
    return out


def check_expected_results(results: Dict[str, float],
                           expected: Sequence[Tuple[str, float, float]],
                           logger=print) -> bool:
    """σ-tolerance regression assertion (reference
    ``coco_eval.py:check_expected_results``): each entry is
    (metric, expected_value, sigma_tol); returns True if all pass."""
    ok = True
    for metric, mean, std in expected:
        actual = results[metric]
        lo, hi = mean - std, mean + std
        passed = lo < actual < hi
        msg = (f"{metric}: {actual:.4f} vs expected {mean:.4f} ± {std:.4f} "
               f"-> {'OK' if passed else 'FAIL'}")
        logger(msg)
        ok &= passed
    return ok
