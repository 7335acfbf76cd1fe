"""Detector inference post-processing parity vs the reference's own
``PostProcessor`` executed directly (``roi_heads/box_head/inference.py``)
for ALL THREE NMS filter modes — ``filter_results`` (0),
``filter_results_peter`` (1), ``filter_results_fast`` (2) — on identical
logits/regressions/proposals.
"""
import numpy as np
import pytest

import jax.numpy as jnp
import torch

import reference_stubs

reference_stubs.install()

from maskrcnn_benchmark.modeling.roi_heads.box_head.inference import (  # noqa: E402
    PostProcessor)
from maskrcnn_benchmark.structures.bounding_box import BoxList  # noqa: E402

from cpt_tpu.models.detector.config import tiny_detector_config  # noqa: E402
from cpt_tpu.models.detector.heads import (postprocess_fast,  # noqa: E402
                                           postprocess_per_class,
                                           postprocess_peter)

H, W = 48, 64


def _inputs(seed, P=12, C=6):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, W - 12, P)
    y1 = rng.uniform(0, H - 12, P)
    boxes = np.stack([x1, y1, x1 + rng.uniform(4, 12, P),
                      y1 + rng.uniform(4, 12, P)], 1).astype(np.float32)
    logits = rng.randn(P, C).astype(np.float32) * 2.0
    box_reg = (rng.randn(P, C * 4) * 0.1).astype(np.float32)
    feats = rng.randn(P, 8).astype(np.float32)
    return boxes, logits, box_reg, feats


def _ref_run(nms_filter, boxes, logits, box_reg, feats,
             ignore_box_regression=False):
    cfg = reference_stubs.full_attr_rcnn_cfg()
    cfg.MODEL.ROI_HEADS.NMS_FILTER = nms_filter
    cfg.MODEL.ROI_BOX_HEAD.FORCE_BOXES = False
    cfg.TEST.IGNORE_BOX_REGRESSION = ignore_box_regression
    pp = PostProcessor(cfg)
    bl = BoxList(torch.tensor(boxes), (W, H), mode="xyxy")
    with torch.no_grad():
        (out,) = pp((torch.tensor(logits), torch.tensor(box_reg)),
                    [bl], torch.tensor(feats))
    order = torch.argsort(out.get_field("scores"), descending=True)
    return (np.asarray(out.bbox[order]),
            np.asarray(out.get_field("scores")[order]),
            np.asarray(out.get_field("labels")[order]))


def _ours_sorted(out):
    valid = np.asarray(out["valid"]).astype(bool)
    boxes = np.asarray(out["boxes"])[valid]
    scores = np.asarray(out["scores"])[valid]
    labels = np.asarray(out["labels"])[valid]
    order = np.argsort(-scores, kind="stable")
    return boxes[order], scores[order], labels[order]


# filter 2 ("fast") with live box regression is dead code in the
# reference: filter_results_fast computes mean-decoded boxes but then
# returns boxlist[keep_boxes], indexing the [N*C, 4] per-class rows with
# N-space indices — misaligned boxes. Every reference cmd runs filter 2
# only with FORCE_BOXES (CPT extraction) or IGNORE_BOX_REGRESSION
# (where boxlist.bbox stays [N, 4] and indexing is consistent), so
# parity is checked in the configurations that are actually reachable:
# filters 0/1 with live regression, filters 1/2 in ignore mode (the
# gqa/_ext.sh setting; ours mirrors ignore mode with zero deltas).
@pytest.mark.parametrize("nms_filter,seed,ignore_reg",
                         [(0, 0, False), (1, 1, False),
                          (1, 3, True), (2, 2, True)])
def test_postprocess_filters_match_reference(nms_filter, seed, ignore_reg):
    boxes, logits, box_reg, feats = _inputs(seed)
    ref_boxes, ref_scores, ref_labels = _ref_run(
        nms_filter, boxes, logits, box_reg, feats,
        ignore_box_regression=ignore_reg)
    assert len(ref_scores) >= 2, "fixture produced too few detections"

    cfg = tiny_detector_config()
    fn = {0: postprocess_per_class, 1: postprocess_peter,
          2: postprocess_fast}[nms_filter]
    deltas = np.zeros_like(box_reg) if ignore_reg else box_reg
    out = fn(cfg, jnp.asarray(logits), jnp.asarray(deltas),
             jnp.asarray(feats), jnp.asarray(boxes),
             jnp.ones((boxes.shape[0],), bool),
             jnp.asarray([H, W], jnp.float32))
    our_boxes, our_scores, our_labels = _ours_sorted(out)

    assert len(our_scores) == len(ref_scores), (nms_filter,
                                                len(our_scores),
                                                len(ref_scores))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(our_labels, ref_labels)
    np.testing.assert_allclose(our_boxes, ref_boxes, rtol=1e-4, atol=1e-4)
