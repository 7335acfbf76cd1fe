"""Cityscapes instance-AP parity vs the reference's own evaluator,
executed directly (``maskrcnn_benchmark/data/datasets/evaluation/
cityscapes/eval_instances.py`` under ``reference_stubs`` plus a stub for
the two trivial ``cityscapesscripts`` helpers it imports).

The synthetic fixture is adversarial on purpose: duplicate matches on
one GT, cross-class overlaps (the reference links class-agnostically),
sub-min-region GTs that "ignore" overlapping predictions, unmatched GTs
(hard false negatives), tied scores, an image with no GT, an image with
no predictions, and one class with no instances anywhere (the NaN path).

Prediction masks go through the reference's own ``Masker`` paste once;
both evaluators then see identical full-canvas binary masks, so the test
isolates the evaluation protocol (mask pasting parity is covered by
``test_reference_fpn_mask_parity``).
"""
import sys
import types

import numpy as np
import pytest
import torch

import reference_stubs

reference_stubs.install()

# eval_instances imports four helpers from cityscapesscripts (absent
# here): two file writers and two pretty-print helpers.
if "cityscapesscripts" not in sys.modules:
    cs = types.ModuleType("cityscapesscripts")
    helpers = types.ModuleType("cityscapesscripts.helpers")
    cs_h = types.ModuleType("cityscapesscripts.helpers.csHelpers")
    cs_h.writeDict2JSON = lambda d, p: None
    cs_h.ensurePath = lambda p: None
    cs_h.colors = types.SimpleNamespace(ENDC="", BOLD="", RED="", GREEN="")
    cs_h.getColorEntry = lambda val, args: ""
    helpers.csHelpers = cs_h
    cs.helpers = helpers
    sys.modules["cityscapesscripts"] = cs
    sys.modules["cityscapesscripts.helpers"] = helpers
    sys.modules["cityscapesscripts.helpers.csHelpers"] = cs_h

from maskrcnn_benchmark.data.datasets.evaluation.cityscapes import (  # noqa: E402
    eval_instances)
from maskrcnn_benchmark.modeling.roi_heads.mask_head.inference import (  # noqa: E402
    Masker)
from maskrcnn_benchmark.structures.bounding_box import BoxList  # noqa: E402
from maskrcnn_benchmark.structures.segmentation_mask import (  # noqa: E402
    SegmentationMask)

from cpt_tpu.engine.cityscapes_eval import (  # noqa: E402
    cityscapes_instance_eval, compute_averages, evaluate_instance_ap,
    format_results, match_instances)

CLASSES = ("cat", "dog", "bird")
W, H = 160, 120


class _FakeDataset:
    CLASSES = CLASSES
    id_to_name = {i: n for i, n in enumerate(CLASSES)}

    def __init__(self, gt_boxlists):
        self._gts = gt_boxlists

    def __len__(self):
        return len(self._gts)

    def __getitem__(self, idx):
        return None, self._gts[idx], idx

    def get_img_info(self, idx):
        return {"width": W, "height": H}


def _box_mask(box, blob_scale=1.0):
    """Full-canvas blob mask roughly filling `box` (elliptical, so mask
    and box statistics differ)."""
    x0, y0, x1, y1 = box
    yy, xx = np.mgrid[0:H, 0:W]
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    rx = max((x1 - x0) / 2.0 * blob_scale, 1.0)
    ry = max((y1 - y0) / 2.0 * blob_scale, 1.0)
    return (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0)


def _fixture(with_masks):
    """Returns (gt_per_image, pred_per_image, gt_boxlists, pred_boxlists,
    canvas_pred_masks_per_image)."""
    gt_recs, pred_recs, gt_bls, pred_bls, canvas_masks = [], [], [], [], []

    def add_image(gt_boxes, gt_labels, pred_boxes, pred_labels, scores):
        gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
        pred_boxes = np.asarray(pred_boxes, np.float32).reshape(-1, 4)
        gt_labels = np.asarray(gt_labels, np.int64)
        pred_labels = np.asarray(pred_labels, np.int64)
        scores = np.asarray(scores, np.float32)

        gt_bl = BoxList(torch.as_tensor(gt_boxes), (W, H), mode="xyxy")
        gt_bl.add_field("labels", torch.as_tensor(gt_labels))
        gt_rec = {"boxes": gt_boxes, "labels": gt_labels}
        g_masks = None
        if with_masks and len(gt_boxes):
            g_masks = np.stack([_box_mask(b) for b in gt_boxes])
            gt_bl.add_field(
                "masks",
                SegmentationMask(torch.as_tensor(g_masks, dtype=torch.uint8),
                                 (W, H), mode="mask"))
            gt_rec["masks"] = g_masks
        elif with_masks:
            g_masks = np.zeros((0, H, W), bool)
            gt_bl.add_field(
                "masks",
                SegmentationMask(torch.zeros((0, H, W), dtype=torch.uint8),
                                 (W, H), mode="mask"))
            gt_rec["masks"] = g_masks

        pred_bl = BoxList(torch.as_tensor(pred_boxes), (W, H), mode="xyxy")
        pred_bl.add_field("labels", torch.as_tensor(pred_labels))
        pred_bl.add_field("scores", torch.as_tensor(scores))
        pred_rec = {"boxes": pred_boxes, "labels": pred_labels,
                    "scores": scores}
        pasted = None
        if with_masks:
            # 28x28 RoI-space blob probabilities, pasted by the
            # reference's own Masker — both evaluators then consume the
            # identical binary canvases.
            yy, xx = np.mgrid[0:28, 0:28] / 27.0
            blob = np.exp(-(((xx - 0.5) / 0.38) ** 2 +
                            ((yy - 0.5) / 0.38) ** 2))
            roi_masks = torch.as_tensor(
                np.tile(blob[None, None], (len(pred_boxes), 1, 1, 1)),
                dtype=torch.float32)
            pred_bl.add_field("mask", roi_masks)
            if len(pred_boxes):
                pasted = Masker(threshold=0.5).forward_single_image(
                    roi_masks, pred_bl)[:, 0].numpy().astype(bool)
            else:
                pasted = np.zeros((0, H, W), bool)
            pred_rec["masks"] = pasted
        gt_recs.append(gt_rec)
        pred_recs.append(pred_rec)
        gt_bls.append(gt_bl)
        pred_bls.append(pred_bl)
        canvas_masks.append(pasted)

    # image 0: one cat GT matched by TWO cat preds (duplicate-match FP
    # rule) + one dog GT overlapping a CAT pred (cross-class link) + a
    # tiny cat GT (area < 100) under an otherwise-unmatched cat pred
    # (ignore-proportion drop).
    add_image(
        gt_boxes=[[20, 20, 60, 60], [70, 20, 110, 60], [24, 72, 33, 81]],
        gt_labels=[0, 1, 0],
        pred_boxes=[[21, 21, 61, 61], [19, 18, 59, 58], [69, 21, 109, 61],
                    [23, 71, 34, 82]],
        pred_labels=[0, 0, 0, 0],
        scores=[0.9, 0.8, 0.7, 0.6])
    # image 1: unmatched dog GT (hard FN), tied scores on two separate
    # cat GTs, one bird GT+pred pair.
    add_image(
        gt_boxes=[[10, 10, 40, 40], [50, 50, 90, 90], [100, 10, 140, 50],
                  [10, 70, 50, 110]],
        gt_labels=[1, 0, 0, 2],
        pred_boxes=[[52, 52, 88, 88], [101, 11, 139, 49],
                    [12, 72, 48, 108]],
        pred_labels=[0, 0, 2],
        scores=[0.5, 0.5, 0.95])
    # image 2: predictions but no GT (pure FPs).
    add_image(gt_boxes=np.zeros((0, 4)), gt_labels=[],
              pred_boxes=[[30, 30, 70, 70]], pred_labels=[1], scores=[0.4])
    # image 3: GT but no predictions.
    add_image(gt_boxes=[[40, 40, 80, 80]], gt_labels=[1],
              pred_boxes=np.zeros((0, 4)), pred_labels=[], scores=[])
    # image 4: NEGATIVE-coordinate boxes (truncated instances). The
    # reference slices mask[y0:y1, x0:x1] raw, so a negative coordinate
    # WRAPS to the canvas tail (near-empty pixel counts); parity requires
    # reproducing that quirk, not clamping to 0.
    add_image(gt_boxes=[[-6, 70, 20, 110], [60, 60, 100, 100]],
              gt_labels=[0, 0],
              pred_boxes=[[-4, 68, 22, 108], [61, 61, 99, 99]],
              pred_labels=[0, 0], scores=[0.7, 0.65])
    return gt_recs, pred_recs, gt_bls, pred_bls, canvas_masks


def _ref_args():
    from copy import deepcopy

    args = deepcopy(eval_instances.defaultArgs)
    args.instLabels = list(CLASSES)
    args.quiet = True
    args.colorized = False
    return args


@pytest.mark.parametrize("with_masks", [False, True])
def test_matches_reference_evaluator(with_masks):
    gt_recs, pred_recs, gt_bls, pred_bls, _ = _fixture(with_masks)
    dataset = _FakeDataset(gt_bls)
    ref_matches = eval_instances.matchGtsWithPreds(dataset, pred_bls)
    args = _ref_args()
    ref_box_ap = eval_instances.evaluateBoxMatches(ref_matches, args)

    matches = match_instances(gt_recs, pred_recs)
    box_ap = evaluate_instance_ap(matches, len(CLASSES), "box")
    np.testing.assert_allclose(box_ap, ref_box_ap, rtol=1e-9, atol=0,
                               equal_nan=True)
    np.testing.assert_allclose(
        [compute_averages(box_ap, CLASSES)["allAp"]],
        [eval_instances.computeAverages(ref_box_ap, args)["allAp"]],
        rtol=1e-12)

    if with_masks:
        ref_mask_ap = eval_instances.evaluateMaskMatches(ref_matches, args)
        mask_ap = evaluate_instance_ap(matches, len(CLASSES), "mask")
        np.testing.assert_allclose(mask_ap, ref_mask_ap, rtol=1e-9, atol=0,
                                   equal_nan=True)
        ours = compute_averages(mask_ap, CLASSES)
        ref = eval_instances.computeAverages(ref_mask_ap, args)
        for key in ("allAp", "allAp50%", "allAp75%"):
            np.testing.assert_allclose(ours[key], ref[key], rtol=1e-12)
        for name in CLASSES:
            np.testing.assert_allclose(ours["classes"][name]["ap"],
                                       ref["classes"][name]["ap"],
                                       rtol=1e-12, equal_nan=True)


def test_full_protocol_and_table(tmp_path):
    gt_recs, pred_recs, _, _, _ = _fixture(True)
    out = tmp_path / "cityscapes.json"
    res = cityscapes_instance_eval(gt_recs, pred_recs, CLASSES,
                                   output_json=str(out))
    assert set(res) == {"bbox", "segm"}
    assert out.exists()
    table = format_results(res["bbox"]["averages"], CLASSES)
    assert "average" in table and "AP_50%" in table
    # sanity: the well-matched bird class scores higher than dog (which
    # has a hard FN and a cross-image FP)
    avg = res["bbox"]["averages"]["classes"]
    assert avg["bird"]["ap50%"] >= avg["dog"]["ap50%"]


def test_cli_driver(tmp_path):
    import json

    from cpt_tpu.tools import cityscapes_eval as cli
    from cpt_tpu.utils import rle as rle_codec

    gt_recs, pred_recs, _, _, _ = _fixture(True)

    def dump(recs, path, with_scores):
        out = []
        for r in recs:
            rec = {"boxes": np.asarray(r["boxes"]).tolist(),
                   "labels": np.asarray(r["labels"]).tolist()}
            if with_scores:
                rec["scores"] = np.asarray(r["scores"]).tolist()
            if "masks" in r and len(r["masks"]):
                rec["masks"] = [rle_codec.encode(m.astype(np.uint8))
                                for m in r["masks"]]
            out.append(rec)
        path.write_text(json.dumps(out))

    gt_path, pred_path = tmp_path / "gt.json", tmp_path / "pred.json"
    dump(gt_recs, gt_path, False)
    dump(pred_recs, pred_path, True)
    res = cli.main(["--gt", str(gt_path), "--pred", str(pred_path),
                    "--classes", ",".join(CLASSES),
                    "--output_json", str(tmp_path / "out.json")])
    direct = cityscapes_instance_eval(gt_recs, pred_recs, CLASSES)
    np.testing.assert_allclose(res["segm"]["averages"]["allAp"],
                               direct["segm"]["averages"]["allAp"],
                               rtol=1e-12)


def test_empty_dataset_nan():
    res = cityscapes_instance_eval(
        [{"boxes": np.zeros((0, 4)), "labels": np.zeros((0,), np.int64)}],
        [{"boxes": np.zeros((0, 4)), "labels": np.zeros((0,), np.int64),
          "scores": np.zeros((0,))}],
        CLASSES, iou_types=("bbox",))
    assert np.isnan(res["bbox"]["averages"]["allAp"])
