"""Detector TRAINING-LOSS parity vs the reference's own loss computations,
executed directly (``maskrcnn_benchmark/modeling/rpn/loss.py``,
``roi_heads/box_head/loss.py`` under ``reference_stubs``).

Sampling is made deterministic by keeping every eligible anchor/proposal
(counts below the sampler's caps): ``torch.randperm`` then only permutes a
set whose loss contribution is permutation-invariant, so the comparison is
exact rather than stochastic.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

import reference_stubs

reference_stubs.install()

from maskrcnn_benchmark.modeling.balanced_positive_negative_sampler import (  # noqa: E402
    BalancedPositiveNegativeSampler)
from maskrcnn_benchmark.modeling.box_coder import BoxCoder  # noqa: E402
from maskrcnn_benchmark.modeling.matcher import Matcher  # noqa: E402
from maskrcnn_benchmark.modeling.roi_heads.box_head.loss import (  # noqa: E402
    FastRCNNLossComputation)
from maskrcnn_benchmark.modeling.rpn.loss import (  # noqa: E402
    RPNLossComputation, generate_rpn_labels)
from maskrcnn_benchmark.structures.bounding_box import BoxList  # noqa: E402

from cpt_tpu.models.detector.losses import (fast_rcnn_loss, rpn_loss,  # noqa: E402
                                            subsample_proposals)


def _rand_boxes(rng, n, size=100.0):
    x1 = rng.uniform(0, size - 20, (n,))
    y1 = rng.uniform(0, size - 20, (n,))
    w = rng.uniform(5, 20, (n,))
    h = rng.uniform(5, 20, (n,))
    return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


def test_rpn_loss_matches_reference():
    """RPN objectness BCE + smooth-L1(β=1/9): matcher with low-quality
    forcing, visibility discard, all-kept sampling."""
    rng = np.random.RandomState(0)
    A, G = 14, 3
    anchors = _rand_boxes(rng, A)
    gt = _rand_boxes(rng, G)
    # overlap some anchors with gt so positives exist
    anchors[:G] = gt + rng.uniform(-2, 2, (G, 4)).astype(np.float32)
    objectness = rng.randn(A).astype(np.float32)
    deltas = rng.randn(A, 4).astype(np.float32)
    visibility = np.ones(A, bool)
    visibility[A - 2] = False

    anchor_bl = BoxList(torch.tensor(anchors), (100, 100), mode="xyxy")
    anchor_bl.add_field("visibility", torch.tensor(visibility))
    target_bl = BoxList(torch.tensor(gt), (100, 100), mode="xyxy")

    evaluator = RPNLossComputation(
        Matcher(0.7, 0.3, allow_low_quality_matches=True),
        BalancedPositiveNegativeSampler(256, 0.5),
        BoxCoder(weights=(1.0, 1.0, 1.0, 1.0)),
        generate_rpn_labels)
    obj_t, box_t = evaluator(
        [[anchor_bl]],
        [torch.tensor(objectness).reshape(1, A, 1, 1)],
        [torch.tensor(deltas.reshape(-1)).reshape(1, A * 4, 1, 1)],
        [target_bl])

    obj_j, box_j = rpn_loss(
        jnp.asarray(objectness), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(gt), jnp.ones((G,), bool), jax.random.PRNGKey(0),
        fg_iou=0.7, bg_iou=0.3, batch_size_per_image=256,
        positive_fraction=0.5, anchor_visible=jnp.asarray(visibility))
    np.testing.assert_allclose(float(obj_j), float(obj_t), rtol=1e-5)
    np.testing.assert_allclose(float(box_j), float(box_t), rtol=1e-5)


def test_fast_rcnn_loss_matches_reference():
    """Box-head CE + per-class smooth-L1(β=1) normalized by sampled count,
    through the reference's subsample + __call__."""
    rng = np.random.RandomState(1)
    P, G, C = 16, 3, 5
    proposals = _rand_boxes(rng, P)
    gt = _rand_boxes(rng, G)
    proposals[:G] = gt + rng.uniform(-1, 1, (G, 4)).astype(np.float32)
    gt_labels = rng.randint(1, C, (G,))
    class_logits = rng.randn(P, C).astype(np.float32)
    box_reg = rng.randn(P, C * 4).astype(np.float32)

    prop_bl = BoxList(torch.tensor(proposals), (100, 100), mode="xyxy")
    target_bl = BoxList(torch.tensor(gt), (100, 100), mode="xyxy")
    target_bl.add_field("labels", torch.tensor(gt_labels))

    evaluator = FastRCNNLossComputation(
        Matcher(0.5, 0.5, allow_low_quality_matches=False),
        BalancedPositiveNegativeSampler(512, 0.25),
        BoxCoder(weights=(10.0, 10.0, 5.0, 5.0)),
        cls_agnostic_bbox_reg=False)
    sampled = evaluator.subsample([prop_bl], [target_bl])
    # all-kept sampling ⇒ the filtered proposals are the originals, but in
    # nonzero() order — recover it to align logits
    keep = np.asarray(
        torch.nonzero(torch.tensor(np.ones(P, bool))).squeeze(1))
    assert len(sampled[0]) == P, "sampler dropped proposals; shrink P"
    cls_t, box_t = evaluator(
        [torch.tensor(class_logits[keep])],
        [torch.tensor(box_reg[keep])])

    labels, reg_targets, pos, sampled_mask = subsample_proposals(
        jnp.asarray(proposals), jnp.ones((P,), bool), jnp.asarray(gt),
        jnp.asarray(gt_labels.astype(np.int32)), jnp.ones((G,), bool),
        jax.random.PRNGKey(1), batch_size_per_image=512,
        positive_fraction=0.25, fg_iou=0.5, bg_iou=0.5)
    assert bool(jnp.all(sampled_mask)), "expected all proposals sampled"
    cls_j, box_j = fast_rcnn_loss(
        jnp.asarray(class_logits), jnp.asarray(box_reg), labels,
        reg_targets, pos, sampled_mask, num_classes=C)

    # cross-check the per-proposal labels agree with the reference's
    ref_labels = np.asarray(sampled[0].get_field("labels"))
    np.testing.assert_array_equal(np.asarray(labels), ref_labels)
    np.testing.assert_allclose(float(cls_j), float(cls_t), rtol=1e-5)
    np.testing.assert_allclose(float(box_j), float(box_t), rtol=1e-5)


def test_attribute_loss_matches_reference():
    """Attribute soft-target CE (scene_graph_benchmark
    attribute_head/loss.py) executed directly: IoU-matched gt attributes,
    bg/between rows zeroed, mean over ALL proposals."""
    from scene_graph_benchmark.attribute_head.loss import (
        AttributeRCNNLossComputation)

    from cpt_tpu.models.detector.losses import (BELOW_LOW, BETWEEN,
                                                attribute_loss,
                                                match_proposals)
    from cpt_tpu.structures.boxes import box_iou

    rng = np.random.RandomState(3)
    P, G, K, A = 10, 3, 4, 9
    proposals = _rand_boxes(rng, P)
    gt = _rand_boxes(rng, G)
    proposals[:G] = gt + rng.uniform(-1, 1, (G, 4)).astype(np.float32)
    gt_attrs = np.zeros((G, K), np.int64)
    gt_attrs[0, :2] = [3, 5]
    gt_attrs[1, 0] = 7
    attr_logits = rng.randn(P, A).astype(np.float32)

    cfg = reference_stubs.full_attr_rcnn_cfg()
    evaluator = AttributeRCNNLossComputation(cfg)
    prop_bl = BoxList(torch.tensor(proposals), (100, 100), mode="xyxy")
    tgt_bl = BoxList(torch.tensor(gt), (100, 100), mode="xyxy")
    tgt_bl.add_field("labels", torch.tensor(np.ones(G, np.int64)))
    tgt_bl.add_field("attributes", torch.tensor(gt_attrs))
    loss_t = evaluator([prop_bl], torch.tensor(attr_logits), [tgt_bl])

    iou = np.asarray(box_iou(jnp.asarray(gt), jnp.asarray(proposals)))
    matches = np.asarray(match_proposals(
        jnp.asarray(iou), cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
        cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD))
    per_prop = gt_attrs[np.maximum(matches, 0)]
    per_prop[(matches == BELOW_LOW) | (matches == BETWEEN)] = 0
    loss_j = attribute_loss(
        jnp.asarray(attr_logits), jnp.asarray(per_prop.astype(np.int32)),
        jnp.ones((P,), bool),
        loss_weight=cfg.MODEL.ROI_ATTRIBUTE_HEAD.LOSS_WEIGHT)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_reldn_contrastive_losses_match_reference():
    """RelDN graphical contrastive losses (node / SO-aware / P-aware)
    vs the reference's own split_pos_neg_* + margin_ranking_loss executed
    directly (relation_head/loss.py:398-668, compensation off — the
    sg_defaults.py:134 default)."""
    import torch.nn.functional as F

    from maskrcnn_benchmark.modeling.roi_heads.box_head import loss as _  # noqa
    from scene_graph_benchmark.relation_head.loss import (
        FastRCNNLossComputation as RelLoss)

    from cpt_tpu.models.detector.relation_head import (
        reldn_contrastive_losses)

    # CPU stand-in for the hardcoded .cuda(device_id) calls
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        rng = np.random.RandomState(5)
        num_objs, R, C = 4, 6, 5           # dets, predicate classes, obj classes
        det_labels = rng.randint(1, C, num_objs)
        # pairs (sbj, obj) with labels: 0=no-rel, >=1 gt predicate
        pairs = np.array([[0, 1], [0, 2], [0, 3], [1, 0], [1, 2],
                          [2, 0], [2, 3], [3, 1], [0, 1], [1, 3]])
        pair_labels = np.array([2, 0, 1, 0, 3, 0, 2, 0, 0, 1])
        P = len(pairs)
        logits = rng.randn(P, R).astype(np.float32)
        probs = torch.softmax(torch.tensor(logits), dim=1)

        evaluator = RelLoss.__new__(RelLoss)

        class _CL:
            NODE_CONTRASTIVE_MARGIN = 0.2
            NODE_CONTRASTIVE_SO_AWARE_MARGIN = 0.2
            NODE_CONTRASTIVE_P_AWARE_MARGIN = 0.2
            USE_SPO_AGNOSTIC_COMPENSATION = False

        class _Cfg:
            class MODEL:
                class ROI_RELATION_HEAD:
                    CONTRASTIVE_LOSS = _CL

        ref = {}
        for name, anchor_col, other_col in (("sbj", 0, 1), ("obj", 1, 0)):
            anchors = pairs[:, anchor_col]
            others = pairs[:, other_col]
            uniq, inds_unique, inds_reverse = np.unique(
                anchors, return_index=True, return_inverse=True)
            binary = (pair_labels > 0).astype(np.int64)
            pos_b, neg_b, tgt = evaluator.split_pos_neg_spo_agnostic(
                probs, binary, inds_unique, inds_reverse)
            ref[f"loss_contrastive_{name}"] = float(F.margin_ranking_loss(
                pos_b, neg_b, tgt, margin=0.2))
            sbj_lab = det_labels[pairs[:, 0]]
            obj_lab = det_labels[pairs[:, 1]]
            pos_b, neg_b, tgt = evaluator.split_pos_neg_so_aware(
                _Cfg, probs, binary, inds_unique, inds_reverse,
                sbj_lab, obj_lab, "s" if name == "sbj" else "o")
            ref[f"loss_so_contrastive_{name}"] = float(
                F.margin_ranking_loss(pos_b, neg_b, tgt, margin=0.2))
            pos_b, neg_b, tgt = evaluator.split_pos_neg_p_aware(
                _Cfg, probs, None, binary, inds_unique, inds_reverse,
                pair_labels)
            ref[f"loss_p_contrastive_{name}"] = float(
                F.margin_ranking_loss(pos_b, neg_b, tgt, margin=0.2))
    finally:
        torch.Tensor.cuda = orig_cuda

    ours = reldn_contrastive_losses(
        jnp.asarray(logits), jnp.asarray(pairs.astype(np.int32)),
        jnp.asarray(pair_labels.astype(np.int32)),
        jnp.ones((P,), bool), jnp.asarray(det_labels.astype(np.int32)),
        num_objs, num_obj_classes=C, num_rel_classes=R)
    for k, v in ref.items():
        np.testing.assert_allclose(float(ours[k]), v, rtol=1e-5,
                                   err_msg=k)


def _stub_eval_import_chain():
    """datasets/__init__ pulls pycocotools + cityscapesscripts; stub."""
    import sys
    import types

    if "pycocotools" not in sys.modules:
        pc = types.ModuleType("pycocotools")
        pm = types.ModuleType("pycocotools.mask")
        pm.decode = pm.encode = pm.frPyObjects = lambda *a, **k: None
        pc.mask = pm
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.mask"] = pm
        pcc = types.ModuleType("pycocotools.coco")
        pcc.COCO = object
        sys.modules["pycocotools.coco"] = pcc
    if "cityscapesscripts" not in sys.modules:
        cs = types.ModuleType("cityscapesscripts")
        ch = types.ModuleType("cityscapesscripts.helpers")
        chh = types.ModuleType("cityscapesscripts.helpers.csHelpers")
        chh.writeDict2JSON = lambda *a, **k: None
        chh.__getattr__ = lambda attr: (lambda *a, **k: None)
        ch.csHelpers = chh
        cs.helpers = ch
        sys.modules["cityscapesscripts"] = cs
        sys.modules["cityscapesscripts.helpers"] = ch
        sys.modules["cityscapesscripts.helpers.csHelpers"] = chh


@pytest.mark.parametrize("use_07", [False, True])
def test_voc_eval_matches_reference(use_07):
    """VOC mAP protocol vs the reference's own eval_detection_voc
    executed directly (evaluation/voc/voc_eval.py): per-class APs and
    mAP on identical synthetic detections, both AP metrics, with
    difficult-gt handling."""
    _stub_eval_import_chain()
    from maskrcnn_benchmark.data.datasets.evaluation.voc.voc_eval import (
        eval_detection_voc as ref_voc)

    from cpt_tpu.engine.detection_eval import eval_detection_voc

    rng = np.random.RandomState(7)
    C, n_img = 4, 5
    preds, gts, pred_bls, gt_bls = [], [], [], []
    for _ in range(n_img):
        ng = rng.randint(2, 5)
        g_boxes = _rand_boxes(rng, ng)
        g_labels = rng.randint(1, C, ng)
        difficult = (rng.rand(ng) < 0.25)
        npd = rng.randint(3, 7)
        # half the predictions jitter a gt box, half are random
        p_boxes = _rand_boxes(rng, npd)
        for i in range(min(ng, npd)):
            p_boxes[i] = g_boxes[i] + rng.uniform(-3, 3, 4).astype(
                np.float32)
        p_labels = rng.randint(1, C, npd)
        p_labels[: min(ng, npd)] = g_labels[: min(ng, npd)]
        p_scores = rng.rand(npd).astype(np.float32)

        preds.append({"boxes": p_boxes, "labels": p_labels,
                      "scores": p_scores})
        gts.append({"boxes": g_boxes, "labels": g_labels,
                    "difficult": difficult})
        pb = BoxList(torch.tensor(p_boxes), (100, 100), mode="xyxy")
        pb.add_field("labels", torch.tensor(p_labels))
        pb.add_field("scores", torch.tensor(p_scores))
        pred_bls.append(pb)
        gb = BoxList(torch.tensor(g_boxes), (100, 100), mode="xyxy")
        gb.add_field("labels", torch.tensor(g_labels))
        gb.add_field("difficult", torch.tensor(difficult))
        gt_bls.append(gb)

    ref = ref_voc(pred_bls, gt_bls, iou_thresh=0.5, use_07_metric=use_07)
    ours = eval_detection_voc(preds, gts, num_classes=C,
                              use_07_metric=use_07, double_inclusive=True)
    ref_ap = ref["ap"]
    for c in range(1, C):
        key = f"AP/{c}"
        if key in ours:
            np.testing.assert_allclose(ours[key], ref_ap[c], rtol=1e-6,
                                       err_msg=key)
    # reference mAP = nanmean over classes incl. background nan slot
    np.testing.assert_allclose(ours["mAP"],
                               float(np.nanmean(ref_ap[1:])), rtol=1e-6)


@pytest.mark.parametrize("use_07", [False, True])
def test_vg_eval_matches_reference(use_07):
    """VG detection-mAP protocol (the test_sg_net evaluator behind the
    VinVL numbers, evaluation/vg/vg_eval.py — global cross-image score
    sort, single +1 convention, greedy taken-flags) vs our DEFAULT
    eval_detection_voc convention."""
    _stub_eval_import_chain()
    from maskrcnn_benchmark.data.datasets.evaluation.vg.vg_eval import (
        calc_detection_voc_prec_rec as ref_pr)

    from cpt_tpu.engine.detection_eval import eval_detection_voc

    rng = np.random.RandomState(11)
    C, n_img = 4, 5
    preds, gts, pred_bls, gt_bls = [], [], [], []
    for _ in range(n_img):
        ng = rng.randint(2, 5)
        g_boxes = _rand_boxes(rng, ng)
        g_labels = rng.randint(1, C, ng)
        npd = rng.randint(3, 7)
        p_boxes = _rand_boxes(rng, npd)
        for i in range(min(ng, npd)):
            p_boxes[i] = g_boxes[i] + rng.uniform(-3, 3, 4).astype(
                np.float32)
        p_labels = rng.randint(1, C, npd)
        p_labels[: min(ng, npd)] = g_labels[: min(ng, npd)]
        p_scores = rng.rand(npd).astype(np.float32)
        preds.append({"boxes": p_boxes, "labels": p_labels,
                      "scores": p_scores})
        gts.append({"boxes": g_boxes, "labels": g_labels})
        pb = BoxList(torch.tensor(p_boxes), (100, 100), mode="xyxy")
        pb.add_field("labels", torch.tensor(p_labels))
        pb.add_field("scores", torch.tensor(p_scores))
        pred_bls.append(pb)
        gb = BoxList(torch.tensor(g_boxes), (100, 100), mode="xyxy")
        gb.add_field("labels", torch.tensor(g_labels))
        gt_bls.append(gb)

    ours = eval_detection_voc(preds, gts, num_classes=C,
                              use_07_metric=use_07)
    for c in range(1, C):
        rec, prec, ref_ap, _scores, npos = ref_pr(
            pred_bls, gt_bls, c, iou_thresh=0.5, eval_attributes=False,
            use_07_metric=use_07)
        if npos == 0:
            continue
        np.testing.assert_allclose(ours[f"AP/{c}"], ref_ap, rtol=1e-6,
                                   err_msg=f"AP/{c}")


def test_attribute_eval_matches_reference():
    """Attribute-detection mAP (vg_eval eval_attributes=True — the
    test_sg_net force-box attribute evaluation) vs our
    eval_detection_attributes: per-class APs on identical synthetic
    predictions with [N,K] attribute slots."""
    _stub_eval_import_chain()
    from maskrcnn_benchmark.data.datasets.evaluation.vg.vg_eval import (
        calc_detection_voc_prec_rec as ref_pr)

    from cpt_tpu.engine.detection_eval import eval_detection_attributes

    rng = np.random.RandomState(13)
    A, K, n_img = 6, 3, 4
    preds, gts, pred_bls, gt_bls = [], [], [], []
    for _ in range(n_img):
        ng = rng.randint(2, 4)
        g_boxes = _rand_boxes(rng, ng)
        g_attrs = np.zeros((ng, K), np.int64)
        for i in range(ng):
            n_a = rng.randint(1, K + 1)
            g_attrs[i, :n_a] = rng.choice(np.arange(1, A), n_a,
                                          replace=False)
        npd = rng.randint(2, 5)
        p_boxes = _rand_boxes(rng, npd)
        for i in range(min(ng, npd)):
            p_boxes[i] = g_boxes[i] + rng.uniform(-2, 2, 4).astype(
                np.float32)
        p_attrs = rng.randint(1, A, (npd, K))
        p_scores = rng.rand(npd, K).astype(np.float32)
        p_scores[rng.rand(npd, K) < 0.2] = 0.0   # zero-score slots skipped

        preds.append({"boxes": p_boxes, "attr_labels": p_attrs,
                      "attr_scores": p_scores})
        gts.append({"boxes": g_boxes, "attributes": g_attrs})
        pb = BoxList(torch.tensor(p_boxes), (100, 100), mode="xyxy")
        pb.add_field("attr_labels", torch.tensor(p_attrs))
        pb.add_field("attr_scores", torch.tensor(p_scores))
        pred_bls.append(pb)
        gb = BoxList(torch.tensor(g_boxes), (100, 100), mode="xyxy")
        gb.add_field("attributes", torch.tensor(g_attrs))
        gt_bls.append(gb)

    ours = eval_detection_attributes(preds, gts, num_attr_classes=A)
    ref_aps = []
    for c in range(1, A):
        _rec, _prec, ap, _scores, npos = ref_pr(
            pred_bls, gt_bls, c, iou_thresh=0.5, eval_attributes=True,
            use_07_metric=False)
        ref_aps.append(float(ap))
        key = f"attrAP/{c}"
        if key in ours:
            np.testing.assert_allclose(ours[key], ap, rtol=1e-6,
                                       err_msg=key)
    np.testing.assert_allclose(ours["attr_mAP"], np.mean(ref_aps),
                               rtol=1e-6)
