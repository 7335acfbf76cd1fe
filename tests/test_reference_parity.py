"""End-to-end parity vs the REFERENCE's own torch modules (CPU, stubbed
CUDA ops — see reference_stubs.py). The strongest parity evidence we can
produce without real checkpoints: same random weights, same inputs, the
reference's actual code vs our JAX rebuild."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

import reference_stubs
from cpt_tpu.models.detector import convert as dcv
from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.models.detector.heads import BoxFeatureExtractor
from cpt_tpu.models.detector.resnet import ResNetC4
from cpt_tpu.models.detector.rpn import RPNHead

reference_stubs.install()


@pytest.fixture(scope="module")
def ref_backbone():
    torch.manual_seed(0)
    from maskrcnn_benchmark.modeling.backbone import resnet as ref_resnet

    cfg = reference_stubs.tiny_resnet_cfg()
    model = ref_resnet.ResNet(cfg)
    model.eval()
    # randomize the frozen-BN buffers too (init is identity)
    rng = np.random.RandomState(0)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if "running_var" in name:
                buf.copy_(torch.tensor(
                    rng.rand(*buf.shape).astype(np.float32) + 0.5))
            elif "running_mean" in name or name.endswith("bias"):
                buf.copy_(torch.tensor(
                    rng.randn(*buf.shape).astype(np.float32) * 0.1))
            elif name.endswith("weight"):
                buf.copy_(torch.tensor(
                    rng.rand(*buf.shape).astype(np.float32) + 0.5))
    return model


def test_backbone_matches_reference_code(ref_backbone, rng):
    """Our ResNetC4 vs the reference's ResNet forward, converted weights."""
    sd = {f"backbone.body.{k}": v.detach().numpy()
          for k, v in ref_backbone.state_dict().items()}
    cfg = tiny_detector_config()
    # convert just the backbone subtree
    bb_params = {
        "stem": {"conv1": {"kernel": dcv._conv(sd["backbone.body.stem.conv1.weight"])},
                 "bn1": dcv._fold_bn(sd, "backbone.body.stem.bn1")},
    }
    for i in range(1, 4):
        blocks = 1
        bb_params[f"layer{i}"] = dcv._stage(sd, f"backbone.body.layer{i}",
                                            blocks)

    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 10
    with torch.no_grad():
        ref = ref_backbone(torch.tensor(x).permute(0, 3, 1, 2))[0]
    ref = ref.permute(0, 2, 3, 1).numpy()

    ours = ResNetC4(cfg.backbone).apply({"params": bb_params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)


def test_rpn_head_matches_reference_code(rng):
    torch.manual_seed(1)
    from maskrcnn_benchmark.modeling.rpn.rpn import RPNHead as RefRPNHead

    ref = RefRPNHead(None, 64, 15)
    ref.eval()
    x = rng.randn(1, 9, 11, 64).astype(np.float32)
    with torch.no_grad():
        logits, deltas = ref(
            [torch.tensor(x).permute(0, 3, 1, 2)])
    sd = {f"rpn.head.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "conv": {"kernel": dcv._conv(sd["rpn.head.conv.weight"]),
                 "bias": sd["rpn.head.conv.bias"]},
        "cls_logits": {"kernel": dcv._conv(sd["rpn.head.cls_logits.weight"]),
                       "bias": sd["rpn.head.cls_logits.bias"]},
        "bbox_pred": {"kernel": dcv._conv(sd["rpn.head.bbox_pred.weight"]),
                      "bias": sd["rpn.head.bbox_pred.bias"]},
    }
    ours_logits, ours_deltas = RPNHead(15).apply({"params": params},
                                                 jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours_logits),
                               logits[0].permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-3)
    # NHWC [H, W, A*4] flat ordering equals the reference's NCHW
    # permute_and_flatten ordering ([H, W, A, 4])
    ref_d = deltas[0].reshape(1, 15, 4, 9, 11).permute(0, 3, 4, 1, 2)
    np.testing.assert_allclose(
        np.asarray(ours_deltas).reshape(1, 9, 11, 15, 4),
        ref_d.numpy(), atol=1e-4, rtol=1e-3)


def test_pooler_stage5_matches_reference_code(rng):
    """Reference Pooler (stubbed adaptive roi_align) + ResNetHead stage-5 vs
    our BoxFeatureExtractor with sampling=0."""
    torch.manual_seed(2)
    reference_stubs.tiny_resnet_cfg()  # registers stage specs
    from maskrcnn_benchmark.modeling.backbone import resnet as ref_resnet
    from maskrcnn_benchmark.modeling.poolers import Pooler
    from maskrcnn_benchmark.structures.bounding_box import BoxList

    pooler = Pooler(output_size=(4, 4), scales=(0.25,), sampling_ratio=0)
    # block_count=3 = the reference's hard-coded stage-5 spec
    stage = ref_resnet.StageSpec(index=4, block_count=3,
                                 return_features=False)
    head = ref_resnet.ResNetHead(
        block_module="BottleneckWithFixedBatchNorm", stages=(stage,),
        num_groups=2, width_per_group=4, stride_in_1x1=False,
        stride_init=None, res2_out_channels=16, dilation=1)
    head.eval()
    rng2 = np.random.RandomState(1)
    with torch.no_grad():
        for name, buf in head.named_buffers():
            if "running_var" in name:
                buf.copy_(torch.tensor(rng2.rand(*buf.shape).astype(np.float32) + 0.5))

    feat = rng.randn(1, 20, 24, 64).astype(np.float32)  # NHWC, C4 channels
    boxes = np.array([[8.0, 8.0, 40.0, 36.0], [30.0, 20.0, 90.0, 70.0]],
                     np.float32)
    boxlist = BoxList(torch.tensor(boxes), (24 * 4, 20 * 4), mode="xyxy")
    with torch.no_grad():
        pooled = pooler([torch.tensor(feat).permute(0, 3, 1, 2)], [boxlist])
        ref_out = head(pooled).permute(0, 2, 3, 1).numpy()

    cfg = tiny_detector_config()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, roi_heads=dataclasses.replace(cfg.roi_heads,
                                           pooler_resolution=4,
                                           pooler_scale=0.25,
                                           pooler_sampling_ratio=0))
    sd = {f"roi_heads.box.feature_extractor.head.{k}": v.detach().numpy()
          for k, v in head.state_dict().items()}
    params = dcv._stage5(sd, "roi_heads.box.feature_extractor", cfg)
    ours = BoxFeatureExtractor(cfg).apply(
        {"params": params}, jnp.asarray(feat[0]), jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-4,
                               rtol=1e-3)


def _convert_full(ref_model, cfg):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return dcv.convert_detector_state_dict(sd, cfg)


def _tiny_cfg_for_full():
    import dataclasses

    cfg = tiny_detector_config()
    return dataclasses.replace(
        cfg,
        roi_heads=dataclasses.replace(cfg.roi_heads,
                                      pooler_sampling_ratio=0),
    )


def test_full_attr_rcnn_force_boxes_parity(rng):
    """THE end-to-end test: reference AttrRCNN forward (its own code, CPU,
    stubbed kernels) vs our jax AttrRCNN — force-boxes extraction mode."""
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    from maskrcnn_benchmark.structures.image_list import to_image_list

    ref_model, ref_cfg = reference_stubs.build_reference_attr_rcnn(
        force_boxes=True)
    cfg = _tiny_cfg_for_full()
    params = {"params": _convert_full(ref_model, cfg)}

    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN

    ours = AttrRCNN(cfg)

    x = rng.randn(64, 64, 3).astype(np.float32) * 20  # preprocessed pixels
    boxes = np.array([[4.0, 4.0, 30.0, 28.0], [20.0, 16.0, 58.0, 52.0],
                      [8.0, 36.0, 40.0, 60.0]], np.float32)

    with torch.no_grad():
        images = to_image_list(torch.tensor(x).permute(2, 0, 1), 16)
        target = BoxList(torch.tensor(boxes), (64, 64), mode="xyxy")
        preds = ref_model(images, [target])[0]
    ref_scores = preds.get_field("scores").numpy()
    ref_labels = preds.get_field("labels").numpy()
    ref_feats = preds.get_field("box_features").numpy()
    ref_scores_all = preds.get_field("scores_all").numpy()

    m = cfg.max_force_boxes
    fb = np.zeros((m, 4), np.float32)
    fb[:3] = boxes
    valid = np.zeros((m,), bool)
    valid[:3] = True
    out = ours.apply(params, jnp.asarray(x), jnp.asarray([64, 64]),
                     jnp.asarray(fb), jnp.asarray(valid),
                     with_attributes=True)

    np.testing.assert_allclose(np.asarray(out["scores"])[:3], ref_scores,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(out["labels"])[:3], ref_labels)
    np.testing.assert_allclose(np.asarray(out["box_features"])[:3],
                               ref_feats, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out["scores_all"])[:3],
                               ref_scores_all, atol=1e-3, rtol=1e-3)
    # attribute head parity
    with torch.no_grad():
        attr_logits_ref = None
        if preds.has_field("attr_scores") or preds.has_field("attr_labels"):
            pass  # reference post-processes attributes; compare raw below
    # raw attribute logits: recompute reference side directly
    with torch.no_grad():
        feat_map = ref_model.backbone(images.tensors)
        ax = ref_model.attribute.feature_extractor(feat_map, [preds])
        alogits, _ = ref_model.attribute.predictor(
            ax, preds.get_field("labels"))
    np.testing.assert_allclose(np.asarray(out["attr_logits"])[:3],
                               alogits.numpy(), atol=2e-3, rtol=1e-2)


def test_full_attr_rcnn_rpn_mode_parity(rng):
    """RPN proposals + filter_results_fast end-to-end vs the reference."""
    from maskrcnn_benchmark.structures.image_list import to_image_list

    ref_model, ref_cfg = reference_stubs.build_reference_attr_rcnn(
        force_boxes=False)
    cfg = _tiny_cfg_for_full()
    params = {"params": _convert_full(ref_model, cfg)}

    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
    from cpt_tpu.models.detector.rpn import grid_anchors

    ours = AttrRCNN(cfg)
    x = rng.randn(64, 64, 3).astype(np.float32) * 20

    with torch.no_grad():
        images = to_image_list(torch.tensor(x).permute(2, 0, 1), 16)
        preds = ref_model(images, None)[0]
    ref_boxes = preds.bbox.numpy()
    ref_scores = preds.get_field("scores").numpy()
    ref_labels = preds.get_field("labels").numpy()

    anchors = jnp.asarray(grid_anchors(cfg.rpn, 4, 4))
    out = ours.apply(params, jnp.asarray(x), jnp.asarray([64, 64]),
                     anchors=anchors, with_attributes=False)
    v = np.asarray(out["valid"])
    n = int(v.sum())
    assert n == len(ref_boxes), (n, len(ref_boxes))
    # tolerance note: proposals differing at float level flip the adaptive
    # RoIAlign ceil(bin) grid count on knife-edge RoIs, which perturbs
    # features ~1e-2 — same algorithm both sides, chaotic boundary
    np.testing.assert_allclose(np.asarray(out["boxes"])[:n], ref_boxes,
                               atol=0.5, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out["scores"])[:n], ref_scores,
                               atol=1e-2, rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(out["labels"])[:n], ref_labels)
