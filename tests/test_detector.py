"""Detector tests: backbone numerics vs torch golden, anchor parity,
full AttrRCNN forward in both modes on a tiny config."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from cpt_tpu.models.detector import convert as dcv
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN, region_features_2054
from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.models.detector.resnet import Bottleneck, FrozenBN, Stem
from cpt_tpu.models.detector.rpn import cell_anchors, grid_anchors


# --- torch golden building blocks (transcription of the reference modules) --

class TFrozenBN(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(n).abs() + 0.5)
        self.bias = tnn.Parameter(torch.randn(n))
        self.running_mean = tnn.Parameter(torch.randn(n))
        self.running_var = tnn.Parameter(torch.rand(n) + 0.5)

    def forward(self, x):
        scale = self.weight * self.running_var.rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)

    def sd(self, prefix):
        return {f"{prefix}.weight": self.weight.detach().numpy(),
                f"{prefix}.bias": self.bias.detach().numpy(),
                f"{prefix}.running_mean": self.running_mean.detach().numpy(),
                f"{prefix}.running_var": self.running_var.detach().numpy()}


class TBottleneck(tnn.Module):
    """Reference Bottleneck (stride in 3x3, grouped) — resnet.py:245-350."""

    def __init__(self, cin, cb, cout, groups, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cb, 1, stride=1, bias=False)
        self.bn1 = TFrozenBN(cb)
        self.conv2 = tnn.Conv2d(cb, cb, 3, stride=stride, padding=1,
                                groups=groups, bias=False)
        self.bn2 = TFrozenBN(cb)
        self.conv3 = tnn.Conv2d(cb, cout, 1, bias=False)
        self.bn3 = TFrozenBN(cout)
        self.down = None
        if cin != cout:
            self.down = tnn.Conv2d(cin, cout, 1, stride=stride, bias=False)
            self.down_bn = TFrozenBN(cout)

    def forward(self, x):
        idn = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.down is not None:
            idn = self.down_bn(self.down(x))
        return torch.relu(out + idn)

    def sd(self, prefix):
        d = {}
        for i in (1, 2, 3):
            d[f"{prefix}.conv{i}.weight"] = getattr(self, f"conv{i}").weight.detach().numpy()
            d.update(getattr(self, f"bn{i}").sd(f"{prefix}.bn{i}"))
        if self.down is not None:
            d[f"{prefix}.downsample.0.weight"] = self.down.weight.detach().numpy()
            d.update(self.down_bn.sd(f"{prefix}.downsample.1"))
        return d


def test_bottleneck_matches_torch(rng):
    torch.manual_seed(0)
    cin, cb, cout, groups, stride = 8, 16, 32, 4, 2
    tb = TBottleneck(cin, cb, cout, groups, stride).eval()
    x = rng.randn(1, 11, 13, cin).astype(np.float32)

    with torch.no_grad():
        ref = tb(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    params = dcv._bottleneck(tb.sd("b"), "b")
    model = Bottleneck(bottleneck_channels=cb, out_channels=cout,
                       num_groups=groups, stride=stride, stride_in_1x1=False)
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_stem_matches_torch(rng):
    torch.manual_seed(1)

    class TStem(tnn.Module):
        def __init__(self, cout):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, cout, 7, stride=2, padding=3, bias=False)
            self.bn1 = TFrozenBN(cout)
            self.pool = tnn.MaxPool2d(3, stride=2, padding=1)

        def forward(self, x):
            return self.pool(torch.relu(self.bn1(self.conv1(x))))

    ts = TStem(8).eval()
    x = rng.randn(1, 32, 40, 3).astype(np.float32) * 50

    with torch.no_grad():
        ref = ts(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    sd = {"s.conv1.weight": ts.conv1.weight.detach().numpy(), **ts.bn1.sd("s.bn1")}
    params = {"conv1": {"kernel": dcv._conv(sd["s.conv1.weight"])},
              "bn1": dcv._fold_bn(sd, "s.bn1")}
    out = Stem(8).apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_cell_anchors_detectron_values():
    """Classic Detectron stride-16 base anchors (golden transcription of
    anchor_generator.py:234-289)."""
    def golden(base_size, scales, ratios):
        anchor = np.array([1, 1, base_size, base_size], float) - 1

        def whctrs(a):
            w = a[2] - a[0] + 1
            h = a[3] - a[1] + 1
            return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

        def mk(ws, hs, xc, yc):
            ws, hs = ws[:, None], hs[:, None]
            return np.hstack([xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
                              xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)])

        w, h, xc, yc = whctrs(anchor)
        ws = np.round(np.sqrt(w * h / np.asarray(ratios)))
        hs = np.round(ws * np.asarray(ratios))
        ra = mk(ws, hs, xc, yc)
        return np.vstack([mk(whctrs(a)[0] * np.asarray(scales),
                             whctrs(a)[1] * np.asarray(scales),
                             whctrs(a)[2], whctrs(a)[3]) for a in ra])

    sizes, ratios = (32, 64, 128, 256, 512), (0.5, 1.0, 2.0)
    ref = golden(16, np.asarray(sizes, float) / 16, ratios)
    ours = cell_anchors(16, sizes, ratios)
    # reference enumerates ratio-major; ours too
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_grid_anchors_shift():
    cfgr = tiny_detector_config().rpn
    g = grid_anchors(cfgr, 2, 3)
    a = cell_anchors(cfgr.anchor_stride, cfgr.anchor_sizes, cfgr.aspect_ratios)
    assert g.shape == (2 * 3 * len(a), 4)
    np.testing.assert_allclose(g[: len(a)], a)
    # anchor at grid (0,1) shifted by stride in x
    np.testing.assert_allclose(g[len(a)][0] - a[0][0], cfgr.anchor_stride)


@pytest.fixture(scope="module")
def tiny_rcnn():
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    hw = jnp.asarray([60, 62])
    boxes = jnp.asarray(make_boxes(rng, cfg.max_force_boxes))
    valid = jnp.asarray([True] * 6 + [False] * (cfg.max_force_boxes - 6))
    anchors = jnp.asarray(grid_anchors(cfg.rpn, 4, 4))
    params = model.init(jax.random.PRNGKey(0), image, hw, boxes, valid)
    return cfg, model, params, image, hw, boxes, valid, anchors


def make_boxes(rng, n):
    x1 = rng.uniform(0, 30, n)
    y1 = rng.uniform(0, 30, n)
    return np.stack([x1, y1, x1 + rng.uniform(4, 20, n),
                     y1 + rng.uniform(4, 20, n)], 1).astype(np.float32)


def test_attr_rcnn_force_boxes(tiny_rcnn):
    cfg, model, params, image, hw, boxes, valid, _ = tiny_rcnn
    out = model.apply(params, image, hw, boxes, valid)
    m = cfg.max_force_boxes
    assert out["boxes"].shape == (m, 4)
    assert out["box_features"].shape == (m, cfg.backbone.out_channels * 2)
    assert out["scores_all"].shape == (m, cfg.roi_heads.num_classes)
    assert out["attr_logits"].shape == (m, cfg.attributes.num_attributes)
    assert np.asarray(out["valid"]).tolist() == np.asarray(valid).tolist()
    assert np.all(np.asarray(out["labels"])[np.asarray(valid)] >= 1)
    feats = region_features_2054(out["box_features"], out["boxes"], hw)
    assert feats.shape == (m, cfg.backbone.out_channels * 2 + 6)


def test_attr_rcnn_rpn_mode(tiny_rcnn):
    cfg, model, params, image, hw, _, _, anchors = tiny_rcnn
    out = model.apply(params, image, hw, anchors=anchors)
    n = cfg.roi_heads.detections_per_img
    assert out["boxes"].shape == (n, 4)
    n_valid = int(np.asarray(out["valid"]).sum())
    assert n_valid <= n
    # detections sorted descending by score among valid slots
    scores = np.asarray(out["scores"])[np.asarray(out["valid"])]
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))
    # boxes inside the true image bounds
    b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= float(hw[1]) - 1 + 1e-5).all()


def test_converter_full_tree_loads(tiny_rcnn, rng):
    """A synthetic maskrcnn-style state_dict converts into a tree with the
    exact structure/shapes of the flax init params."""
    cfg, model, params, *_ = tiny_rcnn

    sd = {}
    bb = cfg.backbone
    # stem
    sd["backbone.body.stem.conv1.weight"] = rng.randn(bb.stem_out_channels, 3, 7, 7).astype(np.float32)
    sd.update(TFrozenBN(bb.stem_out_channels).sd("backbone.body.stem.bn1"))

    def add_stage(prefix, cin, cb, cout, blocks, groups, stride):
        for j in range(blocks):
            s = stride if j == 0 else 1
            ci = cin if j == 0 else cout
            tb = TBottleneck(ci, cb, cout, groups, s)
            sd.update(tb.sd(f"{prefix}.{j}"))

    cin = bb.stem_out_channels
    for i, blocks in enumerate(bb.stage_blocks):
        f = 2 ** i
        add_stage(f"backbone.body.layer{i+1}", cin,
                  bb.stage2_bottleneck_channels * f, bb.res2_out_channels * f,
                  blocks, bb.num_groups, 1 if i == 0 else 2)
        cin = bb.res2_out_channels * f

    fs = 2 ** len(bb.stage_blocks)
    layer = f"layer{len(bb.stage_blocks)+1}"
    for prefix in ("roi_heads.box.feature_extractor", "attribute.feature_extractor"):
        add_stage(f"{prefix}.head.{layer}", cin,
                  bb.stage2_bottleneck_channels * fs, bb.res2_out_channels * fs,
                  bb.head_blocks, bb.num_groups, 2)
    c5 = bb.res2_out_channels * fs

    a = cfg.rpn.num_anchors
    sd["rpn.head.conv.weight"] = rng.randn(cin, cin, 3, 3).astype(np.float32)
    sd["rpn.head.conv.bias"] = rng.randn(cin).astype(np.float32)
    sd["rpn.head.cls_logits.weight"] = rng.randn(a, cin, 1, 1).astype(np.float32)
    sd["rpn.head.cls_logits.bias"] = rng.randn(a).astype(np.float32)
    sd["rpn.head.bbox_pred.weight"] = rng.randn(a * 4, cin, 1, 1).astype(np.float32)
    sd["rpn.head.bbox_pred.bias"] = rng.randn(a * 4).astype(np.float32)

    nc = cfg.roi_heads.num_classes
    sd["roi_heads.box.predictor.cls_score.weight"] = rng.randn(nc, c5).astype(np.float32)
    sd["roi_heads.box.predictor.cls_score.bias"] = rng.randn(nc).astype(np.float32)
    sd["roi_heads.box.predictor.bbox_pred.weight"] = rng.randn(nc * 4, c5).astype(np.float32)
    sd["roi_heads.box.predictor.bbox_pred.bias"] = rng.randn(nc * 4).astype(np.float32)

    at = cfg.attributes
    sd["attribute.predictor.cls_embedding.weight"] = rng.randn(nc, at.cls_emd_dim).astype(np.float32)
    sd["attribute.predictor.fc_attr.weight"] = rng.randn(at.attr_emd_dim, c5 + at.cls_emd_dim).astype(np.float32)
    sd["attribute.predictor.fc_attr.bias"] = rng.randn(at.attr_emd_dim).astype(np.float32)
    sd["attribute.predictor.attr_score.weight"] = rng.randn(at.num_attributes, at.attr_emd_dim).astype(np.float32)
    sd["attribute.predictor.attr_score.bias"] = rng.randn(at.num_attributes).astype(np.float32)

    converted = dcv.convert_detector_state_dict(sd, cfg)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, params["params"])
    conv_shapes = jax.tree_util.tree_map(lambda x: x.shape, converted)
    assert ref_shapes == conv_shapes


def test_batched_force_matches_single(tiny_rcnn):
    """forward_batch_force must reproduce the per-copy force-boxes path."""
    cfg, model, params, image, hw, boxes, valid, _ = tiny_rcnn
    import jax.numpy as jnp

    x = jnp.stack([image, image * 0.5])
    single0 = model.apply(params, x[0], hw, boxes, valid,
                          with_attributes=False)
    single1 = model.apply(params, x[1], hw, boxes, valid,
                          with_attributes=False)
    batched = model.apply(params, x, hw, boxes, valid,
                          method=model.forward_batch_force)
    np.testing.assert_allclose(np.asarray(batched["box_features"][0]),
                               np.asarray(single0["box_features"]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(batched["scores"][1]),
                               np.asarray(single1["scores"]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(batched["labels"][0]),
                                  np.asarray(single0["labels"]))


def test_head_chunking_matches_unchunked(tiny_rcnn):
    """roi_heads.head_chunk processes RoI slots in chunks (extraction
    peak-memory cap); outputs must equal the single-pass path exactly."""
    import dataclasses

    cfg, _, params, image, hw, boxes, valid, _ = tiny_rcnn
    cfg_one = dataclasses.replace(
        cfg, roi_heads=dataclasses.replace(cfg.roi_heads, head_chunk=None))
    cfg_ck = dataclasses.replace(
        cfg, roi_heads=dataclasses.replace(cfg.roi_heads, head_chunk=2))
    imgs = jnp.stack([image, image * 0.7])
    outs = []
    for c in (cfg_one, cfg_ck):
        m = AttrRCNN(c)
        outs.append(m.apply(params, imgs, hw, boxes, valid,
                            with_attributes=True,
                            method=m.forward_batch_force))
    for k in ("scores", "labels", "box_features", "scores_all",
              "attr_logits"):
        np.testing.assert_allclose(np.asarray(outs[0][k]),
                                   np.asarray(outs[1][k]),
                                   atol=1e-6, rtol=1e-6, err_msg=k)
