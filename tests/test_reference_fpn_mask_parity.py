"""Numeric parity of the FPN top-down and mask predictor vs the
reference's OWN torch modules (run on CPU via the stub harness)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.reference_stubs import install  # noqa: E402


def _conv_params(mod):
    return {"kernel": jnp.asarray(
                mod.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(mod.bias.detach().numpy())}


def test_fpn_topdown_matches_reference():
    install()
    from maskrcnn_benchmark.modeling.backbone.fpn import (FPN,
                                                          LastLevelMaxPool)

    from cpt_tpu.models.detector.fpn import FPNTopDown

    torch.manual_seed(0)

    def conv_block(cin, cout, k, s=1):
        return torch.nn.Conv2d(cin, cout, k, stride=s, padding=(k - 1) // 2)

    ref = FPN(in_channels_list=[8, 16, 32], out_channels=8,
              conv_block=conv_block, top_blocks=LastLevelMaxPool()).eval()

    rng = np.random.RandomState(0)
    feats_np = [rng.randn(1, c, s, s).astype(np.float32)
                for c, s in ((8, 32), (16, 16), (32, 8))]
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(f) for f in feats_np])
    assert len(ref_out) == 4                       # P2, P3, P4 + maxpool P5

    params = {"params": {}}
    for i in range(1, 4):
        params["params"][f"fpn_inner{i}"] = _conv_params(
            getattr(ref, f"fpn_inner{i}"))
        params["params"][f"fpn_layer{i}"] = _conv_params(
            getattr(ref, f"fpn_layer{i}"))

    mine = FPNTopDown(out_channels=8)
    feats_j = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_np]
    out = mine.apply(params, feats_j)
    assert len(out) == 4
    for lvl, (r, o) in enumerate(zip(ref_out, out)):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
            err_msg=f"FPN level {lvl} mismatch (bilinear top-down)")


def test_mask_predictor_matches_reference():
    install()
    from tests.reference_stubs import CfgNode

    from maskrcnn_benchmark.modeling.roi_heads.mask_head import (
        roi_mask_predictors)

    from cpt_tpu.models.detector.extra_heads import MaskHead

    cfg = CfgNode()
    cfg.MODEL = CfgNode()
    cfg.MODEL.ROI_BOX_HEAD = CfgNode(NUM_CLASSES=5)
    cfg.MODEL.ROI_MASK_HEAD = CfgNode(CONV_LAYERS=(8,))
    torch.manual_seed(1)
    ref = roi_mask_predictors.MaskRCNNC4Predictor(cfg, in_channels=6).eval()

    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 4, 4).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    # torch ConvTranspose2d weight [in, out, kh, kw] → flax (kh, kw, in,
    # out) with a spatial flip (lax.conv_transpose does not flip taps)
    dk = (ref.conv5_mask.weight.detach().numpy()[:, :, ::-1, ::-1]
          .transpose(2, 3, 0, 1).copy())
    params = {"params": {
        "conv5_mask": {"kernel": jnp.asarray(dk),
                       "bias": jnp.asarray(
                           ref.conv5_mask.bias.detach().numpy())},
        "mask_fcn_logits": _conv_params(ref.mask_fcn_logits),
    }}
    mine = MaskHead(num_classes=5, conv_layers=(), dim_reduced=8)
    got = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_long2dsc_attention_matches_reference():
    """Full sliding-chunk attention (padding + global token) vs the
    reference's own torch Long2DSCSelfAttention (mode=0, exact=0)."""
    install()
    sys = __import__("sys")
    if "/root/reference/prompt_feat" not in sys.path:
        sys.path.insert(0, "/root/reference/prompt_feat")
    from maskrcnn_benchmark.modeling.backbone.longformer2d import (
        Long2DSCSelfAttention)

    from cpt_tpu.models.detector.msvit import Long2DSCAttention

    dim, heads, w, nglo = 16, 2, 2, 1
    rows, cols = 5, 6                       # 5 % 2 = 1 exercises padding
    torch.manual_seed(0)
    ref = Long2DSCSelfAttention(dim, num_heads=heads, qkv_bias=True, w=w,
                                nglo=nglo, exact=0, mode=0, rpe=False,
                                autograd=True).eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, nglo + rows * cols, dim).astype(np.float32)
    with torch.no_grad():
        # reference layout: token = x_idx * ny + y_idx, x-dim first → call
        # with nx=rows, ny=cols to match row-major tokens
        want = ref(torch.from_numpy(x), nx=rows, ny=cols).numpy()

    def dense(mod):
        return {"kernel": jnp.asarray(mod.weight.detach().numpy().T),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {"params": {
        "query": dense(ref.query), "kv": dense(ref.kv),
        "proj": dense(ref.proj),
        "query_global": dense(ref.query_global),
        "kv_global": dense(ref.kv_global),
        "proj_global": dense(ref.proj_global),
    }}
    mine = Long2DSCAttention(dim=dim, num_heads=heads, window=w, nglo=nglo)
    got = mine.apply(params, jnp.asarray(x), rows, cols)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_long2dsc_attention_rpe_matches_reference():
    """rpe=True: Swin-style local/g2l/g2g relative position biases."""
    install()
    sys = __import__("sys")
    if "/root/reference/prompt_feat" not in sys.path:
        sys.path.insert(0, "/root/reference/prompt_feat")
    from maskrcnn_benchmark.modeling.backbone.longformer2d import (
        Long2DSCSelfAttention)

    from cpt_tpu.models.detector.msvit import Long2DSCAttention

    dim, heads, w, nglo = 16, 2, 2, 1
    rows, cols = 4, 6
    torch.manual_seed(1)
    ref = Long2DSCSelfAttention(dim, num_heads=heads, qkv_bias=True, w=w,
                                nglo=nglo, exact=0, mode=0, rpe=True,
                                autograd=True).eval()
    with torch.no_grad():
        # non-zero biases to actually test the terms
        for p in (ref.local_relative_position_bias_table,
                  ref.g2l_relative_position_bias,
                  ref.g2g_relative_position_bias):
            p.copy_(torch.randn_like(p))

    rng = np.random.RandomState(1)
    x = rng.randn(1, nglo + rows * cols, dim).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), nx=rows, ny=cols).numpy()

    def dense(mod):
        return {"kernel": jnp.asarray(mod.weight.detach().numpy().T),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {"params": {
        "query": dense(ref.query), "kv": dense(ref.kv),
        "proj": dense(ref.proj),
        "query_global": dense(ref.query_global),
        "kv_global": dense(ref.kv_global),
        "proj_global": dense(ref.proj_global),
        "local_relative_position_bias_table": jnp.asarray(
            ref.local_relative_position_bias_table.detach().numpy()),
        "g2l_relative_position_bias": jnp.asarray(
            ref.g2l_relative_position_bias.detach().numpy()),
        "g2g_relative_position_bias": jnp.asarray(
            ref.g2g_relative_position_bias.detach().numpy()),
    }}
    mine = Long2DSCAttention(dim=dim, num_heads=heads, window=w,
                             nglo=nglo, rpe=True)
    got = mine.apply(params, jnp.asarray(x), rows, cols)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
