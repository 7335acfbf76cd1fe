"""Kernel-parity tests: vectorized TPU RoIAlign / NMS vs scalar golden refs
(tests/golden_ops.py — direct transcriptions of the documented kernel
algorithms; torchvision is not available in this image)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cpt_tpu.ops.nms import nms_indices_list, nms_padded
from cpt_tpu.ops.roi_align import roi_align, roi_align_batched

from golden_ops import nms_ref, roi_align_ref


def make_rois(rng, n, h, w, scale):
    x1 = rng.uniform(0, w * scale * 0.7, n)
    y1 = rng.uniform(0, h * scale * 0.7, n)
    x2 = x1 + rng.uniform(8, w * scale * 0.3, n)
    y2 = y1 + rng.uniform(8, h * scale * 0.3, n)
    return np.stack([x1, y1, x2, y2], 1).astype(np.float32)


@pytest.mark.parametrize("pooled,sampling", [(14, 2), (7, 2), (14, 1),
                                             (7, 4)])
def test_roi_align_matches_golden(rng, pooled, sampling):
    h, w, c = 25, 31, 8
    scale = 1.0 / 16
    feats = rng.randn(h, w, c).astype(np.float32)
    rois = make_rois(rng, 12, h, w, 1.0 / scale)

    ours = roi_align(jnp.asarray(feats), jnp.asarray(rois),
                     spatial_scale=scale, pooled=pooled, sampling=sampling)
    ref = roi_align_ref(feats, rois, scale, pooled, sampling)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_roi_align_chunking_boundary(rng):
    """RoI counts that don't divide the chunk size pad correctly."""
    feats = rng.randn(12, 12, 3).astype(np.float32)
    rois = make_rois(rng, 5, 12, 12, 1.0)
    ours = roi_align(jnp.asarray(feats), jnp.asarray(rois), spatial_scale=1.0,
                     pooled=3, sampling=2, chunk=4)
    ref = roi_align_ref(feats, rois, 1.0, 3, 2)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_roi_align_batched_matches_golden(rng):
    b, h, w, c = 3, 17, 19, 4
    scale = 1.0 / 8
    feats = rng.randn(b, h, w, c).astype(np.float32)
    rois = make_rois(rng, 9, h, w, 1.0 / scale)
    batch_idx = rng.randint(0, b, 9).astype(np.int32)

    ours = roi_align_batched(jnp.asarray(feats), jnp.asarray(rois),
                             jnp.asarray(batch_idx), spatial_scale=scale,
                             pooled=7, sampling=2)
    ref = np.stack([
        roi_align_ref(feats[batch_idx[i]], rois[i:i + 1], scale, 7, 2)[0]
        for i in range(9)
    ])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_roi_align_tiny_roi_min_size(rng):
    """RoIs smaller than 1px are clamped to extent 1 (reference semantics)."""
    feats = rng.randn(10, 10, 2).astype(np.float32)
    rois = np.array([[4.0, 4.0, 4.2, 4.2]], np.float32)
    ours = roi_align(jnp.asarray(feats), jnp.asarray(rois),
                     spatial_scale=1.0, pooled=2, sampling=2)
    ref = roi_align_ref(feats, rois, 1.0, 2, 2)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_roi_align_out_of_bounds_roi(rng):
    """RoIs extending past the feature map use border clamping + zero
    weights outside [-1, size] — golden covers both paths."""
    feats = rng.randn(10, 10, 2).astype(np.float32)
    rois = np.array([[-5.0, -5.0, 14.0, 14.0], [8.0, 8.0, 20.0, 20.0]],
                    np.float32)
    ours = roi_align(jnp.asarray(feats), jnp.asarray(rois),
                     spatial_scale=1.0, pooled=4, sampling=2)
    ref = roi_align_ref(feats, rois, 1.0, 4, 2)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


@pytest.mark.parametrize("seed,n,thresh", [(0, 50, 0.5), (1, 200, 0.7),
                                           (2, 64, 0.3)])
def test_nms_matches_golden(seed, n, thresh):
    rng = np.random.RandomState(seed)
    boxes = make_rois(rng, n, 40, 40, 4.0)
    scores = rng.rand(n).astype(np.float32)

    ours = nms_indices_list(boxes, scores, thresh, max_out=n)
    ref = nms_ref(boxes, scores, thresh)
    assert ours == ref


def test_nms_legacy_plus_one_convention():
    rng = np.random.RandomState(3)
    boxes = make_rois(rng, 40, 30, 30, 3.0)
    scores = rng.rand(40).astype(np.float32)
    ours = nms_indices_list(boxes, scores, 0.5, max_out=40, iou_offset=1.0)
    ref = nms_ref(boxes, scores, 0.5, offset=1.0)
    assert ours == ref


def test_nms_max_out_truncates():
    boxes = np.array([[0, 0, 10, 10], [100, 0, 110, 10], [0, 100, 10, 110],
                      [100, 100, 110, 110]], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    kept = nms_indices_list(boxes, scores, 0.5, max_out=2)
    assert kept == [0, 1]


def test_nms_respects_valid_mask():
    boxes = jnp.asarray(np.array([[0, 0, 10, 10], [100, 0, 110, 10]],
                                 np.float32))
    scores = jnp.asarray([0.5, 0.9])
    valid = jnp.asarray([True, False])
    idx, keep = nms_padded(boxes, scores, valid, 0.5, max_out=2)
    assert np.asarray(keep).tolist() == [True, False]
    assert int(idx[0]) == 0


def test_roi_align_adaptive_sampling_matches_golden(rng):
    """sampling=0: the reference CUDA kernel's adaptive per-RoI grid
    (the VinVL config's POOLER_SAMPLING_RATIO=0)."""
    h, w, c = 40, 48, 6
    scale = 1.0 / 16
    feats = rng.randn(h, w, c).astype(np.float32)
    # mix of small and large RoIs → different adaptive grid sizes
    rois = np.array([
        [10, 10, 120, 130],      # ~1 sample/bin
        [0, 0, 600, 620],        # ~3 samples/bin
        [100, 50, 700, 740],     # large
        [5, 5, 20, 18],          # sub-bin
    ], np.float32)
    ours = roi_align(jnp.asarray(feats), jnp.asarray(rois),
                     spatial_scale=scale, pooled=7, sampling=0)
    ref = roi_align_ref(feats, rois, scale, 7, 0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_roi_pool_matches_golden(rng):
    from cpt_tpu.ops.roi_pool import roi_pool
    from golden_ops import roi_pool_ref

    feats = rng.randn(16, 20, 5).astype(np.float32)
    rois = np.array([[8, 8, 40, 36], [0, 0, 300, 300], [30, 20, 34, 22]],
                    np.float32)
    ours = roi_pool(jnp.asarray(feats), jnp.asarray(rois),
                    spatial_scale=0.25, pooled=3)
    ref = roi_pool_ref(feats, rois, 0.25, 3)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_sigmoid_focal_loss_matches_golden(rng):
    from cpt_tpu.ops.focal_loss import sigmoid_focal_loss
    from golden_ops import sigmoid_focal_loss_ref

    logits = rng.randn(10, 4).astype(np.float32)
    targets = rng.randint(0, 5, 10).astype(np.int32)
    ours = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets))
    ref = sigmoid_focal_loss_ref(logits, targets, 2.0, 0.25)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_nms_pallas_matches_xla(rng):
    from cpt_tpu.ops.nms_pallas import nms_pallas

    boxes = make_rois(rng, 120, 50, 50, 4.0)
    scores = rng.rand(120).astype(np.float32)
    valid = rng.rand(120) > 0.2
    i1, k1 = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(valid), 0.5, 40)
    i2, k2 = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(valid), 0.5, 40)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(k1)],
                                  np.asarray(i2)[np.asarray(k2)])


def test_roi_align_fuzz_shapes():
    """Random shapes/scales/sampling vs the scalar golden (20 draws)."""
    from cpt_tpu.ops.roi_align import roi_align
    from tests.golden_ops import roi_align_ref

    rng = np.random.RandomState(42)
    for trial in range(20):
        h = int(rng.randint(6, 40))
        w = int(rng.randint(6, 40))
        c = int(rng.choice([1, 3, 8]))
        n = int(rng.randint(1, 9))
        pooled = int(rng.choice([2, 3, 7]))
        sampling = int(rng.choice([0, 1, 2, 4]))
        scale = float(rng.choice([1.0, 0.5, 1 / 16]))
        feat = rng.randn(h, w, c).astype(np.float32)
        span = min(h, w) / max(scale, 1e-6)
        rois = np.sort(rng.uniform(0, span, (n, 2, 2)), axis=1)
        rois = rois.transpose(0, 2, 1).reshape(n, 4).astype(np.float32)
        got = roi_align(jnp.asarray(feat), jnp.asarray(rois),
                        spatial_scale=scale, pooled=pooled,
                        sampling=sampling)
        want = roi_align_ref(feat, rois, scale, pooled, sampling)
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=2e-4, atol=2e-4,
            err_msg=f"trial {trial}: h{h} w{w} c{c} n{n} p{pooled} "
                    f"s{sampling} scale{scale}")


def test_nms_fuzz():
    """Random box soups vs the scalar greedy golden (30 draws, both IoU
    conventions)."""
    from cpt_tpu.ops.nms import nms_padded
    from tests.golden_ops import nms_ref

    rng = np.random.RandomState(7)
    for trial in range(30):
        n = int(rng.randint(1, 40))
        boxes = np.sort(rng.uniform(0, 80, (n, 2, 2)), axis=1)
        boxes = boxes.transpose(0, 2, 1).reshape(n, 4).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        thresh = float(rng.choice([0.3, 0.5, 0.7]))
        offset = float(rng.choice([0.0, 1.0]))
        want = nms_ref(boxes, scores, thresh, offset=offset)
        idx, keep = nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.ones((n,), bool), thresh, max_out=n,
                               iou_offset=offset)
        got = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep))
               if k]
        assert got == want, f"trial {trial}: {got} != {want}"
