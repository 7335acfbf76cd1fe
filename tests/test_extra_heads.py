"""Mask / keypoint / RetinaNet heads (upstream maskrcnn capability rows)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.models.detector.extra_heads import (
    KeypointHead, MaskHead, RetinaNetHead, heatmaps_to_keypoints, mask_loss,
    paste_masks, retinanet_grid_anchors, retinanet_loss, retinanet_select,
    select_class_masks)


@pytest.mark.slow
def test_mask_head_shapes_and_loss():
    head = MaskHead(num_classes=5, conv_layers=(8, 8), dim_reduced=8)
    x = jnp.ones((3, 7, 7, 4))
    params = jax.jit(head.init)(jax.random.PRNGKey(0), x)
    logits = head.apply(params, x)
    assert logits.shape == (3, 14, 14, 5)

    gt = jnp.zeros((3, 14, 14)).at[:, 2:8, 2:8].set(1.0)
    labels = jnp.asarray([1, 2, 0])          # third roi is background
    valid = jnp.asarray([True, True, True])
    loss = mask_loss(logits, gt, labels, valid)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # background/invalid rois contribute nothing
    loss2 = mask_loss(logits, gt, labels, jnp.asarray([True, True, False]))
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_select_class_masks():
    logits = jnp.zeros((2, 4, 4, 3)).at[0, :, :, 2].set(5.0)
    out = select_class_masks(logits, jnp.asarray([2, 1]))
    assert float(out[0].min()) > 0.99
    np.testing.assert_allclose(np.asarray(out[1]), 0.5, atol=1e-6)


def test_paste_masks_places_mask_inside_box():
    m = jnp.ones((1, 8, 8))
    boxes = jnp.asarray([[10.0, 20.0, 29.0, 39.0]])
    out = paste_masks(m, boxes, 64, 64)
    out = np.asarray(out[0])
    # interior solidly on, far exterior off
    assert out[30, 20] and out[25, 15]
    assert not out[5, 5] and not out[60, 60]
    ys, xs = np.nonzero(out)
    # stays within the (slightly expanded) box
    assert xs.min() >= 8 and xs.max() <= 31 and ys.min() >= 18


def test_keypoint_head_and_decode():
    head = KeypointHead(num_keypoints=4, conv_layers=(8, 8))
    x = jnp.ones((2, 7, 7, 4))
    params = jax.jit(head.init)(jax.random.PRNGKey(0), x)
    maps = head.apply(params, x)
    assert maps.shape == (2, 28, 28, 4)

    # synthetic heatmap: keypoint 0 peaked at (row 7, col 21)
    hm = jnp.zeros((1, 28, 28, 1)).at[0, 7, 21, 0].set(9.0)
    rois = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
    xy, score = heatmaps_to_keypoints(hm, rois)
    np.testing.assert_allclose(np.asarray(xy[0, 0]), [43.0, 15.0], atol=1e-4)
    assert float(score[0, 0]) == 9.0


@pytest.mark.slow
def test_retinanet_head_train_and_infer():
    feats = [jnp.ones((1, 8, 8, 16)), jnp.ones((1, 4, 4, 16))]
    head = RetinaNetHead(num_classes=3, num_anchors=9, num_convs=1)
    params = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    logits, deltas = head.apply(params, feats)
    assert logits[0].shape == (1, 8, 8, 27) and deltas[1].shape == (1, 4, 4, 36)
    # prior-prob bias: untrained foreground probability ~0.01
    p = jax.nn.sigmoid(logits[0]).mean()
    assert 0.003 < float(p) < 0.05

    anchors = retinanet_grid_anchors([(8, 8), (4, 4)], [8, 16])
    assert anchors.shape == (9 * (64 + 16), 4)

    gt_boxes = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])
    losses = retinanet_loss(logits, deltas, jnp.asarray(anchors), gt_boxes,
                            jnp.asarray([2]), jnp.asarray([True]),
                            num_classes=3)
    assert all(np.isfinite(float(v)) for v in losses.values())

    la = [jnp.asarray(anchors[:576]), jnp.asarray(anchors[576:])]
    boxes, scores, labels, keep = retinanet_select(
        logits, deltas, la, num_classes=3, image_size=(64, 64),
        pre_nms_top_n=50, max_det=10)
    assert boxes.shape == (10, 4) and keep.dtype == jnp.bool_
    assert np.asarray(boxes).min() >= 0 and np.asarray(boxes).max() <= 63
