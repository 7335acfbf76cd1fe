"""Detector training augmentations (reference transforms/transforms.py):
flip box math with the inclusive TO_REMOVE=1 convention, jitter ranges,
compose behavior, and the train_detector wiring."""
import random

import numpy as np
import pytest

from cpt_tpu.data.detector_transforms import (TrainTransforms, color_jitter,
                                              hflip, vflip)


def test_hflip_box_math_and_involution():
    img = np.arange(2 * 10 * 3).reshape(2, 10, 3).astype(np.uint8)
    boxes = np.asarray([[1.0, 0.0, 4.0, 1.0]])
    fimg, fboxes = hflip(img, boxes)
    # x1' = W - x2 - 1 = 10 - 4 - 1 = 5; x2' = 10 - 1 - 1 = 8
    np.testing.assert_allclose(fboxes, [[5.0, 0.0, 8.0, 1.0]])
    np.testing.assert_array_equal(fimg[:, ::-1], img)
    img2, boxes2 = hflip(fimg, fboxes)
    np.testing.assert_array_equal(img2, img)
    np.testing.assert_allclose(boxes2, boxes)


def test_vflip_box_math():
    img = np.zeros((8, 4, 3), np.uint8)
    boxes = np.asarray([[0.0, 2.0, 3.0, 5.0]])
    _, fboxes = vflip(img, boxes)
    np.testing.assert_allclose(fboxes, [[0.0, 2.0, 3.0, 5.0]])  # symmetric
    boxes = np.asarray([[0.0, 0.0, 3.0, 2.0]])
    _, fboxes = vflip(img, boxes)
    np.testing.assert_allclose(fboxes, [[0.0, 5.0, 3.0, 7.0]])


def test_color_jitter_bounds_and_identity():
    rng = random.Random(0)
    img = np.random.RandomState(0).randint(0, 256, (16, 16, 3)).astype(
        np.uint8)
    # all-zero factors: identity
    np.testing.assert_array_equal(color_jitter(img, rng), img)
    out = color_jitter(img, rng, brightness=0.4, contrast=0.4,
                       saturation=0.4, hue=0.1)
    assert out.dtype == np.uint8
    assert out.min() >= 0 and out.max() <= 255
    assert not np.array_equal(out, img)


def test_train_transforms_compose_deterministic_seed():
    img = np.random.RandomState(1).randint(0, 256, (12, 20, 3)).astype(
        np.uint8)
    boxes = np.asarray([[2.0, 2.0, 8.0, 8.0]])
    t1 = TrainTransforms(hflip_prob=1.0, seed=7)
    out1, b1 = t1(img, boxes)
    np.testing.assert_allclose(b1, [[11.0, 2.0, 17.0, 8.0]])
    t0 = TrainTransforms(hflip_prob=0.0, seed=7)
    out0, b0 = t0(img, boxes)
    np.testing.assert_array_equal(out0, img)
    np.testing.assert_allclose(b0, boxes)


@pytest.mark.slow
def test_train_detector_with_augmentation(tmp_path):
    from cpt_tpu.tools.train_detector import main

    state = main(["--synthetic", "1", "--tiny", "--dtype", "float32",
                  "--max_iter", "2", "--steps", "1", "--warmup_iters", "1",
                  "--freeze_conv_body_at", "0", "--hflip_prob", "0.5",
                  "--color_jitter", "0.2", "0.2", "0.2", "0.0",
                  "--output_dir", str(tmp_path / "ckpt")])
    assert int(state.step) == 2
