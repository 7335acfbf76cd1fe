"""Test-time bbox augmentation: flip-back mapping and merged NMS."""
import numpy as np
import pytest

from cpt_tpu.engine.bbox_aug import hflip_boxes, im_detect_bbox_aug


def test_hflip_boxes_roundtrip():
    boxes = np.array([[10.0, 5.0, 30.0, 25.0]], np.float32)
    flipped = hflip_boxes(boxes, 100)
    np.testing.assert_allclose(flipped, [[69.0, 5.0, 89.0, 25.0]])
    np.testing.assert_allclose(hflip_boxes(flipped, 100), boxes)


def test_bbox_aug_merges_and_dedups(rng):
    image = rng.randint(0, 256, (40, 60, 3)).astype(np.uint8)

    calls = []

    def detect_fn(img, hw):
        calls.append(np.asarray(img).copy())
        # base pass finds box A; flipped pass finds the flipped image of A
        # (same object) plus a new box B
        if len(calls) == 1:
            return {"boxes": np.array([[10, 10, 20, 20]], np.float32),
                    "scores": np.array([0.9], np.float32),
                    "labels": np.array([3]),
                    "valid": np.array([True])}
        return {"boxes": np.array([hflip_boxes(
                    np.array([[10, 10, 20, 20]], np.float32), 60)[0],
                    [5, 30, 15, 38]], np.float32),
                "scores": np.array([0.8, 0.7], np.float32),
                "labels": np.array([3, 4]),
                "valid": np.array([True, True])}

    out = im_detect_bbox_aug(detect_fn, image, (40, 60), hflip=True,
                             max_dets=10)
    assert len(calls) == 2
    # flipped image really was flipped
    np.testing.assert_array_equal(calls[1], image[:, ::-1])
    v = out["valid"]
    kept = sorted(zip(np.round(out["scores"][v].astype(np.float64), 5).tolist(),
                      out["labels"][v].tolist()))
    # duplicate of A suppressed (IoU 1.0 after unmapping); B kept
    assert kept == [(0.7, 4), (0.9, 3)]


@pytest.mark.slow
def test_test_detector_bbox_aug_cli(tmp_path):
    """test_detector --bbox_aug pools hflip+scale passes through the CLI
    (reference TEST.BBOX_AUG path)."""
    from cpt_tpu.tools.test_detector import main as test_main

    results, ok = test_main(["--tiny", "--synthetic", "2",
                             "--dtype", "float32", "--bbox_aug",
                             "--bbox_aug_scales", "0.75",
                             "--output", str(tmp_path / "eval.pk")])
    assert ok and "mAP" in results
