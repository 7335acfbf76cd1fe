"""Demo visualizer: prompt painting + COCODemo-style detection overlay."""
import json

import numpy as np
import pytest
from PIL import Image

from cpt_tpu.tools.demo import colors_for_labels, main as demo_main


@pytest.fixture()
def image_path(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(img).save(path)
    return str(path)


def test_prompt_paint_modes(image_path, tmp_path):
    out = tmp_path / "out.png"
    demo_main(["--image", image_path,
               "--boxes", json.dumps([[4, 4, 30, 30], [20, 20, 50, 50]]),
               "--pred_box", json.dumps([4, 4, 30, 30]),
               "--out", str(out)])
    assert (tmp_path / "out_copy0.png").exists()
    assert (tmp_path / "out_copy1.png").exists()
    demo_main(["--image", image_path,
               "--boxes", json.dumps([[4, 4, 30, 30]]),
               "--multi_color", "--out", str(out)])
    assert out.exists()


def test_colors_for_labels_matches_reference_formula():
    # predictor.py:282-288: colors = labels[:, None] * palette % 255
    labels = np.asarray([1, 7, 42])
    palette = np.asarray([2 ** 25 - 1, 2 ** 15 - 1, 2 ** 21 - 1])
    want = (labels[:, None] * palette % 255).astype(np.uint8)
    np.testing.assert_array_equal(colors_for_labels(labels), want)


@pytest.mark.slow
def test_detect_overlay_tiny(image_path, tmp_path):
    out = tmp_path / "det.png"
    demo_main(["--image", image_path, "--detect", "--tiny",
               "--conf", "0.0", "--out", str(out)])
    assert out.exists()
    arr = np.asarray(Image.open(out))
    assert arr.shape == (64, 64, 3)


@pytest.mark.slow
def test_webcam_loop_with_fake_capture(tmp_path, monkeypatch):
    """--webcam grabs frames, detects, and writes overlays (reference
    demo/webcam.py loop) — exercised with a fake capture device."""
    import cv2

    frames = [np.random.RandomState(i).randint(0, 256, (64, 64, 3))
              .astype(np.uint8) for i in range(2)]

    class FakeCam:
        def __init__(self, dev):
            self.i = 0

        def isOpened(self):
            return True

        def read(self):
            if self.i >= len(frames):
                return False, None
            self.i += 1
            return True, frames[self.i - 1]

        def release(self):
            pass

    monkeypatch.setattr(cv2, "VideoCapture", FakeCam)
    out = tmp_path / "cam.png"
    demo_main(["--webcam", "--max_frames", "2", "--tiny",
               "--conf", "0.0", "--out", str(out)])
    assert (tmp_path / "cam_0000.png").exists()
    assert (tmp_path / "cam_0001.png").exists()
