"""One-shot grounding CLI (tools/cpt_predict.py): image + caption →
predicted box through the full two-stage pipeline in-process."""
import json

import numpy as np
import pytest


@pytest.mark.slow
def test_cpt_predict_end_to_end(tmp_path):
    from PIL import Image

    from cpt_tpu.tools.cpt_predict import main

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "photo.jpg")
    dets = [[4, 4, 30, 30], [32, 8, 60, 50]]
    out = tmp_path / "overlay.png"
    pred = main(["--image", str(tmp_path / "photo.jpg"),
                 "--caption", "the thing on the left",
                 "--dets", json.dumps(dets),
                 "--tiny", "--dtype", "float32",
                 "--hidden_size", "32", "--num_hidden_layers", "2",
                 "--workdir", str(tmp_path / "work"),
                 "--out", str(out)])
    # prediction is one of the candidates (random weights: either)
    assert any(np.allclose(pred, d, atol=1.0) for d in dets)
    assert out.exists()
    # intermediates kept in --workdir
    assert (tmp_path / "work" / "predictions.tsv").exists()


@pytest.mark.slow
def test_cpt_predict_detect_mode(tmp_path):
    from PIL import Image

    from cpt_tpu.tools.cpt_predict import main

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "photo.jpg")
    pred = main(["--image", str(tmp_path / "photo.jpg"),
                 "--caption", "something", "--detect", "--conf", "0.0",
                 "--tiny", "--dtype", "float32",
                 "--hidden_size", "32", "--num_hidden_layers", "2",
                 "--workdir", str(tmp_path / "work")])
    assert len(pred) == 4 and all(np.isfinite(pred))
