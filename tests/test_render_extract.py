"""On-device rendering parity vs PIL, and the full two-stage pipeline:
synthetic image → Extractor → predictions.tsv → stage-2 dataset → eval."""
import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from cpt_tpu.data.refcoco import RefcocoCPTData
from cpt_tpu.engine.extract import Extractor, refcoco_task
from cpt_tpu.engine.scoring import refcoco_evaluate
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.ops.render import (alpha_composite_u8, paste_mask, paste_rect,
                                paste_rects, render_copies)
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab


def pil_paste_rect(image, rect, rgba, inclusive=False):
    img = Image.fromarray(image.copy(), "RGB")
    x1, y1, x2, y2 = [int(v) for v in rect]
    if inclusive:
        w, h = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
    else:
        w, h = x2 - x1, y2 - y1
    fg = Image.new("RGBA", (w, h), color=tuple(rgba))
    img.paste(fg, (x1, y1), fg)
    return np.array(img)


@pytest.mark.parametrize("inclusive", [False, True])
def test_paste_rect_pil_exact(rng, inclusive):
    image = rng.randint(0, 256, (40, 50, 3)).astype(np.uint8)
    rect = np.array([5.0, 7.0, 23.0, 31.0])
    rgba = (240, 0, 30, 127)
    ours = paste_rect(jnp.asarray(image), jnp.asarray(rect),
                      jnp.asarray(rgba, jnp.uint8), inclusive=inclusive)
    ref = pil_paste_rect(image, rect, rgba, inclusive)
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_paste_rects_sequential_overlap(rng):
    """Overlapping rects: later paste wins (reference loop order)."""
    image = rng.randint(0, 256, (30, 30, 3)).astype(np.uint8)
    rects = np.array([[2, 2, 20, 20], [10, 10, 28, 28]], np.float32)
    colors = np.array([[240, 0, 30, 127], [0, 10, 255, 127]], np.uint8)
    ours = paste_rects(jnp.asarray(image), jnp.asarray(rects),
                       jnp.asarray(colors), jnp.ones(2, bool))
    ref = image
    for r, c in zip(rects, colors):
        ref = pil_paste_rect(ref, r, tuple(c))
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_paste_rects_respects_valid(rng):
    image = rng.randint(0, 256, (20, 20, 3)).astype(np.uint8)
    rects = np.array([[2, 2, 10, 10], [5, 5, 15, 15]], np.float32)
    colors = np.array([[240, 0, 30, 127]] * 2, np.uint8)
    out = paste_rects(jnp.asarray(image), jnp.asarray(rects),
                      jnp.asarray(colors), jnp.asarray([True, False]))
    ref = pil_paste_rect(image, rects[0], tuple(colors[0]))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_paste_mask_pil_exact(rng):
    image = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    mask = np.zeros((24, 24), np.uint8)
    mask[4:15, 6:20] = 1
    mask[8:10, 8:10] = 0  # hole
    rgba = (0, 255, 0, 127)
    ours = paste_mask(jnp.asarray(image), jnp.asarray(mask),
                      jnp.asarray(rgba, jnp.uint8))
    # PIL path mirroring vcr/refcoco mask rendering: m*color as RGBA
    m = mask.reshape(24, 24, 1).repeat(4, -1) * np.array(rgba)
    fg = Image.fromarray(m.astype(np.uint8), "RGBA")
    img = Image.fromarray(image.copy(), "RGB")
    img.paste(fg, (0, 0), fg)
    np.testing.assert_array_equal(np.asarray(ours), np.array(img))


def test_render_copies_shapes(rng):
    image = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    rects = np.array([[0, 0, 8, 8], [4, 4, 12, 12]], np.float32)
    colors = np.array([[240, 0, 30, 127]] * 2, np.uint8)
    out = render_copies(jnp.asarray(image), jnp.asarray(rects),
                        jnp.asarray(colors))
    assert out.shape == (2, 16, 16, 3)
    ref0 = pil_paste_rect(image, rects[0], tuple(colors[0]))
    np.testing.assert_array_equal(np.asarray(out[0]), ref0)


def test_two_stage_pipeline_end_to_end(tmp_path, rng):
    """Full CPT loop on a tiny random detector: extraction writes a TSV the
    stage-2 dataset can consume, and grounding eval runs on it."""
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)

    n_dets = 3
    image = rng.randint(0, 256, (cfg.input.pad_h, cfg.input.pad_w, 3)).astype(np.uint8)
    dets = np.array([[4, 4, 24, 24], [30, 8, 50, 30], [10, 34, 40, 58]],
                    np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(image).astype(jnp.float32),
        jnp.asarray([60, 60]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    labelmap = {i: w for i, w in enumerate(
        ["bg", "cat", "dog", "man", "woman", "person", "car"])}
    ex = Extractor(model, params, cfg, labelmap=labelmap, copies_per_chunk=2)

    tasks = [refcoco_task(str(q), image, (60, 60), dets, f"the red dog {q}")
             for q in range(2)]
    out_tsv = str(tmp_path / "predictions.tsv")
    ex.run(tasks, out_tsv)
    assert ex.n_copies == 2 * n_dets

    # row format matches the stage-2 reader's expectations
    anns = [{"id": str(q), "bbox": [4, 4, 21, 21]} for q in range(2)]
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    json.dump({str(q): ["dog"] * n_dets for q in range(2)},
              open(tmp_path / "det.json", "w"))

    tok = BertTokenizer(toy_vocab())
    data = RefcocoCPTData(out_tsv, str(tmp_path / "ann.json"),
                          str(tmp_path / "det.json"), tok, txt_seq_len=24,
                          img_seq_len=4, img_feat_dim=cfg.backbone.out_channels * 2 + 6)
    ex0 = data.example(0)
    assert len(ex0.seqs) == n_dets
    assert ex0.feats[0].shape == (n_dets, cfg.backbone.out_channels * 2 + 6)
    # geometry dims present and normalized
    assert 0.0 <= ex0.feats[0][0][-6] <= 1.0

    from cpt_tpu.config.bert import tiny_bert_config
    from cpt_tpu.models.bert.heads import REC_MLM_CPT

    bcfg = tiny_bert_config(vocab_size=192,
                            img_feature_dim=cfg.backbone.out_channels * 2 + 6)
    bmodel = REC_MLM_CPT(bcfg)
    t = ex0.seqs[0]
    bparams = bmodel.init(jax.random.PRNGKey(1),
                          jnp.asarray(t.input_ids[None]),
                          jnp.asarray(t.segment_ids[None]),
                          jnp.asarray(t.attention_mask[None]),
                          jnp.zeros((1, 4, bcfg.img_feature_dim)))
    acc, preds = refcoco_evaluate(bmodel, bparams, data, tok, batch_size=8)
    assert len(preds) == 2 and 0.0 <= acc <= 100.0


def test_auto_chunking_by_canvas():
    """copies_per_chunk=None sizes the chunk from the HBM pixel budget."""
    from cpt_tpu.engine.extract import Extractor

    ex = Extractor.__new__(Extractor)           # chunk_for needs no model
    ex.chunk = None
    ex.mesh = None
    assert ex.chunk_for(640, 1024) == 128
    assert ex.chunk_for(1024, 1024) == 64
    assert ex.chunk_for(2048, 2048) == 16
    assert ex.chunk_for(10000, 10000) == 1       # floor
    ex.chunk = 8
    assert ex.chunk_for(640, 1024) == 8          # explicit wins


def test_auto_chunking_adapts_to_remaining_copies():
    from cpt_tpu.engine.extract import Extractor

    ex = Extractor.__new__(Extractor)
    ex.chunk = None
    ex.mesh = None
    # a 10-copy RefCOCO task at 640x1024: 16-slot chunk, not 64
    assert ex.chunk_for(640, 1024, remaining=10) == 16
    assert ex.chunk_for(640, 1024, remaining=80) == 128  # next pow2 >= 80
    assert ex.chunk_for(640, 1024, remaining=200) == 128  # budget cap
    assert ex.chunk_for(640, 1024, remaining=3) == 4
    assert ex.chunk_for(640, 1024, remaining=1) == 1
    # tail of an 80-copy task after one 64-chunk: 16 remaining -> 16
    assert ex.chunk_for(640, 1024, remaining=16) == 16


def test_grouped_run_matches_ungrouped(tmp_path, rng):
    """Packing same-image queries into one batch yields identical rows."""
    from cpt_tpu.utils.tsv import TSVFile

    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    image = rng.randint(0, 256, (cfg.input.pad_h, cfg.input.pad_w, 3)
                        ).astype(np.uint8)
    dets = np.array([[4, 4, 24, 24], [30, 8, 50, 30]], np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(image).astype(jnp.float32),
        jnp.asarray([60, 60]), jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))
    ex = Extractor(model, params, cfg, copies_per_chunk=8)

    # three queries on the SAME image array + one on a different image
    other = rng.randint(0, 256, image.shape).astype(np.uint8)
    def mk_tasks():
        return ([refcoco_task(f"q{i}", image, (60, 60), dets, f"cap {i}")
                 for i in range(3)]
                + [refcoco_task("q3", other, (60, 60), dets, "cap 3")])

    a, b = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    ex.run(mk_tasks(), a, group_by_image=True)
    ex.run(mk_tasks(), b, group_by_image=False)
    fa, fb = TSVFile(a), TSVFile(b)
    assert len(fa) == len(fb) == 4
    for i in range(4):
        ka, va = fa.seek(i)
        kb, vb = fb.seek(i)
        assert ka == kb
        oa = json.loads(va)["objects"]
        ob = json.loads(vb)["objects"]
        assert oa[1] == ob[1]                       # caption preserved
        fa0 = np.frombuffer(
            __import__("base64").b64decode(oa[0][0][0]["feature"]),
            np.float32)
        fb0 = np.frombuffer(
            __import__("base64").b64decode(ob[0][0][0]["feature"]),
            np.float32)
        np.testing.assert_allclose(fa0, fb0, rtol=2e-3, atol=2e-3)


def test_det_bucketing_right_sizes_outputs():
    from cpt_tpu.engine.extract import Extractor

    ex = Extractor.__new__(Extractor)
    from cpt_tpu.models.detector.config import VINVL_X152C4, tiny_detector_config
    ex.cfg = VINVL_X152C4
    assert ex.det_bucket_for(10) == 16
    assert ex.det_bucket_for(3) == 8          # floor
    assert ex.det_bucket_for(36) == 64
    assert ex.det_bucket_for(200) == 128      # capped
    ex.cfg = tiny_detector_config()           # max_force_boxes=8
    assert ex.det_bucket_for(3) == 8
    assert ex.det_bucket_for(20) == 8
