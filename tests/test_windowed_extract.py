"""Windowed-recompute extraction: exact when halo covers the receptive
field; measurable drift when it doesn't; origin/fits host logic."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.engine.extract import make_extract_fn
from cpt_tpu.engine.windowed import (feature_drift, make_base_features_fn,
                                     make_windowed_extract_fn,
                                     window_origins)
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import tiny_detector_config

CANVAS = 256


def _setup():
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]), jnp.zeros((m, 4)),
        jnp.ones((m,), bool))
    image = jnp.asarray(rng.randint(0, 256, (CANVAS, CANVAS, 3))
                        .astype(np.uint8))
    # rects near the canvas center, 16x16
    c = 4
    rects = np.zeros((c, 1, 4), np.float32)
    for i in range(c):
        x = 112 + 6 * i
        rects[i, 0] = [x, 120, x + 16, 136]
    colors = np.tile(np.asarray([240, 0, 30, 127], np.uint8), (c, 1, 1))
    dets = np.asarray(np.sort(rng.uniform(40, 216, (m, 2, 2)), axis=1)
                      .transpose(0, 2, 1).reshape(m, 4), np.float32)
    args = dict(
        rects=jnp.asarray(rects), rv=jnp.ones((c, 1), bool),
        colors=jnp.asarray(colors), cv=jnp.ones((c,), bool),
        dets=jnp.asarray(dets), dv=jnp.ones((m,), bool),
        hw=jnp.asarray([CANVAS, CANVAS]))
    return cfg, model, params, image, rects, args


def _exact(cfg, model, params, image, args):
    c = args["rects"].shape[0]
    masks = jnp.zeros((c, CANVAS, CANVAS), jnp.uint8)
    mc = jnp.zeros((c, 4), jnp.uint8)
    fn = make_extract_fn(model, cfg)
    return fn(params, image, args["rects"], args["rv"], args["colors"],
              args["cv"], masks, mc, args["dets"], args["dv"], args["hw"])


def _windowed(cfg, model, params, image, rects, args, window, halo):
    origins, fits = window_origins(rects, window, (CANVAS, CANVAS), halo)
    base = make_base_features_fn(model, cfg)(params, image)
    fn = make_windowed_extract_fn(model, cfg, window=window, halo=halo)
    out = fn(params, image, base, jnp.asarray(origins), args["rects"],
             args["rv"], args["colors"], args["cv"], args["dets"],
             args["dv"], args["hw"])
    return out, fits


@pytest.mark.slow
def test_windowed_exact_with_sufficient_halo():
    cfg, model, params, image, rects, args = _setup()
    exact = _exact(cfg, model, params, image, args)
    # tiny backbone RF radius ~33 px; halo 48 + interior margin >> RF
    approx, fits = _windowed(cfg, model, params, image, rects, args,
                             window=(192, 192), halo=48)
    assert fits.all()
    d = feature_drift(exact, approx)
    assert d["feat_max_rel"] < 5e-3, d
    assert d["label_agreement"] == 1.0


@pytest.mark.slow
def test_windowed_drift_grows_with_small_halo():
    cfg, model, params, image, rects, args = _setup()
    exact = _exact(cfg, model, params, image, args)
    good, _ = _windowed(cfg, model, params, image, rects, args,
                        window=(192, 192), halo=48)
    tight, _ = _windowed(cfg, model, params, image, rects, args,
                         window=(96, 96), halo=16)
    d_good = feature_drift(exact, good)
    d_tight = feature_drift(exact, tight)
    assert d_tight["feat_max_rel"] > d_good["feat_max_rel"]


def test_window_origins_clamp_and_fit():
    rects = np.asarray([
        [[120.0, 120.0, 136.0, 136.0]],     # center: fits
        [[0.0, 0.0, 16.0, 16.0]],           # corner: window clamps to 0
        [[20.0, 20.0, 230.0, 230.0]],       # huge: cannot fit
    ], np.float32)
    origins, fits = window_origins(rects, (192, 192), (CANVAS, CANVAS), 48)
    assert fits[0] and not fits[2]
    assert tuple(origins[1]) == (0, 0)
    assert origins.max() <= CANVAS - 192
    assert (origins % 16 == 0).all()


@pytest.mark.slow
def test_extractor_windowed_mode_matches_full(tmp_path):
    """Extractor(windowed=True) routes fitting copies through the windowed
    path, the rest through the full path, and matches the exact extractor
    (tiny net: halo 48 ≥ 2·RF 21 = 42 ⇒ exact)."""
    rng = np.random.RandomState(1)
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, refcoco_task

    image = rng.randint(0, 256, (CANVAS, CANVAS, 3)).astype(np.uint8)
    # candidate dets: one small central (fits), one huge (full-path)
    dets = np.asarray([[110.0, 110.0, 140.0, 140.0],
                       [10.0, 10.0, 240.0, 240.0],
                       [120.0, 100.0, 150.0, 130.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    def mk():
        return refcoco_task("q0", image, (CANVAS, CANVAS), dets, "query")

    exact = Extractor(model, params, cfg, copies_per_chunk=2)
    ef, el, es = exact.extract_task(mk())
    wnd = Extractor(model, params, cfg, copies_per_chunk=2, windowed=True,
                    window=(192, 192), halo=48)
    wf, wl, ws = wnd.extract_task(mk())
    assert wf.shape == ef.shape
    np.testing.assert_array_equal(wl, el)
    np.testing.assert_allclose(wf, ef, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_extractor_windowed_refcoco_mask_task_matches_full():
    """RefCOCO SEG copies (refcoco_mask_task: per-copy RLE masks with
    alpha-0 rect slots) through Extractor(windowed=True, with_masks)
    match the exact full path — composed routing uses the rect ∪ mask
    bbox target, and one oversized mask falls back to the full path."""
    rng = np.random.RandomState(4)
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, refcoco_mask_task

    image = rng.randint(0, 256, (CANVAS, CANVAS, 3)).astype(np.uint8)
    dets = np.asarray([[110.0, 110.0, 140.0, 140.0],
                       [10.0, 10.0, 240.0, 240.0],
                       [118.0, 104.0, 146.0, 132.0]], np.float32)
    masks = np.zeros((3, CANVAS, CANVAS), np.uint8)
    masks[0, 112:138, 112:138] = 1
    masks[1, 12:238, 12:238] = 1      # huge: routes to the full path
    masks[2, 106:130, 120:144] = 1
    masks[:, ::7, :] = 0              # stripes: not a plain rect paint
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    def mk():
        return refcoco_mask_task("q0", image, (CANVAS, CANVAS), dets,
                                 masks, "query")

    exact = Extractor(model, params, cfg, copies_per_chunk=2,
                      with_masks=True)
    ef, el, es = exact.extract_task(mk())
    wnd = Extractor(model, params, cfg, copies_per_chunk=2, windowed=True,
                    with_masks=True, window=(192, 192), halo=48)
    wf, wl, ws = wnd.extract_task(mk())
    assert wf.shape == ef.shape
    np.testing.assert_array_equal(wl, el)
    np.testing.assert_allclose(wf, ef, rtol=5e-3, atol=5e-3)


def test_extractor_multi_window_auto_sizing(tmp_path):
    """window=[(small), (large)]: each copy routes to the smallest window
    its paint fits (per-task auto window sizing); features still match
    the exact extractor."""
    rng = np.random.RandomState(2)
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, refcoco_task

    image = rng.randint(0, 256, (CANVAS, CANVAS, 3)).astype(np.uint8)
    # one det per ladder rung (16 px → 160-window, 80 px → 192, 120 px →
    # 224) plus a huge one that falls back to the full path
    dets = np.asarray([[120.0, 120.0, 136.0, 136.0],
                       [90.0, 90.0, 170.0, 170.0],
                       [70.0, 70.0, 190.0, 190.0],
                       [10.0, 10.0, 240.0, 240.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    def mk():
        return refcoco_task("q0", image, (CANVAS, CANVAS), dets, "query")

    exact = Extractor(model, params, cfg, copies_per_chunk=2)
    ef, el, es = exact.extract_task(mk())
    wnd = Extractor(model, params, cfg, copies_per_chunk=2, windowed=True,
                    window=[(160, 160), (192, 192), (224, 224)], halo=48)
    assert wnd.windows == [(160, 160), (192, 192), (224, 224)]
    assert len(wnd.wfns) == 3
    wf, wl, ws = wnd.extract_task(mk())
    np.testing.assert_array_equal(wl, el)
    np.testing.assert_allclose(wf, ef, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_base_maps_batched_matches_per_task():
    """Extractor.base_maps (cross-request base-pass batching, the serving
    lever): base maps computed in one vmapped backbone call feed
    extract_task(base=...) and reproduce the per-task path."""
    rng = np.random.RandomState(3)
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, refcoco_task

    dets = np.asarray([[120.0, 120.0, 136.0, 136.0],
                       [100.0, 110.0, 150.0, 140.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))
    tasks = [refcoco_task(f"q{i}",
                          rng.randint(0, 256, (CANVAS, CANVAS, 3))
                          .astype(np.uint8),
                          (CANVAS, CANVAS), dets, "query")
             for i in range(3)]

    wnd = Extractor(model, params, cfg, copies_per_chunk=2, windowed=True,
                    window=(192, 192), halo=48)
    bases = wnd.base_maps(tasks)          # 3 → padded batch of 4
    assert all(b is not None for b in bases)
    for task, base in zip(tasks, bases):
        f_solo, l_solo, s_solo = wnd.extract_task(task)
        f_pre, l_pre, s_pre = wnd.extract_task(task, base=base)
        np.testing.assert_array_equal(l_pre, l_solo)
        np.testing.assert_allclose(f_pre, f_solo, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(s_pre, s_solo, rtol=1e-4, atol=1e-4)

    # non-windowed extractor: base_maps degenerates to Nones
    plain = Extractor(model, params, cfg, copies_per_chunk=2)
    assert plain.base_maps(tasks) == [None, None, None]


@pytest.mark.slow
def test_run_base_batched_tsv_identical():
    """Extractor.run with cross-task base-pass batching (base_batch>1, the
    round-4 dataset-path amortization) writes a TSV byte-identical to the
    per-task base passes (base_batch=1)."""
    import tempfile
    from pathlib import Path

    rng = np.random.RandomState(4)
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, refcoco_task

    dets = np.asarray([[120.0, 120.0, 136.0, 136.0],
                       [100.0, 110.0, 150.0, 140.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    def mk_tasks():
        rng2 = np.random.RandomState(5)
        return [refcoco_task(f"q{i}",
                             rng2.randint(0, 256, (CANVAS, CANVAS, 3))
                             .astype(np.uint8),
                             (CANVAS, CANVAS), dets, f"query {i}")
                for i in range(5)]

    wnd = Extractor(model, params, cfg, copies_per_chunk=2, windowed=True,
                    window=(192, 192), halo=48)

    def read_rows(path):
        import json

        from cpt_tpu.utils.tsv import TSVFile, decode_feature

        tf = TSVFile(str(path))
        rows = []
        for i in range(len(tf)):
            key, payload = tf.seek(i)
            copies = json.loads(payload)["objects"][0]  # [n_copies][n_dets]
            rows.append((key, [(o["class"], decode_feature(o["feature"]))
                               for copy in copies for o in copy]))
        return rows

    with tempfile.TemporaryDirectory() as td:
        solo = Path(td, "solo.tsv")
        wnd.run(mk_tasks(), str(solo), base_batch=1)
        rs = read_rows(solo)
        # base_batch=4: blocks 4+1 (full block + singleton fallback);
        # base_batch=3: blocks 3+2 (the trailing PARTIAL block pads to
        # base_batch so it reuses the pinned batch-3 base program)
        for bb in (4, 3):
            batched = Path(td, f"batched{bb}.tsv")
            wnd.run(mk_tasks(), str(batched), base_batch=bb)
            rb = read_rows(batched)
            assert [k for k, _ in rs] == [k for k, _ in rb]
            for (_, os_), (_, ob) in zip(rs, rb):
                for (cls_s, f_s), (cls_b, f_b) in zip(os_, ob):
                    assert cls_s == cls_b
                    # batched base pass may differ at the float noise floor
                    np.testing.assert_allclose(f_b, f_s, rtol=1e-4,
                                               atol=1e-4)


@pytest.mark.slow
def test_windowed_mask_painting_exact():
    """Mask-painted copies (VCR-style) through the windowed path match the
    exact full path with sufficient halo."""
    from cpt_tpu.engine.windowed import mask_bboxes

    cfg, model, params, image, rects, args = _setup()
    c = 4
    masks = np.zeros((c, CANVAS, CANVAS), np.uint8)
    for i in range(c):
        masks[i, 118:134, 112 + 6 * i:128 + 6 * i] = 1
    mcolors = np.tile(np.asarray([0, 10, 255, 127], np.uint8), (c, 1))
    # exact reference: full-canvas path with masks (no rects)
    fn = make_extract_fn(model, cfg, with_masks=True)
    zero_rects = jnp.zeros((c, 1, 4))
    no_rv = jnp.zeros((c, 1), bool)
    exact = fn(params, image, zero_rects, no_rv,
               jnp.zeros((c, 1, 4), jnp.uint8), args["cv"],
               jnp.asarray(masks), jnp.asarray(mcolors), args["dets"],
               args["dv"], args["hw"])

    boxes = mask_bboxes(masks)
    from cpt_tpu.engine.windowed import (make_base_features_fn,
                                         make_windowed_extract_fn,
                                         window_origins)
    origins, fits = window_origins(boxes, (192, 192), (CANVAS, CANVAS), 48)
    assert fits.all()
    base = make_base_features_fn(model, cfg)(params, image)
    wfn = make_windowed_extract_fn(model, cfg, window=(192, 192), halo=48,
                                   with_masks=True)
    approx = wfn(params, image, base, jnp.asarray(origins), zero_rects,
                 no_rv, jnp.zeros((c, 1, 4), jnp.uint8), args["cv"],
                 args["dets"], args["dv"], args["hw"],
                 jnp.asarray(masks), jnp.asarray(mcolors))
    d = feature_drift(exact, approx)
    assert d["feat_max_rel"] < 5e-3, d
    assert d["label_agreement"] == 1.0


def test_mask_bboxes():
    from cpt_tpu.engine.windowed import mask_bboxes

    m = np.zeros((2, 20, 30), np.uint8)
    m[0, 5:10, 7:12] = 1
    bb = mask_bboxes(m)
    np.testing.assert_array_equal(bb[0, 0], [7, 5, 11, 9])
    np.testing.assert_array_equal(bb[1, 0], [0, 0, 0, 0])  # empty


@pytest.mark.slow
def test_extractor_windowed_mask_tasks():
    """Extractor(windowed=True, with_masks=True) on a VCR-style mask task
    matches the exact extractor."""
    rng = np.random.RandomState(2)
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, ExtractTask

    image = rng.randint(0, 256, (CANVAS, CANVAS, 3)).astype(np.uint8)
    dets = np.asarray([[100.0, 100.0, 150.0, 150.0],
                       [120.0, 110.0, 160.0, 140.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    masks = np.zeros((2, CANVAS, CANVAS), np.uint8)
    masks[0, 118:134, 112:130] = 1
    masks[1, 100:140, 120:160] = 1
    mcolors = np.tile(np.asarray([0, 10, 255, 127], np.uint8), (2, 1))

    def mk():
        return ExtractTask(key="q0", image_rgb=image,
                           image_hw=(CANVAS, CANVAS), det_boxes=dets,
                           copy_masks=masks.copy(),
                           copy_mask_colors=mcolors.copy())

    exact = Extractor(model, params, cfg, copies_per_chunk=2,
                      with_masks=True)
    ef, el, es = exact.extract_task(mk())
    wnd = Extractor(model, params, cfg, copies_per_chunk=2, windowed=True,
                    with_masks=True, window=(192, 192), halo=48)
    wf, wl, ws = wnd.extract_task(mk())
    np.testing.assert_array_equal(wl, el)
    np.testing.assert_allclose(wf, ef, rtol=5e-3, atol=5e-3)


def test_backbone_receptive_field():
    from cpt_tpu.engine.windowed import backbone_receptive_field
    from cpt_tpu.models.detector.config import VINVL_X152C4

    # tiny: stem 3+2, stage1 +4, stage2 +4 (then jump 8), stage3 +8 = 21
    assert backbone_receptive_field(tiny_detector_config()) == 21
    # X152-C4: far beyond any practical halo
    assert backbone_receptive_field(VINVL_X152C4) > 500


def test_windowed_guard_falls_back_for_deep_backbone():
    """Silent approximation is forbidden: below the two-level threshold
    (halo < early-stage RF 77 on X152) windowed falls back to the exact
    path unless allow_approximate; at the default halo 96 the two-level
    EXACT mode engages instead."""
    from cpt_tpu.engine.extract import Extractor
    from cpt_tpu.models.detector.config import VINVL_X152C4

    cfg = VINVL_X152C4
    model = AttrRCNN(cfg)
    default = Extractor(model, None, cfg, windowed=True)
    assert default.windowed and default.windowed_mode == "two_level"
    assert not default._windowed_approx
    guarded = Extractor(model, None, cfg, windowed=True, halo=64)
    assert not guarded.windowed                 # 64 < 77, no approx
    allowed = Extractor(model, None, cfg, windowed=True, halo=64,
                        allow_approximate=True)
    assert allowed.windowed and allowed._windowed_approx


@pytest.mark.slow
def test_windowed_drift_harness_runs_on_first_task():
    """With allow_approximate and halo < RF, the first windowed task
    auto-measures drift vs the exact path and records it."""
    import dataclasses

    rng = np.random.RandomState(3)
    base_cfg = tiny_detector_config()
    # stage2 with 2 blocks: early RF = 21 > halo 16 (and full RF 29), so
    # neither exact windowed mode is eligible at halo 16
    cfg = dataclasses.replace(
        base_cfg, backbone=dataclasses.replace(base_cfg.backbone,
                                               stage_blocks=(1, 2, 1)))
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, refcoco_task

    image = rng.randint(0, 256, (CANVAS, CANVAS, 3)).astype(np.uint8)
    dets = np.asarray([[110.0, 110.0, 140.0, 140.0],
                       [120.0, 100.0, 150.0, 130.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))
    guarded = Extractor(model, params, cfg, windowed=True,
                        window=(96, 96), halo=16)
    assert not guarded.windowed
    wnd = Extractor(model, params, cfg, copies_per_chunk=2, windowed=True,
                    window=(96, 96), halo=16, allow_approximate=True)
    assert wnd._windowed_approx and not wnd._drift_logged
    wnd.extract_task(refcoco_task("q0", image, (CANVAS, CANVAS), dets, "q"))
    assert wnd._drift_logged
    assert wnd.last_drift["feat_max_rel"] >= 0
    assert 0 <= wnd.last_drift["label_agreement"] <= 1


@pytest.mark.slow
def test_sharded_windowed_matches_single_device():
    from cpt_tpu.engine.windowed import make_sharded_windowed_fn
    from cpt_tpu.parallel.mesh import make_mesh

    cfg, model, params, image, rects, args = _setup()
    exact, fits = _windowed(cfg, model, params, image, rects, args,
                            window=(192, 192), halo=48)
    from cpt_tpu.engine.windowed import (make_base_features_fn,
                                         window_origins)
    origins, _ = window_origins(rects, (192, 192), (CANVAS, CANVAS), 48)
    base = make_base_features_fn(model, cfg)(params, image)
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    fn = make_sharded_windowed_fn(model, cfg, mesh, window=(192, 192),
                                  halo=48)
    out = fn(params, image, base, jnp.asarray(origins), args["rects"],
             args["rv"], args["colors"], args["cv"], args["dets"],
             args["dv"], args["hw"])
    for s, d in zip(exact, out):
        np.testing.assert_allclose(np.asarray(s), np.asarray(d),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_extractor_multi_window_sharded(tmp_path):
    """Window ladder + dp mesh: dp-sharded multi-window Extractor matches
    the single-device exact extractor."""
    rng = np.random.RandomState(3)
    cfg = tiny_detector_config()
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, refcoco_task
    from cpt_tpu.parallel.mesh import make_mesh

    image = rng.randint(0, 256, (CANVAS, CANVAS, 3)).astype(np.uint8)
    dets = np.asarray([[120.0, 120.0, 136.0, 136.0],
                       [90.0, 90.0, 170.0, 170.0],
                       [100.0, 110.0, 150.0, 140.0],
                       [10.0, 10.0, 240.0, 240.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    def mk():
        return refcoco_task("q0", image, (CANVAS, CANVAS), dets, "query")

    exact = Extractor(model, params, cfg, copies_per_chunk=4)
    ef, el, es = exact.extract_task(mk())
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    wnd = Extractor(model, params, cfg, copies_per_chunk=4, windowed=True,
                    window=[(160, 160), (224, 224)], halo=48, mesh=mesh)
    wf, wl, ws = wnd.extract_task(mk())
    np.testing.assert_array_equal(wl, el)
    np.testing.assert_allclose(wf, ef, rtol=5e-3, atol=5e-3)


def _deep_cfg():
    """>2 stages with rf_early(2)=13 << rf_full=101: halo 48 is exact for
    the two-level split but NOT for one-level."""
    import dataclasses

    from cpt_tpu.models.detector.config import BackboneConfig

    cfg = tiny_detector_config()
    return dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone,
                                          stage_blocks=(1, 1, 6)))


def test_two_level_rf_math():
    from cpt_tpu.engine.windowed import backbone_receptive_field
    from cpt_tpu.models.detector.config import VINVL_X152C4

    assert backbone_receptive_field(_deep_cfg(), 2) == 13
    assert backbone_receptive_field(_deep_cfg()) == 101
    # X152: stem 5 + stage1 12 + stage2 60 = 77 -> halo 80/96 exact
    assert backbone_receptive_field(VINVL_X152C4, 2) == 77


@pytest.mark.slow
def test_two_level_exactly_matches_full():
    """Two-level windowed output == exact full-canvas extraction on a
    backbone whose FULL RF exceeds the halo (one-level would drift)."""
    from cpt_tpu.engine.windowed import (make_base_early_fn,
                                         make_two_level_extract_fn,
                                         window_origins)

    cfg = _deep_cfg()
    model = AttrRCNN(cfg)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(5)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]), jnp.zeros((m, 4)),
        jnp.ones((m,), bool))
    image = jnp.asarray(rng.randint(0, 256, (CANVAS, CANVAS, 3))
                        .astype(np.uint8))
    c = 4
    rects = np.zeros((c, 1, 4), np.float32)
    for i in range(c):
        x = 112 + 6 * i
        rects[i, 0] = [x, 120, x + 16, 136]
    colors = np.tile(np.asarray([240, 0, 30, 127], np.uint8), (c, 1, 1))
    dets = np.asarray(np.sort(rng.uniform(40, 216, (m, 2, 2)), axis=1)
                      .transpose(0, 2, 1).reshape(m, 4), np.float32)
    args = dict(rects=jnp.asarray(rects), rv=jnp.ones((c, 1), bool),
                colors=jnp.asarray(colors), cv=jnp.ones((c,), bool),
                dets=jnp.asarray(dets), dv=jnp.ones((m,), bool),
                hw=jnp.asarray([CANVAS, CANVAS]))
    exact = _exact(cfg, model, params, image, args)

    origins, fits = window_origins(rects, (192, 192), (CANVAS, CANVAS), 48)
    assert fits.all()
    base = make_base_early_fn(model, cfg, 2)(params, image)
    fn = make_two_level_extract_fn(model, cfg, window=(192, 192), halo=48)
    got = fn(params, image, base, jnp.asarray(origins), args["rects"],
             args["rv"], args["colors"], args["cv"], args["dets"],
             args["dv"], args["hw"])
    d = feature_drift(exact, got)
    assert d["feat_max_rel"] < 2e-4, d
    assert d["label_agreement"] == 1.0

    # sanity: ONE-level at the same halo drifts more (48 < full RF 101)
    one = _windowed(cfg, model, params, image, rects, args,
                    window=(192, 192), halo=48)[0]
    d1 = feature_drift(exact, one)
    assert d1["feat_max_rel"] > d["feat_max_rel"]


def test_windowed_mode_selection():
    """Extractor picks: one_level when halo >= full RF; two_level when
    halo >= early RF only; disabled below both (unless approximate)."""
    from cpt_tpu.engine.extract import Extractor
    from cpt_tpu.models.detector.config import VINVL_X152C4

    tiny = tiny_detector_config()
    ex1 = Extractor(AttrRCNN(tiny), None, tiny, windowed=True)
    assert ex1.windowed_mode == "one_level"       # halo 96 >= RF 21

    deep = _deep_cfg()
    ex2 = Extractor(AttrRCNN(deep), None, deep, windowed=True,
                    window=(192, 192), halo=48)
    assert ex2.windowed_mode == "two_level" and not ex2._windowed_approx

    x152 = VINVL_X152C4
    ex3 = Extractor(AttrRCNN(x152), None, x152, windowed=True)
    assert ex3.windowed_mode == "two_level"       # 96 >= 77 early RF

    ex4 = Extractor(AttrRCNN(x152), None, x152, windowed=True, halo=64)
    assert not ex4.windowed                        # 64 < 77, no approx
    ex5 = Extractor(AttrRCNN(x152), None, x152, windowed=True, halo=64,
                    allow_approximate=True)
    assert ex5.windowed_mode == "one_level" and ex5._windowed_approx


@pytest.mark.slow
def test_extractor_two_level_end_to_end():
    """Extractor(windowed=True) in two-level mode matches the plain
    extractor on a real task."""
    rng = np.random.RandomState(6)
    cfg = _deep_cfg()
    model = AttrRCNN(cfg)
    from cpt_tpu.engine.extract import Extractor, refcoco_task

    image = rng.randint(0, 256, (CANVAS, CANVAS, 3)).astype(np.uint8)
    dets = np.asarray([[110.0, 110.0, 140.0, 140.0],
                       [120.0, 100.0, 150.0, 130.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    def mk():
        return refcoco_task("q0", image, (CANVAS, CANVAS), dets, "q")

    plain = Extractor(model, params, cfg, copies_per_chunk=2)
    ef, el, es = plain.extract_task(mk())
    wnd = Extractor(model, params, cfg, copies_per_chunk=2, windowed=True,
                    window=(192, 192), halo=48)
    assert wnd.windowed_mode == "two_level"
    wf, wl, ws = wnd.extract_task(mk())
    np.testing.assert_array_equal(wl, el)
    np.testing.assert_allclose(wf, ef, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sharded_two_level_matches_single_device():
    from cpt_tpu.engine.windowed import (make_base_early_fn,
                                         make_sharded_windowed_fn,
                                         make_two_level_extract_fn)
    from cpt_tpu.parallel.mesh import make_mesh

    cfg = _deep_cfg()
    model = AttrRCNN(cfg)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(7)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]), jnp.zeros((m, 4)),
        jnp.ones((m,), bool))
    image = jnp.asarray(rng.randint(0, 256, (CANVAS, CANVAS, 3))
                        .astype(np.uint8))
    c = 4
    rects = np.zeros((c, 1, 4), np.float32)
    for i in range(c):
        x = 112 + 6 * i
        rects[i, 0] = [x, 120, x + 16, 136]
    colors = np.tile(np.asarray([240, 0, 30, 127], np.uint8), (c, 1, 1))
    dets = np.asarray(np.sort(rng.uniform(40, 216, (m, 2, 2)), axis=1)
                      .transpose(0, 2, 1).reshape(m, 4), np.float32)
    origins, fits = window_origins(rects, (192, 192), (CANVAS, CANVAS), 48)
    assert fits.all()
    base = make_base_early_fn(model, cfg, 2)(params, image)
    args = (jnp.asarray(origins), jnp.asarray(rects),
            jnp.ones((c, 1), bool), jnp.asarray(colors),
            jnp.ones((c,), bool), jnp.asarray(dets), jnp.ones((m,), bool),
            jnp.asarray([CANVAS, CANVAS]))
    single = make_two_level_extract_fn(model, cfg, window=(192, 192),
                                       halo=48)(params, image, base, *args)
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    sharded = make_sharded_windowed_fn(model, cfg, mesh, two_level=True,
                                       window=(192, 192), halo=48)(
        params, image, base, *args)
    for s, d in zip(single, sharded):
        np.testing.assert_allclose(np.asarray(s), np.asarray(d),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_extractor_mesh_windowed_two_level(tmp_path):
    """Extractor(mesh=..., windowed=True) shards the two-level path over
    dp and matches the unsharded result."""
    from cpt_tpu.engine.extract import Extractor, refcoco_task
    from cpt_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(8)
    cfg = _deep_cfg()
    model = AttrRCNN(cfg)
    image = rng.randint(0, 256, (CANVAS, CANVAS, 3)).astype(np.uint8)
    dets = np.asarray([[110.0, 110.0, 140.0, 140.0],
                       [120.0, 100.0, 150.0, 130.0],
                       [100.0, 120.0, 135.0, 145.0],
                       [115.0, 105.0, 150.0, 140.0]], np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))

    def mk():
        return refcoco_task("q0", image, (CANVAS, CANVAS), dets, "q")

    single = Extractor(model, params, cfg, copies_per_chunk=4,
                       windowed=True, window=(192, 192), halo=48)
    assert single.windowed_mode == "two_level"
    sf, sl, ss = single.extract_task(mk())
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    sharded = Extractor(model, params, cfg, copies_per_chunk=4,
                        windowed=True, window=(192, 192), halo=48,
                        mesh=mesh)
    assert sharded.windowed_mode == "two_level"
    mf, ml, ms = sharded.extract_task(mk())
    np.testing.assert_array_equal(sl, ml)
    np.testing.assert_allclose(sf, mf, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_cascade_equals_no_cascade_and_handles_edges():
    """Dirty-region cascade == plain two-level (both exact), including
    copies whose windows clamp flush against canvas corners (slice edges
    at map edges must reuse the map's own zero padding)."""
    from cpt_tpu.engine.windowed import (make_base_early_fn,
                                         make_two_level_extract_fn,
                                         window_origins)

    cfg = _deep_cfg()
    model = AttrRCNN(cfg)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(9)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]), jnp.zeros((m, 4)),
        jnp.ones((m,), bool))
    image = jnp.asarray(rng.randint(0, 256, (CANVAS, CANVAS, 3))
                        .astype(np.uint8))
    # corner-adjacent rects: windows clamp to (0,0) / bottom-right
    rects = np.asarray([
        [[50.0, 50.0, 70.0, 70.0]],          # clamps top-left
        [[190.0, 190.0, 205.0, 205.0]],      # clamps bottom-right
        [[120.0, 60.0, 140.0, 80.0]],        # clamps top only
        [[120.0, 120.0, 140.0, 140.0]],      # centered
    ], np.float32)
    colors = np.tile(np.asarray([240, 0, 30, 127], np.uint8), (4, 1, 1))
    dets = np.asarray(np.sort(rng.uniform(40, 216, (m, 2, 2)), axis=1)
                      .transpose(0, 2, 1).reshape(m, 4), np.float32)
    origins, fits = window_origins(rects, (192, 192), (CANVAS, CANVAS), 48)
    assert fits.all()
    base = make_base_early_fn(model, cfg, 2)(params, image)
    args = (jnp.asarray(origins), jnp.asarray(rects),
            jnp.ones((4, 1), bool), jnp.asarray(colors),
            jnp.ones((4,), bool), jnp.asarray(dets), jnp.ones((m,), bool),
            jnp.asarray([CANVAS, CANVAS]))
    plain = make_two_level_extract_fn(model, cfg, window=(192, 192),
                                      halo=48, cascade=False)(
        params, image, base, *args)
    casc = make_two_level_extract_fn(model, cfg, window=(192, 192),
                                     halo=48, cascade=True)(
        params, image, base, *args)
    d = feature_drift(plain, casc)
    assert d["feat_max_rel"] < 1e-4, d
    assert d["label_agreement"] == 1.0


@pytest.mark.slow
def test_edge_flush_windows_are_exact():
    """Halo waiver at canvas-flush window sides: corner/edge rects now
    take the windowed path and still match the exact full computation
    (flush slice edges see the same zero padding as the full canvas)."""
    from cpt_tpu.engine.windowed import (make_base_early_fn,
                                         make_two_level_extract_fn)

    cfg = _deep_cfg()
    model = AttrRCNN(cfg)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(10)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]), jnp.zeros((m, 4)),
        jnp.ones((m,), bool))
    image = jnp.asarray(rng.randint(0, 256, (CANVAS, CANVAS, 3))
                        .astype(np.uint8))
    # rects hugging the corners/edges: all inside the halo margin, which
    # the OLD fits logic rejected
    rects = np.asarray([
        [[2.0, 2.0, 30.0, 30.0]],            # top-left corner
        [[220.0, 226.0, 250.0, 252.0]],      # bottom-right corner
        [[100.0, 4.0, 130.0, 30.0]],         # top edge
        [[6.0, 100.0, 36.0, 130.0]],         # left edge
    ], np.float32)
    colors = np.tile(np.asarray([240, 0, 30, 127], np.uint8), (4, 1, 1))
    dets = np.asarray(np.sort(rng.uniform(10, 246, (m, 2, 2)), axis=1)
                      .transpose(0, 2, 1).reshape(m, 4), np.float32)
    origins, fits = window_origins(rects, (192, 192), (CANVAS, CANVAS), 48)
    assert fits.all(), fits          # NEW: edge rects are eligible
    args = dict(rects=jnp.asarray(rects), rv=jnp.ones((4, 1), bool),
                colors=jnp.asarray(colors), cv=jnp.ones((4,), bool),
                dets=jnp.asarray(dets), dv=jnp.ones((m,), bool),
                hw=jnp.asarray([CANVAS, CANVAS]))
    exact = _exact(cfg, model, params, image, args)
    base = make_base_early_fn(model, cfg, 2)(params, image)
    for cascade in (False, True):
        fn = make_two_level_extract_fn(model, cfg, window=(192, 192),
                                       halo=48, cascade=cascade)
        got = fn(params, image, base, jnp.asarray(origins), args["rects"],
                 args["rv"], args["colors"], args["cv"], args["dets"],
                 args["dv"], args["hw"])
        d = feature_drift(exact, got)
        assert d["feat_max_rel"] < 2e-4, (cascade, d)
        assert d["label_agreement"] == 1.0


@pytest.mark.slow
def test_two_level_multi_rect_copies():
    """GQA/VG-style copies paint MULTIPLE rects; the window covers their
    union and the two-level path stays exact."""
    from cpt_tpu.engine.windowed import (make_base_early_fn,
                                         make_two_level_extract_fn)

    cfg = _deep_cfg()
    model = AttrRCNN(cfg)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(12)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]), jnp.zeros((m, 4)),
        jnp.ones((m,), bool))
    image = jnp.asarray(rng.randint(0, 256, (CANVAS, CANVAS, 3))
                        .astype(np.uint8))
    c, k = 3, 2
    rects = np.asarray([
        [[100.0, 100.0, 120.0, 120.0], [130.0, 125.0, 150.0, 145.0]],
        [[90.0, 120.0, 115.0, 140.0], [120.0, 95.0, 140.0, 115.0]],
        [[110.0, 110.0, 150.0, 150.0], [105.0, 105.0, 125.0, 125.0]],
    ], np.float32)
    colors = np.stack([
        np.asarray([[240, 0, 30, 127], [0, 10, 255, 127]], np.uint8)
    ] * c)
    dets = np.asarray(np.sort(rng.uniform(40, 216, (m, 2, 2)), axis=1)
                      .transpose(0, 2, 1).reshape(m, 4), np.float32)
    args = dict(rects=jnp.asarray(rects), rv=jnp.ones((c, k), bool),
                colors=jnp.asarray(colors), cv=jnp.ones((c,), bool),
                dets=jnp.asarray(dets), dv=jnp.ones((m,), bool),
                hw=jnp.asarray([CANVAS, CANVAS]))
    exact = _exact(cfg, model, params, image, args)
    origins, fits = window_origins(rects, (192, 192), (CANVAS, CANVAS), 48)
    assert fits.all()
    base = make_base_early_fn(model, cfg, 2)(params, image)
    got = make_two_level_extract_fn(model, cfg, window=(192, 192),
                                    halo=48)(
        params, image, base, jnp.asarray(origins), args["rects"],
        args["rv"], args["colors"], args["cv"], args["dets"], args["dv"],
        args["hw"])
    d = feature_drift(exact, got)
    assert d["feat_max_rel"] < 2e-4, d
    assert d["label_agreement"] == 1.0


@pytest.mark.slow
def test_two_level_mask_painting_exact():
    """VCR-style mask-painted copies through the two-level path match the
    exact full path."""
    from cpt_tpu.engine.windowed import (make_base_early_fn, mask_bboxes,
                                         make_two_level_extract_fn)

    cfg = _deep_cfg()
    model = AttrRCNN(cfg)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(14)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((CANVAS, CANVAS, 3)),
        jnp.asarray([CANVAS, CANVAS]), jnp.zeros((m, 4)),
        jnp.ones((m,), bool))
    image = jnp.asarray(rng.randint(0, 256, (CANVAS, CANVAS, 3))
                        .astype(np.uint8))
    c = 3
    masks = np.zeros((c, CANVAS, CANVAS), np.uint8)
    masks[0, 110:140, 100:140] = 1
    masks[1, 95:125, 120:160] = 1
    masks[2, 120:150, 105:135] = 1
    mcolors = np.tile(np.asarray([0, 10, 255, 127], np.uint8), (c, 1))
    dets = np.asarray(np.sort(rng.uniform(40, 216, (m, 2, 2)), axis=1)
                      .transpose(0, 2, 1).reshape(m, 4), np.float32)
    zero_rects = jnp.zeros((c, 1, 4))
    no_rv = jnp.zeros((c, 1), bool)
    cv = jnp.ones((c,), bool)
    fn = make_extract_fn(model, cfg, with_masks=True)
    exact = fn(params, image, zero_rects, no_rv,
               jnp.zeros((c, 1, 4), jnp.uint8), cv, jnp.asarray(masks),
               jnp.asarray(mcolors), jnp.asarray(dets),
               jnp.ones((m,), bool), jnp.asarray([CANVAS, CANVAS]))

    boxes = mask_bboxes(masks)
    origins, fits = window_origins(boxes, (192, 192), (CANVAS, CANVAS), 48)
    assert fits.all()
    base = make_base_early_fn(model, cfg, 2)(params, image)
    wfn = make_two_level_extract_fn(model, cfg, window=(192, 192), halo=48,
                                    with_masks=True)
    got = wfn(params, image, base, jnp.asarray(origins), zero_rects,
              no_rv, jnp.zeros((c, 1, 4), jnp.uint8), cv,
              jnp.asarray(dets), jnp.ones((m,), bool),
              jnp.asarray([CANVAS, CANVAS]),
              jnp.asarray(masks), jnp.asarray(mcolors))
    d = feature_drift(exact, got)
    assert d["feat_max_rel"] < 2e-4, d
    assert d["label_agreement"] == 1.0


def test_window_origins_invariants_fuzz():
    """Property test: origins are stride-aligned and in-canvas; every
    'fits' rect sits >= halo (eligibility margin) inside its window."""
    from cpt_tpu.engine.windowed import window_origins

    rng = np.random.RandomState(7)
    canvas = (640, 1024)
    window, halo = (512, 640), 160
    x1 = rng.uniform(0, 900, (200, 1))
    y1 = rng.uniform(0, 560, (200, 1))
    rects = np.stack([x1, y1,
                      x1 + rng.uniform(5, 500, (200, 1)),
                      y1 + rng.uniform(5, 400, (200, 1))],
                     axis=2).astype(np.float32)
    origins, fits = window_origins(rects, window, canvas, halo)
    origins = np.asarray(origins)
    assert (origins % 16 == 0).all()          # stride-aligned windows
    assert (origins >= 0).all()
    assert (origins[:, 0] + window[0] <= canvas[0]).all()
    assert (origins[:, 1] + window[1] <= canvas[1]).all()
    assert fits.any() and (~fits).any()
