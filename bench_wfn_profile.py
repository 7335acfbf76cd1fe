"""Round-4 study: phase breakdown of the two-level windowed extract fn.

Prefix-timing protocol (PERF.md round 3 "extraction time budget"): jit the
two-level computation truncated after each phase — crop+paint+early stages
on windows, paste into base, deep stage 3, heads (RoI-align + stage 5 +
predictors), 2054-d feature assembly — each timed single-call with fresh
inputs, drained queue, materialized result. Differences between successive
prefixes attribute the wall time.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.engine.windowed import (backbone_receptive_field,
                                     make_base_early_fn, window_origins)
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN, region_features_2054
from cpt_tpu.models.detector.config import VINVL_X152C4
from cpt_tpu.ops.render import paste_rects, to_detector_input

H, W = 640, 1024
C = 128
WINDOW, HALO = (512, 640), 160
SPLIT = 2
STRIDE = 16


def main():
    cfg = VINVL_X152C4
    model = AttrRCNN(cfg, dtype=jnp.bfloat16)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((256, 256, 3)),
        jnp.asarray([256, 256]), jnp.zeros((m, 4)), jnp.ones((m,), bool))
    base_fn = make_base_early_fn(model, cfg, SPLIT)

    wh, ww = WINDOW
    map_stride = 4 * 2 ** (SPLIT - 1)
    rf = backbone_receptive_field(cfg, SPLIT)
    t = -(-rf // map_stride)

    dets = jnp.asarray(np.sort(rng.uniform(0, 600, (m, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(m, 4).astype(np.float32))
    dv = jnp.ones((m,), bool)
    hw = jnp.asarray([H, W])
    mh = wh - 2 * HALO - 40
    y1 = rng.uniform(HALO + 21, H - HALO - mh - 21, (C, 1))
    x1 = rng.uniform(HALO + 21, W - HALO - mh - 21, (C, 1))
    rects = np.stack([x1, y1, x1 + rng.uniform(20, mh, (C, 1)),
                      y1 + rng.uniform(20, mh, (C, 1))],
                     axis=2).reshape(C, 1, 4).astype(np.float32)
    origins, fits = window_origins(rects, WINDOW, (H, W), HALO)
    assert fits.all()
    origins = jnp.asarray(origins)
    rects_j = jnp.asarray(rects)
    rv = jnp.ones((C, 1), bool)
    colors = jnp.asarray(np.tile(np.asarray([240, 0, 30, 127], np.uint8),
                                 (C, 1, 1)))

    def crops_early(params, image_u8):
        def crop_and_paint(origin, rect_set, rvv, color_set):
            crop = jax.lax.dynamic_slice(image_u8,
                                         (origin[0], origin[1], 0),
                                         (wh, ww, 3))
            off = jnp.asarray([origin[1], origin[0], origin[1], origin[0]],
                              jnp.float32)
            return paste_rects(crop, rect_set - off[None], color_set, rvv)

        crops = jax.vmap(crop_and_paint)(origins, rects_j, rv, colors)
        x = to_detector_input(crops, cfg.input.pixel_mean, dtype=model.dtype)
        return model.apply(params, x,
                           method=lambda mm, xs: mm.backbone.up_to(xs, SPLIT))

    def patch_fn(wfeats, base_feat):
        def patch(origin, wf):
            whc, wwc, chn = wf.shape
            oy, ox = origin[0] // map_stride, origin[1] // map_stride
            row = jnp.arange(whc)
            col = jnp.arange(wwc)
            row_ok = (((row >= t) | (origin[0] == 0))
                      & ((row < whc - t) | (origin[0] + wh >= H)))
            col_ok = (((col >= t) | (origin[1] == 0))
                      & ((col < wwc - t) | (origin[1] + ww >= W)))
            base_slice = jax.lax.dynamic_slice(base_feat, (oy, ox, 0),
                                               (whc, wwc, chn))
            blended = jnp.where(
                (row_ok[:, None] & col_ok[None, :])[..., None],
                wf.astype(base_feat.dtype), base_slice)
            return jax.lax.dynamic_update_slice(base_feat, blended,
                                                (oy, ox, 0))

        return jax.vmap(patch)(origins, wfeats)

    def stage3_fn(params, patched):
        return model.apply(
            params, patched,
            method=lambda mm, xs: mm.backbone.from_stage(xs, SPLIT))

    def heads_fn(params, c4):
        return model.apply(params, c4, dets, dv,
                           method=AttrRCNN.heads_from_feats)

    def feats_fn(out):
        return jax.vmap(lambda bf, bx: region_features_2054(
            bf.astype(jnp.float32), bx, hw))(out["box_features"],
                                             out["boxes"])

    prefixes = {
        "1_crops_early": lambda p, img, base: crops_early(p, img),
        "2_plus_patch": lambda p, img, base: patch_fn(
            crops_early(p, img), base),
        "3_plus_stage3": lambda p, img, base: stage3_fn(
            p, patch_fn(crops_early(p, img), base)),
        "4_plus_heads": lambda p, img, base: heads_fn(
            p, stage3_fn(p, patch_fn(crops_early(p, img), base))),
        "5_full": lambda p, img, base: feats_fn(heads_fn(
            p, stage3_fn(p, patch_fn(crops_early(p, img), base)))),
    }

    def fresh():
        img = jnp.asarray(rng.randint(0, 256, (H, W, 3)).astype(np.uint8))
        base = base_fn(params, img)
        jax.tree_util.tree_map(lambda a: float(a.sum()), base)
        return img, base

    prev = 0.0
    for name, fn in prefixes.items():
        jfn = jax.jit(fn)
        img, base = fresh()
        out = jfn(params, img, base)
        jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).sum()), out)
        ts = []
        for _ in range(3):
            img, base = fresh()
            t0 = time.perf_counter()
            out = jfn(params, img, base)
            jax.tree_util.tree_map(
                lambda a: float(jnp.asarray(a).sum()), out)
            ts.append(time.perf_counter() - t0)
        cur = min(ts) * 1e3
        print(f"{name}: {cur:.1f} ms (delta {cur - prev:+.1f})", flush=True)
        prev = cur


if __name__ == "__main__":
    main()
