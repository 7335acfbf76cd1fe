"""Windowed-recompute extraction — cross-copy compute reuse (experimental).

The CPT workload's copies of one query differ ONLY inside one painted
rectangle, yet the plain extractor re-runs the backbone on every full
canvas. This path computes the base image's C4 feature map ONCE per task,
and per copy recomputes the backbone only on a fixed window around the
painted rect, pasting the window's interior into a copy of the base map
(``AttrRCNN.heads_from_feats`` then pools detections from the patched
maps). Windows cover ~4-5× fewer pixels than the 640×1024 canvas — the
lever PERF.md identifies as the only route past the extraction roofline.

Exactness: a changed pixel influences features within the backbone's
receptive field RF. The paste trims RF cells from the window border (those
cells carry their whole RF inside the window), and eligibility requires
the paint to sit ≥ 2·RF from the window edge so every dirty cell (paint ±
RF) lands inside the pasted region. One-level exactness therefore needs
halo ≥ 2·RF(full backbone) — feasible only for shallow nets; the
TWO-LEVEL mode (``make_two_level_extract_fn``) needs only
2·RF(stem+stage1+stage2) = 154 px on X152 and is the production default.
Halos below the threshold are the approximate mode (``feature_drift``
quantifies it; ``fits`` routes oversized rects to the exact full path).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.models.detector.attr_rcnn import AttrRCNN, region_features_2054
from cpt_tpu.models.detector.config import DetectorConfig
from cpt_tpu.ops.render import paste_rects, to_detector_input

Array = jax.Array
STRIDE = 16


def backbone_receptive_field(cfg: DetectorConfig,
                             n_stages: Optional[int] = None) -> int:
    """Receptive-field RADIUS (input pixels) of the C4 body.

    Computed from the configured architecture (stem 7×7/s2 + 3×3/s2 maxpool,
    then one 3×3 conv per bottleneck; first block of each stage after the
    first is stride 2, carried by the 1×1 or the 3×3 per ``stride_in_1x1``).
    A painted pixel can influence features up to this radius away; windowed
    exactness requires the paint ≥ 2·RF from the window edge (see
    ``make_windowed_extract_fn``). Tiny test config → 21 px; X152-C4 →
    645 px (one-level windowed is approximate at any practical halo). With
    ``n_stages``, the radius through stem + the first n stages only — X152
    through stage 2 is just 77 px, which makes the TWO-LEVEL windowed path
    (early stages per copy, late stages on the patched map) exact at
    halo ≥ 154.
    """
    b = cfg.backbone
    radius, jump = 0, 1
    radius += 3 * jump; jump *= 2      # stem conv 7×7 stride 2
    radius += 1 * jump; jump *= 2      # stem maxpool 3×3 stride 2
    stage_blocks = b.stage_blocks[:n_stages]
    for i, blocks in enumerate(stage_blocks):
        for j in range(blocks):
            s = 2 if (i > 0 and j == 0) else 1
            if b.stride_in_1x1:
                jump *= s              # leading 1×1 takes the stride
                radius += jump         # then the 3×3 conv
            else:
                radius += jump         # 3×3 conv carries the stride
                jump *= s
    return radius


def window_origins(rects: np.ndarray, window: Tuple[int, int],
                   canvas_hw: Tuple[int, int], halo: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: per copy, the stride-aligned window origin centered on
    the copy's painted rect(s), clamped in-canvas → (origins [C, 2] (y, x),
    fits [C] bool). ``fits`` is False when the rect plus halo margin
    exceeds the window (caller falls back to the full-canvas path).

    Halo margins are WAIVED on window sides flush with the canvas edge: a
    flush slice edge sees the same zero padding as the full-canvas
    computation, so features are exact up to that edge (the paste fns
    blend per-side accordingly). This keeps near-edge and large cornered
    rects on the fast windowed path.
    """
    wh, ww = window
    ch, cw = canvas_hw
    c = rects.shape[0]
    origins = np.zeros((c, 2), np.int32)
    fits = np.zeros((c,), bool)
    if wh > ch or ww > cw:
        return origins, fits           # window exceeds canvas: full path
    for i in range(c):
        rs = rects[i].reshape(-1, 4)
        x1, y1 = rs[:, 0].min(), rs[:, 1].min()
        x2, y2 = rs[:, 2].max(), rs[:, 3].max()
        cy, cx = (y1 + y2) / 2, (x1 + x2) / 2
        oy = int(np.clip(cy - wh / 2, 0, max(ch - wh, 0))) // STRIDE * STRIDE
        ox = int(np.clip(cx - ww / 2, 0, max(cw - ww, 0))) // STRIDE * STRIDE
        origins[i] = (oy, ox)
        top = (y1 >= oy + halo) or (oy == 0 and y1 >= oy)
        bot = (y2 <= oy + wh - halo) or (oy + wh >= ch and y2 <= oy + wh)
        left = (x1 >= ox + halo) or (ox == 0 and x1 >= ox)
        right = (x2 <= ox + ww - halo) or (ox + ww >= cw and x2 <= ox + ww)
        fits[i] = top and bot and left and right
    return origins, fits


def make_base_features_fn(model: AttrRCNN, cfg: DetectorConfig):
    """Jitted: uint8 canvas → C4 feature map (once per task)."""

    @jax.jit
    def fn(params, image_u8):
        x = to_detector_input(image_u8, cfg.input.pixel_mean,
                              dtype=model.dtype)
        return model.apply(params, x, method=AttrRCNN.features)

    return fn


def mask_bboxes(masks: np.ndarray) -> np.ndarray:
    """Host-side: per-copy bounding boxes [C, 1, 4] of binary paint masks
    (empty mask → degenerate box at the origin), for ``window_origins``."""
    c = masks.shape[0]
    out = np.zeros((c, 1, 4), np.float32)
    for i in range(c):
        ys, xs = np.nonzero(masks[i])
        if ys.size:
            out[i, 0] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return out


def make_windowed_extract_fn(model: AttrRCNN, cfg: DetectorConfig, *,
                             window: Tuple[int, int] = (384, 512),
                             halo: int = 96,
                             inclusive_paint: bool = False,
                             with_masks: bool = False):
    """Jitted: per copy, recompute the backbone on the painted window and
    pool detections from the patched base map. Same outputs as
    ``make_extract_fn`` (feats [C, M, 2054], labels, scores). With
    ``with_masks``, each copy additionally alpha-pastes a binary mask
    ([C, H, W] full-canvas; cropped on device).

    Exactness needs TWO margins: pasted cells must have their receptive
    field inside the window (trim = RF), and every DIRTY cell (within RF
    of the paint) must fall inside the pasted region — so the paint must
    sit ≥ 2·RF from the window edge. ``halo`` is the paint-to-edge margin
    ``window_origins`` enforces; exactness therefore requires
    ``halo ≥ 2·RF`` while the paste trims only RF."""
    from cpt_tpu.ops.render import paste_mask

    wh, ww = window
    rf = backbone_receptive_field(cfg)
    # paste trim: ceil(RF/stride) cells in the exact regime; in the
    # approximate regime (halo < RF, gated behind allow_approximate) fall
    # back to trimming the halo itself, as round 1 did
    t = min(-(-rf // STRIDE), halo // STRIDE)
    assert wh % STRIDE == 0 and ww % STRIDE == 0

    @jax.jit
    def fn(params, image_u8, base_feat, origins, rects, rect_valid,
           colors, copy_valid, dets, det_valid, hw, masks=None,
           mask_colors=None):
        def crop_and_paint(origin, rect_set, rv, color_set, m, mc):
            crop = jax.lax.dynamic_slice(image_u8,
                                         (origin[0], origin[1], 0),
                                         (wh, ww, 3))
            off = jnp.asarray([origin[1], origin[0], origin[1], origin[0]],
                              jnp.float32)
            crop = paste_rects(crop, rect_set - off[None], color_set, rv,
                               inclusive=inclusive_paint)
            if with_masks:
                mcrop = jax.lax.dynamic_slice(m, (origin[0], origin[1]),
                                              (wh, ww))
                crop = paste_mask(crop, mcrop, mc)
            return crop

        if not with_masks:
            masks = jnp.zeros((origins.shape[0], 1, 1), jnp.uint8)
            mask_colors = jnp.zeros((origins.shape[0], 4), jnp.uint8)
        crops = jax.vmap(crop_and_paint)(origins, rects, rect_valid,
                                         colors, masks,
                                         mask_colors)     # [C, wh, ww, 3]
        x = to_detector_input(crops, cfg.input.pixel_mean,
                              dtype=model.dtype)
        wfeats = model.apply(params, x,
                             method=lambda m, xs: m.backbone(xs))

        h_img, w_img = image_u8.shape[:2]

        def patch(origin, wf):
            # per-side blended paste: interior always; halo bands kept only
            # where the window is flush with the canvas edge (same padding
            # as the full-canvas computation -> exact to the edge)
            whc, wwc, chn = wf.shape
            oy, ox = origin[0] // STRIDE, origin[1] // STRIDE
            row = jnp.arange(whc)
            col = jnp.arange(wwc)
            row_ok = (((row >= t) | (origin[0] == 0))
                      & ((row < whc - t) | (origin[0] + wh >= h_img)))
            col_ok = (((col >= t) | (origin[1] == 0))
                      & ((col < wwc - t) | (origin[1] + ww >= w_img)))
            base_slice = jax.lax.dynamic_slice(base_feat, (oy, ox, 0),
                                               (whc, wwc, chn))
            blended = jnp.where((row_ok[:, None] & col_ok[None, :])[..., None],
                                wf.astype(base_feat.dtype), base_slice)
            return jax.lax.dynamic_update_slice(base_feat, blended,
                                                (oy, ox, 0))

        patched = jax.vmap(patch)(origins, wfeats)        # [C, h16, w16, ch]
        out = model.apply(params, patched, dets, det_valid,
                          method=AttrRCNN.heads_from_feats)
        feats = jax.vmap(lambda bf, bx: region_features_2054(
            bf.astype(jnp.float32), bx, hw))(out["box_features"],
                                             out["boxes"])
        feats = jnp.where(copy_valid[:, None, None], feats,
                          jnp.zeros_like(feats))
        return feats, out["labels"], out["scores"]

    return fn


def make_base_early_fn(model: AttrRCNN, cfg: DetectorConfig,
                       split_stage: int = 2):
    """Jitted: uint8 canvas → early feature map (stem + first
    ``split_stage`` stages; stride 4·2^(split-1)), once per task."""

    @jax.jit
    def fn(params, image_u8):
        x = to_detector_input(image_u8, cfg.input.pixel_mean,
                              dtype=model.dtype)
        return model.apply(
            params, x[None],
            method=lambda m, xs: m.backbone.up_to(xs, split_stage))[0]

    return fn


def make_two_level_extract_fn(model: AttrRCNN, cfg: DetectorConfig, *,
                              window: Tuple[int, int] = (512, 640),
                              halo: int = 160, split_stage: int = 2,
                              inclusive_paint: bool = False,
                              with_masks: bool = False,
                              cascade: bool = False,
                              cascade_cap: int = 16):
    """Two-level EXACT windowed extraction.

    Per copy, only stem + the first ``split_stage`` stages are recomputed
    on the painted window; the trimmed interior pastes into the cached
    base early map and the remaining stages + heads run on the full
    (patched) map. Because the receptive field through the early stages is
    small (77 px for X152 at split 2), ``halo >= 2 * backbone_receptive_
    field(cfg, split_stage)`` makes the result EXACTLY equal to a full
    recompute — pasted cells carry their whole RF inside the window
    (trim = RF) and every dirty cell (paint + RF) falls inside the pasted
    interior — no approximation, unlike the one-level path whose
    exactness would need the FULL RF. Saves the early stages' cost (the window
    covers ~3.4× fewer pixels than a 640×1024 canvas) while the deep
    stage-3 stack stays exact by running on the whole map.

    ``cascade=True`` additionally runs the FIRST blocks of the deep stage
    on dirty-region windows: after the paste, copies differ from the base
    map only inside the pasted region, and each 3×3 block dilates that
    region by one cell per side — so block k can run on a
    ``(d0 + 2k + 2)``-cell window whose trimmed interior pastes into the
    base's block-k output (recomputed cheaply from ``base_feat`` inside
    the jit, shared across copies). Windows clamped at map edges stay
    exact because a flush slice edge sees the same zero padding as the
    full map. The cascade stops at the saturation block (dirty region
    reaches a map dimension) or ``cascade_cap``; remaining blocks run on
    the full per-copy map as before. All exact — but measured SLOWER at
    X152/640×1024/C=128 (99.5 vs 105.1 copies/s): the dirty windows are
    tiny odd-shaped maps (~17×25 cells) whose convs underfill the MXU by
    more than the ~26% FLOP saving recovers, so it defaults OFF; it may
    win at larger canvases where the windows stay a small fraction of a
    bigger map.

    Same signature/outputs as ``make_windowed_extract_fn``.
    """
    from cpt_tpu.ops.render import paste_mask

    wh, ww = window
    map_stride = 4 * 2 ** (split_stage - 1)
    rf = backbone_receptive_field(cfg, split_stage)
    # trim = ceil(RF/stride) cells (pasted cells exact); halo >= 2*RF
    # additionally guarantees every dirty cell lies inside the paste
    t = -(-rf // map_stride)
    assert wh % STRIDE == 0 and ww % STRIDE == 0
    assert halo >= 2 * rf, (
        f"two-level windowed requires halo ({halo}) >= 2x early-stage RF "
        f"(2x{rf}) for exactness: pasted cells need RF inside the window "
        f"AND dirty cells (paint+RF) must fall inside the pasted interior")

    @jax.jit
    def fn(params, image_u8, base_feat, origins, rects, rect_valid,
           colors, copy_valid, dets, det_valid, hw, masks=None,
           mask_colors=None):
        def crop_and_paint(origin, rect_set, rv, color_set, m, mc):
            crop = jax.lax.dynamic_slice(image_u8,
                                         (origin[0], origin[1], 0),
                                         (wh, ww, 3))
            off = jnp.asarray([origin[1], origin[0], origin[1], origin[0]],
                              jnp.float32)
            crop = paste_rects(crop, rect_set - off[None], color_set, rv,
                               inclusive=inclusive_paint)
            if with_masks:
                mcrop = jax.lax.dynamic_slice(m, (origin[0], origin[1]),
                                              (wh, ww))
                crop = paste_mask(crop, mcrop, mc)
            return crop

        if not with_masks:
            masks = jnp.zeros((origins.shape[0], 1, 1), jnp.uint8)
            mask_colors = jnp.zeros((origins.shape[0], 4), jnp.uint8)
        crops = jax.vmap(crop_and_paint)(origins, rects, rect_valid,
                                         colors, masks, mask_colors)
        x = to_detector_input(crops, cfg.input.pixel_mean,
                              dtype=model.dtype)
        wfeats = model.apply(
            params, x,
            method=lambda m, xs: m.backbone.up_to(xs, split_stage))

        h_img, w_img = image_u8.shape[:2]

        def patch(origin, wf):
            # per-side blended paste (see one-level patch): halo bands
            # survive on window sides flush with the canvas edge, where
            # the window's padding equals the full canvas's
            whc, wwc, chn = wf.shape
            oy, ox = origin[0] // map_stride, origin[1] // map_stride
            row = jnp.arange(whc)
            col = jnp.arange(wwc)
            row_ok = (((row >= t) | (origin[0] == 0))
                      & ((row < whc - t) | (origin[0] + wh >= h_img)))
            col_ok = (((col >= t) | (origin[1] == 0))
                      & ((col < wwc - t) | (origin[1] + ww >= w_img)))
            base_slice = jax.lax.dynamic_slice(base_feat, (oy, ox, 0),
                                               (whc, wwc, chn))
            blended = jnp.where((row_ok[:, None] & col_ok[None, :])[..., None],
                                wf.astype(base_feat.dtype), base_slice)
            return jax.lax.dynamic_update_slice(base_feat, blended,
                                                (oy, ox, 0))

        patched = jax.vmap(patch)(origins, wfeats)   # [C, h8, w8, ch]

        n_deep = cfg.backbone.stage_blocks[split_stage]

        def block_k(v, k):
            return model.apply(
                params, v,
                method=lambda m, xs: m.backbone.stages[split_stage]
                .apply_block(xs, k))

        def later_stages(v):
            return model.apply(
                params, v,
                method=lambda m, xs: m.backbone.from_stage(
                    xs, split_stage + 1))

        # dirty-region size at the deep stage's post-stride map; the FULL
        # window extent (not interior) since edge-flush pastes may write
        # into the halo bands
        p8h, p8w = wh // map_stride, ww // map_stride
        d0h, d0w = p8h // 2 + 3, p8w // 2 + 3

        if not cascade:
            c4 = later_stages(model.apply(
                params, patched,
                method=lambda m, xs: m.backbone.stages[split_stage](xs)))
        else:
            cur = block_k(patched, 0)            # [C, H16, W16, ch3]
            h16, w16, ch3 = cur.shape[1:]
            k_max = min((h16 - d0h - 2) // 2, (w16 - d0w - 2) // 2,
                        n_deep - 1, cascade_cap)
            k_max = max(k_max, 0)
            # base per-block outputs, shared across copies (cheap: K+1
            # blocks on ONE map, amortized over the whole chunk)
            base_h = block_k(base_feat[None], 0)
            o16 = jnp.maximum(
                (origins // map_stride) // 2 - 1, 0)       # [C, 2]
            for k in range(1, k_max + 1):
                base_h = block_k(base_h, k)
                ukh, ukw = d0h + 2 * k, d0w + 2 * k
                skh, skw = ukh + 2, ukw + 2
                u0 = jnp.stack([
                    jnp.clip(o16[:, 0] - k, 0, h16 - ukh),
                    jnp.clip(o16[:, 1] - k, 0, w16 - ukw)], axis=1)
                s0 = jnp.stack([
                    jnp.clip(u0[:, 0] - 1, 0, h16 - skh),
                    jnp.clip(u0[:, 1] - 1, 0, w16 - skw)], axis=1)
                sls = jax.vmap(lambda cm, s: jax.lax.dynamic_slice(
                    cm, (s[0], s[1], 0), (skh, skw, ch3)))(cur, s0)
                outw = block_k(sls, k)
                base_k = base_h[0]

                def paste_k(ow, u, s):
                    upd = jax.lax.dynamic_slice(
                        ow, (u[0] - s[0], u[1] - s[1], 0), (ukh, ukw, ch3))
                    return jax.lax.dynamic_update_slice(
                        base_k, upd, (u[0], u[1], 0))

                cur = jax.vmap(paste_k)(outw, u0, s0)
            for k in range(k_max + 1, n_deep):
                cur = block_k(cur, k)
            c4 = later_stages(cur)
        out = model.apply(params, c4, dets, det_valid,
                          method=AttrRCNN.heads_from_feats)
        feats = jax.vmap(lambda bf, bx: region_features_2054(
            bf.astype(jnp.float32), bx, hw))(out["box_features"],
                                             out["boxes"])
        feats = jnp.where(copy_valid[:, None, None], feats,
                          jnp.zeros_like(feats))
        return feats, out["labels"], out["scores"]

    return fn


def feature_drift(exact, approx) -> dict:
    """Drift report between exact and windowed outputs (feats tuples)."""
    ef, el, es = (np.asarray(a) for a in exact)
    af, al, asc = (np.asarray(a) for a in approx)
    denom = np.maximum(np.abs(ef).max(), 1e-9)
    return {
        "feat_max_rel": float(np.abs(ef - af).max() / denom),
        "feat_mean_rel": float(np.abs(ef - af).mean() / denom),
        "label_agreement": float((el == al).mean()),
        "score_max_abs": float(np.abs(es - asc).max()),
    }


def make_sharded_windowed_fn(model: AttrRCNN, cfg: DetectorConfig, mesh,
                             two_level: bool = False, **kw):
    """Multi-chip windowed extraction: copies (and their windows) shard
    over the mesh's ``dp`` axis; base feature map and params replicate.
    Same linear-scaling argument as ``make_sharded_extract_fn`` — no
    collectives on the hot path. ``two_level=True`` shards the exact
    two-level path instead (same signature)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    base = (make_two_level_extract_fn(model, cfg, **kw) if two_level
            else make_windowed_extract_fn(model, cfg, **kw))
    copy_sharded = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())

    def fn(params, image_u8, base_feat, origins, rects, rect_valid,
           colors, copy_valid, dets, det_valid, hw, *margs):
        shard = lambda x: jax.device_put(x, copy_sharded)
        rep = lambda x: jax.device_put(x, replicated)
        per_copy = jax.tree_util.tree_map(
            shard, (origins, rects, rect_valid, colors, copy_valid) + margs)
        params, image_u8, base_feat, dets, det_valid, hw = (
            jax.tree_util.tree_map(
                rep, (params, image_u8, base_feat, dets, det_valid, hw)))
        return base(params, image_u8, base_feat, *per_copy[:5], dets,
                    det_valid, hw, *per_copy[5:])

    return fn
