"""Stage-1 feature extraction: images → colored copies → AttrRCNN →
predictions.tsv.

TPU-native rework of reference ``engine/inference_ref.py`` /
``inference_vcr.py`` / ``inference_vg.py`` / ``inference.py`` + the color
datasets: the base image is uploaded ONCE per query; all candidate-region
copies are rendered on device (``ops/render``) and run through the detector
in fixed-size chunks under one jit — no PIL, no per-copy host round-trips
(the reference's dominant cost, SURVEY §3 hot loops).

Painting variants (one per reference dataset):
  * rects, one color per copy          — RefCOCO (``refcocodataset.py``)
  * K rects with per-rect colors       — GQA marks / VG subj-obj pairs
  * binary masks with per-mask colors  — RefCOCO RLE / VCR polygons

Output rows are bit-compatible with the reference TSV interchange
(``inference_ref.py:95-192``); per-task payload layouts are produced by the
task builders in ``cpt_tpu.data.stage1_tasks``.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import time
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.models.detector.attr_rcnn import AttrRCNN, region_features_2054
from cpt_tpu.models.detector.config import DetectorConfig
from cpt_tpu.ops.render import paste_mask, paste_rects, to_detector_input
from cpt_tpu.structures.boxes import pad_boxes
from cpt_tpu.utils.tsv import encode_feature, tsv_writer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ExtractTask:
    """One query: base image + candidate boxes + per-copy paint ops.

    Each copy paints up to K rects (``copy_rects [n_copies, K, 4]`` +
    ``copy_rect_valid [n_copies, K]``) and/or one binary mask
    (``copy_masks [n_copies, H, W]``) with per-op RGBA colors.
    """

    key: str
    image_rgb: np.ndarray                  # [H, W, 3] uint8 (canvas-padded)
    image_hw: Sequence[int]                # true (h, w)
    det_boxes: np.ndarray                  # [n_dets, 4] xyxy inclusive
    caption: str = ""
    copy_rects: Optional[np.ndarray] = None        # [n_copies, K, 4]
    copy_rect_valid: Optional[np.ndarray] = None   # [n_copies, K]
    copy_colors_rgba: Optional[np.ndarray] = None  # [n_copies, K, 4] uint8
    copy_masks: Optional[np.ndarray] = None        # [n_copies, H, W] uint8
    copy_mask_colors: Optional[np.ndarray] = None  # [n_copies, 4] uint8
    copy_color_names: Optional[List[List[str]]] = None
    meta: Optional[dict] = None            # task-specific payload fields

    @property
    def n_copies(self) -> int:
        if self.copy_rects is not None:
            return len(self.copy_rects)
        if self.copy_masks is not None:
            return len(self.copy_masks)
        return 1  # plain (uncolored) extraction


def make_extract_fn(model: AttrRCNN, cfg: DetectorConfig, *,
                    inclusive_paint: bool = False,
                    with_masks: bool = False,
                    with_attributes: bool = False):
    """Jitted chunk extractor over C copies with K rects each (+opt mask)."""

    @jax.jit
    def fn(params, image_u8, rects, rect_valid, colors, copy_valid,
           masks, mask_colors, dets, det_valid, hw):
        def render_one(rect_set, rv, color_set, m, mc):
            img = paste_rects(image_u8, rect_set, color_set, rv,
                              inclusive=inclusive_paint)
            if with_masks:
                img = paste_mask(img, m, mc)
            return img

        copies = jax.vmap(render_one)(rects, rect_valid, colors, masks,
                                      mask_colors)
        x = to_detector_input(copies, cfg.input.pixel_mean, dtype=model.dtype)

        # all copies go through the backbone/heads as ONE batch — the MXU
        # runs ~2.5x faster than per-copy serialization at these shapes
        out = model.apply(params, x, hw, dets, det_valid,
                          with_attributes=with_attributes,
                          method=model.forward_batch_force)
        feats = jax.vmap(lambda bf, bx: region_features_2054(
            bf.astype(jnp.float32), bx, hw))(out["box_features"],
                                             out["boxes"])
        feats = jnp.where(copy_valid[:, None, None], feats,
                          jnp.zeros_like(feats))
        return feats, out["labels"], out["scores"]

    return fn


def make_detect_fn(model: AttrRCNN, cfg: DetectorConfig, *,
                   with_attributes: bool = True):
    """Jitted plain RPN-mode detection + feature extraction (the reference's
    generic ``engine/inference.py`` path)."""

    @jax.jit
    def fn(params, image_u8, anchors, hw):
        x = to_detector_input(image_u8, cfg.input.pixel_mean,
                              dtype=model.dtype)
        out = model.apply(params, x, hw, anchors=anchors,
                          with_attributes=with_attributes)
        feats = region_features_2054(
            out["box_features"].astype(jnp.float32), out["boxes"], hw)
        return (feats, out["boxes"], out["labels"], out["scores"],
                out["valid"], out.get("attr_logits"))

    return fn


class Extractor:
    """Host-side driver: chunks copies, invokes the jitted extractor, and
    assembles per-task TSV rows."""

    # largest measured-safe chunk: with RoI-slot head chunking
    # (roi_heads.head_chunk) C=128 at 640×1024 fits v5e HBM and is the
    # measured throughput knee (90.8 copies/s vs 84.4 at C=96; C=64 OOM
    # limit before chunking) → budget ≈ 128 · 640 · 1024 pixels per chunk
    AUTO_CHUNK_PIXEL_BUDGET = 128 * 640 * 1024

    def __init__(self, model: AttrRCNN, params, cfg: DetectorConfig,
                 labelmap: Optional[Dict[int, str]] = None,
                 copies_per_chunk: Optional[int] = 4,
                 inclusive_paint: bool = False,
                 with_masks: bool = False,
                 windowed: bool = False,
                 window: tuple = (512, 640), halo: int = 160,
                 allow_approximate: bool = False,
                 mesh=None):
        """``copies_per_chunk=None`` → auto: the largest power-of-two chunk
        whose canvas pixels fit the measured HBM budget per bucket.
        ``windowed=True`` enables windowed-recompute reuse
        (``engine/windowed.py`` — ~1.7×; see PERF.md) for rect-painted
        copies whose rect fits the window; others fall back to the exact
        full path. Safety rail: windowed features are exact only when
        ``halo >= 2*backbone_receptive_field(cfg, ...)``; when they would be
        approximate the Extractor falls back to the exact path unless
        ``allow_approximate=True``, in which case it proceeds and
        auto-measures ``feature_drift`` on the first windowed task."""
        self.model = model
        self.params = params
        self.cfg = cfg
        self.labelmap = labelmap or {}
        self.chunk = copies_per_chunk
        self.with_masks = with_masks
        self.mesh = mesh
        if mesh is not None:
            self.fn = make_sharded_extract_fn(
                model, cfg, mesh, inclusive_paint=inclusive_paint,
                with_masks=with_masks)
        else:
            self.fn = make_extract_fn(model, cfg,
                                      inclusive_paint=inclusive_paint,
                                      with_masks=with_masks)
        self.windowed = windowed
        self._windowed_approx = False
        self._drift_logged = False
        self.windowed_mode = None
        if windowed:
            from cpt_tpu.engine.windowed import backbone_receptive_field

            split = 2
            rf_full = backbone_receptive_field(cfg)
            deep = len(cfg.backbone.stage_blocks) > split
            rf_early = (backbone_receptive_field(cfg, split)
                        if deep else rf_full)
            # exactness needs the paint >= 2*RF from the window edge:
            # trim RF (pasted cells carry their RF) + RF (dirty cells land
            # inside the paste)
            if halo >= 2 * rf_full:
                self.windowed_mode = "one_level"
            elif deep and halo >= 2 * rf_early:
                # two-level EXACT: early stages per copy (RF through them
                # is only rf_early px), late stages on the patched map
                self.windowed_mode = "two_level"
                logger.info(
                    "windowed extraction: two-level EXACT mode (halo %d >= "
                    "2x early-stage RF %d; full RF %d would need one-level)",
                    halo, rf_early, rf_full)
            elif allow_approximate:
                self.windowed_mode = "one_level"
                self._windowed_approx = True
                logger.warning(
                    "windowed extraction is APPROXIMATE for this backbone "
                    "(halo %d < 2x receptive-field radius %d px); "
                    "proceeding per allow_approximate=True — feature_drift "
                    "will be measured on the first task", halo, rf_full)
            else:
                logger.warning(
                    "windowed extraction disabled: halo %d < 2x backbone "
                    "receptive-field radius %d px (and < 2x early-stage "
                    "RF %d for the exact two-level mode). Falling back to "
                    "the exact full-canvas path (pass "
                    "allow_approximate=True to override).",
                    halo, rf_full, rf_early)
                self.windowed = windowed = False
        if windowed:
            from cpt_tpu.engine.windowed import (make_base_early_fn,
                                                 make_base_features_fn,
                                                 make_sharded_windowed_fn,
                                                 make_two_level_extract_fn,
                                                 make_windowed_extract_fn)

            # per-task auto window sizing: `window` may be one (h, w) or a
            # sequence of them; each copy routes to the SMALLEST window
            # its paint fits (smaller early-stage crops are ~3.5% faster,
            # PERF.md window sweep), the rest to the full path
            if window and isinstance(window[0], (tuple, list)):
                windows = sorted((tuple(w) for w in window),
                                 key=lambda w: w[0] * w[1])
            else:
                windows = [tuple(window)]
            self.windows = windows
            self.window = windows[-1]   # largest: eligibility envelope
            self.halo = halo
            two = self.windowed_mode == "two_level"
            self.base_fn = (make_base_early_fn(model, cfg, split) if two
                            else make_base_features_fn(model, cfg))
            self.wfns = []
            for win in windows:
                kw = dict(window=win, halo=halo,
                          inclusive_paint=inclusive_paint,
                          with_masks=with_masks)
                if two:
                    kw["split_stage"] = split
                if mesh is not None:
                    self.wfns.append(make_sharded_windowed_fn(
                        model, cfg, mesh, two_level=two, **kw))
                elif two:
                    self.wfns.append(make_two_level_extract_fn(model, cfg,
                                                               **kw))
                else:
                    self.wfns.append(make_windowed_extract_fn(model, cfg,
                                                              **kw))
            self.wfn = self.wfns[-1]
        self._base_batch_fn = None
        self.infer_seconds = 0.0
        self.n_copies = 0

    def class_name(self, label: int) -> str:
        return self.labelmap.get(int(label), str(int(label)))

    def chunk_for(self, h: int, w: int, remaining: Optional[int] = None
                  ) -> int:
        """Chunk size for a canvas: fixed if configured, else the largest
        power of two fitting the pixel budget (min 1, max 128), shrunk to
        the next power of two ≥ ``remaining`` so small tasks and tail
        chunks don't pay for padded copies (each size is one cached
        compile; ≤8 specializations per bucket)."""
        if self.chunk is not None:
            return self.chunk
        c = self.AUTO_CHUNK_PIXEL_BUDGET // (h * w)
        c = max(1, min(128, c))
        c = 1 << (c.bit_length() - 1)          # stable compile shapes
        if remaining is not None and remaining > 0:
            need = 1 << max(remaining - 1, 0).bit_length()  # next pow2 ≥ n
            c = min(c, max(need, 1))
        if self.mesh is not None:
            c = max(c, self.mesh.shape["dp"])   # shardable over dp
        return c

    def det_bucket_for(self, n_dets: int) -> int:
        """Static det-slot count for a task: smallest power of two ≥
        n_dets (min 8), capped at max_force_boxes. Right-sizes the
        stage-5 head (which runs on every slot) and the result download —
        a 10-det RefCOCO task at 128 slots wastes 92%% of both."""
        cap = self.cfg.max_force_boxes
        n = max(min(n_dets, cap), 1)
        b = 1 << max(n - 1, 0).bit_length()
        return min(max(b, min(8, cap)), cap)

    def pick_bucket(self, h: int, w: int):
        """Smallest configured canvas bucket containing (h, w); each bucket
        shape is its own compiled specialization of the extract fn."""
        candidates = [b for b in self.cfg.input.buckets
                      if b[0] >= h and b[1] >= w]
        if not candidates:
            return (max(h, self.cfg.input.pad_h), max(w, self.cfg.input.pad_w))
        return min(candidates, key=lambda b: b[0] * b[1])

    def _canvas(self, task: ExtractTask):
        """Task image on its canvas bucket → (jnp image, (h, w))."""
        ih, iw = task.image_rgb.shape[:2]
        h, w = self.pick_bucket(ih, iw)
        if (h, w) != (ih, iw):
            canvas = np.zeros((h, w, 3), np.uint8)
            canvas[: min(ih, h), : min(iw, w)] = task.image_rgb[: h, : w]
            return jnp.asarray(canvas), (h, w)
        return jnp.asarray(task.image_rgb), (h, w)

    def base_maps(self, tasks: Sequence[ExtractTask],
                  pad_to: Optional[int] = None) -> list:
        """Cross-request base-pass batching (the serving lever named in
        PERF.md round 3): compute the windowed base maps of several tasks
        in ONE batched backbone call per canvas-bucket group (padded to
        the next power of two so compile count stays bounded). Feed the
        results back via ``extract_task(task, base=...)``. Single-image
        requests pay batch-1 latency; a loaded serving queue amortizes
        the dominant per-image base pass across requests.

        ``pad_to``: pad every multi-task group to this one batch size so
        a serving daemon compiles exactly ONE batched program regardless
        of how many requests each queue drain yields (a varying drain
        size would otherwise trigger a fresh multi-minute compile the
        first time each power-of-two batch appears).

        → list aligned with ``tasks`` (None entries when not windowed)."""
        if not self.windowed:
            return [None] * len(tasks)
        bases: list = [None] * len(tasks)
        images, groups = [], {}
        for i, t in enumerate(tasks):
            img, hw = self._canvas(t)
            images.append(img)
            groups.setdefault(hw, []).append(i)
        t0 = time.time()
        for idxs in groups.values():
            if len(idxs) == 1:
                bases[idxs[0]] = self.base_fn(self.params, images[idxs[0]])
                continue
            bp = 1 << (len(idxs) - 1).bit_length()
            if pad_to is not None and pad_to >= len(idxs):
                bp = pad_to
            if self._base_batch_fn is None:
                self._base_batch_fn = jax.jit(
                    jax.vmap(self.base_fn, in_axes=(None, 0)))
            batch = jnp.stack(
                [images[i] for i in idxs] +
                [jnp.zeros_like(images[idxs[0]])] * (bp - len(idxs)))
            out = self._base_batch_fn(self.params, batch)
            for j, i in enumerate(idxs):
                bases[i] = jax.tree_util.tree_map(lambda a, j=j: a[j], out)
        self.infer_seconds += time.time() - t0
        return bases

    def extract_task(self, task: ExtractTask, base=None):
        """→ (feats [n_copies, M, 2054], labels, scores) numpy.

        ``base``: optional precomputed windowed base map for this task
        (from ``base_maps``); ignored on the full path."""
        if self.windowed and (task.copy_rects is not None
                              or task.copy_masks is not None):
            return self._extract_task_windowed(task, base=base)
        m = self.det_bucket_for(len(task.det_boxes))
        dets, det_valid = pad_boxes(task.det_boxes, m)
        dets_j = jnp.asarray(dets)
        det_valid_j = jnp.asarray(det_valid)
        hw = jnp.asarray(task.image_hw, jnp.int32)
        image, (h, w) = self._canvas(task)

        n_copies = task.n_copies
        k = (task.copy_rects.shape[1] if task.copy_rects is not None else 1)

        all_out = ([], [], [])
        t0 = time.time()
        start = 0
        while start < n_copies:
            chunk = self.chunk_for(h, w, n_copies - start)
            end = min(start + chunk, n_copies)
            rects = np.zeros((chunk, k, 4), np.float32)
            rect_valid = np.zeros((chunk, k), bool)
            colors = np.zeros((chunk, k, 4), np.uint8)
            masks = np.zeros((chunk, h, w), np.uint8)
            mask_colors = np.zeros((chunk, 4), np.uint8)
            valid = np.zeros((chunk,), bool)
            valid[: end - start] = True
            if task.copy_rects is not None:
                rects[: end - start] = task.copy_rects[start:end]
                rect_valid[: end - start] = (
                    task.copy_rect_valid[start:end]
                    if task.copy_rect_valid is not None else True)
                colors[: end - start] = task.copy_colors_rgba[start:end]
            if task.copy_masks is not None:
                tm = task.copy_masks[start:end]
                masks[: end - start, : tm.shape[1], : tm.shape[2]] = (
                    tm[:, :h, :w])
                mask_colors[: end - start] = task.copy_mask_colors[start:end]
            out = self.fn(self.params, image, jnp.asarray(rects),
                          jnp.asarray(rect_valid), jnp.asarray(colors),
                          jnp.asarray(valid), jnp.asarray(masks),
                          jnp.asarray(mask_colors), dets_j, det_valid_j, hw)
            # keep device arrays: dispatch of the next chunk overlaps with
            # this one's execution; host conversion happens once at the end
            for buf, arr in zip(all_out, out):
                buf.append((arr, end - start))
            start = end
        gathered = tuple(
            np.concatenate([np.asarray(a)[:k] for a, k in buf])
            for buf in all_out)
        self.infer_seconds += time.time() - t0
        self.n_copies += n_copies
        return gathered

    def _extract_task_windowed(self, task: ExtractTask, base=None):
        """Windowed-recompute path: copies whose rect fits the window reuse
        the task's cached base feature map; the rest run the full path."""
        from cpt_tpu.engine.windowed import window_origins

        if self._windowed_approx and not self._drift_logged:
            # Auto drift harness: on the first windowed task of an
            # approximate run, also compute the exact features and log the
            # measured drift so the approximation is never silent.
            self._drift_logged = True
            from cpt_tpu.engine.windowed import feature_drift

            approx = self._extract_task_windowed(task)
            self.windowed = False
            try:
                exact = self.extract_task(task)
            finally:
                self.windowed = True
            drift = feature_drift(exact, approx)
            logger.warning("windowed feature_drift (first task, vs exact): "
                           "%s", drift)
            self.last_drift = drift
            return approx

        m = self.det_bucket_for(len(task.det_boxes))
        dets, det_valid = pad_boxes(task.det_boxes, m)
        dets_j = jnp.asarray(dets)
        det_valid_j = jnp.asarray(det_valid)
        hw = jnp.asarray(task.image_hw, jnp.int32)
        image, (h, w) = self._canvas(task)

        n = task.n_copies
        k = task.copy_rects.shape[1] if task.copy_rects is not None else 1
        rects_all = (task.copy_rects if task.copy_rects is not None
                     else np.zeros((n, k, 4), np.float32))
        colors_all = (task.copy_colors_rgba
                      if task.copy_colors_rgba is not None
                      else np.zeros((n, k, 4), np.uint8))
        rv_all = (task.copy_rect_valid if task.copy_rect_valid is not None
                  else np.full((n, k), task.copy_rects is not None))
        # window target: union of painted rects and mask extents
        target = rects_all
        if task.copy_masks is not None:
            from cpt_tpu.engine.windowed import mask_bboxes

            mb = mask_bboxes(task.copy_masks)
            target = np.concatenate([target, mb], axis=1)
            # drop all-zero rect slots from the union bbox computation
            if task.copy_rects is None:
                target = mb
        # route each copy to the smallest window its paint fits
        n_win = len(self.windows)
        assign = np.full(n, n_win, np.int32)
        origins_per = []
        for wi, win in enumerate(self.windows):
            org, fits = window_origins(target, win, (h, w), self.halo)
            origins_per.append(org)
            newly = (assign == n_win) & fits
            assign[newly] = wi
        win_groups = [(np.nonzero(assign == wi)[0], wi)
                      for wi in range(n_win)]
        full_idx = np.nonzero(assign == n_win)[0]
        any_windowed = any(len(idx) for idx, _ in win_groups)

        fdim = None
        out_f = out_l = out_s = None
        t0 = time.time()
        if base is None and any_windowed:
            base = self.base_fn(self.params, image)

        def scatter(sel, chunk_out, count):
            nonlocal out_f, out_l, out_s, fdim
            f, l, s = (np.asarray(a)[:count] for a in chunk_out)
            if out_f is None:
                fdim = f.shape[-1]
                out_f = np.zeros((n, m, fdim), np.float32)
                out_l = np.zeros((n, m), np.int32)
                out_s = np.zeros((n, m), np.float32)
            out_f[sel] = f
            out_l[sel] = l
            out_s[sel] = s

        for idx, wi in win_groups + [(full_idx, None)]:
            use_window = wi is not None
            win = self.windows[wi] if use_window else None
            at = 0
            while at < len(idx):
                chunk = self.chunk_for(
                    win[0] if use_window else h,
                    win[1] if use_window else w,
                    len(idx) - at)
                sel = idx[at:at + chunk]
                pad = chunk - len(sel)
                rects = np.concatenate(
                    [rects_all[sel], np.zeros((pad, k, 4), np.float32)])
                rv = np.concatenate([rv_all[sel], np.zeros((pad, k), bool)])
                colors = np.concatenate(
                    [colors_all[sel], np.zeros((pad, k, 4), np.uint8)])
                cv = np.concatenate([np.ones(len(sel), bool),
                                     np.zeros(pad, bool)])
                masks_c = np.zeros((chunk, h, w), np.uint8)
                mcolors_c = np.zeros((chunk, 4), np.uint8)
                if task.copy_masks is not None:
                    tm = task.copy_masks[sel]
                    masks_c[:len(sel), :tm.shape[1], :tm.shape[2]] = (
                        tm[:, :h, :w])
                    mcolors_c[:len(sel)] = task.copy_mask_colors[sel]
                if use_window:
                    org = np.concatenate(
                        [origins_per[wi][sel], np.zeros((pad, 2), np.int32)])
                    margs = ((jnp.asarray(masks_c), jnp.asarray(mcolors_c))
                             if self.with_masks else ())
                    out = self.wfns[wi](self.params, image, base,
                                        jnp.asarray(org), jnp.asarray(rects),
                                        jnp.asarray(rv), jnp.asarray(colors),
                                        jnp.asarray(cv), dets_j, det_valid_j,
                                        hw, *margs)
                else:
                    out = self.fn(self.params, image, jnp.asarray(rects),
                                  jnp.asarray(rv), jnp.asarray(colors),
                                  jnp.asarray(cv), jnp.asarray(masks_c),
                                  jnp.asarray(mcolors_c),
                                  dets_j, det_valid_j, hw)
                scatter(sel, out, len(sel))
                at += chunk
        self.infer_seconds += time.time() - t0
        self.n_copies += n
        return out_f, out_l, out_s

    def boxlists_for(self, task: ExtractTask, feats, labels, scores
                     ) -> List[List[dict]]:
        n_dets = min(len(task.det_boxes), self.cfg.max_force_boxes)
        objs = []
        for c in range(task.n_copies):
            objs.append([{
                "rect": [float(v) for v in task.det_boxes[b]],
                "class": self.class_name(labels[c, b]),
                "conf": float(scores[c, b]),
                "feature": encode_feature(feats[c, b]),
            } for b in range(n_dets)])
        return objs

    # default cross-task base-batch for the dataset path: the per-task
    # base-map pass otherwise runs at batch 1 (3-6% MXU utilization at
    # X152 batch-1 shapes, PERF.md round 1); batching the next few tasks'
    # base passes into one call amortizes it (PERF.md round 4)
    RUN_BASE_BATCH = 8

    def run(self, tasks: Iterable[ExtractTask], out_tsv: str,
            payload_fn: Optional[Callable] = None,
            group_by_image: bool = True,
            base_batch: Optional[int] = None) -> None:
        """``payload_fn(task, objs) -> json-serializable payload``; defaults
        to the RefCOCO row layout. ``group_by_image`` packs consecutive
        queries over the same image into one device batch (fills large
        chunks — ~2x on real RefCOCO val where each image has several
        referring expressions of ~10 copies each). On the windowed path,
        the base-map passes of up to ``base_batch`` consecutive task
        groups run as ONE batched backbone call (``base_maps``) — the
        batch-1 base pass is otherwise ~20% of the two-level budget
        (PERF.md round 4); ``base_batch=1`` restores per-task passes."""
        payload_fn = payload_fn or refcoco_payload
        max_copies = self.chunk or 64
        if base_batch is None:
            base_batch = self.RUN_BASE_BATCH if self.windowed else 1

        def blocks(it, size):
            block = []
            for x in it:
                block.append(x)
                if len(block) >= size:
                    yield block
                    block = []
            if block:
                yield block

        def rows():
            groups = (_group_consecutive(tasks, max_copies)
                      if group_by_image else ([t] for t in tasks))
            for block in blocks(groups, max(base_batch, 1)):
                merged = [merge_tasks(g) for g in block]
                # pad_to pins ONE batched base program per canvas bucket
                # (a smaller trailing block would otherwise compile its
                # own power-of-two size — multi-minute on the relay)
                bases = (self.base_maps(merged, pad_to=base_batch)
                         if len(merged) > 1 else [None])
                for group, task_m, base in zip(block, merged, bases):
                    feats, labels, scores = self.extract_task(task_m,
                                                              base=base)
                    at = 0
                    for task in group:
                        n = task.n_copies
                        objs = self.boxlists_for(task, feats[at:at + n],
                                                 labels[at:at + n],
                                                 scores[at:at + n])
                        yield [task.key, json.dumps(payload_fn(task, objs))]
                        at += n

        tsv_writer(rows(), out_tsv)


# --- per-task payload layouts (what stage 2 decodes) -------------------------

def refcoco_payload(task: ExtractTask, objs) -> dict:
    rect_lists = [[r.tolist() for r, v in zip(rs, vs) if v]
                  for rs, vs in zip(task.copy_rects, task.copy_rect_valid)]
    return {"objects": [objs, task.caption, task.copy_color_names,
                        rect_lists]}


def gqa_payload(task: ExtractTask, objs) -> dict:
    # objects[1][0] = positions_and_colors for the question rewrite
    return {"objects": [objs[0], [task.meta["positions_and_colors"]]]}


def vcr_payload(task: ExtractTask, objs) -> dict:
    return {"objects": [objs[0], [task.meta["obj_colors"],
                                  task.meta["obj_names"]]]}


def vg_payload(task: ExtractTask, objs) -> dict:
    # the reference layout (inference_vg.py:179-181 writes
    # [[boxlist], color_names, pair_labels, rel]; its stage-2 reads
    # objs[0] / colors at [1] / names at [2], vg_cpt_dataset.py:103-121)
    return {"objects": [[objs[0]], task.meta["colors"],
                        task.meta["subj_obj_names"],
                        task.meta["rel_label"]]}


def plain_payload(task: ExtractTask, objs) -> dict:
    return {"objects": objs[0]}


def refcoco_task(key: str, image_rgb: np.ndarray, image_hw, det_boxes,
                 caption: str, color=("red", (240, 0, 30, 127))) -> ExtractTask:
    """RefCOCO scheme: one copy per candidate det, single color
    (``refcocodataset.py:216,260-288``)."""
    name, rgba = color
    n = len(det_boxes)
    det_boxes = np.asarray(det_boxes, np.float32)
    return ExtractTask(
        key=key, image_rgb=image_rgb, image_hw=image_hw,
        det_boxes=det_boxes, caption=caption,
        copy_rects=det_boxes[:, None, :],
        copy_rect_valid=np.ones((n, 1), bool),
        copy_colors_rgba=np.tile(np.asarray(rgba, np.uint8), (n, 1, 1)),
        copy_color_names=[[name]] * n,
    )


def refcoco_mask_task(key: str, image_rgb: np.ndarray, image_hw, det_boxes,
                      det_masks, caption: str,
                      color=("red", (240, 0, 30, 127))) -> ExtractTask:
    """RefCOCO SEG variant: candidate dets carry segmentation masks and
    each copy paints its mask instead of its rect
    (``refcocodataset.py:241-247`` — ``"rle" in rawdets[0]`` — and the
    ``draw_rectangles`` mask branch :294-300; boxes still ride along for
    the TSV payload/geometry). ``copy_rects`` keep the boxes for the
    payload and the windowed routing targets but paint at alpha 0 — an
    exact no-op under the integer blend ((img*255 + 127) // 255 == img).

    ``det_masks``: [n, H, W] binary masks (RLE decoded host-side)."""
    name, rgba = color
    n = len(det_boxes)
    det_boxes = np.asarray(det_boxes, np.float32)
    no_paint = np.asarray((rgba[0], rgba[1], rgba[2], 0), np.uint8)
    return ExtractTask(
        key=key, image_rgb=image_rgb, image_hw=image_hw,
        det_boxes=det_boxes, caption=caption,
        copy_rects=det_boxes[:, None, :],
        copy_rect_valid=np.ones((n, 1), bool),
        copy_colors_rgba=np.tile(no_paint, (n, 1, 1)),
        copy_color_names=[[name]] * n,
        copy_masks=np.asarray(det_masks, np.uint8),
        copy_mask_colors=np.tile(np.asarray(rgba, np.uint8), (n, 1)),
    )


def make_sharded_extract_fn(model: AttrRCNN, cfg: DetectorConfig, mesh, *,
                            inclusive_paint: bool = False,
                            with_masks: bool = False,
                            with_attributes: bool = False):
    """Multi-chip extraction: copies are sharded over the mesh's ``dp``
    axis (embarrassingly parallel — each chip renders + runs its slice of
    the copy batch; params replicated). Replaces the reference's
    per-process dataset sharding (``inference.py`` multi-GPU launch) with
    one jit over a ``jax.sharding.Mesh`` — scaling is linear in chips
    because no collective is on the hot path.

    The chunk size must be a multiple of ``mesh.shape['dp']``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    base = make_extract_fn(model, cfg, inclusive_paint=inclusive_paint,
                           with_masks=with_masks,
                           with_attributes=with_attributes)
    copy_sharded = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())

    def fn(params, image_u8, rects, rect_valid, colors, copy_valid,
           masks, mask_colors, dets, det_valid, hw):
        def shard_copies(x):
            return jax.device_put(x, copy_sharded)

        rects, rect_valid, colors, copy_valid, masks, mask_colors = (
            jax.tree_util.tree_map(
                shard_copies,
                (rects, rect_valid, colors, copy_valid, masks, mask_colors)))
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated), params)
        image_u8, dets, det_valid, hw = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated),
            (image_u8, dets, det_valid, hw))
        return base(params, image_u8, rects, rect_valid, colors,
                    copy_valid, masks, mask_colors, dets, det_valid, hw)

    return fn


def merge_tasks(tasks: List[ExtractTask]) -> ExtractTask:
    """Concatenate the copies of several queries over the SAME image and
    det boxes into one task (RefCOCO/GQA have many referring expressions
    per image; packing them fills large chunks — per-copy throughput at
    C=64 is ~2x C=16, PERF.md)."""
    t0 = tasks[0]
    if len(tasks) == 1:
        return t0
    for t in tasks[1:]:
        assert t.image_rgb is t0.image_rgb or np.array_equal(
            t.image_rgb, t0.image_rgb), "grouped tasks must share the image"
        assert np.array_equal(t.det_boxes, t0.det_boxes), (
            "grouped tasks must share det boxes")

    def cat(field):
        vals = [getattr(t, field) for t in tasks]
        if any(v is None for v in vals):
            assert all(v is None for v in vals), f"mixed {field} in group"
            return None
        return np.concatenate(vals)

    return dataclasses.replace(
        t0, key="|".join(t.key for t in tasks),
        copy_rects=cat("copy_rects"),
        copy_rect_valid=cat("copy_rect_valid"),
        copy_colors_rgba=cat("copy_colors_rgba"),
        copy_masks=cat("copy_masks"),
        copy_mask_colors=cat("copy_mask_colors"))


def _group_consecutive(tasks: Iterable[ExtractTask], max_copies: int):
    """Yield lists of consecutive tasks sharing an image (identity check —
    loaders memoize the decoded image per image_id), capped at max_copies."""
    group: List[ExtractTask] = []
    n = 0
    for task in tasks:
        same = (group and task.image_rgb is group[0].image_rgb
                and np.array_equal(task.det_boxes, group[0].det_boxes))
        if same and n + task.n_copies <= max_copies:
            group.append(task)
            n += task.n_copies
        else:
            if group:
                yield group
            group = [task]
            n = task.n_copies
    if group:
        yield group
