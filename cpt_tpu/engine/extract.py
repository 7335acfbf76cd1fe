"""Stage-1 feature extraction: images → colored copies → AttrRCNN →
predictions.tsv.

TPU-native rework of reference ``engine/inference_ref.py`` + the color
datasets: the base image is uploaded ONCE per query; all candidate-region
copies are rendered on device (``ops/render``) and run through the detector
in fixed-size chunks under one jit — no PIL, no per-copy host round-trips
(the reference's dominant cost, SURVEY §3 hot loops).

Output is bit-compatible with the reference TSV interchange: one row per
query, ``key \\t json{"objects": [per-copy boxlists, caption, colors,
rects]}`` with base64 float32 2054-d features
(``inference_ref.py:95-192``).
"""
from __future__ import annotations

import dataclasses
import functools
import json
import time
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.models.detector.attr_rcnn import AttrRCNN, region_features_2054
from cpt_tpu.models.detector.config import DetectorConfig
from cpt_tpu.ops.render import render_copies, to_detector_input
from cpt_tpu.structures.boxes import pad_boxes
from cpt_tpu.utils.tsv import encode_feature, tsv_writer


@dataclasses.dataclass
class ExtractTask:
    """One query: base image + candidate boxes + per-copy colored rects."""

    key: str
    image_rgb: np.ndarray          # [H, W, 3] uint8 (canvas-padded)
    image_hw: Sequence[int]        # true (h, w)
    det_boxes: np.ndarray          # [n_dets, 4] xyxy inclusive
    caption: str = ""
    # per copy: the rect(s) painted and their color names; rect index i is
    # det i for RefCOCO's one-color-per-copy scheme
    copy_rects: Optional[np.ndarray] = None     # [n_copies, 4]
    copy_colors_rgba: Optional[np.ndarray] = None  # [n_copies, 4] uint8
    copy_color_names: Optional[List[List[str]]] = None


def make_extract_fn(model: AttrRCNN, cfg: DetectorConfig, *,
                    copies_per_chunk: int = 4, inclusive_paint: bool = False,
                    with_attributes: bool = False):
    """Jitted chunk extractor.

    fn(params, image_u8, rects [C,4], colors [C,4], copy_valid [C],
       dets [M,4], det_valid [M], hw [2])
      → features [C, M, 2054] f32, labels [C, M] i32, scores [C, M] f32
    """

    @jax.jit
    def fn(params, image_u8, rects, colors, copy_valid, dets, det_valid, hw):
        copies = render_copies(image_u8, rects, colors,
                               inclusive=inclusive_paint)     # [C, H, W, 3]
        x = to_detector_input(copies, cfg.input.pixel_mean,
                              dtype=model.dtype)

        def one_copy(img):
            out = model.apply(params, img, hw, dets, det_valid,
                              with_attributes=with_attributes)
            feats = region_features_2054(
                out["box_features"].astype(jnp.float32), out["boxes"], hw)
            return feats, out["labels"], out["scores"]

        feats, labels, scores = jax.lax.map(one_copy, x)
        zero = jnp.zeros_like(feats)
        feats = jnp.where(copy_valid[:, None, None], feats, zero)
        return feats, labels, scores

    return fn


class Extractor:
    """Host-side driver: chunks copies, invokes the jitted extractor, and
    assembles reference-format TSV rows."""

    def __init__(self, model: AttrRCNN, params, cfg: DetectorConfig,
                 labelmap: Optional[Dict[int, str]] = None,
                 copies_per_chunk: int = 4, inclusive_paint: bool = False):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.labelmap = labelmap or {}
        self.chunk = copies_per_chunk
        self.fn = make_extract_fn(model, cfg,
                                  copies_per_chunk=copies_per_chunk,
                                  inclusive_paint=inclusive_paint)
        self.infer_seconds = 0.0
        self.n_copies = 0

    def class_name(self, label: int) -> str:
        return self.labelmap.get(int(label), str(int(label)))

    def extract_task(self, task: ExtractTask):
        """→ (objs, colors, rect_lists) in the reference row layout."""
        m = self.cfg.max_force_boxes
        dets, det_valid = pad_boxes(task.det_boxes, m)
        dets_j = jnp.asarray(dets)
        det_valid_j = jnp.asarray(det_valid)
        hw = jnp.asarray(task.image_hw, jnp.int32)
        image = jnp.asarray(task.image_rgb)

        n_copies = len(task.copy_rects)
        all_feats, all_labels, all_scores = [], [], []
        t0 = time.time()
        for start in range(0, n_copies, self.chunk):
            end = min(start + self.chunk, n_copies)
            rects = np.zeros((self.chunk, 4), np.float32)
            colors = np.zeros((self.chunk, 4), np.uint8)
            valid = np.zeros((self.chunk,), bool)
            rects[: end - start] = task.copy_rects[start:end]
            colors[: end - start] = task.copy_colors_rgba[start:end]
            valid[: end - start] = True
            feats, labels, scores = self.fn(
                self.params, image, jnp.asarray(rects), jnp.asarray(colors),
                jnp.asarray(valid), dets_j, det_valid_j, hw)
            feats = np.asarray(feats)[: end - start]
            all_feats.append(feats)
            all_labels.append(np.asarray(labels)[: end - start])
            all_scores.append(np.asarray(scores)[: end - start])
        self.infer_seconds += time.time() - t0
        self.n_copies += n_copies

        feats = np.concatenate(all_feats)     # [n_copies, M, 2054]
        labels = np.concatenate(all_labels)
        scores = np.concatenate(all_scores)

        n_dets = len(task.det_boxes)
        objs = []
        for c in range(n_copies):
            boxlist = []
            for b in range(min(n_dets, self.cfg.max_force_boxes)):
                boxlist.append({
                    "rect": [float(v) for v in task.det_boxes[b]],
                    "class": self.class_name(labels[c, b]),
                    "conf": float(scores[c, b]),
                    "feature": encode_feature(feats[c, b]),
                })
            objs.append(boxlist)
        colors = task.copy_color_names
        rect_lists = [[[float(v) for v in r]] for r in task.copy_rects]
        return objs, colors, rect_lists

    def run(self, tasks: Iterable[ExtractTask], out_tsv: str) -> None:
        def rows():
            for task in tasks:
                objs, colors, rect_lists = self.extract_task(task)
                payload = {"objects": [objs, task.caption, colors, rect_lists]}
                yield [task.key, json.dumps(payload)]

        tsv_writer(rows(), out_tsv)


def refcoco_task(key: str, image_rgb: np.ndarray, image_hw, det_boxes,
                 caption: str, color=("red", (240, 0, 30, 127))) -> ExtractTask:
    """RefCOCO scheme: one copy per candidate det, single color
    (``refcocodataset.py:216,260-288``)."""
    name, rgba = color
    n = len(det_boxes)
    return ExtractTask(
        key=key, image_rgb=image_rgb, image_hw=image_hw,
        det_boxes=np.asarray(det_boxes, np.float32),
        caption=caption,
        copy_rects=np.asarray(det_boxes, np.float32),
        copy_colors_rgba=np.tile(np.asarray(rgba, np.uint8), (n, 1)),
        copy_color_names=[[name]] * n,
    )
