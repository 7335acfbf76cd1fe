"""Stage-1 task builders: per-task colored-prompt ExtractTasks.

Parity with the reference color datasets (SURVEY §2b):
  * ``gqa_mark_task`` — paint the parsed question entity's box(es) with the
    6-color palette; meta carries the question-rewrite positions
    (``gqadataset.py:107-179``; inclusive extents ``max(x2-x1+1, 1)``)
  * ``vcr_color_task`` — paint segmentation masks of referenced entities
    with up to COLOR_D palette colors; meta carries obj_colors/obj_names
    keyed by sorted entity lists (``vcrdataset.py:120-288``)
  * ``vg_pair_task`` — subject red / object blue rects, one copy per pair
    (``vgdataset.py:93,134-158``)
  * ``parse_gqa_marks`` — rule-based grounding of the question entity to a
    detection box (functional equivalent of ``other/parse_gqa/myparse.py``,
    which matches question nouns against detection class names; documented
    simplification of the 330-line parser)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from cpt_tpu.data.prompts import CROSS_TASK_COLORS, vcr_entity_key
from cpt_tpu.engine.extract import ExtractTask


def gqa_mark_task(q_id: str, image_rgb: np.ndarray, image_hw, det_boxes,
                  to_mark: Sequence[Tuple[Sequence[float], Sequence[int]]],
                  n_color: int = 1,
                  palette=CROSS_TASK_COLORS) -> ExtractTask:
    """``to_mark``: [[box xyxy, char_positions], ...] from the question
    parser; up to ``n_color`` entities painted (one copy per question)."""
    marks = list(to_mark)[:n_color]
    k = max(len(marks), 1)
    rects = np.zeros((1, k, 4), np.float32)
    valid = np.zeros((1, k), bool)
    colors = np.zeros((1, k, 4), np.uint8)
    positions_and_colors = []
    for i, (box, char_pos) in enumerate(marks):
        rects[0, i] = box
        valid[0, i] = True
        colors[0, i] = palette[i][1]
        positions_and_colors.append([list(np.atleast_1d(char_pos).tolist()),
                                     palette[i][0]])
    return ExtractTask(
        key=str(q_id), image_rgb=image_rgb, image_hw=image_hw,
        det_boxes=np.asarray(det_boxes, np.float32),
        copy_rects=rects, copy_rect_valid=valid, copy_colors_rgba=colors,
        meta={"positions_and_colors": positions_and_colors},
    )


def rasterize_polygon(polygon: Sequence[Sequence[float]], h: int, w: int
                      ) -> np.ndarray:
    """Polygon [[x, y], ...] → binary mask [h, w] (PIL rasterization for
    parity with the reference's polygon handling)."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (w, h), 0)
    ImageDraw.Draw(img).polygon([(float(x), float(y)) for x, y in polygon],
                                outline=1, fill=1)
    return np.asarray(img, np.uint8)


def vcr_color_task(q_id: str, image_rgb: np.ndarray, image_hw, det_boxes,
                   entity_ids: Sequence[Sequence[int]],
                   entity_polygons: Dict[int, Sequence[Sequence[float]]],
                   entity_names: Dict[int, str],
                   color_d: int = 6, palette=CROSS_TASK_COLORS
                   ) -> ExtractTask:
    """``entity_ids``: entity-id lists referenced by the question/answers in
    order of appearance; the first ``color_d`` distinct entities get palette
    colors painted over their segmentation masks (single copy)."""
    h, w = image_rgb.shape[:2]
    mask = np.zeros((h, w), np.uint8)
    # composite all colored entities into one copy via sequential mask paints
    obj_colors: Dict[str, str] = {}
    obj_names: Dict[str, str] = {}
    color_cnt = 0
    masks, mask_colors = [], []
    for ids in entity_ids:
        key = vcr_entity_key(ids)
        if key not in obj_names:
            names = sorted({entity_names[i] for i in ids})
            obj_names[key] = ("people" if len(ids) > 1 and
                              names == ["person"] else " and ".join(
                                  entity_names[i] for i in sorted(ids)))
        if key in obj_colors or color_cnt >= color_d:
            continue
        m = np.zeros((h, w), np.uint8)
        for i in ids:
            if i in entity_polygons:
                m |= rasterize_polygon(entity_polygons[i], h, w)
        if m.any():
            masks.append(m)
            mask_colors.append(palette[color_cnt][1])
            obj_colors[key] = palette[color_cnt][0]
            color_cnt += 1

    # flatten to one composited mask pass per copy: paint sequentially by
    # running K mask copies through the extractor's single-mask channel is
    # wasteful; instead pre-composite on host (identical result because the
    # reference also pastes sequentially)
    composite = np.zeros((h, w, 3), np.int32)
    image = image_rgb.copy()
    for m, c in zip(masks, mask_colors):
        alpha = m.astype(np.int32) * c[3]
        fg = np.asarray(c[:3], np.int32)
        image = ((fg[None, None] * alpha[..., None]
                  + image.astype(np.int32) * (255 - alpha[..., None]) + 127)
                 // 255).astype(np.uint8)

    return ExtractTask(
        key=str(q_id), image_rgb=image, image_hw=image_hw,
        det_boxes=np.asarray(det_boxes, np.float32),
        copy_rects=np.zeros((1, 1, 4), np.float32),
        copy_rect_valid=np.zeros((1, 1), bool),
        copy_colors_rgba=np.zeros((1, 1, 4), np.uint8),
        meta={"obj_colors": obj_colors, "obj_names": obj_names},
    )


def vg_pair_task(img_name: str, image_rgb: np.ndarray, image_hw, det_boxes,
                 subj_idx: int, obj_idx: int, subj_name: str, obj_name: str,
                 rel_label: str,
                 pair_colors=((240, 0, 30, 127), (0, 10, 255, 127)),
                 color_names=("red", "blue")) -> ExtractTask:
    """One copy per (subject, object) pair: subject red, object blue
    (``vgdataset.py:134-158``); key = ``<img>_<s>_<o>``."""
    det_boxes = np.asarray(det_boxes, np.float32)
    rects = np.stack([det_boxes[subj_idx], det_boxes[obj_idx]])[None]
    colors = np.asarray(pair_colors, np.uint8)[None]
    return ExtractTask(
        key=f"{img_name}_{subj_idx}_{obj_idx}",
        image_rgb=image_rgb, image_hw=image_hw, det_boxes=det_boxes,
        copy_rects=rects, copy_rect_valid=np.ones((1, 2), bool),
        copy_colors_rgba=colors,
        meta={"subj_obj_names": [subj_name, obj_name],
              "colors": list(color_names), "rel_label": rel_label},
    )


def plain_task(img_key: str, image_rgb: np.ndarray, image_hw, det_boxes
               ) -> ExtractTask:
    """Uncolored extraction (GQA plain features / ImgDataset)."""
    n = len(det_boxes)
    return ExtractTask(
        key=str(img_key), image_rgb=image_rgb, image_hw=image_hw,
        det_boxes=np.asarray(det_boxes, np.float32),
        copy_rects=np.zeros((1, 1, 4), np.float32),
        copy_rect_valid=np.zeros((1, 1), bool),
        copy_colors_rgba=np.zeros((1, 1, 4), np.uint8),
    )


STOPWORDS = {
    "is", "are", "the", "a", "an", "what", "which", "who", "where", "how",
    "there", "that", "this", "of", "on", "in", "to", "and", "or", "do",
    "does", "you", "see", "any", "color", "kind", "type",
}


def parse_gqa_marks(question: str, det_boxes: Sequence[Sequence[float]],
                    det_names: Sequence[str], max_marks: int = 1
                    ) -> List[Tuple[List[float], List[int]]]:
    """Ground question entities to detection boxes by word/class-name match
    (functional equivalent of the reference's rule parser output
    ``to_mark.json``: [[box, char_positions], ...])."""
    marks = []
    lower_q = question.lower()
    words = lower_q.split()
    char_pos = 0
    positions = []
    for wt in words:
        positions.append(char_pos)
        char_pos += len(wt) + 1
    used = set()
    for wi, word in enumerate(words):
        stripped = word.strip("?.,")
        if stripped in STOPWORDS:
            continue
        for di, name in enumerate(det_names):
            if di in used:
                continue
            if stripped == name.lower() or stripped == name.lower() + "s":
                end = positions[wi] + len(stripped)
                marks.append(([float(v) for v in det_boxes[di]], [end]))
                used.add(di)
                break
        if len(marks) >= max_marks:
            break
    return marks
