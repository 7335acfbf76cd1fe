"""Scalar numpy reference implementations of RoIAlign and NMS.

Direct transcriptions of the documented kernel algorithms (legacy
``aligned=False`` RoIAlign; greedy score-descending NMS with exclusive-IoU
and strict-greater suppression — torchvision semantics). These serve as the
golden spec for the vectorized TPU ops: the implementations are independent
(per-sample scalar loops here vs separable matmuls / fori_loop there).
"""
import numpy as np


def bilinear(feat, y, x):
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2], feat.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return ((1 - ly) * (1 - lx) * feat[y0, x0] + (1 - ly) * lx * feat[y0, x1]
            + ly * (1 - lx) * feat[y1, x0] + ly * lx * feat[y1, x1])


def roi_align_ref(feat, rois, spatial_scale, pooled, sampling,
                  max_sampling=8):
    """feat [H, W, C]; rois [N, 4] xyxy → [N, pooled, pooled, C].

    ``sampling == 0`` = the CUDA kernel's adaptive grid
    (ceil(roi_extent / pooled) per axis)."""
    n = rois.shape[0]
    c = feat.shape[2]
    out = np.zeros((n, pooled, pooled, c), np.float32)
    for i, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * spatial_scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w = roi_w / pooled
        bin_h = roi_h / pooled
        if sampling == 0:
            s_y = min(int(np.ceil(bin_h)), max_sampling)
            s_x = min(int(np.ceil(bin_w)), max_sampling)
        else:
            s_y = s_x = sampling
        for py in range(pooled):
            for px in range(pooled):
                acc = np.zeros(c, np.float32)
                for sy in range(s_y):
                    for sx in range(s_x):
                        y = y1 + (py + (sy + 0.5) / s_y) * bin_h
                        x = x1 + (px + (sx + 0.5) / s_x) * bin_w
                        acc += bilinear(feat, y, x)
                out[i, py, px] = acc / (s_y * s_x)
    return out


def iou_xyxy(a, b, offset=0.0):
    area_a = max(a[2] - a[0] + offset, 0) * max(a[3] - a[1] + offset, 0)
    area_b = max(b[2] - b[0] + offset, 0) * max(b[3] - b[1] + offset, 0)
    iw = max(min(a[2], b[2]) - max(a[0], b[0]) + offset, 0)
    ih = max(min(a[3], b[3]) - max(a[1], b[1]) + offset, 0)
    inter = iw * ih
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def nms_ref(boxes, scores, thresh, offset=0.0):
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        for j in order:
            if not suppressed[j] and iou_xyxy(boxes[i], boxes[j], offset) > thresh:
                suppressed[j] = True
        suppressed[i] = True
    return keep
