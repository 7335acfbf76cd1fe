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


def roi_pool_ref(feat, rois, spatial_scale, pooled):
    """Scalar RoIPool (transcription of ROIPool_cuda.cu semantics)."""
    n = rois.shape[0]
    h, w, c = feat.shape
    out = np.zeros((n, pooled, pooled, c), np.float32)
    for i, roi in enumerate(rois):
        x1 = int(round(roi[0] * spatial_scale))
        y1 = int(round(roi[1] * spatial_scale))
        x2 = int(round(roi[2] * spatial_scale))
        y2 = int(round(roi[3] * spatial_scale))
        roi_w = max(x2 - x1 + 1, 1)
        roi_h = max(y2 - y1 + 1, 1)
        for py in range(pooled):
            for px in range(pooled):
                hs = min(max(y1 + (py * roi_h) // pooled, 0), h)
                he = min(max(y1 + -(-((py + 1) * roi_h) // pooled), 0), h)
                ws = min(max(x1 + (px * roi_w) // pooled, 0), w)
                we = min(max(x1 + -(-((px + 1) * roi_w) // pooled), 0), w)
                if he > hs and we > ws:
                    out[i, py, px] = feat[hs:he, ws:we].max(axis=(0, 1))
    return out


def sigmoid_focal_loss_ref(logits, targets, gamma, alpha):
    """Scalar transcription of SigmoidFocalLoss_cuda.cu forward."""
    n, c = logits.shape
    out = np.zeros((n, c), np.float32)
    p = 1.0 / (1.0 + np.exp(-logits))
    for i in range(n):
        for j in range(c):
            cls = j + 1
            zp = float(targets[i] == cls)
            zn = float(targets[i] != cls and targets[i] >= 0)
            out[i, j] = (-zp * alpha * (1 - p[i, j]) ** gamma * np.log(max(p[i, j], 1e-12))
                         - zn * (1 - alpha) * p[i, j] ** gamma * np.log(max(1 - p[i, j], 1e-12)))
    return out
