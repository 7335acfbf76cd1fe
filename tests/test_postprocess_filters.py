"""NMS_FILTER 0/1 post-processing variants vs numpy transcriptions of the
reference algorithms (inference.py:188-308)."""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.models.detector.heads import (postprocess_per_class,
                                           postprocess_per_class_with_retry,
                                           postprocess_peter)
from cpt_tpu.structures.boxes import decode_boxes

from golden_ops import nms_ref


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _setup(rng, n=24, c=5):
    cfg = tiny_detector_config()
    cfg = dataclasses.replace(
        cfg, roi_heads=dataclasses.replace(cfg.roi_heads, num_classes=c,
                                           detections_per_img=8,
                                           min_detections_per_img=2,
                                           score_thresh=0.25))
    logits = rng.randn(n, c).astype(np.float32) * 2
    deltas = rng.randn(n, c * 4).astype(np.float32) * 0.05
    x1 = rng.uniform(0, 40, n)
    y1 = rng.uniform(0, 40, n)
    props = np.stack([x1, y1, x1 + rng.uniform(5, 20, n),
                      y1 + rng.uniform(5, 20, n)], 1).astype(np.float32)
    feats = rng.randn(n, 6).astype(np.float32)
    hw = np.asarray([64, 64])
    return cfg, logits, deltas, props, feats, hw


def _decode_clip_np(cfg, logits, deltas, props, hw):
    prob = _softmax(logits)
    n, c = prob.shape
    dec = np.array(decode_boxes(jnp.asarray(deltas), jnp.asarray(props),
                                cfg.roi_heads.bbox_reg_weights),
                   copy=True).reshape(n, c, 4)
    dec[..., 0::2] = dec[..., 0::2].clip(0, hw[1] - 1)
    dec[..., 1::2] = dec[..., 1::2].clip(0, hw[0] - 1)
    return prob, dec


def ref_filter_results(cfg, logits, deltas, props, hw):
    """numpy transcription of filter_results (NMS_FILTER=0)."""
    rh = cfg.roi_heads
    prob, dec = _decode_clip_np(cfg, logits, deltas, props, hw)
    n, c = prob.shape
    out = []
    for j in range(1, c):
        inds = np.where(prob[:, j] > rh.score_thresh)[0]
        if len(inds) == 0:
            continue
        keep = nms_ref(dec[inds, j], prob[inds, j], rh.nms_thresh)
        for k in keep:
            out.append((float(prob[inds[k], j]), j, inds[k]))
    out.sort(key=lambda t: -t[0])
    return out[: rh.detections_per_img]


def test_per_class_filter_matches_reference_transcription(rng):
    cfg, logits, deltas, props, feats, hw = _setup(rng)
    ref = ref_filter_results(cfg, logits, deltas, props, hw)

    out = postprocess_per_class(cfg, jnp.asarray(logits), jnp.asarray(deltas),
                                jnp.asarray(feats), jnp.asarray(props),
                                jnp.ones((len(props),), bool),
                                jnp.asarray(hw))
    valid = np.asarray(out["valid"])
    got = list(zip(np.asarray(out["scores"])[valid].tolist(),
                   np.asarray(out["labels"])[valid].tolist()))
    want = [(s, j) for s, j, _ in ref]
    assert len(got) == len(want)
    for (gs, gl), (ws, wl) in zip(got, want):
        assert gl == wl and abs(gs - ws) < 1e-5


def ref_filter_peter(cfg, logits, deltas, props, hw):
    rh = cfg.roi_heads
    prob, dec = _decode_clip_np(cfg, logits, deltas, props, hw)
    n, c = prob.shape
    mask = np.zeros((n, c), np.float32)
    for j in range(1, c):
        keep = nms_ref(dec[:, j], prob[:, j], 0.3)
        mask[keep, j] = 1
    dists = mask * prob
    dists[:, 0] = 0
    scores = dists.max(1)
    labels = dists.argmax(1)
    inds = np.where(scores > 0)[0]
    order = inds[np.argsort(-scores[inds], kind="stable")]
    num = int((scores[order] >= rh.score_thresh).sum())
    n_keep = min(max(num, rh.min_detections_per_img), rh.detections_per_img)
    n_keep = min(n_keep, len(order))
    kept = order[:n_keep]
    return [(float(scores[i]), int(labels[i])) for i in kept]


def test_peter_filter_matches_reference_transcription(rng):
    cfg, logits, deltas, props, feats, hw = _setup(rng, n=20, c=4)
    ref = ref_filter_peter(cfg, logits, deltas, props, hw)
    out = postprocess_peter(cfg, jnp.asarray(logits), jnp.asarray(deltas),
                            jnp.asarray(feats), jnp.asarray(props),
                            jnp.ones((len(props),), bool), jnp.asarray(hw))
    valid = np.asarray(out["valid"])
    got = list(zip(np.asarray(out["scores"])[valid].tolist(),
                   np.asarray(out["labels"])[valid].tolist()))
    assert len(got) == len(ref)
    for (gs, gl), (ws, wl) in zip(got, ref):
        assert gl == wl and abs(gs - ws) < 1e-5


def test_per_class_retry_lowers_threshold(rng):
    cfg, logits, deltas, props, feats, hw = _setup(rng)
    # impossible base threshold: nothing survives without the retry loop
    cfg = dataclasses.replace(
        cfg, roi_heads=dataclasses.replace(cfg.roi_heads, score_thresh=0.999,
                                           min_detections_per_img=3))
    out = postprocess_per_class_with_retry(
        cfg, jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(feats),
        jnp.asarray(props), jnp.ones((len(props),), bool), jnp.asarray(hw))
    assert int(np.asarray(out["valid"]).sum()) >= 3
