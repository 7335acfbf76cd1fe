"""Standalone detector-extraction benchmark (slow compile — not part of the
driver's bench.py contract; run manually on TPU).

Measures the stage-1 hot path: full VinVL X152-C4 force-boxes extraction of
C colored copies (the per-candidate expansion of one RefCOCO query) at a
given canvas. Prints one JSON line per config.

Protocol per PERF.md: fresh inputs per call, queue drained, result
materialized inside the timed region.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cpt_tpu.engine.extract import make_extract_fn
    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
    from cpt_tpu.models.detector.config import VINVL_X152C4

    cfg = VINVL_X152C4
    model = AttrRCNN(cfg, dtype=jnp.bfloat16)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1024, 1024, 3)),
        jnp.asarray([800, 800]), jnp.zeros((m, 4)), jnp.ones((m,), bool))
    dets = jnp.asarray(np.sort(rng.uniform(0, 900, (m, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(m, 4).astype(np.float32))
    dv = jnp.ones((m,), bool)
    hw = jnp.asarray([800, 800])
    fn = make_extract_fn(model, cfg)

    configs = [(8, 640, 1024)]
    if "--full" in sys.argv:
        configs = [(8, 1024, 1024), (8, 640, 1024), (16, 640, 1024)]
    if "--c32" in sys.argv:
        configs = [(32, 640, 1024)]
    if "--c64" in sys.argv:
        configs = [(64, 640, 1024)]
    if "--c128" in sys.argv:
        configs = [(128, 640, 1024)]
    for c, h, w in configs:
        img = jnp.asarray(rng.randint(0, 256, (h, w, 3)).astype(np.uint8))
        rects = jnp.asarray(rng.uniform(0, 600, (c, 1, 4)).astype(np.float32))
        rv = jnp.ones((c, 1), bool)
        colors = jnp.asarray(np.tile(np.asarray([240, 0, 30, 127], np.uint8),
                                     (c, 1, 1)))
        cv = jnp.ones((c,), bool)
        masks = jnp.zeros((c, h, w), jnp.uint8)
        mc = jnp.zeros((c, 4), jnp.uint8)
        out = fn(params, img, rects, rv, colors, cv, masks, mc, dets, dv, hw)
        float(out[0].sum())   # compile + drain
        ts = []
        for _ in range(3):
            img = jnp.asarray(rng.randint(0, 256, (h, w, 3)).astype(np.uint8))
            float(img.sum())
            t0 = time.perf_counter()
            out = fn(params, img, rects, rv, colors, cv, masks, mc,
                     dets, dv, hw)
            float(out[0].sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({
            "metric": "vinvl_extraction_copies_per_sec",
            "value": round(c / dt, 2),
            "unit": "copies/s",
            "config": f"C={c} canvas={h}x{w} rois={m}",
            "ms_per_copy": round(dt / c * 1000, 1),
        }))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
