"""Round-4 study: cost of the two-level windowed BASE pass (stem+stage1+
stage2 at stride 8) at batch 1 vs batched across tasks.

PERF.md round 3 attributes the two-level path's per-task overhead to the
base-map pass, which today runs at batch 1 once per task both in bench.py
and in ``Extractor.run`` (extract.py). ``Extractor.base_maps`` already
batches base passes across requests for the serving daemon; this study
measures what dataset-path (extract_features / bench) throughput gains
from the same amortization, at the real X152/640x1024 operating point.

Protocol: single-call wall-clock per PERF.md (queue drained via
float(sum) before t0, result materialized inside the timed region, fresh
random inputs per call, min of 3).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.engine.windowed import (make_base_early_fn,
                                     make_two_level_extract_fn,
                                     window_origins)
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import VINVL_X152C4

H, W = 640, 1024
C = 128


def timed(fn, fresh_args, n=3):
    ts = []
    for _ in range(n):
        args = fresh_args()
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: float(a.sum()) if hasattr(a, "sum") else a, out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = VINVL_X152C4
    model = AttrRCNN(cfg, dtype=jnp.bfloat16)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((256, 256, 3)),
        jnp.asarray([256, 256]), jnp.zeros((m, 4)), jnp.ones((m,), bool))
    base_fn = make_base_early_fn(model, cfg, 2)

    def fresh_img():
        img = jnp.asarray(rng.randint(0, 256, (H, W, 3)).astype(np.uint8))
        float(img.sum())  # drain
        return (params, img)

    base_fn(*fresh_img())  # compile
    t1 = timed(base_fn, fresh_img)
    print(f"base pass batch=1: {t1*1e3:.1f} ms", flush=True)

    for b in (4, 8):
        bfn = jax.jit(jax.vmap(base_fn, in_axes=(None, 0)))

        def fresh_batch(b=b):
            imgs = jnp.asarray(
                rng.randint(0, 256, (b, H, W, 3)).astype(np.uint8))
            float(imgs.sum())
            return (params, imgs)

        bfn(*fresh_batch())  # compile
        tb = timed(bfn, fresh_batch)
        print(f"base pass batch={b}: {tb*1e3:.1f} ms total = "
              f"{tb*1e3/b:.1f} ms/task (vs {t1*1e3:.1f} batch-1)",
              flush=True)

    # two-level windowed WITHOUT the base pass in the timed region
    window, halo = (512, 640), 160
    wfn = make_two_level_extract_fn(model, cfg, window=window, halo=halo)
    dets = jnp.asarray(np.sort(rng.uniform(0, 600, (m, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(m, 4).astype(np.float32))
    dv = jnp.ones((m,), bool)
    hw = jnp.asarray([H, W])
    mh = window[0] - 2 * halo - 40
    y1 = rng.uniform(halo + 21, H - halo - mh - 21, (C, 1))
    x1 = rng.uniform(halo + 21, W - halo - mh - 21, (C, 1))
    rects = np.stack([x1, y1, x1 + rng.uniform(20, mh, (C, 1)),
                      y1 + rng.uniform(20, mh, (C, 1))],
                     axis=2).reshape(C, 1, 4).astype(np.float32)
    origins, fits = window_origins(rects, window, (H, W), halo)
    assert fits.all()
    rv = jnp.ones((C, 1), bool)
    colors = jnp.asarray(np.tile(np.asarray([240, 0, 30, 127], np.uint8),
                                 (C, 1, 1)))
    cv = jnp.ones((C,), bool)
    args = (jnp.asarray(origins), jnp.asarray(rects), rv, colors, cv,
            dets, dv, hw)

    def fresh_wfn_args():
        img = jnp.asarray(rng.randint(0, 256, (H, W, 3)).astype(np.uint8))
        base = base_fn(params, img)
        jax.tree_util.tree_map(lambda a: float(a.sum()), base)
        return (params, img, base) + args

    wfn(*fresh_wfn_args())  # compile
    tw = timed(wfn, fresh_wfn_args)
    print(f"two-level wfn only (C={C}, no base): {tw*1e3:.1f} ms = "
          f"{C/tw:.1f} copies/s", flush=True)
    print(f"with batch-1 base per task (current bench): "
          f"{C/(tw+t1):.1f} copies/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
