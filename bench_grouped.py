"""Round-3 grouped-conv study on the real TPU (manual; not driver bench).

Measures the ResNeXt 32x8d grouped 3x3 legs at the real extraction stage
shapes in three formulations:

* ``xla``     — lax.conv_general_dilated(feature_group_count) [baseline]
* ``im2col``  — XLA-level conv_general_dilated_patches + group-batched
                dot_general (VERDICT r2 "next round" #1)
* ``pallas``  — slice-dense tap-accumulate Pallas kernel
                (ops/grouped_conv.py::grouped_conv3x3_sd)

Protocol per PERF.md: whole loop on device (lax.scan with a carried data
dependency), timed once warm.  TF/s reported against USEFUL FLOPs
(2*N*H*W*9*cpg*C) so formulations with internal FLOP waste are charged
for it.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cpt_tpu.ops.grouped_conv import (grouped_conv3x3_im2col,
                                      grouped_conv3x3_sd,
                                      grouped_conv3x3_tapdot,
                                      pack_weights_sd,
                                      reference_grouped_conv3x3)

# (name, N, H, W, C) at the 640x1024 extraction canvas, G=32
STAGES = [
    ("stage1", 64, 160, 256, 256),
    ("stage2", 64, 80, 128, 512),
    ("stage3", 64, 40, 64, 1024),
]
G = 32
ITERS = 20


def make_loop(f, w_args):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = f(c, *w_args)
            return c + y * jnp.asarray(1e-6, c.dtype), ()
        c, _ = lax.scan(body, x, None, length=ITERS)
        return c
    return loop


def time_loop(loop, x):
    loop(x).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    return (time.perf_counter() - t0) / ITERS


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    rng = np.random.RandomState(0)
    for name, n, h, w, ch in STAGES:
        if only and only not in name:
            continue
        cpg = ch // G
        useful = 2.0 * n * h * w * 9 * cpg * ch
        x = jnp.asarray(rng.randn(n, h, w, ch).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        w33 = jnp.asarray(rng.randn(3, 3, cpg, ch).astype(np.float32) * 0.05,
                          jnp.bfloat16)
        s = jnp.asarray(rng.rand(ch).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(ch).astype(np.float32))
        res = {"stage": name, "N": n, "cpg": cpg,
               "useful_gflop": round(useful / 1e9, 1)}

        def xla_f(c, w_, s_, b_):
            return reference_grouped_conv3x3(c, w_, s_, b_, G, 1, True)

        dt = time_loop(make_loop(xla_f, (w33, s, b)), x)
        res["xla_ms"] = round(dt * 1e3, 2)
        res["xla_tfs"] = round(useful / dt / 1e12, 1)

        if only != "pallas-only":
            # im2col patches are 9x the input; shrink N to fit HBM
            n_i = max(1, min(n, int(2.0e9 / (h * w * ch * 9 * 2))))
            xi = x[:n_i]

            def im_f(c, w_, s_, b_):
                return grouped_conv3x3_im2col(c, w_, s_, b_, G, 1, True)

            dt = time_loop(make_loop(im_f, (w33, s, b)), xi)
            u_i = useful * n_i / n
            res["im2col_N"] = n_i
            res["im2col_ms"] = round(dt * 1e3, 2)
            res["im2col_tfs"] = round(u_i / dt / 1e12, 1)

        def td_f(c, w_, s_, b_):
            return grouped_conv3x3_tapdot(c, w_, s_, b_, G, True)

        dt = time_loop(make_loop(td_f, (w33, s, b)), x)
        res["tapdot_ms"] = round(dt * 1e3, 2)
        res["tapdot_tfs"] = round(useful / dt / 1e12, 1)

        wd = pack_weights_sd(w33, G).astype(jnp.bfloat16)
        for tag, md in (("pallas", "dots9"), ("pallas_cat9", "cat9")):
            def pl_f(c, wd_, s_, b_, _md=md):
                return grouped_conv3x3_sd(c, None, s_, b_, G, True,
                                          packed=wd_, mode=_md)

            # correctness spot-check at tiny N before timing
            got = pl_f(x[:1], wd, s, b)
            ref = xla_f(x[:1], w33, s, b)
            err = float(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32)).max())
            res[f"{tag}_max_abs_err"] = round(err, 4)
            dt = time_loop(make_loop(pl_f, (wd, s, b)), x)
            res[f"{tag}_ms"] = round(dt * 1e3, 2)
            res[f"{tag}_tfs"] = round(useful / dt / 1e12, 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
