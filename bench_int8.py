"""Round-3 int8 precision study on the real TPU (manual; not driver bench).

PERF.md's round-3 ceiling attribution is a *bf16* story (197 TF/s peak;
grouped legs at ~15 TF/s effective, dense 1x1s at ~65-117 TF/s, both at
their measured shape ceilings).  The v5e MXU also has a 394 TOP/s int8
path, so quantized inference is the one precision lever that analysis
does not close.  This measures whether XLA actually reaches higher
effective rates with int8 operands at the real extraction shapes:

* grouped 3x3 (G=32) at stage-1/2/3 shapes: int8 conv with
  preferred_element_type=int32 vs the bf16 baseline;
* dense 1x1 (stage-3 1024->1024): int8 dot_general vs bf16.

Protocol per PERF.md: whole loop on device (lax.scan with a carried data
dependency), timed once warm.  TF/s (TOP/s for int8) against useful
FLOPs 2*N*H*W*9*cpg*C (grouped) / 2*N*H*W*Cin*Cout (dense).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

STAGES = [
    ("stage1", 64, 160, 256, 256),
    ("stage2", 64, 80, 128, 512),
    ("stage3", 64, 40, 64, 1024),
]
G = 32
ITERS = 20


def make_loop(f, w, carry_dtype):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = f(c, w)
            # keep a data dependency; re-quantize y into the carry dtype
            upd = (y.astype(jnp.float32) * 1e-6).astype(jnp.float32)
            c = (c.astype(jnp.float32) + upd).astype(carry_dtype)
            return c, ()
        c, _ = lax.scan(body, x, None, length=ITERS)
        return c
    return loop


def time_loop(loop, x):
    loop(x).block_until_ready()
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    return (time.perf_counter() - t0) / ITERS


def grouped(dtype, acc):
    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=G,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)
    return f


def dense1x1(acc):
    def f(x, w):
        n, h, wd, c = x.shape
        y = lax.dot_general(x.reshape(n * h * wd, c), w,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=acc)
        return y.reshape(n, h, wd, -1)
    return f


def main():
    rng = np.random.RandomState(0)
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, n, h, w, ch in (STAGES if only in (None, "grouped") else []):
        cpg = ch // G
        useful = 2.0 * n * h * w * 9 * cpg * ch
        res = {"op": f"grouped3x3 {name}", "N": n, "cpg": cpg}
        xf = rng.randn(n, h, w, ch).astype(np.float32)
        wf = rng.randn(3, 3, cpg, ch).astype(np.float32)

        x16 = jnp.asarray(xf * 0.1, jnp.bfloat16)
        w16 = jnp.asarray(wf * 0.05, jnp.bfloat16)
        dt = time_loop(make_loop(grouped(jnp.bfloat16, jnp.bfloat16), w16,
                                 jnp.bfloat16), x16)
        res["bf16_ms"] = round(dt * 1e3, 2)
        res["bf16_tfs"] = round(useful / dt / 1e12, 1)

        x8 = jnp.asarray(np.clip(xf * 10, -127, 127), jnp.int8)
        w8 = jnp.asarray(np.clip(wf * 30, -127, 127), jnp.int8)
        try:
            dt = time_loop(make_loop(grouped(jnp.int8, jnp.int32), w8,
                                     jnp.int8), x8)
            res["int8_ms"] = round(dt * 1e3, 2)
            res["int8_tops"] = round(useful / dt / 1e12, 1)
        except Exception as e:  # noqa: BLE001 - report and continue
            res["int8_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(res), flush=True)

    # dense 1x1 legs at stage-3 shape, plus the head-sized matmul
    if only == "grouped":
        return
    for name, n, h, w, cin, cout in [
            ("stage3 1024->1024", 64, 40, 64, 1024, 1024),
            ("stage2 512->512", 64, 80, 128, 512, 512),
            ("head 2048->2048", 1, 128, 49, 2048, 2048)]:
        useful = 2.0 * n * h * w * cin * cout
        res = {"op": f"dense1x1 {name}"}
        xf = rng.randn(n, h, w, cin).astype(np.float32)
        wf = rng.randn(cin, cout).astype(np.float32)
        x16 = jnp.asarray(xf * 0.1, jnp.bfloat16)
        w16 = jnp.asarray(wf * 0.05, jnp.bfloat16)
        dt = time_loop(make_loop(dense1x1(jnp.bfloat16), w16, jnp.bfloat16),
                       x16)
        res["bf16_ms"] = round(dt * 1e3, 2)
        res["bf16_tfs"] = round(useful / dt / 1e12, 1)
        x8 = jnp.asarray(np.clip(xf * 10, -127, 127), jnp.int8)
        w8 = jnp.asarray(np.clip(wf * 30, -127, 127), jnp.int8)
        try:
            dt = time_loop(make_loop(dense1x1(jnp.int32), w8, jnp.int8), x8)
            res["int8_ms"] = round(dt * 1e3, 2)
            res["int8_tops"] = round(useful / dt / 1e12, 1)
        except Exception as e:  # noqa: BLE001
            res["int8_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
