"""Fused-attention-block kernel study on the real TPU (manual; not driver
bench).

After the fused FFN (ops/fused_ffn.py) took scoring to 93% of the
silicon cap, the remaining non-matmul HBM traffic in the forward is the
attention sub-block: the [B, 12, S, S] f32 score/softmax tensors plus
QKV/context intermediates. ops/fused_attention.py keeps all of it in
VMEM. This measures, at the real scoring shapes (B=128, S=128, H=768,
bf16):

  * XLA reference attention sub-block (the model's einsum path) vs the
    fused kernel, tb (sequences per grid step) in {1, 2, 4, 8};
  * protocol: on-device scan with a carried data dependency consuming
    ALL output columns (PERF.md round-3 trap), timed warm; plus a
    single-call check (fresh inputs, drained queue, materialized
    result).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cpt_tpu.ops.fused_attention import (fused_attention_block,
                                         reference_attention_block)

B, S, H, NH = 128, 128, 768, 12
ITERS = 20
DT = jnp.bfloat16


def make_inputs(seed):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, S, H) * 0.5, DT)
    wqkv = jnp.asarray(rng.randn(H, 3 * H) * 0.03, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * H) * 0.02, jnp.float32)
    wo = jnp.asarray(rng.randn(H, H) * 0.03, jnp.float32)
    bo = jnp.asarray(rng.randn(H) * 0.02, jnp.float32)
    g = jnp.asarray(rng.rand(H) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    mask = (rng.rand(B, S) > 0.15).astype(np.float32)
    kb = jnp.asarray((1 - mask) * -10000.0, jnp.float32)
    return x, wqkv, bqkv, wo, bo, g, b, kb


def scan_loop(f, args):
    x0, rest = args[0], args[1:]

    @jax.jit
    def loop(x):
        def body(c, _):
            y = f(c, *rest)
            # consume ALL columns: the carry is a scaled full-output blend
            c = (c.astype(jnp.float32) * 0.9 +
                 y.astype(jnp.float32) * 0.1).astype(DT)
            return c, ()
        c, _ = lax.scan(body, x, None, length=ITERS)
        return c
    return loop, x0


def time_scan(f, args):
    loop, x0 = scan_loop(f, args)
    out = loop(x0)
    float(out.sum())            # drain
    t0 = time.perf_counter()
    out = loop(x0)
    val = float(out.sum())      # materialize inside the timed region
    dt = (time.perf_counter() - t0) / ITERS
    return dt, val


def time_single(f, args_list):
    jitted = jax.jit(f)
    out = jitted(*args_list[0])
    float(out.sum())
    times = []
    for args in args_list[1:]:
        float(args[0].sum())    # drain with a fresh dependency
        t0 = time.perf_counter()
        out = jitted(*args)
        float(out.sum())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    print(f"backend={jax.default_backend()} B={B} S={S} H={H}")
    args = make_inputs(0)

    ref_t, ref_val = time_scan(
        lambda x, *r: reference_attention_block(x, *r, num_heads=NH,
                                                eps=1e-12), args)
    print(f"XLA reference block: {ref_t*1e3:.3f} ms/call (chk {ref_val:.1f})")

    for tb in (1, 2, 4, 8):
        f = lambda x, *r: fused_attention_block(x, *r, NH, 1e-12, tb)
        t, val = time_scan(f, args)
        print(f"fused tb={tb}: {t*1e3:.3f} ms/call (chk {val:.1f}) "
              f"speedup {ref_t/t:.2f}x")

    # single-call sanity (includes relay dispatch)
    args_list = [make_inputs(s) for s in range(6)]
    t_ref = time_single(
        lambda x, *r: reference_attention_block(x, *r, num_heads=NH,
                                                eps=1e-12), args_list)
    t_fus = time_single(
        lambda x, *r: fused_attention_block(x, *r, NH, 1e-12, 4), args_list)
    print(f"single-call: ref {t_ref*1e3:.2f} ms, fused(tb=4) "
          f"{t_fus*1e3:.2f} ms")

    # numerics vs oracle on device
    out_f = jax.jit(lambda x, *r: fused_attention_block(
        x, *r, NH, 1e-12, 4))(*args)
    out_r = jax.jit(lambda x, *r: reference_attention_block(
        x, *r, num_heads=NH, eps=1e-12))(*args)
    d = jnp.abs(out_f.astype(jnp.float32) - out_r.astype(jnp.float32))
    rel = float(d.mean() / jnp.abs(out_r.astype(jnp.float32)).mean())
    print(f"device mean rel diff vs model path: {rel:.2e}")


if __name__ == "__main__":
    main()
