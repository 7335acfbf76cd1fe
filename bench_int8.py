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


def ffn_study():
    """Scoring-stage FFN: fused bf16 Pallas kernel (production) vs an
    XLA-level W8A8 int8 FFN (dynamic act scales, int32 accum, f32
    gelu/LN epilogues — quantize overhead INCLUDED) at the bench shapes
    (BATCH=128 x seq=128 -> M=16384 tokens, 768->3072->768)."""
    from cpt_tpu.ops.fused_ffn import fused_ffn
    from cpt_tpu.ops.quant import int8_matmul, quant_act

    M, H, I = 128 * 128, 768, 3072
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(H, I).astype(np.float32) * 0.02)
    b1 = jnp.zeros((I,), jnp.float32)
    w2 = jnp.asarray(rng.randn(I, H).astype(np.float32) * 0.02)
    b2 = jnp.zeros((H,), jnp.float32)
    gamma = jnp.ones((H,), jnp.float32)
    beta = jnp.zeros((H,), jnp.float32)
    useful = 2.0 * M * H * I * 2  # both matmuls

    def fused(c, _):
        return fused_ffn(c, w1, b1, w2, b2, gamma, beta)

    def xla_int8(c, _):
        inter = int8_matmul(quant_act(c), w1, b1, out_dtype=jnp.float32)
        inter = jax.nn.gelu(inter, approximate=False).astype(jnp.bfloat16)
        out = int8_matmul(quant_act(inter), w2, b2, out_dtype=jnp.float32)
        y = out + c.astype(jnp.float32)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - jnp.square(mu)
        y = (y - mu) * jax.lax.rsqrt(var + 1e-12)
        return (y * gamma + beta).astype(jnp.bfloat16)

    def xla_bf16(c, _):
        inter = jnp.dot(c, w1.astype(jnp.bfloat16)) + b1.astype(jnp.bfloat16)
        inter = jax.nn.gelu(inter, approximate=False)
        out = jnp.dot(inter, w2.astype(jnp.bfloat16)) + b2.astype(jnp.bfloat16)
        y = (out + c).astype(jnp.float32)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - jnp.square(mu)
        y = (y - mu) * jax.lax.rsqrt(var + 1e-12)
        return (y * gamma + beta).astype(jnp.bfloat16)

    for tag, f in [("fused_bf16", fused), ("xla_bf16", xla_bf16),
                   ("xla_int8", xla_int8)]:
        @jax.jit
        def loop(c, f=f):
            def body(c, _):
                y = f(c, None)
                return (c + y * jnp.bfloat16(1e-3)).astype(jnp.bfloat16), ()
            c, _ = lax.scan(body, c, None, length=ITERS)
            return c
        dt = time_loop(loop, x)
        print(json.dumps({"op": f"ffn {tag}", "ms": round(dt * 1e3, 3),
                          "tfs": round(useful / dt / 1e12, 1)}), flush=True)


def ffn_pallas_study():
    """W8A8 int8 INSIDE the fused Pallas FFN kernel (per-tile dynamic
    activation quantize in VMEM, per-column weight scales, int32 accum)
    vs the production bf16 fused kernel. Result (PERF.md): Mosaic's
    int8 dot caps at ~86-90 TF/s (not the 394 TOP/s headline), so the
    full kernel nets only ~4-6% — inside relay noise. Validated
    numerically (cos 0.9999 vs bf16)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cpt_tpu.ops.fused_ffn import _gelu, fused_ffn

    M, H, F = 128 * 128, 768, 3072

    def kern(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
             g_ref, lb_ref, out_ref, *, eps):
        x = x_ref[:]
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        h = jnp.dot(xq, w1_ref[:], preferred_element_type=jnp.int32)
        h = h.astype(jnp.float32) * (sx * s1_ref[0]) + b1_ref[0]
        h = _gelu(h, False)
        sh = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8) / 127.0
        hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
        y = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sh * s2_ref[0]) + b2_ref[0] + xf
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        out_ref[:] = ((y - mu) * jax.lax.rsqrt(var + eps) * g_ref[0]
                      + lb_ref[0]).astype(x.dtype)

    def ffn_int8(x, w1q, s1, b1, w2q, s2, b2, gamma, beta, tm):
        row = lambda i: (i, 0)
        fixed = lambda i: (0, 0)
        return pl.pallas_call(
            functools.partial(kern, eps=1e-12), grid=(M // tm,),
            in_specs=[pl.BlockSpec((tm, H), row, memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(s, fixed, memory_space=pltpu.VMEM)
               for s in ((H, F), (1, F), (1, F), (F, H), (1, H), (1, H),
                         (1, H), (1, H))],
            out_specs=pl.BlockSpec((tm, H), row, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * M * H * F, bytes_accessed=4 * M * H,
                transcendentals=M * F),
        )(x, w1q, s1.reshape(1, F), b1.reshape(1, F), w2q,
          s2.reshape(1, H), b2.reshape(1, H), gamma.reshape(1, H),
          beta.reshape(1, H))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.02)
    b1, b2 = jnp.zeros((F,), jnp.float32), jnp.zeros((H,), jnp.float32)
    gamma, beta = jnp.ones((H,), jnp.float32), jnp.zeros((H,), jnp.float32)

    def qw(w):
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
        return jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s

    w1q, s1 = qw(w1)
    w2q, s2 = qw(w2)
    useful = 4.0 * M * H * F

    ref = np.asarray(fused_ffn(x, w1, b1, w2, b2, gamma, beta),
                     np.float32).ravel()
    for tag, f in [
            ("pallas_int8_tm1024",
             lambda c: ffn_int8(c, w1q, s1, b1, w2q, s2, b2, gamma, beta,
                                1024)),
            ("pallas_bf16",
             lambda c: fused_ffn(c, w1, b1, w2, b2, gamma, beta))]:
        got = np.asarray(f(x), np.float32).ravel()
        cos = float(ref @ got / (np.linalg.norm(ref) * np.linalg.norm(got)
                                 + 1e-9))

        @jax.jit
        def loop(c, f=f):
            def body(c, _):
                y = f(c)
                return (c + y * jnp.bfloat16(1e-3)).astype(jnp.bfloat16), ()
            c, _ = lax.scan(body, c, None, length=ITERS)
            return c

        dt = time_loop(loop, x)
        print(json.dumps({"op": f"ffn {tag}", "ms": round(dt * 1e3, 3),
                          "tfs": round(useful / dt / 1e12, 1),
                          "cos": round(cos, 5)}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ffn":
        ffn_study()
    elif len(sys.argv) > 1 and sys.argv[1] == "ffn_pallas":
        ffn_pallas_study()
    else:
        main()
