"""Stem (7×7/s2 conv) space-to-depth study on the real TPU (manual).

The round-3 extraction budget put the stem at ~55 ms of the 1414 ms
C=128 extraction (≈4%): a 7×7 stride-2 conv on 3 input channels is the
classic MXU-hostile shape (im2col K = 7·7·3 = 147, far below the
contraction widths this chip needs — PERF.md MXU microbench). The
MLPerf-style space-to-depth reformulation rewrites it EXACTLY as a
4×4 stride-1 conv on a 2×2-s2d grid (12 input channels, K = 192,
asymmetric pad (2,1)):

    y[i,j] = Σ_u,v w7[u,v] x[2i+u-3, 2j+v-3]
    x2[p,q,(dy,dx,c)] = x[2p+dy, 2q+dx, c]
    w4[a,b,(dy,dx,c)]  = w7[2(a-2)+dy+3, 2(b-2)+dx+3, c]   (zero outside)

Measures, at C=128 / 640×1024 bf16: normalize-only, baseline stem conv,
s2d transform + 4×4 conv, and the fused normalize+s2d variant.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

C, H, W = 128, 640, 1024
OUT = 64
ITERS = 10


def s2d(x):
    """[N, H, W, 3] → [N, H/2, W/2, 12] with channel (dy*2+dx)*3+c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # [N, H/2, W/2, dy, dx, c]
    return x.reshape(n, h // 2, w // 2, 4 * c)


def w7_to_w4(w7):
    """[7, 7, 3, O] → [4, 4, 12, O] (zero taps outside the 7×7 support)."""
    w4 = np.zeros((4, 4, 4, w7.shape[2], w7.shape[3]), w7.dtype)
    for a in range(4):
        for dy in range(2):
            u = 2 * (a - 2) + dy + 3
            if not 0 <= u < 7:
                continue
            for b in range(4):
                for dx in range(2):
                    v = 2 * (b - 2) + dx + 3
                    if not 0 <= v < 7:
                        continue
                    w4[a, b, dy * 2 + dx] = w7[u, v]
    return w4.reshape(4, 4, 4 * w7.shape[2], w7.shape[3])


def conv7(x, w):
    return lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv4_s2d(x2, w4):
    return lax.conv_general_dilated(
        x2, w4, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check_equivalence():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 3), jnp.float32)
    w7 = rng.randn(7, 7, 3, 8).astype(np.float32)
    y_ref = conv7(x, jnp.asarray(w7))
    y_s2d = conv4_s2d(s2d(x), jnp.asarray(w7_to_w4(w7)))
    err = float(jnp.max(jnp.abs(y_ref - y_s2d)))
    print(f"equivalence max abs err: {err:.2e}")
    assert err < 1e-4


def time_loop(f, *args):
    @jax.jit
    def loop(x, *rest):
        def body(c, _):
            y = f(c, *rest)
            c = c + (y.astype(jnp.float32).mean() * 1e-30).astype(c.dtype)
            return c, ()
        c, _ = lax.scan(body, x, None, length=ITERS)
        return c

    out = loop(*args)
    float(out.sum())
    t0 = time.perf_counter()
    out = loop(*args)
    float(out.sum())
    return (time.perf_counter() - t0) / ITERS


def main():
    check_equivalence()
    if jax.default_backend() == "cpu":
        print("cpu: equivalence only")
        return
    rng = np.random.RandomState(1)
    xu8 = jnp.asarray(rng.randint(0, 256, (C, H, W, 3)), jnp.uint8)
    mean = jnp.asarray([103.53, 116.28, 123.675], jnp.bfloat16)
    w7 = jnp.asarray(rng.randn(7, 7, 3, OUT) * 0.05, jnp.bfloat16)
    w4 = jnp.asarray(
        w7_to_w4(np.asarray(w7, np.float32)), jnp.bfloat16)

    def normalize(xu):
        return xu.astype(jnp.bfloat16)[..., ::-1] - mean

    x = jax.jit(normalize)(xu8)
    x2 = jax.jit(lambda a: s2d(normalize(a)))(xu8)

    t_conv7 = time_loop(lambda a, w: conv7(a, w), x, w7)
    print(f"baseline 7x7/s2 conv: {t_conv7*1e3:.2f} ms "
          f"({2*C*(H//2)*(W//2)*147*OUT/t_conv7/1e12:.1f} TF/s)")
    t_conv4 = time_loop(lambda a, w: conv4_s2d(a, w), x2, w4)
    print(f"s2d 4x4/s1 conv (pre-transformed): {t_conv4*1e3:.2f} ms "
          f"({2*C*(H//2)*(W//2)*192*OUT/t_conv4/1e12:.1f} TF/s)")

    # end-to-end: uint8 → normalize (+ s2d) → conv, as extraction pays it
    t_e2e7 = time_loop(lambda a, w: conv7(normalize(a), w), xu8, w7)
    t_e2e4 = time_loop(lambda a, w: conv4_s2d(s2d(normalize(a)), w),
                       xu8, w4)
    print(f"e2e uint8→stem: 7x7 {t_e2e7*1e3:.2f} ms vs s2d {t_e2e4*1e3:.2f}"
          f" ms → {t_e2e7/t_e2e4:.2f}x")


if __name__ == "__main__":
    main()
