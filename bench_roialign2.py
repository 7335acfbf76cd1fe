"""Round-4 study part 2: where roi_align's time actually goes.

Phases at C=32 copies x M=128 RoIs, [40,64,1024] bf16 maps, chunk 32:
interp-matrix build | einsum1 (y-contract) | einsum2 (x-contract,
batched-tiny) | full. Each phase timed with its inputs materialized and
its output materialized (HBM in/out), so phase sums can exceed the
fused full time — the deltas still rank the phases.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.ops.roi_align import _interp_matrix

C, M, CK = 32, 128, 32
H, W, CH = 40, 64, 1024
P = 14
SCALE = 1.0 / 16

_scale = jax.jit(lambda x, s: x * s)
_cache = {}


def fresh(seed, shape):
    if shape not in _cache:
        gen = jax.jit(lambda k: jax.random.normal(k, shape, jnp.bfloat16))
        _cache[shape] = gen(jax.random.PRNGKey(0))
    x = _scale(_cache[shape], jnp.bfloat16(1.0 + 0.001 * seed))
    float(x.sum())
    return x


def timed(jfn, shapes, n=3):
    out = jfn(*[fresh(0, s) for s in shapes])
    jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).sum()), out)
    del out
    ts = []
    for i in range(n):
        args = [fresh(i + 1, s) for s in shapes]
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).sum()), out)
        ts.append(time.perf_counter() - t0)
        del out, args
    return min(ts) * 1e3


def main():
    rng = np.random.RandomState(0)
    rois = jnp.asarray(np.sort(rng.uniform(0, 600, (M, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(M, 4).astype(np.float32))

    def build():
        scale = jnp.float32(SCALE)
        x1, y1, x2, y2 = (rois[:, i] * scale for i in range(4))
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w, bin_h = roi_w / P, roi_h / P
        s_y = jnp.clip(jnp.ceil(bin_h), 1, 8).astype(jnp.int32)
        s_x = jnp.clip(jnp.ceil(bin_w), 1, 8).astype(jnp.int32)
        ry = _interp_matrix(y1, bin_h, H, P, s_y, jnp.bfloat16)
        rx = _interp_matrix(x1, bin_w, W, P, s_x, jnp.bfloat16)
        return ry, rx

    # 0) build alone (per wfn it happens once per jit; vmap-invariant)
    bfn = jax.jit(lambda u: jax.tree_util.tree_map(
        lambda a: a * u.astype(a.dtype), build()))
    print(f"interp build: {timed(bfn, [()]):.1f} ms", flush=True)

    ry, rx = build()
    fshape = (C, H, W, CH)

    # 1) einsum1 only: t[n,p,w,c] per copy-chunk (materialized out)
    @jax.jit
    def e1(feats):
        outs = []
        for i in range(0, M, CK):
            ry_c = ry[i:i + CK]
            outs.append(jax.vmap(lambda f: jnp.einsum(
                "nph,hwc->npwc", ry_c, f,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            )(feats))
        return outs

    print(f"einsum1 only (t out to HBM): {timed(e1, [fshape]):.1f} ms",
          flush=True)

    # 2) einsum2 only on a materialized t (one chunk's shape, x4 chunks)
    tshape = (C, CK, P, W, CH)

    @jax.jit
    def e2(*ts):
        outs = []
        for i, t in enumerate(ts):
            rx_c = rx[i * CK:(i + 1) * CK]
            outs.append(jax.vmap(lambda tt: jnp.einsum(
                "nqw,npwc->npqc", rx_c, tt,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            )(t))
        return jnp.concatenate(outs, axis=1)

    print(f"einsum2 only (t in from HBM): "
          f"{timed(e2, [tshape] * 4):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
