"""Round-4 study: RoIAlign contraction order (HBM-traffic bound).

In-context shapes: C=64 copies x M=128 RoIs on [40, 64, 1024] bf16 C4
maps (the two-level wfn's heads input at 640x1024, C=128 halved to fit
standalone HBM). The heads profile attributes ~103 ms to pooling at
~8 TF/s — HBM-bound on the separable intermediate t [n, P, W, C]
(write+read ~470 MB/copy).

Variant B contracts the LARGER spatial dim (W=64) first so the
intermediate carries H=40 instead (294 MB/copy), at the cost of one
5 MB transpose of f per copy (f [h,w,c] -> [w,h,c], which keeps the
first einsum a natural-layout single GEMM).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.ops.roi_align import roi_align, _interp_matrix

C, M, CK = 32, 128, 32  # relay HBM headroom; both variants linear in C
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


def timed(jfn, shape, n=3):
    out = jfn(fresh(0, shape))
    jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).sum()), out)
    del out
    ts = []
    for i in range(n):
        x = fresh(i + 1, shape)
        t0 = time.perf_counter()
        out = jfn(x)
        jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).sum()), out)
        ts.append(time.perf_counter() - t0)
        del out, x
    return min(ts) * 1e3


def interp_mats(rois):
    """Shared Ry [M,P,H] / Rx [M,P,W] (adaptive sampling=0, bf16) via the
    production helper."""
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


def main():
    rng = np.random.RandomState(0)
    rois = jnp.asarray(np.sort(rng.uniform(0, 600, (M, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(M, 4).astype(np.float32))
    ry, rx = interp_mats(rois)
    shape = (C, H, W, CH)

    # A: production path (y-first separable), head_chunk pattern
    @jax.jit
    def var_a(feats):
        outs = []
        for i in range(0, M, CK):
            pooled = jax.vmap(lambda f: roi_align(
                f, rois[i:i + CK], spatial_scale=SCALE, pooled=P,
                sampling=0))(feats)
            outs.append(pooled)
        return jnp.concatenate(outs, axis=1)

    ta = timed(var_a, shape)
    print(f"A y-first (production): {ta:.1f} ms", flush=True)

    # B: x-first (contract W first; intermediate carries H=40)
    @jax.jit
    def var_b(feats):
        ft = jnp.transpose(feats, (0, 2, 1, 3))        # [C, W, H, CH]
        outs = []
        for i in range(0, M, CK):
            rx_c, ry_c = rx[i:i + CK], ry[i:i + CK]

            def pool(f):
                t = jnp.einsum("nqw,whc->nqhc", rx_c, f,
                               preferred_element_type=jnp.float32)
                out = jnp.einsum("nph,nqhc->npqc", ry_c,
                                 t.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                return out.astype(jnp.bfloat16)

            outs.append(jax.vmap(pool)(ft))
        return jnp.concatenate(outs, axis=1)

    tb = timed(var_b, shape)
    print(f"B x-first (W contracted first): {tb:.1f} ms", flush=True)

    # exactness: B == A (same separable math, opposite order; f32 accums)
    x = fresh(99, shape)
    a = var_a(x)
    b = var_b(x)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    print(f"max |A-B|: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
