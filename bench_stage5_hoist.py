"""Round-4 study: two exact algebraic reformulations of the extraction
heads (pool + stage-5), A/B'd composed at the bench operating point
(C copies x M=128 RoI slots, 40x64x1024 bf16 C4 maps).

1. **conv1 hoist**: stage-5 block-0's 1x1 conv (24% of stage-5 FLOPs)
   commutes with RoI-align (both linear, conv1 has no spatial extent):
   apply it once per copy on the h*w=2560-position feature map instead
   of per RoI slot on the M*196=25088-position pooled tensor (19.6x
   fewer conv1 FLOPs). The residual-branch downsample then needs the
   block INPUT at the stride-2 grid -> pool the raw map on the even
   rows/cols of the 14-grid (25% extra pooling). BN shift handled by
   the interpolation mass (rowsum(Ry) x rowsum(Rx)); relu stays
   post-pool. Exact up to f32 reassociation.

2. **one-shot pooling**: the separable form is HBM-bound on the
   [n, P, H, C] intermediate (~8 TF/s measured). The combined
   interpolation matrix R2[n, P*P, H*W] = Ry (x) Rx is shared across
   ALL copies (boxes are per image), so pooling becomes ONE
   [M*196, 2560] x [2560, C*1024] GEMM: 10x the FLOPs but MXU-bound.

All variants are hand-rolled with the real shapes/weight layouts
(timing study only; exactness is asserted separately in tests once a
winner ships). Timing per PERF.md protocol: fresh scaled inputs, drain
before t0, materialize inside the timed region, min of 3.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.ops.roi_align import interp_matrices, roi_align

C, M, CK = 64, 128, 32
H16, W16 = 40, 64
G = 32          # groups

_scale = jax.jit(lambda x, s: x * s)
_base_cache = {}


def on_device_normal(seed, shape, key=0):
    if (shape, key) not in _base_cache:
        gen = jax.jit(lambda k: 0.05 * jax.random.normal(
            k, shape, jnp.bfloat16))
        _base_cache[(shape, key)] = gen(jax.random.PRNGKey(key))
    x = _scale(_base_cache[(shape, key)], jnp.bfloat16(1.0 + 0.001 * seed))
    float(x.sum())
    return x


def timed(jfn, fresh, n=3):
    out = jfn(*fresh(0))
    jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).sum()), out)
    ts = []
    for i in range(n):
        args = fresh(i + 1)
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).sum()), out)
        ts.append(time.perf_counter() - t0)
    del out
    return min(ts) * 1e3


def make_weights():
    r = np.random.RandomState(1)

    def w(*s):
        return jnp.asarray(r.randn(*s).astype(np.float32) * 0.02,
                           jnp.bfloat16)

    ws = {
        "w1": w(1024, 1024), "b1": w(1024),
        "k2a": w(3, 3, 32, 1024), "b2a": w(1024),      # grouped s2
        "w3a": w(1024, 2048), "b3a": w(2048),
        "wd": w(1024, 2048), "bd": w(2048),            # downsample
    }
    for blk in ("b", "c"):                              # blocks 1, 2
        ws[f"w1{blk}"] = w(2048, 1024)
        ws[f"b1{blk}"] = w(1024)
        ws[f"k2{blk}"] = w(3, 3, 32, 1024)
        ws[f"b2{blk}"] = w(1024)
        ws[f"w3{blk}"] = w(1024, 2048)
        ws[f"b3{blk}"] = w(2048)
    return ws


def gconv(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=G)


def stage5_tail(out, identity, ws):
    """block0 post-conv1 (grouped conv2 s2, conv3) + blocks 1-2."""
    out = jax.nn.relu(gconv(out, ws["k2a"], 2) + ws["b2a"])
    out = jax.nn.relu(out @ ws["w3a"] + ws["b3a"] + identity)
    for blk in ("b", "c"):
        y = jax.nn.relu(out @ ws[f"w1{blk}"] + ws[f"b1{blk}"])
        y = jax.nn.relu(gconv(y, ws[f"k2{blk}"], 1) + ws[f"b2{blk}"])
        out = jax.nn.relu(y @ ws[f"w3{blk}"] + ws[f"b3{blk}"] + out)
    return out


def pool_sep(f, ry, rx):
    """Current separable pooling (w-first), one copy batch, one chunk."""
    fc = jnp.transpose(f, (0, 2, 1, 3))                  # [C, W, H, ch]
    t = jnp.einsum("nqw,bwhc->bnqhc", rx, fc,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.einsum("nph,bnqhc->bnpqc", ry, t,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def main():
    r = np.random.RandomState(0)
    dets = jnp.asarray(np.sort(r.uniform(0, 600, (M, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(M, 4).astype(np.float32))
    ws = make_weights()
    ry, rx = interp_matrices(dets, H16, W16, spatial_scale=1.0 / 16,
                             pooled=14, sampling=0, dtype=jnp.bfloat16)
    ry, rx = jax.device_put(ry), jax.device_put(rx)
    feat_shape = (C, H16, W16, 1024)

    def fresh(seed):
        return (on_device_normal(seed, feat_shape),)

    # ---- A: baseline pool+stage5 (separable, chunked, mirrors run_chunk)
    @jax.jit
    def base(f):
        outs = []
        for i in range(0, M, CK):
            pooled = pool_sep(f, ry[i:i + CK], rx[i:i + CK])
            flat = pooled.reshape(C * CK, 14, 14, 1024)
            out = jax.nn.relu(flat @ ws["w1"] + ws["b1"])
            identity = flat[:, ::2, ::2] @ ws["wd"] + ws["bd"]
            outs.append(jnp.mean(stage5_tail(out, identity, ws), (1, 2)))
        return jnp.concatenate(outs)

    print(f"A baseline pool+stage5:      {timed(base, fresh):7.1f} ms",
          flush=True)

    # ---- B: conv1 hoist (separable pooling; + even-grid raw pool)
    @jax.jit
    def hoist(f):
        ymap = f @ ws["w1"]                               # [C,H,W,1024]
        outs = []
        for i in range(0, M, CK):
            py = pool_sep(ymap, ry[i:i + CK], rx[i:i + CK])
            xe = pool_sep(f, ry[i:i + CK, ::2], rx[i:i + CK, ::2])
            flat = py.reshape(C * CK, 14, 14, 1024)
            out = jax.nn.relu(flat + ws["b1"])            # mass~1 (timing)
            identity = (xe.reshape(C * CK, 7, 7, 1024) @ ws["wd"]
                        + ws["bd"])
            outs.append(jnp.mean(stage5_tail(out, identity, ws), (1, 2)))
        return jnp.concatenate(outs)

    print(f"B conv1 hoist:               {timed(hoist, fresh):7.1f} ms",
          flush=True)

    # ---- pooling-only A/B: separable vs one-shot Kronecker GEMM
    @jax.jit
    def pool_only(f):
        return [pool_sep(f, ry[i:i + CK], rx[i:i + CK])
                for i in range(0, M, CK)]

    print(f"pool separable only:         {timed(pool_only, fresh):7.1f} ms",
          flush=True)

    @jax.jit
    def pool_oneshot(f):
        fk = f.reshape(C, H16 * W16, 1024)
        outs = []
        for i in range(0, M, CK):
            r2 = jnp.einsum("nph,nqw->npqhw", ry[i:i + CK],
                            rx[i:i + CK]).reshape(CK * 196, H16 * W16)
            o = jnp.einsum("nk,bkc->bnc", r2, fk,
                           preferred_element_type=jnp.float32)
            outs.append(o.reshape(C, CK, 14, 14, 1024).astype(jnp.bfloat16))
        return outs

    print(f"pool one-shot GEMM:          {timed(pool_oneshot, fresh):7.1f} ms",
          flush=True)

    # ---- C: hoist + one-shot pooling composed
    @jax.jit
    def hoist_oneshot(f):
        ymap = (f @ ws["w1"]).reshape(C, H16 * W16, 1024)
        fk = f.reshape(C, H16 * W16, 1024)
        outs = []
        for i in range(0, M, CK):
            r2 = jnp.einsum("nph,nqw->npqhw", ry[i:i + CK],
                            rx[i:i + CK]).reshape(CK * 196, H16 * W16)
            r2e = jnp.einsum("nph,nqw->npqhw", ry[i:i + CK, ::2],
                             rx[i:i + CK, ::2]).reshape(CK * 49, H16 * W16)
            py = jnp.einsum("nk,bkc->bnc", r2, ymap,
                            preferred_element_type=jnp.float32)
            xe = jnp.einsum("nk,bkc->bnc", r2e, fk,
                            preferred_element_type=jnp.float32)
            flat = py.reshape(C * CK, 14, 14, 1024).astype(jnp.bfloat16)
            out = jax.nn.relu(flat + ws["b1"])
            identity = (xe.reshape(C * CK, 7, 7, 1024).astype(jnp.bfloat16)
                        @ ws["wd"] + ws["bd"])
            outs.append(jnp.mean(stage5_tail(out, identity, ws), (1, 2)))
        return jnp.concatenate(outs)

    print(f"C hoist + one-shot pooling:  {timed(hoist_oneshot, fresh):7.1f} ms",
          flush=True)

    # ---- D: baseline stage5 but one-shot pooling (no hoist)
    @jax.jit
    def base_oneshot(f):
        fk = f.reshape(C, H16 * W16, 1024)
        outs = []
        for i in range(0, M, CK):
            r2 = jnp.einsum("nph,nqw->npqhw", ry[i:i + CK],
                            rx[i:i + CK]).reshape(CK * 196, H16 * W16)
            pooled = jnp.einsum("nk,bkc->bnc", r2, fk,
                                preferred_element_type=jnp.float32)
            flat = pooled.reshape(C * CK, 14, 14, 1024).astype(jnp.bfloat16)
            out = jax.nn.relu(flat @ ws["w1"] + ws["b1"])
            identity = flat[:, ::2, ::2] @ ws["wd"] + ws["bd"]
            outs.append(jnp.mean(stage5_tail(out, identity, ws), (1, 2)))
        return jnp.concatenate(outs)

    print(f"D one-shot pooling only:     {timed(base_oneshot, fresh):7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
