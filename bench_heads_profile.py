"""Round-4 study: sub-phase breakdown of the extraction heads
(RoI-align -> stage-5 -> predictor) at the bench operating point
(C=128 copies, M=128 RoI slots, 40x64x1024 C4 maps, bf16).

The round-4 wfn phase profile attributes ~630 ms (the largest share) to
heads_from_feats; this study splits it (same prefix protocol) and A/Bs
RoI-align variants. Inputs are generated ON DEVICE in bf16 (the first
version OOMed shipping 1.3 GB f32 host arrays through the relay).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import VINVL_X152C4
from cpt_tpu.ops.roi_align import roi_align

C, M = 64, 128   # C=128 standalone OOMs the relay HBM; stage5 is linear in C
H16, W16 = 40, 64

_scale = jax.jit(lambda x, s: x * s)


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


_base_cache = {}


def on_device_normal(seed, shape):
    """Fresh bf16 input on device, queue drained. One normal per shape;
    freshness across timed calls via a scalar multiply (the relay gotcha
    is about XLA constant-folding/caching identical buffers, which the
    multiply defeats without 1.3 GB PRNG intermediates)."""
    if shape not in _base_cache:
        gen = jax.jit(lambda k: jax.random.normal(k, shape, jnp.bfloat16))
        _base_cache[shape] = gen(jax.random.PRNGKey(0))
    x = _scale(_base_cache[shape], jnp.bfloat16(1.0 + 0.001 * seed))
    float(x.sum())
    return x


def main():
    cfg = VINVL_X152C4
    model = AttrRCNN(cfg, dtype=jnp.bfloat16)
    m = cfg.max_force_boxes
    assert m == M, m
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((256, 256, 3)),
        jnp.asarray([256, 256]), jnp.zeros((m, 4)), jnp.ones((m,), bool))
    dets = jnp.asarray(np.sort(rng.uniform(0, 600, (m, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(m, 4).astype(np.float32))
    dv = jnp.ones((m,), bool)
    rh = cfg.roi_heads

    feat_shape = (C, H16, W16, 1024)

    def fresh_feats(seed):
        return (on_device_normal(seed, feat_shape),)

    # 1) full heads_from_feats
    @jax.jit
    def full(feats):
        return model.apply(params, feats, dets, dv,
                           method=AttrRCNN.heads_from_feats)

    print(f"heads_from_feats full: {timed(full, fresh_feats):.1f} ms",
          flush=True)

    # 2) RoI-align only (head_chunk layout: 4 chunks of 32 slots)
    ck = rh.head_chunk or M

    @jax.jit
    def align_only(feats):
        outs = []
        for i in range(0, M, ck):
            pooled = jax.vmap(lambda f: roi_align(
                f, dets[i:i + ck], spatial_scale=rh.pooler_scale,
                pooled=rh.pooler_resolution,
                sampling=rh.pooler_sampling_ratio))(feats)
            outs.append(pooled)
        return jnp.concatenate(outs, axis=1)

    print(f"roi_align only: {timed(align_only, fresh_feats):.1f} ms",
          flush=True)

    # 3) stage-5 only on pre-pooled features (chunked like run_chunk)
    pooled_shape = (C, M, rh.pooler_resolution, rh.pooler_resolution, 1024)

    def fresh_pooled(seed):
        return (on_device_normal(seed + 100, pooled_shape),)

    @jax.jit
    def stage5_only(pooled):
        outs = []
        for i in range(0, M, ck):
            flat = pooled[:, i:i + ck].reshape(
                (C * ck,) + pooled.shape[2:])
            x = model.apply(params, flat,
                            method=lambda mm, xs:
                            mm.box_extractor.run_head(xs))
            outs.append(x)
        return jnp.concatenate(outs, axis=0)

    print(f"stage5 only: {timed(stage5_only, fresh_pooled):.1f} ms",
          flush=True)

    # 4) predictor only
    x5 = jax.eval_shape(stage5_only, jax.ShapeDtypeStruct(
        pooled_shape, jnp.bfloat16))

    def fresh_x5(seed):
        return (on_device_normal(seed + 200, x5.shape),)

    @jax.jit
    def pred_only(v):
        return model.apply(params, v,
                           method=lambda mm, xs: mm.box_predictor(xs))

    print(f"predictor only: {timed(pred_only, fresh_x5):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
