"""Round-4 study part 4: composed A/B of the fused Pallas pooling kernel
inside heads_from_feats (xla vs pallas pooler_impl) at C=64."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import VINVL_X152C4

C, M = 64, 128
H16, W16 = 40, 64

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


def main():
    rng = np.random.RandomState(0)
    shape = (C, H16, W16, 1024)
    m = VINVL_X152C4.max_force_boxes
    dets = jnp.asarray(np.sort(rng.uniform(0, 600, (m, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(m, 4).astype(np.float32))
    dv = jnp.ones((m,), bool)
    outs = {}
    for impl in ("xla", "pallas"):
        cfg = dataclasses.replace(
            VINVL_X152C4,
            roi_heads=dataclasses.replace(VINVL_X152C4.roi_heads,
                                          pooler_impl=impl))
        model = AttrRCNN(cfg, dtype=jnp.bfloat16)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((256, 256, 3)),
            jnp.asarray([256, 256]), jnp.zeros((m, 4)), jnp.ones((m,), bool))

        @jax.jit
        def full(feats):
            return model.apply(params, feats, dets, dv,
                               method=AttrRCNN.heads_from_feats)

        print(f"heads_from_feats pooler={impl}: "
              f"{timed(full, shape):.1f} ms", flush=True)
        outs[impl] = full(fresh(42, shape))
    da = np.asarray(outs["xla"]["box_features"], np.float32)
    db = np.asarray(outs["pallas"]["box_features"], np.float32)
    print("box_features max |Δ|:", float(np.abs(da - db).max()),
          "ref max:", float(np.abs(da).max()), flush=True)
    la = np.asarray(outs["xla"]["labels"])
    lb = np.asarray(outs["pallas"]["labels"])
    print("label agreement:", float((la == lb).mean()), flush=True)


if __name__ == "__main__":
    main()
