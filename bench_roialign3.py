"""Round-4 study part 3: composed A/B of the pooling contraction order
inside heads_from_feats (the number that matters — round-3 lesson:
isolated pooling wins can vanish or invert composed)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import cpt_tpu.ops.roi_align as RA
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
    cfg = VINVL_X152C4
    model = AttrRCNN(cfg, dtype=jnp.bfloat16)
    m = cfg.max_force_boxes
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((256, 256, 3)),
        jnp.asarray([256, 256]), jnp.zeros((m, 4)), jnp.ones((m,), bool))
    dets = jnp.asarray(np.sort(rng.uniform(0, 600, (m, 2, 2)), axis=1)
                       .transpose(0, 2, 1).reshape(m, 4).astype(np.float32))
    dv = jnp.ones((m,), bool)
    shape = (C, H16, W16, 1024)
    orig = RA.roi_align

    for order in ("y", "x"):
        RA.roi_align = functools.partial(orig, contract=order)

        @jax.jit
        def full(feats):
            return model.apply(params, feats, dets, dv,
                               method=AttrRCNN.heads_from_feats)

        print(f"heads_from_feats contract={order}: "
              f"{timed(full, shape):.1f} ms", flush=True)
    RA.roi_align = orig


if __name__ == "__main__":
    main()
