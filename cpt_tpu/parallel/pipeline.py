"""Pipeline parallelism (GPipe microbatch schedule) for the BERT encoder.

Beyond-reference capability: the reference has no pipeline parallelism
(SURVEY.md §2e — torch DDP data-parallel only). TPU-native design per the
scaling-book recipe: the encoder's layers are stacked into a single
``[L, ...]`` pytree whose leading dimension is sharded over a ``pp`` mesh
axis, and a ``shard_map`` program runs the classic GPipe loop — each stage
``lax.scan``s its local ``L/pp`` layers over the microbatch it currently
holds, then ``ppermute``s the activation ring-wise to the next stage.
``n_micro`` microbatches drain the bubble in ``n_micro + pp − 1`` ticks.
All collectives ride ICI; everything is jit-compatible and reverse-mode
differentiable (scan + ppermute + psum), so the same program serves
training.

Composes with the existing axes: the mesh here is (dp, pp) — batch sharded
over dp as usual, layers over pp. For BERT-base scoring pp is not needed
for capacity (the model fits one chip many times over); the value is
framework completeness for larger encoder stacks.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.6 promotes shard_map to the top level
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        # the pipeline carry starts replicated and becomes pp-varying
        # after the first ppermute; skip the varying-manual-axes check
        # (the old check_rep=False)
        return _shard_map(f, check_vma=False, **kw)
except ImportError:  # pragma: no cover
    from functools import partial

    from jax.experimental.shard_map import shard_map as _shard_map_exp

    shard_map = partial(_shard_map_exp, check_rep=False)  # type: ignore


def make_pp_mesh(dp: int = 1, pp: int = 2,
                 devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    assert dp * pp == n, f"dp({dp}) * pp({pp}) != #devices({n})"
    return Mesh(np.asarray(devices).reshape(dp, pp), ("dp", "pp"))


def stack_layer_params(encoder_params: dict, num_layers: int) -> Any:
    """``{layer_i: tree}`` → one tree with ``[L, ...]`` leaves (the layout
    whose leading dim shards over ``pp``)."""
    layers = [encoder_params[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked: Any, num_layers: int) -> dict:
    """Inverse of ``stack_layer_params`` (checkpoint round-trips)."""
    return {f"layer_{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(num_layers)}


def stacked_specs(stacked: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: P("pp"), stacked)


def shard_stacked(stacked: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("pp"))), stacked)


def make_pp_encoder_fn(cfg, mesh: Mesh, n_micro: int,
                       dtype: Any = jnp.float32):
    """→ ``fn(stacked_layer_params, hidden [B,S,H], attn_bias) → [B,S,H]``.

    ``stacked_layer_params`` leaves are ``[L, ...]`` sharded ``P('pp')``;
    ``hidden``/``attn_bias`` batch-sharded ``P('dp')``. Output equals
    ``BertEncoder`` exactly (same per-layer math, same order). ``B`` (the
    per-dp-shard batch) must divide by ``n_micro``.
    """
    from cpt_tpu.models.bert.model import BertLayer

    pp = mesh.shape["pp"]
    L = cfg.num_hidden_layers
    assert L % pp == 0, f"num_hidden_layers({L}) % pp({pp}) != 0"
    layer = BertLayer(cfg, dtype)
    ring = [(i, (i + 1) % pp) for i in range(pp)]

    def local_stack(stacked_local, hidden, attn_bias):
        def body(h, lp):
            return layer.apply({"params": lp}, h, attn_bias), None

        h, _ = jax.lax.scan(body, hidden, stacked_local)
        return h

    def pp_program(stacked_local, hidden, attn_bias):
        s = jax.lax.axis_index("pp")
        b = hidden.shape[0]
        assert b % n_micro == 0, (b, n_micro)
        mb = hidden.reshape(n_micro, b // n_micro, *hidden.shape[1:])
        ab = attn_bias.reshape(n_micro, b // n_micro, *attn_bias.shape[1:])

        def tick(carry, t):
            buf, out = carry
            idx = jnp.clip(t - s, 0, n_micro - 1)
            x0 = jax.lax.dynamic_index_in_dim(mb, idx, keepdims=False)
            a = jax.lax.dynamic_index_in_dim(ab, idx, keepdims=False)
            x = jnp.where(s == 0, x0, buf)
            y = local_stack(stacked_local, x, a)
            valid = (t - s >= 0) & (t - s < n_micro)
            upd = jax.lax.dynamic_update_index_in_dim(out, y, idx, 0)
            out = jnp.where((s == pp - 1) & valid, upd, out)
            return (jax.lax.ppermute(y, "pp", ring), out), None

        init = (jnp.zeros_like(mb[0]), jnp.zeros_like(mb))
        (_, out), _ = jax.lax.scan(tick, init,
                                   jnp.arange(n_micro + pp - 1))
        # results live on the last stage; broadcast to every pp rank
        out = jax.lax.psum(jnp.where(s == pp - 1, out,
                                     jnp.zeros_like(out)), "pp")
        return out.reshape(b, *hidden.shape[1:])

    def call(stacked, hidden, attn_bias):
        f = shard_map(pp_program, mesh=mesh,
                      in_specs=(stacked_specs(stacked), P("dp"), P("dp")),
                      out_specs=P("dp"))
        return f(stacked, hidden, attn_bias)

    return call


def make_pp_scoring_fn(cfg, mesh: Mesh, n_micro: int,
                       dtype: Any = jnp.float32):
    """Pipelined REC_MLM_CPT scoring forward.

    → ``fn(params, stacked, ids, token_type_ids, attention_mask,
    img_feats, mask_pos) → logits [B, vocab]`` where ``params`` is the
    REC_MLM_CPT variables dict (its ``bert/encoder`` subtree is unused —
    the encoder runs from ``stacked``) and ``stacked`` =
    ``stack_layer_params(params['params']['bert']['encoder'], L)``
    sharded ``P('pp')``. Matches ``REC_MLM_CPT.__call__`` with
    ``mask_pos`` exactly.
    """
    from cpt_tpu.models.bert.heads import BertLMPredictionHead
    from cpt_tpu.models.bert.model import BertImgModel

    bert = BertImgModel(cfg, dtype)
    head = BertLMPredictionHead(cfg, dtype)
    enc_fn = make_pp_encoder_fn(cfg, mesh, n_micro, dtype)

    def fn(params, stacked, input_ids, token_type_ids, attention_mask,
           img_feats, mask_pos):
        bp = params["params"]["bert"]
        emb, bias = bert.apply({"params": bp}, input_ids, token_type_ids,
                               attention_mask, None, img_feats,
                               method="embed")
        seq = enc_fn(stacked, emb, bias)
        table = bp["embeddings"]["word_embeddings"]["embedding"]
        gathered = jnp.take_along_axis(seq, mask_pos[:, None, None], axis=1)
        logits = head.apply({"params": params["params"]["mlm_head"]},
                            gathered, table)
        return logits[:, 0].astype(jnp.float32)

    return fn
