"""Device mesh + sharding rules — the SPMD backbone.

TPU-native replacement for the reference's torch.distributed stack
(``prompt_feat/maskrcnn_benchmark/utils/comm.py``, DDP/NCCL/gloo, pickle
all_gather): one ``jax.sharding.Mesh`` with named axes and
``NamedSharding`` annotations; XLA inserts all collectives over ICI.

Axes:
  * ``dp``  — data parallel (batch dimension). The reference's only strategy.
  * ``tp``  — tensor parallel (attention heads / MLP hidden). Not needed for
    BERT-base parity but wired so larger models shard out of the box.

Param placement is rule-based on parameter path suffixes, so models don't
carry sharding annotations inline.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != #devices({n})"
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, ("dp", "tp"))


# (path-suffix regex, PartitionSpec) — first match wins; default replicated.
# Shapes refer to cpt_tpu.models.bert param layout.
BERT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # fused qkv kernel (hidden, 3, heads, head_dim): shard heads
    (r"attention/qkv/kernel$", P(None, None, "tp", None)),
    (r"attention/qkv/bias$", P(None, "tp", None)),
    # attention out kernel (heads, head_dim, hidden): shard heads (contracting)
    (r"attention/out/kernel$", P("tp", None, None)),
    # MLP: column-parallel intermediate, row-parallel output
    (r"intermediate/kernel$", P(None, "tp")),
    (r"intermediate/bias$", P("tp",)),
    (r"output/kernel$", P("tp", None)),
    # embeddings/vocab-dim tensors stay replicated for BERT-base scale
)


def path_str(key_path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in key_path)


def param_specs(params: Any, rules: Sequence[Tuple[str, P]] = BERT_TP_RULES
                ) -> Any:
    """PartitionSpec pytree for a param tree by path-suffix rules."""

    def spec_for(kp, leaf):
        path = path_str(kp)
        for pattern, spec in rules:
            if re.search(pattern, path):
                if getattr(leaf, "ndim", 0) == len(spec):
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = BERT_TP_RULES) -> Any:
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


# FSDP-style placement: shard every large kernel's first (input) dimension
# over the dp axis — params and optimizer state live distributed and XLA
# all-gathers per layer. Composes with the tp rules (tp takes precedence).
def fsdp_specs(params: Any, dp_size: int, min_size: int = 2 ** 16,
               tp_rules: Sequence[Tuple[str, P]] = BERT_TP_RULES) -> Any:
    def spec_for(kp, leaf):
        path = path_str(kp)
        shape = getattr(leaf, "shape", ())
        for pattern, spec in tp_rules:
            if re.search(pattern, path) and len(shape) == len(spec):
                # graft dp onto the first unsharded, divisible dim
                dims = list(spec)
                for i, d in enumerate(dims):
                    if d is None and shape[i] % dp_size == 0:
                        dims[i] = "dp"
                        break
                return P(*dims)
        if (len(shape) >= 2 and getattr(leaf, "size", 0) >= min_size
                and shape[0] % dp_size == 0):
            return P("dp")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_fsdp(params: Any, mesh: Mesh, **kw) -> Any:
    specs = fsdp_specs(params, num_dp(mesh), **kw)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_specs(batch: Any) -> Any:
    """Shard the leading (batch) dim of every array over ``dp``."""
    return jax.tree_util.tree_map(
        lambda x: P("dp") if getattr(x, "ndim", 0) >= 1 else P(), batch)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        batch, batch_specs(batch))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def num_dp(mesh: Mesh) -> int:
    return mesh.shape["dp"]


def process_allgather(tree: Any) -> Any:
    """Host-level gather across processes (multi-host pods). Single-process
    (this repo's test env): identity. Replaces the reference's pickle-based
    ``all_gather`` (``utils/comm.py:102-143``)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
