"""Multi-host (pod-slice) startup and per-host data sharding.

TPU-native replacement for the reference's multi-process launch stack —
``torch.distributed.launch`` + ``init_process_group`` + ``DistributedSampler``
(``Oscar/oscar/fewshot/refcoco_cpt.py:516-522``,
``prompt_feat/maskrcnn_benchmark/utils/comm.py:49-143``,
``data/build.py`` samplers). On TPU pods every host runs the same SPMD
program over one global :class:`jax.sharding.Mesh`; the pieces that remain
host-level are (a) process startup, (b) slicing the input stream so each
host feeds its own chips, and (c) forming global device arrays from the
per-host slices. This module owns those three.

Launch recipe (one command per host)::

    CPT_COORDINATOR=host0:8476 CPT_NUM_PROCESSES=4 CPT_PROCESS_ID=$i \
        python -m cpt_tpu.tools.<tool> ...

Torch-style ``MASTER_ADDR``/``MASTER_PORT``/``WORLD_SIZE``/``RANK`` env vars
are accepted as aliases so reference launch scripts port mechanically. On
Cloud TPU pods, ``CPT_MULTIHOST=1`` alone triggers the argument-free
``jax.distributed.initialize()`` autodetection.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _already_initialized() -> bool:
    """Whether the distributed runtime is already up — checked WITHOUT
    touching the XLA backend (``jax.process_count()`` would initialize it,
    after which ``jax.distributed.initialize`` refuses to run)."""
    try:
        from jax._src import distributed as _d

        return _d.global_state.client is not None
    except Exception:
        return False


def initialize_from_env() -> bool:
    """Env-guarded ``jax.distributed.initialize``; returns True if a
    multi-process runtime was started (or already is).

    No-op (returns False) in the default single-process case, so every CLI
    tool can call it unconditionally. Reads, in order of preference:

    * ``CPT_COORDINATOR`` (host:port), ``CPT_NUM_PROCESSES``,
      ``CPT_PROCESS_ID``
    * torch-style ``MASTER_ADDR`` (+``MASTER_PORT``, default 8476),
      ``WORLD_SIZE``, ``RANK``
    * ``CPT_MULTIHOST=1`` → argument-free autodetect (Cloud TPU pod
      metadata).
    """
    if _already_initialized():
        return True
    env = os.environ
    num = int(env.get("CPT_NUM_PROCESSES", env.get("WORLD_SIZE", "1")))
    coord = env.get("CPT_COORDINATOR")
    if coord is None and "MASTER_ADDR" in env:
        coord = f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '8476')}"
    if num > 1 and coord is not None:
        pid = int(env.get("CPT_PROCESS_ID", env.get("RANK", "0")))
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num, process_id=pid)
        return True
    if env.get("CPT_MULTIHOST"):
        jax.distributed.initialize()
        return True
    return False


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Reference ``utils/comm.py:49-56`` (is_main_process): gate logging,
    checkpoint writes, and eval-report emission to one host."""
    return jax.process_index() == 0


def host_shard(items: Sequence, index: Optional[int] = None,
               count: Optional[int] = None, strided: bool = True) -> list:
    """This host's slice of a work list.

    ``strided=True`` reproduces ``DistributedSampler``'s rank::world
    interleaving (good load balance over heterogeneous items);
    ``strided=False`` gives the contiguous TOTAL_STEP/CUR_STEP split the
    reference's resumable extraction loop uses
    (``refcocodataset.py:186-196``).
    """
    i = jax.process_index() if index is None else index
    n = jax.process_count() if count is None else count
    items = list(items)
    if n <= 1:
        return items
    if strided:
        return items[i::n]
    period = len(items) // n
    return items[period * i:] if i == n - 1 else (
        items[period * i: period * (i + 1)])


def global_batch(local_batch: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Form globally dp-sharded device arrays from this host's local batch.

    Each host passes its own slice (leading dim = global_batch/process_count
    × its share); the result is one global jit-able array sharded over
    ``axis``. Replaces DDP's implicit per-rank batch semantics.
    """
    def put(x):
        x = np.asarray(x)
        spec = P(axis) if x.ndim >= 1 else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(put, local_batch)


def allreduce_sum(*scalars: float) -> tuple:
    """Sum Python scalars across hosts (reference ``comm.py:146-168``
    reduce_dict pattern); identity in the single-process case."""
    if jax.process_count() == 1:
        return tuple(scalars)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(
        np.asarray(scalars, np.float64))
    return tuple(arr.sum(axis=0))


def sync(name: str = "barrier") -> None:
    """Cross-host barrier (reference ``comm.py:57-76`` synchronize)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
