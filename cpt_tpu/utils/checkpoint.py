"""Checkpoint save/restore — Orbax-backed.

Replaces the reference's two checkpoint systems
(``maskrcnn_benchmark/utils/checkpoint.py`` ``Checkpointer``/
``DetectronCheckpointer`` with its ``last_checkpoint`` tag file, and Oscar's
HuggingFace ``save_pretrained`` + ``training_args.bin``):

  * ``save_checkpoint`` / ``restore_checkpoint`` — full train state (params +
    optimizer + step) via Orbax PyTreeCheckpointer
  * ``last_checkpoint`` tag-file resume semantics (``checkpoint.py:73-93``)
  * ``keep_last`` pruning
  * ``save_best`` — the reference keeps the best model via an in-RAM
    deepcopy (``gqa_cpt.py:381-386``); here it's just another directory.
"""
from __future__ import annotations

import os
import os.path as op
import shutil
from typing import Any, List, Optional

import jax
import numpy as np


def _tag_path(ckpt_dir: str) -> str:
    return op.join(ckpt_dir, "last_checkpoint")


def save_checkpoint(ckpt_dir: str, name: str, state: Any,
                    keep_last: Optional[int] = None,
                    retries: int = 10) -> str:
    """Save pytree ``state`` under ``ckpt_dir/name``; update last_checkpoint.

    Retries transient IO failures up to ``retries`` times (the reference's
    save-retry loop, ``gqa_cpt.py:508-517``)."""
    import time

    import orbax.checkpoint as ocp

    os.makedirs(ckpt_dir, exist_ok=True)
    path = op.abspath(op.join(ckpt_dir, name))
    host_state = jax.device_get(state)
    last_err = None
    for attempt in range(max(retries, 1)):
        try:
            if op.exists(path):
                shutil.rmtree(path)
            ckpt = ocp.PyTreeCheckpointer()
            ckpt.save(path, host_state)
            break
        except (OSError, IOError) as e:         # pragma: no cover - IO flake
            last_err = e
            time.sleep(min(2 ** attempt, 30))
    else:                                        # pragma: no cover
        raise last_err
    with open(_tag_path(ckpt_dir), "w") as f:
        f.write(name)
    if keep_last:
        prune_checkpoints(ckpt_dir, keep_last)
    return path


def has_checkpoint(ckpt_dir: str) -> bool:
    return op.exists(_tag_path(ckpt_dir))


def last_checkpoint_name(ckpt_dir: str) -> Optional[str]:
    if not has_checkpoint(ckpt_dir):
        return None
    with open(_tag_path(ckpt_dir)) as f:
        return f.read().strip()


def restore_checkpoint(ckpt_dir: str, target: Any,
                       name: Optional[str] = None) -> Any:
    """Restore into the structure of ``target`` (shapes/dtypes preserved).

    With ``name=None``, follows the ``last_checkpoint`` tag; returns
    ``target`` unchanged if no checkpoint exists (fresh start)."""
    import orbax.checkpoint as ocp

    if name is None:
        name = last_checkpoint_name(ckpt_dir)
        if name is None:
            return target
    path = op.abspath(op.join(ckpt_dir, name))
    ckpt = ocp.PyTreeCheckpointer()
    # restore against the target's structure so container types (NamedTuple
    # train states, custom nodes) and leaf order are preserved
    restored = ckpt.restore(path, item=jax.device_get(target))

    leaves_t, treedef = jax.tree_util.tree_flatten(target)
    leaves_r = jax.tree_util.tree_leaves(restored)
    cast = [np.asarray(r).astype(np.asarray(t).dtype)
            if hasattr(t, "dtype") else r
            for t, r in zip(leaves_t, leaves_r)]
    return jax.tree_util.tree_unflatten(treedef, cast)


def list_checkpoints(ckpt_dir: str) -> List[str]:
    if not op.isdir(ckpt_dir):
        return []
    return sorted(d for d in os.listdir(ckpt_dir)
                  if op.isdir(op.join(ckpt_dir, d)))


def save_model(save_dir: str, params: Any, config: Any = None,
               retries: int = 10, retry_sleep: float = 1.0) -> str:
    """``save_pretrained`` equivalent (reference ``utils/save_model.py``):
    params via Orbax + the model config as json. Saves are retried on
    transient IO errors (the reference's save-retry-×10 loop,
    ``gqa_cpt.py:508-517``)."""
    import json
    import time

    from cpt_tpu.config.core import to_dict

    last_err = None
    for attempt in range(max(retries, 1)):
        try:
            path = save_checkpoint(save_dir, "model", params)
            break
        except OSError as e:                  # transient fs hiccups
            last_err = e
            time.sleep(retry_sleep)
    else:
        raise last_err
    if config is not None:
        with open(op.join(save_dir, "config.json"), "w") as f:
            json.dump(to_dict(config), f, indent=2)
    return path


def load_model(save_dir: str, target_params: Any) -> Any:
    """Restore params saved by ``save_model`` into ``target_params``' tree."""
    return restore_checkpoint(save_dir, target_params, name="model")


def prune_checkpoints(ckpt_dir: str, keep_last: int) -> None:
    names = list_checkpoints(ckpt_dir)
    last = last_checkpoint_name(ckpt_dir)
    removable = [n for n in names if n != last]
    for n in removable[: max(0, len(names) - keep_last)]:
        shutil.rmtree(op.join(ckpt_dir, n))
