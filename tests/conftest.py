"""Test harness: force an 8-device virtual CPU platform before JAX import.

Multi-chip sharding logic (mesh/pjit/shard_map) is validated on a virtual
8-device CPU mesh, per the build contract — real TPU runs happen in bench.py.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon site hook force-registers the TPU platform and
# overrides JAX_PLATFORMS; this config update wins (must run before any
# backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs[:8]
