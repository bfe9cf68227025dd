"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the standard JAX substitute for multi-chip hardware (SURVEY.md §4):
``xla_force_host_platform_device_count=8`` gives 8 CPU "devices" so sharding
and collective tests exercise real ``jax.sharding`` paths. Must be set
before jax initializes.
"""
import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the remote TPU
# tunnel) and a sitecustomize registers that backend at interpreter startup;
# running unit tests over that RPC path is ~100x slower and hogs the single
# real chip. Tests always use the virtual 8-device CPU mesh. The env var
# alone is too late (jax is already imported), so also update jax.config —
# backend selection is lazy, so this wins as long as no array op ran yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
