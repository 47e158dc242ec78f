"""Test harness config: run everything on a virtual 8-device CPU mesh.

This is the JAX "fake backend" (SURVEY §4): multi-chip sharding logic is
exercised on host CPU with ``xla_force_host_platform_device_count=8``, so the
full parallel test suite runs anywhere. Must run before jax import.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env presets axon/TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize imports jax at interpreter startup (before this file), freezing
# jax_platforms=axon in the config; backends are lazy, so overriding the config
# here still wins as long as no test touched a device yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
