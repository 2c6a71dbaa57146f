"""Test harness: CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a fake 8-device CPU mesh (the
TPU-world equivalent of testing pmap/shard_map without a real slice); the
driver separately dry-runs the multi-chip path, and bench.py runs on a real
TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may pre-register a TPU platform plugin (overriding
# JAX_PLATFORMS at interpreter startup); pin the config explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
