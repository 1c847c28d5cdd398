"""Test harness: force CPU backend with 8 virtual devices so multi-chip sharding
paths (pjit/shard_map over a Mesh) execute without TPU hardware.

Must run before jax initializes its backends — hence env vars at module import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # overwrite: the session env pins JAX_PLATFORMS=axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

# The axon TPU plugin force-appends itself to jax_platforms at import time, overriding
# the env var — pin the config explicitly before any backend initialization.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(567)
