"""Test harness config: force CPU with 8 virtual devices (multi-chip sharding
tests without real chips) and enable x64 for numerical-parity tests."""

import os

# note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# jax.config.update('jax_platforms', ...) is honored, so use that.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
