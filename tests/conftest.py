"""Test harness: force CPU with an 8-device virtual mesh so multi-chip
sharding logic is exercised without TPU hardware."""

import os

# force CPU unconditionally: the session env may point JAX at the tunneled
# TPU (JAX_PLATFORMS=axon), which makes eager tiny-model tests crawl
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import time; the config
# update below wins as long as no computation has run yet.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.RandomState(0)
