"""Test harness config: force an 8-device virtual CPU mesh before jax import.

This is the JAX-native analogue of a fake distributed backend (SURVEY.md §4):
all sharding/mesh tests run against 8 virtual CPU devices, no TPU required.
"""

import os

# Hard override: the environment pins jax_platforms to "axon,cpu" (the real
# TPU tunnel) in a way that wins over the JAX_PLATFORMS env var, so unit tests
# must force CPU through jax.config (done below, after import). Set
# PARADIS_TEST_TPU=1 to opt into running the suite on the chip.
if not os.environ.get("PARADIS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = _flags

import jax
import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (multi-process) test")

if not os.environ.get("PARADIS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/paradis_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
