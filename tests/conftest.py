"""Test harness config: force an 8-device virtual CPU mesh before jax import.

This is the JAX-native analogue of a fake distributed backend (SURVEY.md §4):
all sharding/mesh tests run against 8 virtual CPU devices, no TPU required.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
