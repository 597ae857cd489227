"""Test harness config: force an 8-device virtual CPU mesh before jax import.

This is the JAX-native analogue of a fake distributed backend (SURVEY.md §4):
all sharding/mesh tests run against 8 virtual CPU devices, no TPU required.
"""

import os

# Hard override: the shell presets JAX_PLATFORMS=axon (the real TPU tunnel);
# unit tests must run on the virtual CPU mesh. Set PARADIS_TEST_TPU=1 to opt
# into running the suite on the chip.
if not os.environ.get("PARADIS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
