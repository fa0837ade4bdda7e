"""Test configuration: force JAX onto an 8-virtual-device CPU backend.

This is the JAX-native analogue of a fake multi-node backend: every
sharding/mesh test runs on 8 host devices without TPU hardware
(SURVEY.md §4). Must set env vars before jax is imported anywhere.
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
    return np.random.default_rng(42)
