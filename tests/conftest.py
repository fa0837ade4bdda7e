"""Test configuration: force JAX onto an 8-virtual-device CPU backend.

This is the JAX-native analogue of a fake multi-node backend: every
sharding/mesh test runs on 8 host devices without TPU hardware
(SURVEY.md §4). Must set env vars before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin in this environment overrides the JAX_PLATFORMS env
# var, so pin the platform through the config API instead (must happen
# before the first backend use anywhere in the test session).
import jax

jax.config.update("jax_platforms", "cpu")

# Spawned stitcher children (GUI/process-edition tests) re-initialize
# jax from scratch; this pins them to CPU too (editions._child_main).
os.environ["IMAGE_STITCHER_JAX_PLATFORM"] = "cpu"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
