"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-device sharding tests use the
virtual CPU devices.  The environment pins jax_platforms to the axon TPU
plugin, so the env var alone is not enough — we also update the config
before any backend initialization.
"""

import os

# Must be set before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
