"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-device sharding tests use the
virtual CPU devices.
"""

import os

# Must be set before jax import (any test module importing jax goes through
# conftest first under pytest).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
