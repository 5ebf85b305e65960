"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-device sharding tests use the
virtual CPU devices.  The environment pins jax_platforms to the axon TPU
plugin, so the env var alone is not enough — we also update the config
before any backend initialization.
"""

import os

# Must be set before jax initializes its backends.  VST_TEST_TPU=1 runs
# the selected tests on the real backend instead (used to validate
# device-semantics-sensitive paths, e.g. the fused multi-clip solve, on
# actual TPU hardware; the 8-device mesh tests will then skip or fail —
# select specific tests).
if not os.environ.get("VST_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not os.environ.get("VST_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
