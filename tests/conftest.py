"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Real-TPU behavior is exercised separately by bench.py / __graft_entry__.py;
tests must be hermetic and runnable anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon plugin re-registers itself over JAX_PLATFORMS;
# config.update wins over the env var.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
