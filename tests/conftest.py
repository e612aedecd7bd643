"""Test config: force CPU with 8 virtual devices (SURVEY.md §4 implications).

The axon TPU plugin's sitecustomize hard-sets jax_platforms="axon,cpu" at
interpreter start (overriding the JAX_PLATFORMS env var), so we must force
the CPU backend via jax.config AFTER import — before any backend use. The
XLA_FLAGS env var must still be set before the CPU client initializes to get
the 8-device virtual mesh the sharding tests need.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
