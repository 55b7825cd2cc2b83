"""Test configuration.

Tests run on CPU with 8 simulated devices (multi-chip sharding tests without
hardware — SURVEY.md §4 test-parity plan) and float64 enabled (the parity
precision mode: trajectories are compared against NumPy oracles exactly like
the reference's doctest suites compare CppAD against closed forms).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# This image's sitecustomize force-registers the tunneled "axon" TPU backend
# regardless of JAX_PLATFORMS env; override via config so tests run on the
# local 8-device CPU simulation.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
