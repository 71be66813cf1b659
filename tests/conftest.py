"""Test env: force the CPU backend with 8 virtual devices so sharding tests
exercise real multi-device code paths without TPU hardware (SURVEY.md §4)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's boot hook force-selects the TPU backend via
# jax.config.update("jax_platforms", ...), which overrides JAX_PLATFORMS env.
# Override it back: tests run on the CPU backend with 8 virtual devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from rpg_open_remode_tpu.utils import synthetic


@pytest.fixture(scope="session")
def small_frames():
    """A short low-res synthetic sequence shared across tests."""
    return synthetic.generate(n_frames=12, width=160, height=120, seed=3)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
