"""Test configuration: force CPU backend with a virtual 8-device mesh so
sharding tests run without TPU hardware, mirror the reference's fast-test
philosophy (tiny grid, heavy subsystems off by default —
/root/reference/tests/conftest.py:21-42)."""

import os

# Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("MPLBACKEND", "Agg")

import jax

# The axon sitecustomize registers the TPU plugin regardless of env vars;
# jax.config is the authoritative override for the test run.
jax.config.update("jax_platforms", "cpu")
# Math-parity tests compare against float64 NumPy/SciPy oracles.
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def small_grid():
    from qingdai_tpu.grid import make_grid
    return make_grid(19, 36)
