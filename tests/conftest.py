"""Test configuration: run everything on CPU with 8 virtual devices.

Tests never touch the real TPU (bench.py does); they need the CPU backend
with 8 virtual devices so the sharded-CG psum/all-gather path is exercised
without a pod (SURVEY §4), and float64 for parity against the float64 oracle.

Some environments install a sitecustomize that imports jax and registers a
TPU PJRT plugin with ``JAX_PLATFORMS=axon`` in the ambient environment.  The
plugin registration itself is harmless — backends are initialized lazily —
so it suffices to override the platform through jax.config (which wins over
the env var) and extend XLA_FLAGS before the first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; a TPU backend was already "
    "initialized before conftest.py ran"
)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
