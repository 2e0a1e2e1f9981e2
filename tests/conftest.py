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

# Persistent compilation cache: the suite compiles ~1000 XLA programs; a
# warm cache turns reruns into disk loads.  Besides speed, this reduces
# exposure to a FLAKY XLA:CPU compiler crash (SIGABRT/SIGSEGV inside
# backend_compile, observed in >50% of single-process full-suite runs at
# the ~700-test scale, crash site varying run to run).  The reliable way
# to run the whole suite is per-file subprocesses: ``python
# tools/run_tests.py`` (which CI uses).  min_entry_size 0 caches even
# tiny programs; tests are correctness-, not timing-bound.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; a TPU backend was already "
    "initialized before conftest.py ran"
)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
