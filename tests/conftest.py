"""Test configuration: run everything on CPU with 8 virtual devices.

Tests never touch the real TPU (bench.py does); they need the CPU backend
with 8 virtual devices so the sharded-CG psum/all-gather path is exercised
without a pod (SURVEY §4), and float64 for parity against the float64 oracle.

Some environments install a sitecustomize that registers a TPU PJRT plugin
at interpreter start — before this conftest can set JAX_PLATFORMS.  When we
detect that (jax already initialized on a non-cpu backend, or the hijacking
env vars present), we re-exec pytest once with a scrubbed environment.
"""

import os
import sys

_WANT_FLAGS = "--xla_force_host_platform_device_count=8"


def _needs_reexec() -> bool:
    if os.environ.get("CGTPU_TEST_REEXEC") == "1":
        return False
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
        return True
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    if _WANT_FLAGS.split("=")[0].lstrip("-") not in os.environ.get("XLA_FLAGS", ""):
        return True
    return False


if _needs_reexec():
    env = dict(os.environ)
    env["CGTPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disables TPU-plugin sitecustomize
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " " + _WANT_FLAGS).strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
