"""Unit tests for ops/blas.py against NumPy (SURVEY §4: dot/axpy vs numpy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.ops import blas


@pytest.fixture
def vecs(rng):
    n = 1003
    return (
        rng.standard_normal(n),
        rng.standard_normal(n),
    )


def test_dot(vecs):
    x, y = vecs
    got = blas.dot(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), x @ y, rtol=1e-12)


def test_norm_sq_and_norm(vecs):
    x, _ = vecs
    np.testing.assert_allclose(np.asarray(blas.norm_sq(jnp.asarray(x))), x @ x, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(blas.norm(jnp.asarray(x))), np.sqrt(x @ x), rtol=1e-12
    )


def test_saxpby_family(vecs):
    x, y = vecs
    a, b = 0.7, -1.3
    xp, yp = jnp.asarray(x), jnp.asarray(y)
    np.testing.assert_allclose(np.asarray(blas.saxpby(a, xp, b, yp)), a * x + b * y)
    np.testing.assert_allclose(np.asarray(blas.sapbx(xp, b, yp)), x + b * y)
    np.testing.assert_allclose(np.asarray(blas.sambx(xp, b, yp)), x - b * y)


def test_dot_widens_bf16():
    x = jnp.ones((4096,), dtype=jnp.bfloat16) * 0.1
    got = blas.dot(x, x)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(float(got), 4096 * 0.1 * 0.1, rtol=1e-2)
