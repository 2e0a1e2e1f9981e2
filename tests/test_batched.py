"""Batched multi-RHS CG tests."""

import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu import CSRMatrix, cg_solve, cg_solve_batched
from conjugategradient_tpu.problems import poisson2d_coo
from conjugategradient_tpu.solver import jacobi_preconditioner


def _problem(nx=10):
    rows, cols, vals, shape = poisson2d_coo(nx)
    return CSRMatrix.from_coo(rows, cols, vals, shape), shape[0]


def test_batched_matches_sequential(rng):
    A, n = _problem()
    B = jnp.asarray(rng.standard_normal((4, n)))
    X, info = cg_solve_batched(A, B, tol=1e-10)
    assert X.shape == (4, n)
    for i in range(4):
        x_i, info_i = cg_solve(A, B[i], tol=1e-10)
        np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_i), rtol=1e-8)
        # per-lane info reflects its own convergence point
        assert bool(info.converged[i])
    # residual check
    R = B - jnp.stack([A.matvec(X[i]) for i in range(4)])
    assert float(jnp.max(jnp.abs(R))) < 1e-8


def test_batched_with_preconditioner(rng):
    A, n = _problem(8)
    B = jnp.asarray(rng.standard_normal((3, n)))
    X, info = cg_solve_batched(A, B, tol=1e-9, M=jacobi_preconditioner(A))
    R = B - jnp.stack([A.matvec(X[i]) for i in range(3)])
    assert float(jnp.max(jnp.abs(R))) < 1e-7


def test_batched_shape_validation(rng):
    A, n = _problem(5)
    try:
        cg_solve_batched(A, jnp.ones((n,)))
        assert False, "expected ValueError"
    except ValueError:
        pass
