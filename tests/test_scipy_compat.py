"""scipy.sparse.linalg.cg drop-in front-end (scipy_compat.cg)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.problems import poisson2d_coo
from conjugategradient_tpu.scipy_compat import cg

scipy_sparse = pytest.importorskip("scipy.sparse")


def _scipy_problem(nx=12):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = scipy_sparse.csr_matrix((vals, (rows, cols)), shape=shape)
    b = np.arange(1, shape[0] + 1, dtype=np.float64)
    return A, b


def test_matches_scipy_result():
    from scipy.sparse.linalg import cg as scipy_cg

    A, b = _scipy_problem()
    x, info = cg(A, b, rtol=1e-10)
    xs, infos = scipy_cg(A, b, rtol=1e-10)
    assert info == 0 and infos == 0
    np.testing.assert_allclose(np.asarray(x), xs, rtol=1e-7, atol=1e-9)
    # true residual meets scipy's termination contract
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(r) <= 1.01 * 1e-10 * np.linalg.norm(b)


def test_info_positive_on_cap():
    A, b = _scipy_problem()
    x, info = cg(A, b, rtol=1e-12, maxiter=3)
    assert info == 3


def test_atol_only():
    A, b = _scipy_problem(8)
    x, info = cg(A, b, rtol=0.0, atol=1e-8)
    assert info == 0
    assert np.linalg.norm(b - A @ np.asarray(x)) <= 1.1e-8


def test_preconditioner_operator():
    """scipy-style M ~ A^-1 (here: inverse-diagonal as a scipy matrix)."""
    A, b = _scipy_problem()
    M = scipy_sparse.diags(1.0 / A.diagonal())
    x, info = cg(A, b, rtol=1e-10, M=M)
    assert info == 0
    np.testing.assert_allclose(
        A @ np.asarray(x), b, rtol=1e-7, atol=1e-7
    )


def test_callback_sees_every_iterate():
    A, b = _scipy_problem(6)
    seen = []
    x, info = cg(A, b, rtol=1e-10, callback=lambda xk: seen.append(xk.copy()))
    assert info == 0
    assert len(seen) >= 2
    np.testing.assert_allclose(seen[-1], np.asarray(x))
    # iterates improve monotonically in the A-norm (CG property)
    errs = [np.linalg.norm(b - A @ xk) for xk in seen[:-1]]
    assert errs[-1] < errs[0]


def test_x0_warm_start():
    A, b = _scipy_problem()
    x_cold, _ = cg(A, b, rtol=1e-10)
    x, info = cg(A, b, x0=np.asarray(x_cold), rtol=1e-10)
    assert info == 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_cold), rtol=1e-9)


def test_matrix_free_callable_A():
    """scipy accepts LinearOperator A; the shim accepts any JAX-traceable
    callable, with n taken from b."""
    import jax.numpy as jnp

    A, b = _scipy_problem(8)
    Ad = jnp.asarray(A.toarray())
    x, info = cg(lambda v: Ad @ v, b, rtol=1e-10)
    assert info == 0
    np.testing.assert_allclose(A @ np.asarray(x), b, rtol=1e-7, atol=1e-7)


def test_numpy_backed_linear_operator_rejected_clearly():
    """A numpy-backed scipy LinearOperator cannot run inside jit; the shim
    must fail at setup with an actionable message, not a tracer error from
    the compiled loop."""
    from scipy.sparse.linalg import LinearOperator

    A, b = _scipy_problem(8)
    lo = LinearOperator(A.shape, matvec=lambda v: A @ np.asarray(v))
    try:
        cg(lo, b, rtol=1e-8)
        assert False, "expected TypeError"
    except TypeError as e:
        assert "JAX-traceable" in str(e)
    # same contract for M
    M = LinearOperator(A.shape, matvec=lambda v: np.asarray(v) / A.diagonal())
    try:
        cg(A, b, rtol=1e-8, M=M)
        assert False, "expected TypeError"
    except TypeError as e:
        assert "JAX-traceable" in str(e)
