"""FSAI preconditioner tests (solver/fsai.py).

Contracts: with a FULL lower-triangular pattern G is exactly the inverse
Cholesky factor (GᵀG = A⁻¹, G L = I); the scaling normalizes
diag(G A Gᵀ) = 1; M⁻¹ = GᵀG is SPD so PCG converges to the true solution;
FSAI beats Jacobi on iteration counts (it is the stronger factor); a
denser pattern (power=2) is at least as strong; the device apply matches
the host factor bit-for-bit in structure; ingest guards reject non-SPD
diagonals and non-square inputs."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from conjugategradient_tpu import (
    CSRMatrix,
    cg_solve,
    fsai_preconditioner,
    jacobi_preconditioner,
)
from conjugategradient_tpu.problems import (
    poisson2d_coo,
    powerlaw_spd_coo,
    random_spd_dense,
)


def _poisson2d(nx):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    return A, shape[0]


def _iters(A, b, M, tol=1e-10):
    x, info = cg_solve(A, b, tol=tol, M=M, maxiter=5000)
    assert bool(info.converged)
    return int(info.iterations), x


def test_full_pattern_is_exact_inverse_factor():
    # a dense SPD matrix has a full lower-triangular FSAI pattern, for
    # which the Frobenius minimization is exact: G = L^-1, GᵀG = A⁻¹
    n = 24
    A = random_spd_dense(n, seed=1)
    apply = fsai_preconditioner(A, dtype=np.float64)
    G = apply.G_host.toarray()
    L = np.linalg.cholesky(A)
    np.testing.assert_allclose(G @ L, np.eye(n), atol=1e-10)
    np.testing.assert_allclose(G.T @ G, np.linalg.inv(A), rtol=1e-8, atol=1e-10)


def test_gagt_unit_diagonal():
    A, n = _poisson2d(14)
    apply = fsai_preconditioner(A, dtype=np.float64)
    G = apply.G_host.toarray()
    Ad = np.asarray(A.to_dense())
    np.testing.assert_allclose(np.diag(G @ Ad @ G.T), np.ones(n), atol=1e-12)


def test_device_apply_matches_host_factor():
    A, n = _poisson2d(10)
    apply = fsai_preconditioner(A, dtype=np.float64)
    rng = np.random.default_rng(0)
    r = rng.standard_normal(n)
    z = np.asarray(apply(jnp.asarray(r)))
    z_host = apply.G_host.T @ (apply.G_host @ r)
    np.testing.assert_allclose(z, z_host, rtol=1e-12, atol=1e-12)


def test_minv_is_spd():
    A, n = _poisson2d(8)
    apply = fsai_preconditioner(A, dtype=np.float64)
    G = apply.G_host.toarray()
    assert np.all(np.diag(G) > 0)
    Minv = G.T @ G
    w = np.linalg.eigvalsh(Minv)
    assert w.min() > 0


def test_fsai_pcg_converges_and_beats_jacobi():
    A, n = _poisson2d(24)
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(n)
    b = jnp.asarray(np.asarray(A.to_dense()) @ x_true)

    it_plain, _ = _iters(A, b, None)
    it_jac, _ = _iters(A, b, jacobi_preconditioner(A))
    it_fsai, x = _iters(A, b, fsai_preconditioner(A, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)
    # constant-diagonal Poisson: Jacobi == plain; FSAI must strictly win
    assert it_fsai < it_jac <= it_plain + 1, (it_fsai, it_jac, it_plain)


def test_power2_at_least_as_strong():
    A, n = _poisson2d(20)
    b = jnp.arange(1, n + 1, dtype=jnp.float64)
    it1, _ = _iters(A, b, fsai_preconditioner(A, power=1, dtype=np.float64))
    it2, _ = _iters(A, b, fsai_preconditioner(A, power=2, dtype=np.float64))
    assert it2 <= it1, (it2, it1)
    # and the pattern genuinely grew
    g1 = fsai_preconditioner(A, power=1, dtype=np.float64).nnz
    g2 = fsai_preconditioner(A, power=2, dtype=np.float64).nnz
    assert g2 > g1


def test_powerlaw_scattered_pattern():
    # the scattered-graph input class (SELL territory): FSAI still builds
    # and still reduces iterations vs Jacobi
    rows, cols, vals, shape = powerlaw_spd_coo(600, seed=5)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    n = shape[0]
    rng = np.random.default_rng(7)
    x_true = rng.standard_normal(n)
    b = jnp.asarray(np.asarray(A.to_dense()) @ x_true)
    it_jac, _ = _iters(A, b, jacobi_preconditioner(A), tol=1e-8)
    it_fsai, x = _iters(A, b, fsai_preconditioner(A, dtype=np.float64), tol=1e-8)
    assert it_fsai < it_jac
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-5, atol=1e-6)


def test_scipy_and_dense_ingest():
    n = 16
    A = random_spd_dense(n, seed=2)
    for A_in in (A, sp.csr_matrix(A)):
        apply = fsai_preconditioner(A_in, dtype=np.float64)
        assert apply.nnz == n * (n + 1) // 2


def test_layout_override():
    A, n = _poisson2d(12)
    auto = fsai_preconditioner(A, dtype=np.float64)
    csr = fsai_preconditioner(A, layout="csr", dtype=np.float64)
    r = jnp.arange(1.0, n + 1)
    np.testing.assert_allclose(
        np.asarray(auto(r)), np.asarray(csr(r)), rtol=1e-12, atol=1e-12
    )
    assert isinstance(csr.G, CSRMatrix) and isinstance(csr.Gt, CSRMatrix)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="power"):
        fsai_preconditioner(np.eye(4), power=0)
    with pytest.raises(ValueError, match="square"):
        fsai_preconditioner(sp.csr_matrix(np.ones((3, 4))))
    bad = np.eye(4)
    bad[2, 2] = -1.0
    with pytest.raises(ValueError, match="SPD"):
        fsai_preconditioner(bad)


def test_indefinite_submatrix_falls_back_to_jacobi_row():
    # an indefinite matrix with positive diagonal: the local solves can
    # produce a non-positive pivot; those rows must degrade to the scalar
    # 1/sqrt(a_ii) row instead of emitting NaNs
    A = np.array(
        [[1.0, 2.0, 0.0], [2.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    apply = fsai_preconditioner(A, dtype=np.float64)
    G = apply.G_host.toarray()
    assert np.all(np.isfinite(G))
    assert np.all(np.diag(G) > 0)
