"""MINRES tests (solver/minres.py).

The reference is SPD-only (a non-positive pᵀAp NaN-poisons its CG,
CG.hpp:401); MINRES is the framework's symmetric-INDEFINITE extension.
Contracts under test: the φ̄ residual estimate tracks the true ‖b − Ax_k‖
to roundoff, histories are monotone non-increasing, indefinite systems
that break CG converge, scipy.sparse.linalg.minres agrees on the solution,
the shift/preconditioner/warm-start/breakdown edges behave, and every
operator layout ingests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

from conjugategradient_tpu import CSRMatrix, cg_solve, minres_solve
from conjugategradient_tpu.problems import poisson2d_coo
from conjugategradient_tpu.solver.precond import jacobi_preconditioner


def _poisson2d(nx):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    return A, shape[0]


def _indefinite(n, seed=3):
    """Symmetric, strongly indefinite: random symmetric with spectrum
    straddling zero (eigenvalues in ~[-2.5, 2.5], none near 0)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    half = n // 2
    eigs = np.concatenate(
        [np.linspace(-2.5, -0.5, half), np.linspace(0.5, 2.5, n - half)]
    )
    return Q @ np.diag(eigs) @ Q.T


class TestSPD:
    def test_solves_poisson_to_tol(self):
        A, n = _poisson2d(16)
        b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
        x, info = minres_solve(A, b, tol=1e-10)
        assert bool(info.converged)
        r = np.asarray(b) - np.asarray(A.matvec(x))
        assert np.linalg.norm(r) <= 1e-9

    def test_phibar_tracks_true_residual(self):
        """The QR-recurrence estimate φ̄_k must equal ‖b − A x_k‖₂ to
        roundoff (M=None) — this pins the whole Givens bookkeeping."""
        A, n = _poisson2d(12)
        b = jnp.asarray(np.random.default_rng(1).standard_normal(n))
        full_hist = np.asarray(minres_solve(A, b, tol=1e-12)[1].rnorm_history)
        for k in (1, 5, 20, 40):
            x_k, info = minres_solve(A, b, tol=0.0, maxiter=k)
            true = np.linalg.norm(np.asarray(b) - np.asarray(A.matvec(x_k)))
            est = float(info.rnorm)
            assert abs(true - est) <= 1e-8 * full_hist[0]
            # the capped run's trajectory is a prefix of the full one
            np.testing.assert_allclose(
                np.asarray(info.rnorm_history)[: k + 1],
                full_hist[: k + 1], rtol=1e-12)

    def test_history_monotone_and_padded(self):
        A, n = _poisson2d(16)
        b = jnp.asarray(np.random.default_rng(2).standard_normal(n))
        x, info = minres_solve(A, b, tol=1e-10)
        k = int(info.iterations)
        h = np.asarray(info.rnorm_history)
        assert h[0] == pytest.approx(float(jnp.linalg.norm(b)), rel=1e-12)
        valid = h[: k + 1]
        assert np.all(np.isfinite(valid))
        # MINRES minimizes ‖r‖ over a growing space: monotone (tiny slack
        # for f64 roundoff)
        assert np.all(np.diff(valid) <= 1e-12 * valid[0])
        assert np.all(np.isnan(h[k + 1:]))

    def test_matches_scipy_solution(self):
        A, n = _poisson2d(10)
        sp = scipy.sparse.csr_matrix(
            (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
            shape=(n, n))
        b = np.random.default_rng(4).standard_normal(n)
        x_ref, code = scipy.sparse.linalg.minres(sp, b, rtol=1e-12)
        assert code == 0
        x, info = minres_solve(A, jnp.asarray(b), tol=1e-11)
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-8)


class TestIndefinite:
    def test_converges_where_cg_breaks(self):
        n = 64
        Ad = _indefinite(n)
        b = np.random.default_rng(5).standard_normal(n)
        # roundoff re-opens the exhausted Krylov space slightly past k=n,
        # so give the cap headroom beyond the default N
        x, info = minres_solve(jnp.asarray(Ad), jnp.asarray(b), tol=1e-10,
                               maxiter=4 * n)
        assert bool(info.converged)
        assert np.linalg.norm(b - Ad @ np.asarray(x)) <= 1e-9
        # the MINRES estimate is monotone; plain CG on the same indefinite
        # system oscillates wildly (its theory needs positive curvature —
        # measured here: ~100x residual spikes, 31 increases, and >n
        # iterations).  CG converging at all on such systems is luck;
        # monotone descent is what MINRES guarantees.
        k_m = int(info.iterations)
        h_m = np.asarray(info.rnorm_history)[: k_m + 1]
        assert np.all(np.diff(h_m) <= 1e-12 * h_m[0])
        _, info_cg = cg_solve(jnp.asarray(Ad), jnp.asarray(b), tol=1e-10,
                              maxiter=4 * n)
        k_c = int(info_cg.iterations)
        h_c = np.sqrt(np.asarray(info_cg.rho_history)[: k_c + 1])
        assert np.any(np.diff(h_c) > 0)

    def test_shift_matches_explicit(self):
        n = 48
        Ad = _indefinite(n, seed=6)
        sigma = 0.3
        b = np.random.default_rng(7).standard_normal(n)
        x_shift, _ = minres_solve(jnp.asarray(Ad), jnp.asarray(b),
                                  tol=1e-11, shift=sigma)
        x_expl, _ = minres_solve(jnp.asarray(Ad - sigma * np.eye(n)),
                                 jnp.asarray(b), tol=1e-11)
        np.testing.assert_allclose(np.asarray(x_shift), np.asarray(x_expl),
                                   atol=1e-8)

    def test_singular_consistent(self):
        """1-D Neumann Laplacian (nullspace = constants); b ⊥ 1 keeps the
        system consistent — MINRES converges where the matrix is singular."""
        n = 32
        Ad = (2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)).astype(float)
        Ad[0, 0] = Ad[-1, -1] = 1.0
        b = np.random.default_rng(8).standard_normal(n)
        b -= b.mean()
        x, info = minres_solve(jnp.asarray(Ad), jnp.asarray(b), tol=1e-9)
        assert bool(info.converged)
        assert np.linalg.norm(b - Ad @ np.asarray(x)) <= 1e-8


class TestPrecondAndEdges:
    def test_jacobi_pcg_converges_faster(self):
        # scaled SPD system where Jacobi actually pays
        A, n = _poisson2d(14)
        scale = jnp.asarray(
            np.exp(np.random.default_rng(9).uniform(-2, 2, n)))
        Ad = scale[:, None] * _dense(A, n) * scale[None, :]
        b = jnp.asarray(np.random.default_rng(10).standard_normal(n))
        M = jacobi_preconditioner(Ad)
        x_p, info_p = minres_solve(Ad, b, tol=1e-8, M=M)
        _, info_u = minres_solve(Ad, b, tol=1e-8)
        assert bool(info_p.converged)
        r = np.asarray(b) - np.asarray(Ad) @ np.asarray(x_p)
        assert np.linalg.norm(r) <= 1e-6
        assert int(info_p.iterations) < int(info_u.iterations)

    def test_indefinite_preconditioner_detected(self):
        A, n = _poisson2d(8)
        b = jnp.ones((n,), jnp.float64)
        # negative-definite M: r·Mr < 0 — the Lanczos inner product breaks,
        # sqrt gives NaN, and the solver must report non-convergence
        x, info = minres_solve(A, b, tol=1e-10, M=lambda r: -r)
        assert not bool(info.converged)

    def test_warm_start_at_solution(self):
        A, n = _poisson2d(8)
        x_star = jnp.asarray(np.random.default_rng(11).standard_normal(n))
        b = A.matvec(x_star)
        x, info = minres_solve(A, b, x0=x_star, tol=1e-12)
        assert int(info.iterations) == 0
        assert bool(info.converged)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(x_star))

    def test_zero_rhs(self):
        A, n = _poisson2d(8)
        x, info = minres_solve(A, jnp.zeros((n,), jnp.float64), tol=0.0)
        assert int(info.iterations) == 0
        assert bool(info.converged)
        assert np.all(np.asarray(x) == 0)

    def test_float32(self):
        A, n = _poisson2d(12)
        A32 = CSRMatrix(A.data.astype(jnp.float32), A.indices, A.indptr,
                        A.row_ids, A.shape)
        b = jnp.asarray(
            np.random.default_rng(12).standard_normal(n), jnp.float32)
        x, info = minres_solve(A32, b, tol=1e-4)
        assert bool(info.converged)
        r = np.asarray(b) - np.asarray(A32.matvec(x))
        assert np.linalg.norm(r) <= 1e-3

    def test_callable_operator(self):
        n = 40
        Ad = _indefinite(n, seed=13)
        b = np.random.default_rng(14).standard_normal(n)
        x, info = minres_solve(
            lambda v: jnp.asarray(Ad) @ v, jnp.asarray(b), tol=1e-9, n=n)
        assert bool(info.converged)
        assert np.linalg.norm(b - Ad @ np.asarray(x)) <= 1e-8


def _dense(A, n):
    sp = scipy.sparse.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=(n, n))
    return jnp.asarray(sp.toarray())


class TestTrueResidual:
    def test_rnorm_true_matches_estimate_when_healthy(self):
        A, n = _poisson2d(14)
        b = jnp.asarray(np.random.default_rng(15).standard_normal(n))
        x, info = minres_solve(A, b, tol=1e-9)
        assert bool(info.converged)
        assert abs(float(info.rnorm_true) - float(info.rnorm)) <= 1e-7 * float(
            jnp.linalg.norm(b))

    def test_singular_inconsistent_detected_by_rnorm_true(self):
        """The MINRES least-squares failure mode: on a singular system with
        b NOT in range(A), x diverges along the nullspace while the
        recurrence estimate phibar keeps shrinking.  rnorm_true is the
        detector the info carries for exactly this."""
        n = 32
        Ad = (2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)).astype(float)
        Ad[0, 0] = Ad[-1, -1] = 1.0  # Neumann: nullspace = constants
        b = np.random.default_rng(16).standard_normal(n)
        b += 1.0 - b.mean()  # force a nullspace component: inconsistent
        x, info = minres_solve(jnp.asarray(Ad), jnp.asarray(b), tol=1e-10,
                               maxiter=8 * n)
        # the estimate underreports; the true residual cannot fall below
        # the norm of b's nullspace component (= mean(b)*sqrt(n))
        floor = abs(b.mean()) * np.sqrt(n)
        assert float(info.rnorm_true) >= 0.9 * floor
        assert float(info.rnorm_true) > 10 * float(info.rnorm)
