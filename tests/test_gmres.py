"""GMRES(m) (solver/gmres.py): restarted minimal-residual correctness.

Completes the nonsymmetric solver matrix beyond BiCGStab (the reference has
no nonsymmetric story at all): pinned against scipy's dense solve and
scipy.sparse.linalg.gmres, plus the restart/masking/happy-breakdown
machinery the one-jit formulation folds into a fixed-shape loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from conjugategradient_tpu import bicgstab_solve, cg_solve, gmres_solve
from conjugategradient_tpu.problems import convection_diffusion_2d_coo
from conjugategradient_tpu.solver.precond import jacobi_preconditioner
from conjugategradient_tpu.types import BlockedEllMatrix, CSRMatrix


def _convdiff(nx=20, peclet=20.0):
    rows, cols, vals, shape = convection_diffusion_2d_coo(nx, peclet=peclet)
    return sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()


@pytest.fixture(scope="module")
def convdiff():
    return _convdiff()


def test_converges_on_nonsymmetric(convdiff):
    b = np.random.default_rng(0).standard_normal(convdiff.shape[0])
    x_ref = spla.spsolve(convdiff.tocsc(), b)
    x, info = gmres_solve(
        CSRMatrix.from_scipy(convdiff), jnp.asarray(b), tol=1e-10)
    assert bool(info.converged)
    assert not bool(info.breakdown)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=0, atol=1e-8)
    # rnorm IS the recomputed true residual (restart recompute)
    r = b - convdiff @ np.asarray(x)
    assert abs(float(info.rnorm) - np.linalg.norm(r)) <= 1e-9
    assert float(info.rnorm_true) == float(info.rnorm)


def test_no_restart_matches_full_gmres(convdiff):
    """With m >= the step count, one cycle suffices and the Givens
    estimates track the true residuals (full GMRES, monotone)."""
    n = convdiff.shape[0]
    b = np.random.default_rng(1).standard_normal(n)
    x, info = gmres_solve(
        CSRMatrix.from_scipy(convdiff), jnp.asarray(b), tol=1e-10,
        restart=n)
    assert bool(info.converged)
    assert int(info.cycles) == 1
    h = np.asarray(info.rnorm_history)
    h = h[~np.isnan(h)]
    # minimal-residual property: non-increasing within a cycle
    assert (np.diff(h) <= 1e-9 * h[0]).all()


def test_restart_interacts_correctly(convdiff):
    """Small m needs more total steps than large m but still converges,
    and iteration/cycle accounting is consistent."""
    b = np.random.default_rng(2).standard_normal(convdiff.shape[0])
    A = CSRMatrix.from_scipy(convdiff)
    x5, i5 = gmres_solve(A, jnp.asarray(b), tol=1e-8, restart=5,
                         maxiter=4000)
    x40, i40 = gmres_solve(A, jnp.asarray(b), tol=1e-8, restart=40,
                           maxiter=4000)
    assert bool(i5.converged) and bool(i40.converged)
    assert int(i5.iterations) >= int(i40.iterations)
    # cycles * m bounds the inner count
    assert int(i5.iterations) <= int(i5.cycles) * 5
    assert int(i40.iterations) <= int(i40.cycles) * 40


def test_gmres_succeeds_where_cg_fails(convdiff):
    b = np.random.default_rng(3).standard_normal(convdiff.shape[0])
    A = CSRMatrix.from_scipy(convdiff)
    xg, ig = gmres_solve(A, jnp.asarray(b), tol=1e-8)
    assert bool(ig.converged)
    xc, ic = cg_solve(A, jnp.asarray(b), tol=1e-8,
                      maxiter=int(ig.iterations) + 10)
    rc = np.linalg.norm(b - convdiff @ np.asarray(xc))
    rg = np.linalg.norm(b - convdiff @ np.asarray(xg))
    assert rg <= 1e-8 < rc  # CG's Krylov recurrences assume symmetry


def test_spd_case_matches_cg():
    rows, cols, vals, shape = convection_diffusion_2d_coo(12, peclet=0.0)
    A_sp = sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()
    b = np.random.default_rng(4).standard_normal(shape[0])
    A = CSRMatrix.from_scipy(A_sp)
    xg, ig = gmres_solve(A, jnp.asarray(b), tol=1e-10)
    xc, _ = cg_solve(A, jnp.asarray(b), tol=1e-10)
    assert bool(ig.converged)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xc), atol=1e-8)


def test_jacobi_preconditioner_helps():
    """Right preconditioning with Jacobi on a badly diag-scaled system."""
    A_sp = _convdiff(16, peclet=10.0)
    d = np.logspace(0, 4, A_sp.shape[0])
    A_sp = sp.diags(d) @ A_sp
    b = np.random.default_rng(5).standard_normal(A_sp.shape[0])
    A = CSRMatrix.from_scipy(A_sp.tocsr())
    M = jacobi_preconditioner(A)
    tol = 1e-6 * np.linalg.norm(b)
    x_p, i_p = gmres_solve(A, jnp.asarray(b), tol=tol, restart=30,
                           maxiter=3000, M=M)
    x_u, i_u = gmres_solve(A, jnp.asarray(b), tol=tol, restart=30,
                           maxiter=3000)
    assert bool(i_p.converged)
    assert int(i_p.iterations) < int(i_u.iterations)
    x_ref = spla.spsolve(A_sp.tocsc(), b)
    np.testing.assert_allclose(np.asarray(x_p), x_ref, rtol=1e-4, atol=1e-6)


def test_happy_breakdown_is_convergence():
    """A of rank-structure with b in a tiny Krylov space: exhaustion = the
    exact solution, flagged converged, never breakdown."""
    n = 32
    A = np.eye(n) * 3.0  # K(A, b) = span{b}: one step is exact
    b = np.random.default_rng(6).standard_normal(n)
    x, info = gmres_solve(jnp.asarray(A), jnp.asarray(b), tol=1e-12)
    assert bool(info.converged)
    assert not bool(info.breakdown)
    assert int(info.iterations) == 1
    np.testing.assert_allclose(np.asarray(x), b / 3.0, atol=1e-12)


def test_runs_to_cap_with_zero_tol(convdiff):
    b = np.random.default_rng(7).standard_normal(convdiff.shape[0])
    x, info = gmres_solve(
        CSRMatrix.from_scipy(convdiff), jnp.asarray(b), tol=0.0,
        maxiter=17, restart=8)
    assert int(info.iterations) == 17
    assert not bool(info.converged)


def test_history_and_warm_start(convdiff):
    n = convdiff.shape[0]
    b = np.random.default_rng(8).standard_normal(n)
    A = CSRMatrix.from_scipy(convdiff)
    x1, i1 = gmres_solve(A, jnp.asarray(b), tol=1e-4, restart=20)
    h = np.asarray(i1.rnorm_history)
    assert h.shape == (n + 1,)
    k = int(i1.iterations)
    assert not np.isnan(h[: k + 1]).any()
    assert np.isnan(h[k + 1:]).all()
    # warm start from the half-solved iterate finishes faster
    x2, i2 = gmres_solve(A, jnp.asarray(b), x0=x1, tol=1e-10, restart=20)
    x3, i3 = gmres_solve(A, jnp.asarray(b), tol=1e-10, restart=20)
    assert bool(i2.converged)
    assert int(i2.iterations) < int(i3.iterations)


def test_layouts_and_callable(convdiff):
    b = np.random.default_rng(9).standard_normal(convdiff.shape[0])
    x_ref = spla.spsolve(convdiff.tocsc(), b)
    bell = BlockedEllMatrix.from_csr(CSRMatrix.from_scipy(convdiff))
    x_b, i_b = gmres_solve(bell, jnp.asarray(b), tol=1e-9)
    assert bool(i_b.converged)
    np.testing.assert_allclose(np.asarray(x_b), x_ref, atol=1e-7)
    dense = jnp.asarray(convdiff.toarray())
    x_c, i_c = gmres_solve(
        lambda v: dense @ v, jnp.asarray(b), tol=1e-9, n=convdiff.shape[0])
    assert bool(i_c.converged)
    np.testing.assert_allclose(np.asarray(x_c), x_ref, atol=1e-7)


def test_float32(convdiff):
    b = np.random.default_rng(10).standard_normal(convdiff.shape[0])
    bn = np.linalg.norm(b)
    x, info = gmres_solve(
        CSRMatrix.from_scipy(convdiff).astype(jnp.float32),
        jnp.asarray(b, jnp.float32), tol=1e-4 * bn, maxiter=3000)
    assert bool(info.converged)
    r = b - convdiff @ np.asarray(x, np.float64)
    assert np.linalg.norm(r) <= 2e-4 * bn


def test_nan_operator_is_clean_breakdown():
    n = 16
    A = np.eye(n)
    A[3, 3] = np.nan
    b = np.ones(n)
    x, info = gmres_solve(jnp.asarray(A), jnp.asarray(b), tol=1e-10)
    assert bool(info.breakdown)
    assert not bool(info.converged)


class TestScipyDropIn:
    def test_drop_in_matches_scipy_contract(self, convdiff):
        from conjugategradient_tpu.scipy_compat import gmres

        b = np.random.default_rng(11).standard_normal(convdiff.shape[0])
        x_sp, info_sp = spla.gmres(convdiff, b, rtol=1e-8, atol=0.0)
        x, info = gmres(convdiff, b, rtol=1e-8, atol=0.0)
        assert info == info_sp == 0
        np.testing.assert_allclose(np.asarray(x), x_sp, atol=1e-5)
        # ours tests the TRUE residual
        r = b - convdiff @ np.asarray(x)
        assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(b)

    def test_cap_returns_cycles(self, convdiff):
        from conjugategradient_tpu.scipy_compat import gmres

        b = np.random.default_rng(12).standard_normal(convdiff.shape[0])
        x, info = gmres(convdiff, b, rtol=1e-14, atol=0.0, restart=5,
                        maxiter=2)
        assert info == 2

    def test_callback_per_cycle(self, convdiff):
        from conjugategradient_tpu.scipy_compat import gmres

        b = np.random.default_rng(13).standard_normal(convdiff.shape[0])
        seen = []
        x, info = gmres(convdiff, b, rtol=1e-8, restart=25,
                        callback=lambda xk: seen.append(xk.copy()),
                        callback_type="x")
        assert info == 0
        assert len(seen) >= 2
        np.testing.assert_allclose(seen[-1], np.asarray(x), rtol=0)
        # iterates improve cycle over cycle
        r_first = np.linalg.norm(b - convdiff @ seen[0])
        r_last = np.linalg.norm(b - convdiff @ seen[-1])
        assert r_last < r_first

    def test_legacy_callback_type_rejected(self, convdiff):
        from conjugategradient_tpu.scipy_compat import gmres

        b = np.ones(convdiff.shape[0])
        with pytest.raises(ValueError, match="callback_type"):
            gmres(convdiff, b, callback=lambda *_: None,
                  callback_type="legacy")

    def test_preconditioned(self, convdiff):
        from conjugategradient_tpu.scipy_compat import gmres

        b = np.random.default_rng(14).standard_normal(convdiff.shape[0])
        M = sp.diags(1.0 / convdiff.diagonal())
        x, info = gmres(convdiff, b, rtol=1e-9, M=M)
        assert info == 0
        r = b - convdiff @ np.asarray(x)
        assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(b)


class TestFlexible:
    """flexible=True — Saad's FGMRES (z-basis kept, x += Z y)."""

    def test_fixed_linear_m_coincides(self, convdiff):
        """With one fixed linear M, FGMRES and right-preconditioned GMRES
        coincide (exact arithmetic; f64 to tight tolerance)."""
        A = CSRMatrix.from_scipy(convdiff)
        b = jnp.asarray(
            np.random.default_rng(20).standard_normal(convdiff.shape[0]))
        M = jacobi_preconditioner(A)
        x_s, i_s = gmres_solve(A, b, tol=1e-9, restart=20, M=M)
        x_f, i_f = gmres_solve(A, b, tol=1e-9, restart=20, M=M,
                               flexible=True)
        assert bool(i_f.converged)
        assert int(i_f.iterations) == int(i_s.iterations)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_s),
                                   atol=1e-10)

    def test_inner_krylov_preconditioner(self, convdiff):
        """The capability FGMRES exists for: M = an inner CG solve on the
        symmetric part (NONLINEAR in v).  FGMRES converges cleanly;
        standard right-preconditioned GMRES with the same M needs
        substantially more work (its fixed-operator assumption is
        violated, so the in-cycle estimate misleads it)."""
        from conjugategradient_tpu import cg_solve

        A_np = convdiff.toarray()
        sym = jnp.asarray(0.5 * (A_np + A_np.T))
        A = CSRMatrix.from_scipy(convdiff)
        n = convdiff.shape[0]
        b = jnp.asarray(np.random.default_rng(21).standard_normal(n))

        def inner_cg(v):
            return cg_solve(sym, v, tol=0.0, maxiter=8)[0]

        x_f, i_f = gmres_solve(A, b, tol=1e-8, restart=20, M=inner_cg,
                               flexible=True, maxiter=400)
        assert bool(i_f.converged)
        r = np.asarray(b) - convdiff @ np.asarray(x_f)
        assert np.linalg.norm(r) <= 1e-8
        # inner-Krylov preconditioning beats no preconditioning
        _, i_plain = gmres_solve(A, b, tol=1e-8, restart=20, maxiter=400)
        assert int(i_f.iterations) < int(i_plain.iterations)

    def test_flexible_without_m_is_plain_gmres(self, convdiff):
        A = CSRMatrix.from_scipy(convdiff)
        b = jnp.asarray(
            np.random.default_rng(22).standard_normal(convdiff.shape[0]))
        x1, i1 = gmres_solve(A, b, tol=1e-8, flexible=True)
        x2, i2 = gmres_solve(A, b, tol=1e-8)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        assert int(i1.iterations) == int(i2.iterations)


def test_unrolled_arnoldi_matches_fori_to_roundoff():
    """unroll='always' reads only the live basis rows — the dead rows are
    exact zeros, so the values agree to reduction-tree roundoff (XLA's
    contraction association differs with the row count: measured 1e-16
    absolute in f64 — NOT bitwise), and the counts match."""
    from conjugategradient_tpu.problems import convection_diffusion_2d_coo

    rows, cols, vals, shape = convection_diffusion_2d_coo(12, peclet=12.0)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    n = shape[0]
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(n))

    d = jnp.asarray(np.asarray(A.diagonal()))

    def m_jac(v):
        return v / d

    for kw in (dict(), dict(M=m_jac), dict(M=m_jac, flexible=True)):
        x_f, i_f = gmres_solve(A, b, tol=1e-9, maxiter=4 * n, restart=17,
                               unroll="never", **kw)
        x_u, i_u = gmres_solve(A, b, tol=1e-9, maxiter=4 * n, restart=17,
                               unroll="always", **kw)
        assert int(i_u.iterations) == int(i_f.iterations)
        assert int(i_u.cycles) == int(i_f.cycles)
        np.testing.assert_allclose(np.asarray(x_u), np.asarray(x_f),
                                   rtol=0, atol=1e-11)
        hf, hu = np.asarray(i_f.rnorm_history), np.asarray(i_u.rnorm_history)
        sel = np.isfinite(hf)
        np.testing.assert_allclose(hu[sel], hf[sel], rtol=1e-8, atol=1e-13)
