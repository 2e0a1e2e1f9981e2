"""BiCGStab (solver/bicgstab.py): nonsymmetric-solver correctness.

The reference has no nonsymmetric story (its CG silently mis-solves a
nonsymmetric A); these tests pin the extension against scipy's dense solve
and scipy.sparse.linalg.bicgstab, plus the breakdown/half-step exits the
jitted formulation folds into one loop body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from conjugategradient_tpu import bicgstab_solve, cg_solve
from conjugategradient_tpu.problems import (
    convection_diffusion_2d_coo,
    poisson2d_coo,
)
from conjugategradient_tpu.solver.precond import jacobi_preconditioner
from conjugategradient_tpu.types import BlockedEllMatrix, CSRMatrix


def _convdiff(nx=20, peclet=20.0):
    rows, cols, vals, shape = convection_diffusion_2d_coo(nx, peclet=peclet)
    return sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()


@pytest.fixture(scope="module")
def convdiff():
    return _convdiff()


def test_generator_is_nonsymmetric_m_matrix(convdiff):
    A = convdiff
    assert abs(A - A.T).max() > 0.1  # genuinely nonsymmetric
    assert (A.diagonal() > 0).all()
    off = A - sp.diags(A.diagonal())
    assert off.data.max() <= 0  # M-matrix off-diagonals
    # peclet=0 degenerates to the symmetric Poisson operator
    r0, c0, v0, s0 = convection_diffusion_2d_coo(8, peclet=0.0)
    rp, cp, vp, _ = poisson2d_coo(8)
    A0 = sp.coo_matrix((v0, (r0, c0)), shape=s0).toarray()
    Ap = sp.coo_matrix((vp, (rp, cp)), shape=s0).toarray()
    np.testing.assert_allclose(A0, Ap, rtol=0)


def test_converges_on_nonsymmetric(convdiff):
    b = np.random.default_rng(0).standard_normal(convdiff.shape[0])
    x_ref = spla.spsolve(convdiff.tocsc(), b)
    x, info = bicgstab_solve(
        CSRMatrix.from_scipy(convdiff), jnp.asarray(b), tol=1e-10,
        maxiter=2000)
    assert bool(info.converged)
    assert not bool(info.breakdown)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=0, atol=1e-8)
    # the recurrence residual and the recomputed one agree at convergence
    assert float(info.rnorm_true) <= 5e-10
    assert abs(float(info.rnorm) - float(info.rnorm_true)) <= 1e-10


def test_cg_fails_where_bicgstab_succeeds(convdiff):
    """The motivating contrast: CG's symmetric recurrences cannot solve
    this operator to tolerance (the reference would silently mis-solve)."""
    b = np.random.default_rng(1).standard_normal(convdiff.shape[0])
    op = CSRMatrix.from_scipy(convdiff)
    x_cg, info_cg = cg_solve(op, jnp.asarray(b), tol=1e-10)
    x_ref = spla.spsolve(convdiff.tocsc(), b)
    err_cg = np.linalg.norm(np.asarray(x_cg) - x_ref)
    x_bi, info_bi = bicgstab_solve(op, jnp.asarray(b), tol=1e-10,
                                   maxiter=2000)
    err_bi = np.linalg.norm(np.asarray(x_bi) - x_ref)
    assert bool(info_bi.converged)
    assert err_bi < 1e-8
    assert err_bi < err_cg  # CG left real error on the table


def test_spd_case_matches_cg():
    rows, cols, vals, shape = poisson2d_coo(12)
    op = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(shape[0]))
    x_cg, _ = cg_solve(op, b, tol=1e-12)
    x_bi, info = bicgstab_solve(op, b, tol=1e-12, maxiter=2000)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x_bi), np.asarray(x_cg),
                               rtol=0, atol=1e-9)


def test_jacobi_preconditioner_helps():
    # diagonal scaling D·A·D with wildly varying D: Jacobi undoes it
    A = _convdiff(16, peclet=8.0)
    d = np.exp(np.linspace(0.0, 6.0, A.shape[0]))
    D = sp.diags(d)
    As = (D @ A @ D).tocsr()
    op = CSRMatrix.from_scipy(As)
    b = np.random.default_rng(3).standard_normal(A.shape[0])
    _, plain = bicgstab_solve(op, jnp.asarray(b), tol=1e-8, maxiter=4000)
    M = jacobi_preconditioner(op)
    x, pre = bicgstab_solve(op, jnp.asarray(b), tol=1e-8, maxiter=4000, M=M)
    assert bool(pre.converged)
    assert int(pre.iterations) < int(plain.iterations)
    x_ref = spla.spsolve(As.tocsc(), b)
    np.testing.assert_allclose(
        np.asarray(x), x_ref, rtol=0,
        atol=1e-6 * float(np.linalg.norm(x_ref)))


def test_half_step_exact_exit():
    # 1-D system converges exactly at the first half-step: s = r - α·v = 0
    x, info = bicgstab_solve(jnp.array([[2.0]]), jnp.array([4.0]), tol=1e-12)
    assert bool(info.converged)
    assert int(info.iterations) == 1
    np.testing.assert_allclose(float(x[0]), 2.0, rtol=1e-14)


def test_skew_breakdown_is_clean():
    # skew-symmetric A: r̂ᵀ(A r) = 0 on step one → α = ∞ → breakdown; the
    # returned iterate must be the last FINITE one, never NaN-poisoned
    A = jnp.array([[0.0, 1.0], [-1.0, 0.0]])
    b = jnp.array([1.0, 0.0])
    x, info = bicgstab_solve(A, b, tol=1e-12, maxiter=10)
    assert bool(info.breakdown)
    assert not bool(info.converged)
    assert np.isfinite(np.asarray(x)).all()
    assert int(info.iterations) == 1


def test_runs_to_cap_with_zero_tol(convdiff):
    op = CSRMatrix.from_scipy(convdiff)
    b = jnp.asarray(np.ones(op.shape[0]))
    _, info = bicgstab_solve(op, b, tol=0.0, maxiter=7)
    assert int(info.iterations) == 7
    assert not bool(info.converged)


def test_history_and_warm_start(convdiff):
    op = CSRMatrix.from_scipy(convdiff)
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(op.shape[0]))
    x, info = bicgstab_solve(op, b, tol=1e-10, maxiter=2000)
    k = int(info.iterations)
    hist = np.asarray(info.rnorm_history)
    assert np.isfinite(hist[: k + 1]).all()
    assert np.isnan(hist[k + 1:]).all()
    np.testing.assert_allclose(hist[0], float(jnp.linalg.norm(b)), rtol=1e-12)
    np.testing.assert_allclose(hist[k], float(info.rnorm), rtol=1e-12)
    # warm start from the solution: immediate exit, zero iterations
    _, info2 = bicgstab_solve(op, b, x0=x, tol=1e-8)
    assert int(info2.iterations) == 0
    assert bool(info2.converged)


def test_layouts_and_callable(convdiff):
    b = jnp.asarray(np.random.default_rng(5).standard_normal(
        convdiff.shape[0]))
    x_ref = spla.spsolve(convdiff.tocsc(), np.asarray(b))
    csr = CSRMatrix.from_scipy(convdiff)
    bell = BlockedEllMatrix.from_csr(csr)
    x_b, info_b = bicgstab_solve(bell, b, tol=1e-10, maxiter=2000)
    assert bool(info_b.converged)
    np.testing.assert_allclose(np.asarray(x_b), x_ref, rtol=0, atol=1e-7)
    # matrix-free callable with n=
    mv = csr.matvec
    x_c, info_c = bicgstab_solve(
        lambda v: mv(v), b, tol=1e-10, maxiter=2000, n=csr.shape[0])
    assert bool(info_c.converged)
    np.testing.assert_allclose(np.asarray(x_c), x_ref, rtol=0, atol=1e-7)


def test_float32(convdiff):
    op = CSRMatrix.from_scipy(convdiff, dtype=jnp.float32)
    b = jnp.asarray(np.random.default_rng(6).standard_normal(
        op.shape[0]), dtype=jnp.float32)
    x, info = bicgstab_solve(op, b, tol=1e-4, maxiter=4000)
    assert bool(info.converged)
    assert float(info.rnorm_true) <= 5e-4


class TestScipyCompat:
    def test_drop_in_matches_scipy_contract(self, convdiff):
        from conjugategradient_tpu.scipy_compat import bicgstab

        b = np.random.default_rng(7).standard_normal(convdiff.shape[0])
        x, flag = bicgstab(convdiff, b, rtol=1e-9)
        assert flag == 0
        xs, sflag = spla.bicgstab(convdiff, b, rtol=1e-9)
        assert sflag == 0
        x_ref = spla.spsolve(convdiff.tocsc(), b)
        ours = np.linalg.norm(np.asarray(x) - x_ref)
        theirs = np.linalg.norm(xs - x_ref)
        assert ours <= max(2 * theirs, 1e-7)

    def test_cap_returns_maxiter(self, convdiff):
        from conjugategradient_tpu.scipy_compat import bicgstab

        b = np.ones(convdiff.shape[0])
        _, flag = bicgstab(convdiff, b, rtol=1e-14, maxiter=3)
        assert flag == 3

    def test_breakdown_returns_minus_ten(self):
        from conjugategradient_tpu.scipy_compat import bicgstab

        A = np.array([[0.0, 1.0], [-1.0, 0.0]])
        _, flag = bicgstab(A, np.array([1.0, 0.0]), rtol=1e-12)
        assert flag == -10

    def test_callback_observes_iterates(self, convdiff):
        from conjugategradient_tpu.scipy_compat import bicgstab

        seen = []
        b = np.random.default_rng(8).standard_normal(convdiff.shape[0])
        x, flag = bicgstab(convdiff, b, rtol=1e-8,
                           callback=lambda xk: seen.append(xk.copy()))
        assert flag == 0
        assert len(seen) >= 1
        np.testing.assert_allclose(seen[-1], np.asarray(x), rtol=0, atol=0)

    def test_preconditioned(self, convdiff):
        from conjugategradient_tpu.scipy_compat import bicgstab

        b = np.random.default_rng(9).standard_normal(convdiff.shape[0])
        Minv = sp.diags(1.0 / convdiff.diagonal())
        x, flag = bicgstab(convdiff, b, rtol=1e-9, M=Minv)
        assert flag == 0
        x_ref = spla.spsolve(convdiff.tocsc(), b)
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=0, atol=1e-6)
