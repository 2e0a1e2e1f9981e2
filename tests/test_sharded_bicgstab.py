"""Sharded BiCGStab (method="bicgstab" through the one sharded solve core)
on 8 virtual CPU devices: NONSYMMETRIC systems on the row mesh.

Collective pattern: two halo'd local matvecs + three psum rounds per
iteration (the (t·s, t·t, s·s) triple rides ONE stacked psum, and the
full-step residual norm is recovered algebraically from it —
loops._sharded_bicgstab docstring).

Parity contract vs the single-device solver (solver/bicgstab.py): same
trajectory to psum-association roundoff over an early window, iteration
counts within ±2 (BiCGStab's ω recurrence amplifies last-ulp differences
faster than CG), solution and true residual pinned tightly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from conjugategradient_tpu import CSRMatrix, bicgstab_solve
from conjugategradient_tpu.parallel import partition_csr_rows, sharded_cg_solve
from conjugategradient_tpu.problems import convection_diffusion_2d_coo

N_DEV = 8


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


def _convdiff_op(nx=20, peclet=20.0):
    rows, cols, vals, shape = convection_diffusion_2d_coo(nx, peclet=peclet)
    return CSRMatrix.from_coo(rows, cols, vals, shape), shape[0]


def _bell_setup(A, n, bm=8, bn=8):
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        (n, n), N_DEV, bm=bm, bn=bn)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    b_pad = jnp.zeros((n_pad,), jnp.float64).at[:n].set(jnp.asarray(b))
    return jnp.asarray(blocks), jnp.asarray(bcols), b_pad, jnp.asarray(b)


def test_nonsymmetric_matches_single_device():
    A, n = _convdiff_op()
    blocks, bcols, b_pad, b = _bell_setup(A, n)
    x_ref, info_ref = bicgstab_solve(A, b, tol=1e-9, maxiter=4 * n)
    x_sh, info_sh = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-9, maxiter=4 * n, method="bicgstab")
    assert bool(info_ref.converged) and bool(info_sh.converged)
    assert abs(int(info_sh.iterations) - int(info_ref.iterations)) <= 2
    r = np.asarray(b) - np.asarray(A.matvec(jnp.asarray(x_sh[:n])))
    assert np.linalg.norm(r) <= 5e-9
    np.testing.assert_allclose(np.asarray(x_sh[:n]), np.asarray(x_ref),
                               atol=1e-7)
    # early-window trajectory parity (sharded history is SQUARED norms,
    # single-device BicgstabInfo carries norms)
    h_ref = np.asarray(info_ref.rnorm_history)
    h_sh = np.sqrt(np.asarray(info_sh.rho_history))
    np.testing.assert_allclose(h_sh[:15], h_ref[:15], rtol=1e-6)


def test_solves_what_sharded_cg_cannot():
    A, n = _convdiff_op(16, peclet=30.0)
    blocks, bcols, b_pad, b = _bell_setup(A, n)
    Asp = sp.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=(n, n))
    x_true = spla.spsolve(Asp.tocsc(), np.asarray(b))
    x_sh, info_sh = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-9, maxiter=6 * n, method="bicgstab")
    assert bool(info_sh.converged)
    np.testing.assert_allclose(np.asarray(x_sh[:n]), x_true, atol=1e-7)
    # the standard sharded CG loop cannot reach this tolerance here
    _, info_cg = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-9, maxiter=6 * n, use_fused="never")
    assert not bool(info_cg.converged)


def test_jacobi_composes():
    A, n = _convdiff_op(16, peclet=8.0)
    # diagonal scaling so Jacobi genuinely changes the iteration
    d = np.exp(np.linspace(0.0, 5.0, n))
    Asp = sp.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=(n, n))
    As = (sp.diags(d) @ Asp @ sp.diags(d)).tocsr()
    op = CSRMatrix.from_scipy(As)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(op.data), np.asarray(op.indices), np.asarray(op.indptr),
        (n, n), N_DEV, bm=8, bn=8)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    b_pad = jnp.zeros((n_pad,), jnp.float64).at[:n].set(jnp.asarray(b))
    inv_diag = np.ones(n_pad)
    inv_diag[:n] = 1.0 / As.diagonal()
    x_pl, info_pl = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b_pad, tol=1e-8,
        maxiter=8 * n, method="bicgstab")
    x_pc, info_pc = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b_pad, tol=1e-8,
        maxiter=8 * n, method="bicgstab", inv_diag=jnp.asarray(inv_diag))
    assert bool(info_pc.converged)
    assert int(info_pc.iterations) < int(info_pl.iterations)
    x_true = spla.spsolve(As.tocsc(), b)
    np.testing.assert_allclose(
        np.asarray(x_pc[:n]), x_true, rtol=0,
        atol=1e-6 * float(np.linalg.norm(x_true)))
    # and the preconditioned mesh solve matches the single-device one
    from conjugategradient_tpu.solver.precond import jacobi_preconditioner

    x_sd, info_sd = bicgstab_solve(
        op, jnp.asarray(b), tol=1e-8, maxiter=8 * n,
        M=jacobi_preconditioner(op))
    assert abs(int(info_pc.iterations) - int(info_sd.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(x_pc[:n]), np.asarray(x_sd),
                               atol=1e-6 * float(np.linalg.norm(x_true)))


def test_zero_tol_runs_to_cap():
    A, n = _convdiff_op(12)
    blocks, bcols, b_pad, _ = _bell_setup(A, n)
    _, info = sharded_cg_solve(
        blocks, bcols, b_pad, tol=0.0, maxiter=9, method="bicgstab")
    assert int(info.iterations) == 9
    assert not bool(info.converged)


def test_recompute_and_sstep_exclusions():
    A, n = _convdiff_op(12)
    blocks, bcols, b_pad, _ = _bell_setup(A, n)
    with pytest.raises(ValueError, match="residual-replacement"):
        sharded_cg_solve(blocks, bcols, b_pad, tol=1e-8,
                         method="bicgstab", recompute_r_every=10)
