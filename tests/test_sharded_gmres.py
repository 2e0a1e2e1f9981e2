"""Sharded GMRES(m) (method="gmres" through the one sharded solve core)
on 8 virtual CPU devices: restarted minimal-residual on the row mesh.

Collective pattern: one halo'd local matvec + THREE psums per inner
Arnoldi step (the two CGS2 projection vectors + the basis norm), one more
matvec + psum per restart cycle for the true-residual recompute
(loops._sharded_gmres docstring).

Parity contract vs the single-device solver (solver/gmres.py): the Givens
scalars are replicated functions of psum outputs and the restart recompute
resets drift every cycle, so iteration counts match EXACTLY in f64 and the
solutions agree to roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from conjugategradient_tpu import CSRMatrix, gmres_solve
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


def _bell_setup(A, n, bm=8, bn=8, seed=0):
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        (n, n), N_DEV, bm=bm, bn=bn)
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(n)
    b_pad = jnp.zeros((n_pad,), jnp.float64).at[:n].set(jnp.asarray(b))
    return jnp.asarray(blocks), jnp.asarray(bcols), b_pad, jnp.asarray(b)


def test_nonsymmetric_matches_single_device_exactly():
    A, n = _convdiff_op()
    blocks, bcols, b_pad, b = _bell_setup(A, n)
    x_ref, info_ref = gmres_solve(A, b, tol=1e-9, restart=25, maxiter=4 * n)
    x_sh, info_sh = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-9, maxiter=4 * n, method="gmres",
        gmres_restart=25)
    assert bool(info_ref.converged) and bool(info_sh.converged)
    # restart recompute kills drift: f64 iteration counts match exactly
    assert int(info_sh.iterations) == int(info_ref.iterations)
    r = np.asarray(b) - np.asarray(A.matvec(jnp.asarray(x_sh[:n])))
    assert np.linalg.norm(r) <= 5e-9
    np.testing.assert_allclose(np.asarray(x_sh[:n]), np.asarray(x_ref),
                               atol=1e-10)
    # trajectory parity (sharded history is SQUARED norms, GmresInfo norms)
    h_ref = np.asarray(info_ref.rnorm_history)
    h_sh = np.sqrt(np.asarray(info_sh.rho_history))
    k = int(info_ref.iterations)
    # rtol loose at the tail: near-roundoff residual magnitudes differ by
    # psum association order (abs diffs ~2e-16)
    np.testing.assert_allclose(h_sh[: k + 1], h_ref[: k + 1],
                               rtol=1e-6, atol=1e-12)


def test_restart_length_is_a_real_knob():
    A, n = _convdiff_op(16, peclet=30.0)
    blocks, bcols, b_pad, b = _bell_setup(A, n, seed=1)
    Asp = sp.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=(n, n))
    x_true = spla.spsolve(Asp.tocsc(), np.asarray(b))
    x5, i5 = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-8, maxiter=8 * n, method="gmres",
        gmres_restart=5)
    x40, i40 = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-8, maxiter=8 * n, method="gmres",
        gmres_restart=40)
    assert bool(i5.converged) and bool(i40.converged)
    assert int(i5.iterations) >= int(i40.iterations)
    np.testing.assert_allclose(np.asarray(x40[:n]), x_true, atol=1e-6)


def test_jacobi_composes_right_preconditioned():
    A, n = _convdiff_op(16, peclet=8.0)
    d = np.exp(np.linspace(0.0, 5.0, n))
    Asp = sp.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=(n, n))
    As = (sp.diags(d) @ Asp @ sp.diags(d)).tocsr()
    op = CSRMatrix.from_scipy(As)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(op.data), np.asarray(op.indices), np.asarray(op.indptr),
        (n, n), N_DEV, bm=8, bn=8)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n)
    b_pad = jnp.zeros((n_pad,), jnp.float64).at[:n].set(jnp.asarray(b))
    inv_diag = np.ones(n_pad)
    inv_diag[:n] = 1.0 / As.diagonal()
    x_pl, info_pl = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b_pad, tol=1e-8,
        maxiter=8 * n, method="gmres")
    x_pc, info_pc = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b_pad, tol=1e-8,
        maxiter=8 * n, method="gmres", inv_diag=jnp.asarray(inv_diag))
    assert bool(info_pc.converged)
    assert int(info_pc.iterations) < int(info_pl.iterations)
    x_true = spla.spsolve(As.tocsc(), b)
    np.testing.assert_allclose(
        np.asarray(x_pc[:n]), x_true, rtol=0,
        atol=1e-6 * float(np.linalg.norm(x_true)))
    # and the preconditioned mesh solve matches single-device EXACTLY
    from conjugategradient_tpu.solver.precond import jacobi_preconditioner

    x_sd, info_sd = gmres_solve(
        op, jnp.asarray(b), tol=1e-8, maxiter=8 * n,
        M=jacobi_preconditioner(op))
    assert int(info_pc.iterations) == int(info_sd.iterations)
    np.testing.assert_allclose(np.asarray(x_pc[:n]), np.asarray(x_sd),
                               atol=1e-8 * float(np.linalg.norm(x_true)))


def test_zero_tol_runs_to_cap_mid_cycle():
    A, n = _convdiff_op(12)
    blocks, bcols, b_pad, _ = _bell_setup(A, n)
    # cap 13 with m=5: two full cycles + 3 steps of the third — the cap
    # must land mid-cycle without over-counting
    _, info = sharded_cg_solve(
        blocks, bcols, b_pad, tol=0.0, maxiter=13, method="gmres",
        gmres_restart=5)
    assert int(info.iterations) == 13
    assert not bool(info.converged)


def test_exclusions():
    A, n = _convdiff_op(12)
    blocks, bcols, b_pad, _ = _bell_setup(A, n)
    with pytest.raises(ValueError, match="residual-replacement"):
        sharded_cg_solve(blocks, bcols, b_pad, tol=1e-8,
                         method="gmres", recompute_r_every=10)


def test_flexible_matches_single_device_fgmres():
    """gmres_flexible=True (mesh FGMRES) with a NONLINEAR M_local: the
    z-basis update must match single-device gmres_solve(flexible=True)
    with the same elementwise nonlinear M, and actually solve the system.
    (ADVICE r4: the sharded path used to apply M as a fixed right
    preconditioner only — a nonlinear M silently mis-updated.)"""
    A, n = _convdiff_op(16, peclet=15.0)
    blocks, bcols, b_pad, b = _bell_setup(A, n, seed=3)

    def nonlinear_m(v):  # elementwise => identical per-shard and globally
        return v / (1.0 + 0.3 * jnp.abs(v))

    x_sh, info_sh = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-9, maxiter=6 * n, method="gmres",
        gmres_restart=25, gmres_flexible=True, M_local=nonlinear_m)
    x_sd, info_sd = gmres_solve(
        A, b, tol=1e-9, maxiter=6 * n, restart=25, M=nonlinear_m,
        flexible=True)
    assert bool(info_sh.converged) and bool(info_sd.converged)
    assert int(info_sh.iterations) == int(info_sd.iterations)
    r = np.asarray(b) - np.asarray(A.matvec(jnp.asarray(x_sh[:n])))
    assert np.linalg.norm(r) <= 5e-9
    np.testing.assert_allclose(np.asarray(x_sh[:n]), np.asarray(x_sd),
                               atol=1e-9 * max(1.0, float(np.linalg.norm(x_sd))))


def test_flexible_coincides_with_standard_for_linear_m():
    """With a fixed LINEAR M_local the two variants coincide in exact
    arithmetic; in f64 the iteration counts match and solutions agree."""
    A, n = _convdiff_op(14, peclet=10.0)
    blocks, bcols, b_pad, b = _bell_setup(A, n, seed=4)

    def linear_m(v):
        return 0.5 * v

    kw = dict(tol=1e-9, maxiter=6 * n, method="gmres", gmres_restart=20,
              M_local=linear_m)
    x_f, info_f = sharded_cg_solve(blocks, bcols, b_pad,
                                   gmres_flexible=True, **kw)
    x_s, info_s = sharded_cg_solve(blocks, bcols, b_pad, **kw)
    assert bool(info_f.converged) and bool(info_s.converged)
    assert int(info_f.iterations) == int(info_s.iterations)
    np.testing.assert_allclose(np.asarray(x_f[:n]), np.asarray(x_s[:n]),
                               rtol=0, atol=1e-10)


def test_unrolled_arnoldi_matches_fori_on_mesh():
    """The static-j Arnoldi (the TPU form) must match the fori form to
    roundoff on the mesh, like solver/gmres.py's unroll= (forced here via
    the loops._GMRES_UNROLL_OVERRIDE test hook; caches cleared so both
    forms actually compile)."""
    from conjugategradient_tpu.parallel import loops
    from conjugategradient_tpu.parallel import sharded_cg_solve as _  # noqa
    import conjugategradient_tpu.parallel.sharded_cg as sc

    A, n = _convdiff_op(14, peclet=12.0)
    blocks, bcols, b_pad, b = _bell_setup(A, n, seed=8)
    kw = dict(tol=1e-9, maxiter=4 * n, method="gmres", gmres_restart=19)
    results = {}
    for form in (False, True):
        loops._GMRES_UNROLL_OVERRIDE = form
        sc._SOLVE_CACHE.clear()
        try:
            results[form] = sharded_cg_solve(blocks, bcols, b_pad, **kw)
        finally:
            loops._GMRES_UNROLL_OVERRIDE = None
            sc._SOLVE_CACHE.clear()
    (x_f, i_f), (x_u, i_u) = results[False], results[True]
    assert bool(i_f.converged) and bool(i_u.converged)
    assert int(i_u.iterations) == int(i_f.iterations)
    np.testing.assert_allclose(np.asarray(x_u[:n]), np.asarray(x_f[:n]),
                               rtol=0, atol=1e-10)
