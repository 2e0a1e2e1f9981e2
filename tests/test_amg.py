"""Smoothed-aggregation AMG tests (solver/amg.py).

The reference feeds arbitrary SuiteSparse SPD matrices to UNpreconditioned
CG (test/Tester.cpp); AMG is the framework's grid-free preconditioner for
exactly that input class.  Contracts under test: the V-cycle operator is
symmetric positive definite (PCG requirement), PCG converges to the true
solution, iteration counts beat plain/Jacobi decisively and grow only
mildly with problem size, and both prolongator variants (smoothed /
unsmoothed) work."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import (
    CSRMatrix,
    cg_solve,
    jacobi_preconditioner,
    smoothed_aggregation_preconditioner,
)
from conjugategradient_tpu.problems import banded_spd_coo, poisson2d_coo
from conjugategradient_tpu.types import StencilOperator


def _poisson2d(nx):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    return A, shape[0]


def _mg_matrix(apply, n, dtype=jnp.float64):
    eye = np.eye(n)
    return np.stack(
        [np.asarray(apply(jnp.asarray(eye[:, j], dtype=dtype))) for j in range(n)],
        axis=1,
    )


@pytest.mark.parametrize("smooth", [True, False])
def test_vcycle_symmetric_positive(smooth):
    A, n = _poisson2d(12)  # n = 144
    apply = smoothed_aggregation_preconditioner(
        A, coarse_size=30, smooth_prolongator=smooth
    )
    assert apply.n_levels >= 2
    M = _mg_matrix(apply, n)
    np.testing.assert_allclose(M, M.T, rtol=0, atol=1e-12 * np.abs(M).max())
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0, f"AMG V-cycle not PD: min eig {w.min()}"


def test_amg_pcg_converges_to_true_solution():
    A, n = _poisson2d(24)
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(n)
    b = jnp.asarray(np.asarray(A.to_dense()) @ x_true)
    apply = smoothed_aggregation_preconditioner(A)
    x, info = cg_solve(A, b, tol=1e-10, M=apply)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)


def test_amg_beats_plain_and_jacobi():
    A, n = _poisson2d(48)  # n = 2304
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n))
    tol = 1e-8 * float(jnp.linalg.norm(b))
    _, plain = cg_solve(A, b, tol=tol)
    _, jac = cg_solve(A, b, tol=tol, M=jacobi_preconditioner(A))
    amg = smoothed_aggregation_preconditioner(A)
    _, mg = cg_solve(A, b, tol=tol, M=amg)
    assert bool(mg.converged)
    assert int(mg.iterations) * 3 < int(plain.iterations), (
        int(mg.iterations), int(plain.iterations))
    assert int(mg.iterations) * 2 < int(jac.iterations), (
        int(mg.iterations), int(jac.iterations))


def test_amg_iterations_grow_mildly_with_size():
    iters = {}
    for nx in (24, 48):
        A, n = _poisson2d(nx)
        b = jnp.asarray(np.random.default_rng(7).standard_normal(n))
        tol = 1e-8 * float(jnp.linalg.norm(b))
        _, info = cg_solve(
            A, b, tol=tol, M=smoothed_aggregation_preconditioner(A)
        )
        assert bool(info.converged)
        iters[nx] = int(info.iterations)
    # 4x the unknowns may cost at most ~40% more iterations (smoothed
    # aggregation is near-optimal on Poisson; plain CG would double)
    assert iters[48] <= 1.4 * iters[24] + 2, iters


def test_unsmoothed_variant_still_helps():
    A, n = _poisson2d(32)
    b = jnp.asarray(np.random.default_rng(9).standard_normal(n))
    tol = 1e-8 * float(jnp.linalg.norm(b))
    _, plain = cg_solve(A, b, tol=tol)
    _, ua = cg_solve(
        A, b, tol=tol,
        M=smoothed_aggregation_preconditioner(A, smooth_prolongator=False),
    )
    assert bool(ua.converged)
    assert int(ua.iterations) * 2 < int(plain.iterations)


def test_two_cycles_cut_iterations():
    A, n = _poisson2d(32)
    b = jnp.asarray(np.random.default_rng(11).standard_normal(n))
    tol = 1e-8 * float(jnp.linalg.norm(b))
    _, one = cg_solve(
        A, b, tol=tol, M=smoothed_aggregation_preconditioner(A, cycles=1)
    )
    _, two = cg_solve(
        A, b, tol=tol, M=smoothed_aggregation_preconditioner(A, cycles=2)
    )
    assert bool(two.converged)
    assert int(two.iterations) < int(one.iterations)


def test_banded_problem_and_scipy_input_agree():
    import scipy.sparse as sp

    rows, cols, vals, shape = banded_spd_coo(600, bandwidth=5, seed=13)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    A_sp = sp.csr_matrix((vals, (rows, cols)), shape=shape)
    b = jnp.asarray(np.random.default_rng(13).standard_normal(shape[0]))
    tol = 1e-9 * float(jnp.linalg.norm(b))
    x1, i1 = cg_solve(A, b, tol=tol, M=smoothed_aggregation_preconditioner(A))
    x2, i2 = cg_solve(
        A, b, tol=tol, M=smoothed_aggregation_preconditioner(A_sp)
    )
    assert bool(i1.converged) and bool(i2.converged)
    assert int(i1.iterations) == int(i2.iterations)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-12)


def test_hierarchy_metadata():
    A, n = _poisson2d(32)
    apply = smoothed_aggregation_preconditioner(A, coarse_size=50)
    assert apply.n_levels >= 3
    sizes = apply.level_sizes
    assert sizes[0] == n and all(
        sizes[i + 1] < sizes[i] for i in range(len(sizes) - 1)
    )
    assert sizes[-1] <= 50
    assert apply.operator_complexity < 3.0  # setup didn't blow up storage


def test_validation_and_rejections():
    op = StencilOperator.poisson((8, 8, 8), dtype=jnp.float64)
    with pytest.raises(TypeError, match="multigrid_preconditioner"):
        smoothed_aggregation_preconditioner(op)
    A, _ = _poisson2d(8)
    with pytest.raises(ValueError, match="nu"):
        smoothed_aggregation_preconditioner(A, nu=0)
    with pytest.raises(ValueError, match="cycles"):
        smoothed_aggregation_preconditioner(A, cycles=0)
    with pytest.raises(ValueError, match="omega"):
        smoothed_aggregation_preconditioner(A, omega=2.5)
    rect = np.zeros((4, 6))
    with pytest.raises((TypeError, ValueError)):
        smoothed_aggregation_preconditioner(rect)


def test_powerlaw_guards_keep_setup_cheap_and_effective():
    """Scale-free graphs are SA's classic failure mode: without the
    densification guard the smoothed prolongator drove operator complexity
    to 238x and setup to minutes (measured).  With the guard, setup is
    seconds and AMG still beats Jacobi on iterations."""
    import time

    from conjugategradient_tpu.problems import powerlaw_spd_coo

    rows, cols, vals, shape = powerlaw_spd_coo(4000, seed=0)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(shape[0]))
    tol = 1e-8 * float(jnp.linalg.norm(b))
    t0 = time.time()
    amg = smoothed_aggregation_preconditioner(A)
    assert time.time() - t0 < 30, "guarded setup must not densify"
    _, jac = cg_solve(A, b, tol=tol, M=jacobi_preconditioner(A))
    _, mg = cg_solve(A, b, tol=tol, M=amg)
    assert bool(mg.converged)
    assert int(mg.iterations) < int(jac.iterations)


def test_stalled_hierarchy_falls_back_to_jacobi_coarse():
    """A graph with no couplings cannot coarsen at all; above dense_cap
    the coarsest solve must degrade to (symmetric) Jacobi sweeps instead
    of materializing an O(n^2) dense inverse."""
    n = 300
    A = CSRMatrix.from_arrays(
        2.0 + np.arange(n, dtype=np.float64) % 3,
        np.arange(n, dtype=np.int32),
        np.arange(n + 1, dtype=np.int32),
        (n, n),
    )
    apply = smoothed_aggregation_preconditioner(A, dense_cap=50)
    assert apply.n_levels == 1  # nothing aggregated
    M = _mg_matrix(apply, n)
    np.testing.assert_allclose(M, M.T, rtol=0, atol=1e-13 * np.abs(M).max())
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    x, info = cg_solve(A, b, tol=1e-10, M=apply)
    assert bool(info.converged)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(b) / np.asarray(A.data), rtol=1e-8
    )


def test_banded_levels_ride_the_dia_layout():
    """level_layout="auto" must put banded levels on the DIA layout (no
    gathers in the smoothing matvecs — docs/performance.md's layout
    thesis) and force-csr must not change the preconditioner's math."""
    from conjugategradient_tpu.solver.amg import _level_operator, _to_scipy_csr
    from conjugategradient_tpu.types import DIAMatrix

    A, n = _poisson2d(24)
    A_sp = _to_scipy_csr(A)
    op = _level_operator(A_sp, jnp.float64, "auto")
    assert isinstance(op, DIAMatrix), type(op).__name__
    b = jnp.asarray(np.random.default_rng(17).standard_normal(n))
    tol = 1e-9 * float(jnp.linalg.norm(b))
    _, i_auto = cg_solve(
        A, b, tol=tol, M=smoothed_aggregation_preconditioner(A)
    )
    _, i_csr = cg_solve(
        A, b, tol=tol,
        M=smoothed_aggregation_preconditioner(A, level_layout="csr"),
    )
    assert bool(i_auto.converged) and bool(i_csr.converged)
    # same math, different rounding: counts may differ by a step or two
    assert abs(int(i_auto.iterations) - int(i_csr.iterations)) <= 2


def test_native_aggregation_matches_python():
    """native/amg_agg.cpp must reproduce the Python pass bitwise — same
    visit order, same tie-breaks — so hierarchies are identical with and
    without the native library."""
    from conjugategradient_tpu.io import native as native_io
    from conjugategradient_tpu.solver.amg import (
        _aggregate_py,
        _strength_graph,
        _to_scipy_csr,
    )

    if not native_io.available():
        pytest.skip("native library not built")
    from conjugategradient_tpu.io.native import amg_aggregate_native
    from conjugategradient_tpu.problems import powerlaw_spd_coo

    cases = []
    A, _ = _poisson2d(20)
    cases.append(_strength_graph(_to_scipy_csr(A), 0.08))
    rows, cols, vals, shape = powerlaw_spd_coo(1500, seed=4)
    A2 = CSRMatrix.from_coo(rows, cols, vals, shape)
    cases.append(_strength_graph(_to_scipy_csr(A2), 0.08))
    cases.append(_strength_graph(_to_scipy_csr(A2), 0.0))
    for S in cases:
        agg_py, n_py = _aggregate_py(S)
        agg_c, n_c = amg_aggregate_native(S.indptr, S.indices, S.shape[0])
        assert n_py == n_c
        np.testing.assert_array_equal(agg_py, agg_c)


class TestChebyshevSmoother:
    def test_error_polynomial_is_shifted_scaled_chebyshev(self):
        """The degree-nu smoother's error operator must be EXACTLY
        T_nu((theta - t)/delta)/T_nu(theta/delta) in t = eig(D^-1 A) —
        checked against a dense eigendecomposition."""
        from numpy.polynomial import chebyshev as C

        from conjugategradient_tpu.solver.amg import _cheb_smooth_steps

        rng = np.random.default_rng(0)
        n = 32
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        lam = np.linspace(0.05, 1.9, n)
        A = Q @ np.diag(lam) @ Q.T  # D = I, so D^-1 A = A
        for nu in (1, 2, 3, 4):
            a, b = 1.9 / 6.0, 1.9
            step1, coeffs = _cheb_smooth_steps(a, b, nu)
            B = np.eye(n)
            d = step1 * B
            U = d.copy()
            for c_d, c_z in coeffs:
                z = B - A @ U
                d = c_d * d + c_z * z
                U = U + d
            S = np.eye(n) - U @ A  # error operator of the zero-guess apply
            theta, delta = 0.5 * (b + a), 0.5 * (b - a)
            sel = [0] * nu + [1]
            p = C.chebval((theta - lam) / delta, sel) / C.chebval(
                theta / delta, sel
            )
            S_want = Q @ np.diag(p) @ Q.T
            np.testing.assert_allclose(S, S_want, atol=1e-12)

    def test_chebyshev_cycle_is_symmetric_and_converges(self):
        A, n = _poisson2d(48)
        M = smoothed_aggregation_preconditioner(A, smoother="chebyshev")
        rng = np.random.default_rng(5)
        u = jnp.asarray(rng.standard_normal(n))
        v = jnp.asarray(rng.standard_normal(n))
        uMv, vMu = float(u @ M(v)), float(v @ M(u))
        assert abs(uMv - vMu) <= 1e-12 * abs(uMv)
        b = jnp.asarray(rng.standard_normal(n))
        tol = 1e-9 * float(jnp.linalg.norm(b))
        x, info = cg_solve(A, b, tol=tol, M=M)
        assert bool(info.converged)

    def test_chebyshev_not_worse_than_jacobi_at_equal_degree(self):
        """The measured contract behind the default cheb_lower=1/6:
        chebyshev matches or beats jacobi at the same per-sweep matvec
        count on the PDE suite (poisson 192^2: 15 -> 13 at nu=2)."""
        A, n = _poisson2d(96)
        b = jnp.asarray(np.random.default_rng(6).standard_normal(n))
        tol = 1e-9 * float(jnp.linalg.norm(b))
        _, ij = cg_solve(
            A, b, tol=tol, M=smoothed_aggregation_preconditioner(A)
        )
        _, ic = cg_solve(
            A, b, tol=tol,
            M=smoothed_aggregation_preconditioner(A, smoother="chebyshev"),
        )
        assert bool(ic.converged)
        assert int(ic.iterations) <= int(ij.iterations)

    def test_validation(self):
        A, _ = _poisson2d(12)
        with pytest.raises(ValueError, match="smoother"):
            smoothed_aggregation_preconditioner(A, smoother="sor")
        with pytest.raises(ValueError, match="cheb_lower"):
            smoothed_aggregation_preconditioner(
                A, smoother="chebyshev", cheb_lower=1.5
            )


class TestNearNullspace:
    def _scaled_laplacian(self, nx=64, seed=0):
        import scipy.sparse as sp

        rows, cols, vals, shape = poisson2d_coo(nx)
        L = sp.csr_matrix((vals, (rows, cols)), shape=shape)
        rng = np.random.default_rng(seed)
        s = np.exp(rng.uniform(-3, 3, shape[0]))
        A_sp = (sp.diags(s) @ L @ sp.diags(s)).tocsr()
        A = CSRMatrix.from_arrays(A_sp.data, A_sp.indices, A_sp.indptr,
                                  tuple(shape))
        return A, s, shape[0]

    def test_tentative_prolongator_interpolates_modes_exactly(self):
        """The per-aggregate QR contract: P0 @ B_coarse == B exactly and
        P0's columns are orthonormal within each aggregate."""
        from conjugategradient_tpu.solver.amg import _tentative_prolongator

        rng = np.random.default_rng(1)
        n, k = 200, 4
        agg = rng.integers(0, 37, n)
        agg[np.arange(37)] = np.arange(37)  # every aggregate non-empty
        B = rng.standard_normal((n, k))
        P0, B_c = _tentative_prolongator(agg, 37, B)
        np.testing.assert_allclose(P0 @ B_c, B, atol=1e-12)
        G = (P0.T @ P0).toarray()
        np.testing.assert_allclose(G, np.eye(P0.shape[1]), atol=1e-12)

    def test_scaled_laplacian_true_mode_beats_constant(self):
        """The canonical near-nullspace case: on S L S the smooth mode is
        1/s, not the constant — supplying it must cut iterations by at
        least 2x (measured 105 -> 38)."""
        A, s, n = self._scaled_laplacian()
        b = jnp.asarray(np.random.default_rng(2).standard_normal(n))
        tol = 1e-9 * float(jnp.linalg.norm(b))
        _, i_const = cg_solve(
            A, b, tol=tol, maxiter=2000,
            M=smoothed_aggregation_preconditioner(A),
        )
        _, i_mode = cg_solve(
            A, b, tol=tol, maxiter=2000,
            M=smoothed_aggregation_preconditioner(A, near_nullspace=1.0 / s),
        )
        assert bool(i_mode.converged)
        assert 2 * int(i_mode.iterations) <= int(i_const.iterations)

    def test_rbm_block_hierarchy_converges_and_is_symmetric(self):
        """Rigid-body modes + node (blocksize=3) aggregation on the
        elasticity stand-in: converges, cycle symmetric, hierarchy
        actually coarsens (the dof-level aggregation couldn't: k=6
        columns per ~3-dof aggregate measured 5184 -> 5074)."""
        from conjugategradient_tpu import rigid_body_modes
        from conjugategradient_tpu.problems import elasticity3d_coo

        nx = 8
        rows, cols, vals, shape = elasticity3d_coo(nx)
        A = CSRMatrix.from_coo(rows, cols, vals, shape)
        coords = np.stack(
            np.meshgrid(np.arange(nx), np.arange(nx), np.arange(nx),
                        indexing="ij"), axis=-1,
        ).reshape(-1, 3).astype(float)
        B = rigid_body_modes(coords)
        assert B.shape == (shape[0], 6)
        M = smoothed_aggregation_preconditioner(
            A, near_nullspace=B, blocksize=3)
        assert M.level_sizes[1] <= 0.6 * M.level_sizes[0]
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.standard_normal(shape[0]))
        v = jnp.asarray(rng.standard_normal(shape[0]))
        uMv, vMu = float(u @ M(v)), float(v @ M(u))
        assert abs(uMv - vMu) <= 1e-12 * abs(uMv)
        b = jnp.asarray(rng.standard_normal(shape[0]))
        tol = 1e-9 * float(jnp.linalg.norm(b))
        _, info = cg_solve(A, b, tol=tol, M=M)
        assert bool(info.converged)

    def test_rigid_body_modes_contract(self):
        from conjugategradient_tpu import rigid_body_modes

        coords = np.array([[0.0, 0, 0], [1, 0, 0], [0, 2, 0], [0, 0, 3]])
        B = rigid_body_modes(coords)
        assert B.shape == (12, 6)
        # rank 6 (independent modes) and exact translations
        assert np.linalg.matrix_rank(B) == 6
        np.testing.assert_allclose(B[0::3, 0], 1.0)
        # rotation about z moves node (1,0,0) in -y... (-y, x, 0) at
        # centered coords
        c = coords - coords.mean(axis=0)
        np.testing.assert_allclose(B[0::3, 5], -c[:, 1])
        np.testing.assert_allclose(B[1::3, 5], c[:, 0])
        with pytest.raises(ValueError, match="n_nodes"):
            rigid_body_modes(np.zeros((4, 2)))

    def test_validation(self):
        A, _ = _poisson2d(12)
        with pytest.raises(ValueError, match="near_nullspace rows"):
            smoothed_aggregation_preconditioner(
                A, near_nullspace=np.ones(7))
        with pytest.raises(ValueError, match="finite"):
            smoothed_aggregation_preconditioner(
                A, near_nullspace=np.full(144, np.nan))
        with pytest.raises(ValueError, match="blocksize"):
            smoothed_aggregation_preconditioner(A, blocksize=0)
        with pytest.raises(ValueError, match="divisible"):
            smoothed_aggregation_preconditioner(A, blocksize=5)


def test_amg_rides_batched_multi_rhs():
    """The V-cycle apply is pure traceable jnp, so cg_solve_batched's
    vmap-over-lanes preconditioner hook composes with AMG — pin it (a
    non-vmappable apply would break here, not at build time)."""
    from conjugategradient_tpu.solver.batched import cg_solve_batched

    A, n = _poisson2d(48)
    B = jnp.asarray(np.random.default_rng(11).standard_normal((4, n)))
    tol = 1e-9 * jnp.linalg.norm(B, axis=1)
    M = smoothed_aggregation_preconditioner(A)
    X, info = cg_solve_batched(A, B, tol=tol, M=M)
    assert bool(np.all(np.asarray(info.converged)))
    assert int(np.max(np.asarray(info.iterations))) <= 15
    for j in range(4):
        r = np.asarray(B[j]) - np.asarray(A.matvec(X[j]))
        assert np.linalg.norm(r) <= 10 * float(tol[j])


class TestAmgGmresNonsymmetric:
    """SA-AMG as a RIGHT preconditioner for GMRES on mildly nonsymmetric
    convection-diffusion (round-5 VERDICT item 6)."""

    def test_amg_gmres_beats_unpreconditioned(self):
        from conjugategradient_tpu import gmres_solve
        from conjugategradient_tpu.problems import convection_diffusion_2d_coo

        rows, cols, vals, shape = convection_diffusion_2d_coo(
            48, peclet=10.0)
        A = CSRMatrix.from_coo(rows, cols, vals, shape)
        n = shape[0]
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(n))
        tol = 1e-8 * float(jnp.linalg.norm(b))

        M = smoothed_aggregation_preconditioner(A)
        x_pl, i_pl = gmres_solve(A, b, tol=tol, maxiter=6 * n, restart=30)
        x_mg, i_mg = gmres_solve(A, b, tol=tol, maxiter=6 * n, restart=30,
                                 M=M)
        assert bool(i_mg.converged)
        # the algorithmic win: several-fold fewer Krylov matvecs
        assert int(i_mg.iterations) * 3 <= int(i_pl.iterations), (
            int(i_mg.iterations), int(i_pl.iterations))
        r = np.asarray(b) - np.asarray(A.matvec(x_mg))
        assert np.linalg.norm(r) <= 5 * tol

    def test_high_peclet_still_converges_with_tuning(self):
        # convection-dominated: the documented guard — raise theta, drop
        # prolongator smoothing — keeps AMG useful as a GMRES M
        from conjugategradient_tpu import gmres_solve
        from conjugategradient_tpu.problems import convection_diffusion_2d_coo

        rows, cols, vals, shape = convection_diffusion_2d_coo(
            32, peclet=60.0)
        A = CSRMatrix.from_coo(rows, cols, vals, shape)
        n = shape[0]
        b = jnp.ones((n,), jnp.float64)
        tol = 1e-8 * float(jnp.linalg.norm(b))
        M = smoothed_aggregation_preconditioner(
            A, theta=0.25, smooth_prolongator=False)
        x, info = gmres_solve(A, b, tol=tol, maxiter=6 * n, restart=30,
                              M=M)
        assert bool(info.converged)
        r = np.asarray(b) - np.asarray(A.matvec(x))
        assert np.linalg.norm(r) <= 5 * tol
