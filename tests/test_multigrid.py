"""Geometric multigrid preconditioner tests (solver/multigrid.py).

The reference has nothing like this (plain CG only, src/CG.hpp:255-454);
the contract under test is ours: the V-cycle must be a SYMMETRIC positive
operator (PCG requirement), its transfer operators exact transposes, and
PCG-with-MG must converge in a near-mesh-independent handful of iterations
where plain CG needs O(n_x)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import cg_solve
from conjugategradient_tpu.ops.stencil import poisson7_csr
from conjugategradient_tpu.solver.multigrid import (
    _dense_stencil_inverse,
    _level_shapes,
    _prolong,
    _restrict,
    multigrid_preconditioner,
)
from conjugategradient_tpu.types import CSRMatrix, StencilOperator


def _mg_matrix(apply, n, dtype=jnp.float64):
    """Materialize M^{-1} column by column (small grids only)."""
    eye = np.eye(n)
    cols = [np.asarray(apply(jnp.asarray(eye[:, j], dtype=dtype))) for j in range(n)]
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("shape", [(7, 7, 7), (8, 6, 4), (9, 9, 1)])
def test_transfer_operators_are_transposes(shape, rng):
    """R must equal (1/2)^d P^T — the identity that makes the cycle
    symmetric.  Checked as <R u, v>_coarse == (1/2)^d <u, P v>_fine."""
    coarse = _level_shapes(shape, coarse_size=1, max_levels=2)[1]
    d = sum(1 for a, b in zip(shape, coarse) if a != b)
    u = jnp.asarray(rng.standard_normal(shape))
    v = jnp.asarray(rng.standard_normal(coarse))
    lhs = float(jnp.vdot(_restrict(u, coarse), v))
    rhs = float(jnp.vdot(u, _prolong(v, shape))) * 0.5**d
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize("shape,center", [((7, 7, 7), 6.0), ((8, 8, 8), 6.0), ((9, 9, 1), 4.0)])
def test_vcycle_is_symmetric_positive(shape, center):
    op = StencilOperator(
        jnp.asarray(center, jnp.float64), jnp.asarray(-1.0, jnp.float64), shape
    )
    apply = multigrid_preconditioner(op, coarse_size=27)
    n = int(np.prod(shape))
    M = _mg_matrix(apply, n)
    np.testing.assert_allclose(M, M.T, rtol=0, atol=1e-12 * np.abs(M).max())
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0, f"V-cycle operator not positive definite: min eig {w.min()}"


def test_vcycle_contracts_error():
    """One V-cycle used as a SOLVER iteration must contract the error by
    a grid-independent factor.  Measured on 15^3: rates ~[0.07, 0.19,
    0.21] — the ~0.2 asymptote is the expected V(2,2) damped-Jacobi rate
    (Gauss-Seidel smoothers do better but serialize, which is exactly
    what the TPU design avoids); 0.3 is the regression bound."""
    shape = (15, 15, 15)
    op = StencilOperator.poisson(shape, dtype=jnp.float64)
    apply = multigrid_preconditioner(op, coarse_size=27)
    rng = np.random.default_rng(7)
    x_true = jnp.asarray(rng.standard_normal(int(np.prod(shape))))
    b = op.matvec(x_true)
    x = jnp.zeros_like(b)
    errs = [float(jnp.linalg.norm(x - x_true))]
    for _ in range(3):
        x = x + apply(b - op.matvec(x))
        errs.append(float(jnp.linalg.norm(x - x_true)))
    rates = [errs[i + 1] / errs[i] for i in range(3)]
    assert max(rates) < 0.3, f"V-cycle contraction rates too weak: {rates}"


@pytest.mark.parametrize("shape", [(16, 16, 16), (31, 31, 31)])
def test_mgpcg_converges_to_true_solution(shape):
    op = StencilOperator.poisson(shape, dtype=jnp.float64)
    n = int(np.prod(shape))
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(n)
    b = jnp.asarray(np.asarray(poisson7_csr(shape).to_dense() @ x_true))
    apply = multigrid_preconditioner(op)
    x, info = cg_solve(op, b, tol=1e-10, M=apply)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)


def test_mgpcg_iteration_counts_nearly_mesh_independent():
    """The whole point: plain CG grows like O(n_x); MG-PCG must sit at
    O(10) for every size, and barely move between 15^3 and 31^3."""
    iters = {}
    for nx in (15, 31):
        shape = (nx, nx, nx)
        op = StencilOperator.poisson(shape, dtype=jnp.float64)
        b = jnp.asarray(
            np.random.default_rng(5).standard_normal(int(np.prod(shape)))
        )
        tol = 1e-8 * float(jnp.linalg.norm(b))
        _, plain = cg_solve(op, b, tol=tol)
        _, mg = cg_solve(op, b, tol=tol, M=multigrid_preconditioner(op))
        assert bool(mg.converged)
        iters[nx] = (int(plain.iterations), int(mg.iterations))
        assert iters[nx][1] <= 15, f"MG-PCG at {nx}^3 took {iters[nx][1]} iters"
        assert iters[nx][1] * 3 < iters[nx][0], (
            f"MG-PCG not clearly ahead of plain CG at {nx}^3: {iters[nx]}"
        )
    # mesh-independence: doubling the grid may add at most a couple iters
    assert abs(iters[31][1] - iters[15][1]) <= 3, iters


def test_mgpcg_2d_problem_via_flat_grid():
    """2-D Poisson rides as (nx, ny, 1) with center=4."""
    shape = (33, 17, 1)
    op = StencilOperator(
        jnp.asarray(4.0, jnp.float64), jnp.asarray(-1.0, jnp.float64), shape
    )
    b = jnp.asarray(
        np.random.default_rng(9).standard_normal(int(np.prod(shape)))
    )
    tol = 1e-8 * float(jnp.linalg.norm(b))
    _, plain = cg_solve(op, b, tol=tol)
    _, mg = cg_solve(op, b, tol=tol, M=multigrid_preconditioner(op))
    assert bool(mg.converged)
    assert int(mg.iterations) <= 15
    assert int(mg.iterations) * 2 < int(plain.iterations)


def test_multiple_cycles_cut_iterations_and_stay_symmetric():
    shape = (16, 16, 16)
    op = StencilOperator.poisson(shape, dtype=jnp.float64)
    b = jnp.asarray(
        np.random.default_rng(11).standard_normal(int(np.prod(shape)))
    )
    tol = 1e-8 * float(jnp.linalg.norm(b))
    _, one = cg_solve(op, b, tol=tol, M=multigrid_preconditioner(op, cycles=1))
    _, two = cg_solve(op, b, tol=tol, M=multigrid_preconditioner(op, cycles=2))
    assert bool(two.converged)
    assert int(two.iterations) < int(one.iterations)
    # symmetry of the multi-cycle operator on a small grid
    small = StencilOperator.poisson((6, 6, 6), dtype=jnp.float64)
    M = _mg_matrix(multigrid_preconditioner(small, cycles=2, coarse_size=27), 216)
    np.testing.assert_allclose(M, M.T, rtol=0, atol=1e-12 * np.abs(M).max())


def test_apply_is_jittable_and_fixed_shape():
    shape = (8, 8, 8)
    op = StencilOperator.poisson(shape, dtype=jnp.float64)
    apply = multigrid_preconditioner(op, coarse_size=27)
    r = jnp.asarray(np.random.default_rng(13).standard_normal(512))
    out = jax.jit(apply)(r)
    assert out.shape == r.shape and out.dtype == r.dtype


def test_dense_coarse_inverse_matches_csr_assembly():
    shape = (3, 4, 2)
    inv = _dense_stencil_inverse(shape, 6.0, -1.0)
    A = np.asarray(poisson7_csr(shape).to_dense())
    np.testing.assert_allclose(inv @ A, np.eye(A.shape[0]), atol=1e-10)


def test_rejects_non_stencil_and_bad_params():
    A = CSRMatrix.from_coo(
        np.array([0, 1]), np.array([0, 1]), np.array([2.0, 2.0]), (2, 2)
    )
    with pytest.raises(TypeError, match="StencilOperator"):
        multigrid_preconditioner(A)
    op = StencilOperator.poisson((8, 8, 8), dtype=jnp.float64)
    with pytest.raises(ValueError, match="nu"):
        multigrid_preconditioner(op, nu=0)
    with pytest.raises(ValueError, match="omega"):
        multigrid_preconditioner(op, omega=2.5)
    with pytest.raises(ValueError, match="cycles"):
        multigrid_preconditioner(op, cycles=0)
    neg = StencilOperator(
        jnp.asarray(-6.0, jnp.float64), jnp.asarray(-1.0, jnp.float64), (4, 4, 4)
    )
    with pytest.raises(ValueError, match="center"):
        multigrid_preconditioner(neg)


class TestChebyshevSmoother:
    def test_symmetric_and_converges(self):
        op = StencilOperator.poisson((16, 16, 16), dtype=jnp.float64)
        n = 16**3
        M = multigrid_preconditioner(op, smoother="chebyshev")
        rng = np.random.default_rng(7)
        u = jnp.asarray(rng.standard_normal(n))
        v = jnp.asarray(rng.standard_normal(n))
        uMv, vMu = float(u @ M(v)), float(v @ M(u))
        assert abs(uMv - vMu) <= 1e-12 * abs(uMv)
        b = jnp.asarray(rng.standard_normal(n))
        tol = 1e-9 * float(jnp.linalg.norm(b))
        x, info = cg_solve(op, b, tol=tol, M=M)
        assert bool(info.converged)

    def test_not_worse_than_jacobi_at_equal_degree(self):
        """The measured contract behind the defaults: degree-nu Chebyshev
        matches or beats nu Jacobi sweeps at the same stencil-pass count
        (48^3 f64: 15 -> 13 at nu=2)."""
        op = StencilOperator.poisson((32, 32, 32), dtype=jnp.float64)
        n = 32**3
        b = jnp.asarray(np.random.default_rng(8).standard_normal(n))
        tol = 1e-9 * float(jnp.linalg.norm(b))
        _, ij = cg_solve(op, b, tol=tol, M=multigrid_preconditioner(op))
        _, ic = cg_solve(
            op, b, tol=tol,
            M=multigrid_preconditioner(op, smoother="chebyshev"),
        )
        assert bool(ic.converged)
        assert int(ic.iterations) <= int(ij.iterations)

    def test_validation(self):
        op = StencilOperator.poisson((8, 8, 8), dtype=jnp.float64)
        with pytest.raises(ValueError, match="smoother"):
            multigrid_preconditioner(op, smoother="gs")
        with pytest.raises(ValueError, match="cheb_lower"):
            multigrid_preconditioner(op, smoother="chebyshev", cheb_lower=0.0)
