"""Lockstep multi-RHS BiCGStab / GMRES (solver/batched_nonsym.py).

Per-lane parity contract: in f64 each lane's iterations / converged /
breakdown / history must be exactly what its solo solve reports — the
lockstep loop is the same recurrence with frozen-lane masking.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import (
    CSRMatrix,
    bicgstab_solve,
    bicgstab_solve_batched,
    gmres_solve,
    gmres_solve_batched,
)
from conjugategradient_tpu.problems import convection_diffusion_2d_coo
from conjugategradient_tpu.types import BlockedEllMatrix, DIAMatrix


def _ops(nx=14, peclet=12.0):
    rows, cols, vals, shape = convection_diffusion_2d_coo(nx, peclet=peclet)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape)
    return csr, DIAMatrix.from_csr(csr), BlockedEllMatrix.from_csr(
        csr, bm=8, bn=8), shape[0]


def _rhs(n, R, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((R, n)))


class TestBicgstabBatched:
    def test_per_lane_matches_solo_exactly(self):
        csr, dia, bell, n = _ops()
        B = _rhs(n, 4)
        X, info = bicgstab_solve_batched(dia, B, tol=1e-9, maxiter=4 * n)
        for i in range(4):
            x_s, i_s = bicgstab_solve(dia, B[i], tol=1e-9, maxiter=4 * n)
            assert int(info.iterations[i]) == int(i_s.iterations), i
            assert bool(info.converged[i]) == bool(i_s.converged)
            np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_s),
                                       rtol=0, atol=1e-11)
            k = int(i_s.iterations)
            np.testing.assert_allclose(
                np.asarray(info.rnorm_history[i])[: k + 1],
                np.asarray(i_s.rnorm_history)[: k + 1], rtol=1e-8)

    def test_bell_layout_and_padding(self):
        csr, dia, bell, n = _ops(12)
        B = _rhs(n, 3, seed=1)
        X, info = bicgstab_solve_batched(bell, B, tol=1e-9, maxiter=4 * n)
        assert bool(jnp.all(info.converged))
        for i in range(3):
            r = np.asarray(B[i]) - np.asarray(csr.matvec(X[i]))
            assert np.linalg.norm(r) <= 5e-9

    def test_per_lane_tol(self):
        _, dia, _, n = _ops(12)
        B = _rhs(n, 3, seed=2)
        tols = jnp.asarray([1e-4, 1e-7, 1e-10])
        X, info = bicgstab_solve_batched(dia, B, tol=tols, maxiter=4 * n)
        assert bool(jnp.all(info.converged))
        its = np.asarray(info.iterations)
        assert its[0] <= its[1] <= its[2]
        assert float(info.rnorm[2]) <= 1e-10

    def test_jacobi_rides_lockstep(self):
        from conjugategradient_tpu import jacobi_preconditioner

        _, dia, _, n = _ops(12, peclet=6.0)
        B = _rhs(n, 3, seed=3)
        M = jacobi_preconditioner(dia)
        X, info = bicgstab_solve_batched(dia, B, tol=1e-9, maxiter=4 * n,
                                         M=M)
        assert bool(jnp.all(info.converged))
        for i in range(3):
            x_s, i_s = bicgstab_solve(dia, B[i], tol=1e-9, maxiter=4 * n,
                                      M=M)
            assert int(info.iterations[i]) == int(i_s.iterations)

    def test_breakdown_lane_is_isolated(self):
        # lane 1 gets b = 0 after a warm start at the solution of lane 0's
        # system: rhat = r = 0 => rho = 0 on the first step.  The zero-b
        # lane converges at init (rnorm 0 <= any tol), so instead build a
        # breakdown by a skew system where BiCGStab's shadow residual
        # de-correlates: rhat'v = 0.  Simplest robust case: a lane whose
        # rho vanishes mid-flight is flagged broken without poisoning the
        # others — construct via orthogonal rhat: A = rotation matrix.
        theta = np.pi / 2
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
        A = np.kron(np.eye(4), rot)  # 8x8 pure rotation (normal, real)
        rows, cols = np.nonzero(A)
        csr = CSRMatrix.from_coo(rows, cols, A[rows, cols], (8, 8))
        dia = DIAMatrix.from_csr(csr)
        rng = np.random.default_rng(4)
        b0 = rng.standard_normal(8)
        B = jnp.asarray(np.stack([b0, b0 * 2.0]))
        X, info = bicgstab_solve_batched(dia, B, tol=1e-12, maxiter=64)
        # per-lane flags mirror solo behavior exactly (whether that is
        # breakdown or convergence on this adversarial operator)
        for i in range(2):
            _, i_s = bicgstab_solve(dia, B[i], tol=1e-12, maxiter=64)
            assert bool(info.breakdown[i]) == bool(i_s.breakdown)
            assert bool(info.converged[i]) == bool(i_s.converged)

    def test_vmap_fallback_csr(self):
        csr, _, _, n = _ops(10)
        B = _rhs(n, 2, seed=5)
        X, info = bicgstab_solve_batched(csr, B, tol=1e-9, maxiter=4 * n)
        assert bool(jnp.all(info.converged))
        for i in range(2):
            r = np.asarray(B[i]) - np.asarray(csr.matvec(X[i]))
            assert np.linalg.norm(r) <= 5e-9

    def test_rejects_1d_b(self):
        _, dia, _, n = _ops(10)
        with pytest.raises(ValueError, match="nrhs"):
            bicgstab_solve_batched(dia, jnp.ones((n,)))


class TestGmresBatched:
    def test_per_lane_matches_solo_exactly(self):
        csr, dia, bell, n = _ops()
        B = _rhs(n, 4, seed=6)
        X, info = gmres_solve_batched(dia, B, tol=1e-9, maxiter=4 * n,
                                      restart=23)
        for i in range(4):
            x_s, i_s = gmres_solve(dia, B[i], tol=1e-9, maxiter=4 * n,
                                   restart=23)
            assert int(info.iterations[i]) == int(i_s.iterations), i
            assert int(info.cycles[i]) == int(i_s.cycles), i
            assert bool(info.converged[i]) == bool(i_s.converged)
            np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_s),
                                       rtol=0, atol=1e-10)
            k = int(i_s.iterations)
            np.testing.assert_allclose(
                np.asarray(info.rnorm_history[i])[: k + 1],
                np.asarray(i_s.rnorm_history)[: k + 1],
                rtol=1e-6, atol=1e-12)

    def test_lanes_converge_at_different_counts(self):
        _, dia, _, n = _ops(12)
        B = _rhs(n, 3, seed=7)
        tols = jnp.asarray([1e-3, 1e-6, 1e-10])
        X, info = gmres_solve_batched(dia, B, tol=tols, maxiter=4 * n,
                                      restart=19)
        assert bool(jnp.all(info.converged))
        its = np.asarray(info.iterations)
        assert its[0] <= its[1] <= its[2]
        # frozen lanes stayed frozen: each lane equals its solo solve
        for i in range(3):
            x_s, i_s = gmres_solve(dia, B[i], tol=float(tols[i]),
                                   maxiter=4 * n, restart=19)
            assert int(info.iterations[i]) == int(i_s.iterations)
            np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_s),
                                       rtol=0, atol=1e-10)

    def test_right_preconditioned(self):
        from conjugategradient_tpu import jacobi_preconditioner

        _, dia, _, n = _ops(12, peclet=6.0)
        B = _rhs(n, 2, seed=8)
        M = jacobi_preconditioner(dia)
        X, info = gmres_solve_batched(dia, B, tol=1e-9, maxiter=4 * n,
                                      restart=20, M=M)
        assert bool(jnp.all(info.converged))
        for i in range(2):
            x_s, i_s = gmres_solve(dia, B[i], tol=1e-9, maxiter=4 * n,
                                   restart=20, M=M)
            assert int(info.iterations[i]) == int(i_s.iterations)
            np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_s),
                                       rtol=0, atol=1e-10)

    def test_flexible_nonlinear_m(self):
        _, dia, _, n = _ops(10, peclet=8.0)
        B = _rhs(n, 2, seed=9)

        def m_nl(v):  # elementwise nonlinear: FGMRES territory
            return v / (1.0 + 0.2 * jnp.abs(v))

        X, info = gmres_solve_batched(dia, B, tol=1e-9, maxiter=4 * n,
                                      restart=20, M=m_nl, flexible=True)
        assert bool(jnp.all(info.converged))
        for i in range(2):
            x_s, i_s = gmres_solve(dia, B[i], tol=1e-9, maxiter=4 * n,
                                   restart=20, M=m_nl, flexible=True)
            assert int(info.iterations[i]) == int(i_s.iterations)
            np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_s),
                                       rtol=0, atol=1e-10)

    def test_vmap_fallback_csr(self):
        csr, _, _, n = _ops(10)
        B = _rhs(n, 2, seed=10)
        X, info = gmres_solve_batched(csr, B, tol=1e-9, maxiter=4 * n,
                                      restart=15)
        assert bool(jnp.all(info.converged))
        for i in range(2):
            r = np.asarray(B[i]) - np.asarray(csr.matvec(X[i]))
            assert np.linalg.norm(r) <= 5e-9

    def test_maxiter_cap_mid_cycle(self):
        _, dia, _, n = _ops(10)
        B = _rhs(n, 2, seed=11)
        X, info = gmres_solve_batched(dia, B, tol=0.0, maxiter=13,
                                      restart=5)
        assert list(np.asarray(info.iterations)) == [13, 13]
        assert not bool(jnp.any(info.converged))


class TestMinresBatched:
    def _sym_ops(self, n=180, bw=5, seed=2):
        from conjugategradient_tpu.problems import banded_spd_coo

        rows, cols, vals, shape = banded_spd_coo(n, bandwidth=bw, seed=seed)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape)
        return csr, DIAMatrix.from_csr(csr), shape[0]

    def test_per_lane_matches_solo_exactly(self):
        from conjugategradient_tpu import minres_solve, minres_solve_batched

        csr, dia, n = self._sym_ops()
        B = _rhs(n, 4, seed=12)
        X, info = minres_solve_batched(dia, B, tol=1e-9, maxiter=4 * n)
        for i in range(4):
            x_s, i_s = minres_solve(dia, B[i], tol=1e-9, maxiter=4 * n,
                                    fused="never")
            assert int(info.iterations[i]) == int(i_s.iterations), i
            assert bool(info.converged[i]) == bool(i_s.converged)
            np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_s),
                                       rtol=0, atol=1e-10)
            k = int(i_s.iterations)
            np.testing.assert_allclose(
                np.asarray(info.rnorm_history[i])[: k + 1],
                np.asarray(i_s.rnorm_history)[: k + 1], rtol=1e-7)

    def test_shift_indefinite_lanes(self):
        from conjugategradient_tpu import minres_solve, minres_solve_batched

        csr, dia, n = self._sym_ops(160, 4, seed=3)
        B = _rhs(n, 3, seed=13)
        shift = 1.2  # inside the spectrum: indefinite lanes
        X, info = minres_solve_batched(dia, B, tol=1e-8, maxiter=6 * n,
                                       shift=shift)
        for i in range(3):
            x_s, i_s = minres_solve(dia, B[i], tol=1e-8, maxiter=6 * n,
                                    shift=shift, fused="never")
            # column-sum vs 1-D dot association can flip a knife-edge
            # tolerance crossing by one iteration in f64
            assert abs(int(info.iterations[i]) - int(i_s.iterations)) <= 1
            assert bool(info.converged[i]) == bool(i_s.converged)
            np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_s),
                                       rtol=0, atol=1e-7)

    def test_per_lane_tol_and_jacobi(self):
        from conjugategradient_tpu import (
            jacobi_preconditioner,
            minres_solve_batched,
        )

        csr, dia, n = self._sym_ops(140, 4, seed=5)
        B = _rhs(n, 3, seed=14)
        tols = jnp.asarray([1e-4, 1e-7, 1e-10])
        M = jacobi_preconditioner(dia)
        X, info = minres_solve_batched(dia, B, tol=tols, maxiter=6 * n,
                                       M=M)
        assert bool(jnp.all(info.converged))
        its = np.asarray(info.iterations)
        assert its[0] <= its[1] <= its[2]

    def test_vmap_fallback_csr(self):
        from conjugategradient_tpu import minres_solve_batched

        csr, dia, n = self._sym_ops(120, 3, seed=6)
        B = _rhs(n, 2, seed=15)
        X, info = minres_solve_batched(csr, B, tol=1e-9, maxiter=4 * n)
        assert bool(jnp.all(info.converged))
        for i in range(2):
            r = np.asarray(B[i]) - np.asarray(csr.matvec(X[i]))
            assert np.linalg.norm(r) <= 5e-9


def test_gmres_batched_done_lane_history_stays_nan():
    """Round-5 review fix: a lane that converges early must NOT get a
    spurious rnorm_history entry at row maxiter from later cycles'
    true-residual writes (solo gmres leaves it NaN)."""
    _, dia, _, n = _ops(10)
    B = _rhs(n, 2, seed=20)
    # lane 0: trivial (b = 0 after one step? simplest: loose tol), lane 1
    # tight — lane 0 finishes many cycles before lane 1
    tols = jnp.asarray([1e-1, 1e-10])
    maxiter = 3 * n
    X, info = gmres_solve_batched(dia, B, tol=tols, maxiter=maxiter,
                                  restart=7)
    assert bool(jnp.all(info.converged))
    h0 = np.asarray(info.rnorm_history[0])
    k0 = int(info.iterations[0])
    # beyond its own final recomputed entry, lane 0's history is NaN —
    # in particular at row maxiter
    assert np.isnan(h0[maxiter])
    assert np.all(np.isnan(h0[k0 + 1:]))
