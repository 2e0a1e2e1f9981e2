"""Fused CG-iteration kernels (ops/pallas/fused_cg.py, solver/fused.py) —
interpret-mode correctness and fused-vs-unfused iteration parity.

The fused path is the TPU fast path; on the CPU test backend the kernels run
in Pallas interpret mode.  Parity contract: identical iteration counts and
matching residual histories vs the portable f32 solver (same algorithm, only
the kernel fusion differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import cg_solve
from conjugategradient_tpu.ops.pallas.fused_cg import (
    fused_dir_spmv_dot,
    fused_update_dot,
)
from conjugategradient_tpu.ops.spmv import bell_spmv
from conjugategradient_tpu.problems import banded_spd_coo, poisson2d_coo, reference_rhs
from conjugategradient_tpu.solver.fused import (
    fused_bell_cg_solve,
    fused_supported,
)
from conjugategradient_tpu.types import BlockedEllMatrix, CSRMatrix


def _bell_poisson(nx=32, bm=128, bn=128):
    rows, cols, vals, shape = poisson2d_coo(nx)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    return BlockedEllMatrix.from_csr(csr, bm=bm, bn=bn), shape[0]


class TestKernels:
    def test_dir_spmv_dot(self):
        bell, n = _bell_poisson()
        mp = bell.padded_shape[1]
        rng = np.random.default_rng(0)
        r = rng.standard_normal(mp).astype(np.float32)
        p_old = rng.standard_normal(mp).astype(np.float32)
        beta = np.float32(0.37)
        p_new, q, pap = fused_dir_spmv_dot(
            bell.blocks, bell.block_cols,
            jnp.asarray(r.reshape(-1, 128)), jnp.asarray(p_old.reshape(-1, 128)),
            jnp.full((1, 1), beta), interpret=True,
        )
        pv = r + beta * p_old
        q_ref = np.zeros(mp, np.float32)
        q_ref[:n] = np.asarray(bell_spmv(bell, jnp.asarray(pv)))
        np.testing.assert_allclose(np.asarray(p_new).ravel(), pv, atol=1e-6)
        np.testing.assert_allclose(np.asarray(q).ravel(), q_ref, atol=2e-5)
        np.testing.assert_allclose(float(pap[0, 0]), pv @ q_ref, rtol=1e-5)

    def test_update_dot(self):
        rng = np.random.default_rng(1)
        mp = 1024
        x, p, r, q = (rng.standard_normal(mp).astype(np.float32) for _ in range(4))
        alpha = np.float32(0.21)
        to2d = lambda v: jnp.asarray(v.reshape(-1, 128))
        x2, r2, rnorm = fused_update_dot(
            to2d(x), to2d(p), to2d(r), to2d(q), jnp.full((1, 1), alpha),
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(x2).ravel(), x + alpha * p, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r2).ravel(), r - alpha * q, atol=1e-6)
        np.testing.assert_allclose(
            float(rnorm[0, 0]), (r - alpha * q) @ (r - alpha * q), rtol=1e-5
        )

    def test_update_dot_grid_accumulation(self):
        # rows > 1024 forces a multi-step grid; rnorm must accumulate across it
        rng = np.random.default_rng(2)
        rows = 3072
        arrs = [rng.standard_normal((rows, 128)).astype(np.float32) for _ in range(4)]
        x, p, r, q = (jnp.asarray(a) for a in arrs)
        alpha = jnp.full((1, 1), np.float32(0.5))
        x2, r2, rnorm = fused_update_dot(x, p, r, q, alpha, interpret=True)
        rr = arrs[2] - 0.5 * arrs[3]
        np.testing.assert_allclose(float(rnorm[0, 0]), float((rr * rr).sum()), rtol=1e-5)


class TestFusedSolve:
    def test_iteration_parity_poisson(self):
        bell, n = _bell_poisson()
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        x_ref, i_ref = cg_solve(bell, b, tol=1e-4, fused="never")
        x_f, i_f = fused_bell_cg_solve(bell, b, tol=1e-4, interpret=True)
        assert int(i_f.iterations) == int(i_ref.iterations)
        assert bool(i_f.converged) == bool(i_ref.converged)
        k = int(i_ref.iterations)
        h1 = np.asarray(i_ref.rho_history)[:k]
        h2 = np.asarray(i_f.rho_history)[:k]
        np.testing.assert_allclose(h2, h1, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_iteration_parity_banded(self):
        rows, cols, vals, shape = banded_spd_coo(700, bandwidth=6, seed=3)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        bell = BlockedEllMatrix.from_csr(csr, bm=128, bn=128)
        b = jnp.asarray(reference_rhs(shape[0], dtype=np.float32)) / shape[0]
        x_ref, i_ref = cg_solve(bell, b, tol=1e-5, fused="never")
        x_f, i_f = fused_bell_cg_solve(bell, b, tol=1e-5, interpret=True)
        assert int(i_f.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-5)

    def test_warm_start_at_solution(self):
        # rho == 0 guard: a second solve from the answer must not poison x
        bell, n = _bell_poisson()
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        x_ref, _ = cg_solve(bell, b, tol=1e-6, fused="never")
        x2, i2 = fused_bell_cg_solve(bell, b, x0=x_ref, tol=1e-4, interpret=True)
        assert bool(jnp.all(jnp.isfinite(x2)))
        assert int(i2.iterations) <= 5

    def test_zero_rhs(self):
        bell, n = _bell_poisson()
        x, info = fused_bell_cg_solve(
            bell, jnp.zeros((n,), jnp.float32), tol=1e-30, interpret=True
        )
        assert bool(jnp.all(x == 0))

    def test_x0_respected(self):
        bell, n = _bell_poisson()
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        x_ref, i_ref = cg_solve(bell, b, x0, tol=1e-4, fused="never")
        x_f, i_f = fused_bell_cg_solve(bell, b, x0, tol=1e-4, interpret=True)
        assert int(i_f.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-4)


class TestGating:
    def test_supported_square_tiles_only(self):
        bell, _ = _bell_poisson(bm=128, bn=128)
        assert fused_supported(bell, dtype=jnp.float32, interpret=True)
        rect, _ = _bell_poisson(bm=8, bn=128)
        assert not fused_supported(rect, dtype=jnp.float32, interpret=True)

    def test_rejects_f64_vectors(self):
        bell, _ = _bell_poisson()
        assert not fused_supported(bell, dtype=jnp.float64, interpret=True)

    def test_cpu_backend_not_auto(self):
        bell, _ = _bell_poisson()
        assert not fused_supported(bell, dtype=jnp.float32)  # cpu backend

    def test_always_requires_capable_operator(self):
        rows, cols, vals, shape = poisson2d_coo(8)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        b = jnp.ones((shape[0],), jnp.float32)
        with pytest.raises(ValueError, match="fused"):
            cg_solve(csr, b, fused="always")

    def test_never_keeps_portable_path(self):
        # f64 on CPU (the parity configuration) must never dispatch fused
        bell, n = _bell_poisson()
        b = jnp.asarray(reference_rhs(n, dtype=np.float64))
        x, info = cg_solve(bell, b, tol=1e-8)  # auto -> portable on cpu/f64
        assert bool(info.converged)


class TestMosaicBlockRule:
    """Row-group / chunk selection must satisfy Mosaic's block-shape rule
    (second-to-last dim divisible by 8 OR equal to the array dim) for every
    operator size — caught live on the chip with poisson2d_34 (nrb=10 chose
    R=2 and the TPU lowering rejected the (2, 128) q block)."""

    def test_row_group_invariant(self):
        from conjugategradient_tpu.ops.pallas.fused_cg import (
            _row_group_for_blocked_q,
        )

        for nrb in (1, 2, 5, 8, 10, 16, 24, 95, 1000, 1001, 2048):
            R = _row_group_for_blocked_q(nrb, 8)
            assert nrb % R == 0
            assert R % 8 == 0 or R == nrb

    def test_update_chunk_invariant(self):
        from conjugategradient_tpu.ops.pallas.fused_cg import (
            _largest_divisor_leq,
        )

        for rows in (8, 10, 16, 410, 1024, 2048, 2050, 12288):
            C = _largest_divisor_leq(rows, 1024)
            assert rows % C == 0
            assert C % 8 == 0 or C == rows

    def test_supported_gates_odd_giant_full_storage(self):
        """A full-storage operator whose nrb has no multiple-of-8 divisor
        AND whose whole tile array exceeds the single-step VMEM cap must be
        rejected (it would need a one-step grid that cannot fit)."""
        nrb, kmax, bm = 1001, 3, 128  # 1001*3*128*128*4 ≈ 197 MB > 16 MB cap
        blocks = jax.ShapeDtypeStruct((nrb, kmax, bm, bm), jnp.float32)
        cols = jax.ShapeDtypeStruct((nrb, kmax), jnp.int32)
        a = BlockedEllMatrix(blocks, cols, (nrb * bm, nrb * bm), 1)
        assert not fused_supported(a, dtype=jnp.float32, interpret=True)

    def test_small_odd_operator_supported_and_solves(self):
        """poisson2d_34's shape (nrb=10) must stay fused-supported and solve
        (interpret mode on CPU; the chip run is the live verification)."""
        bell, n = _bell_poisson(nx=34)
        assert bell.blocks.shape[0] % 8 != 0  # the shape class under test
        assert fused_supported(bell, dtype=jnp.float32, interpret=True)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32))
        x, info = fused_bell_cg_solve(bell, b, tol=1e-4 * float(
            jnp.linalg.norm(b)), maxiter=3 * n, interpret=True)
        assert bool(info.converged)


class TestFusedStencil:
    """Matrix-free fused CG (solver/fused_stencil.py) — config 4's fast path."""

    def _op(self, grid=(8, 16, 128)):
        from conjugategradient_tpu.types import StencilOperator

        return StencilOperator.poisson(grid, dtype=jnp.float32), int(np.prod(grid))

    def test_dir_dot_kernel(self):
        from conjugategradient_tpu.ops.pallas.fused_stencil import (
            fused_stencil_dir_dot,
        )

        op, n = self._op()
        rng = np.random.default_rng(0)
        r = rng.standard_normal(op.grid_shape).astype(np.float32)
        p = rng.standard_normal(op.grid_shape).astype(np.float32)
        beta = np.float32(0.3)
        pn, q, pap = fused_stencil_dir_dot(
            jnp.asarray(r), jnp.asarray(p), jnp.full((1, 1), beta),
            op.center, op.off, interpret=True,
        )
        pv = r + beta * p
        q_ref = np.asarray(op.matvec(jnp.asarray(pv.reshape(-1))))
        np.testing.assert_allclose(np.asarray(pn), pv, atol=1e-6)
        np.testing.assert_allclose(np.asarray(q).reshape(-1), q_ref, atol=2e-5)
        np.testing.assert_allclose(float(pap[0, 0]), pv.reshape(-1) @ q_ref,
                                   rtol=1e-5)

    def test_solve_iteration_parity(self):
        from conjugategradient_tpu.solver.fused_stencil import (
            fused_stencil_cg_solve,
        )

        op, n = self._op()
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        x_ref, i_ref = cg_solve(op, b, tol=1e-4, fused="never")
        x_f, i_f = fused_stencil_cg_solve(op, b, tol=1e-4, interpret=True)
        assert int(i_f.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-5)
        k = int(i_ref.iterations)
        np.testing.assert_allclose(
            np.asarray(i_f.rho_history)[:k], np.asarray(i_ref.rho_history)[:k],
            rtol=1e-4,
        )

    def test_gating(self):
        from conjugategradient_tpu.solver.fused_stencil import (
            fused_stencil_supported,
        )
        from conjugategradient_tpu.types import StencilOperator

        op, _ = self._op()
        assert fused_stencil_supported(op, dtype=jnp.float32, interpret=True)
        bad = StencilOperator.poisson((8, 16, 100), dtype=jnp.float32)
        assert not fused_stencil_supported(bad, dtype=jnp.float32, interpret=True)
        assert not fused_stencil_supported(op, dtype=jnp.float64, interpret=True)
        assert not fused_stencil_supported(op, dtype=jnp.float32)  # cpu auto


class TestFusedPCG:
    """Fused Jacobi-PCG (solver/fused.fused_bell_pcg_solve) — BASELINE
    config 3's fused preconditioner-apply, parity vs the portable PCG."""

    def _sys(self):
        from conjugategradient_tpu.solver import jacobi_preconditioner

        rows, cols, vals, shape = banded_spd_coo(700, bandwidth=6, seed=7)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        bell = BlockedEllMatrix.from_csr(csr, bm=128, bn=128)
        b = jnp.asarray(reference_rhs(shape[0], dtype=np.float32)) / shape[0]
        return bell, b, jacobi_preconditioner(bell)

    def test_parity_vs_portable_pcg(self):
        from conjugategradient_tpu.solver.fused import fused_bell_pcg_solve

        bell, b, M = self._sys()
        x_ref, i_ref = cg_solve(bell, b, tol=1e-5, M=M, fused="never")
        x_f, i_f = fused_bell_pcg_solve(bell, b, M.inv_diag, tol=1e-5,
                                        interpret=True)
        assert int(i_f.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-5)
        k = int(i_ref.iterations)
        np.testing.assert_allclose(
            np.asarray(i_f.rho_history)[:k], np.asarray(i_ref.rho_history)[:k],
            rtol=1e-4,
        )

    def test_jacobi_changes_trajectory(self):
        # sanity: on a varying-diagonal matrix PCG != CG (the kernels are
        # really preconditioning, not just scaling)
        from conjugategradient_tpu.solver.fused import (
            fused_bell_cg_solve,
            fused_bell_pcg_solve,
        )

        bell, b, M = self._sys()
        _, i_cg = fused_bell_cg_solve(bell, b, tol=1e-6, interpret=True)
        _, i_pcg = fused_bell_pcg_solve(bell, b, M.inv_diag, tol=1e-6,
                                        interpret=True)
        assert int(i_pcg.iterations) != int(i_cg.iterations)

    def test_preconditioner_carries_diag(self):
        from conjugategradient_tpu.solver import jacobi_preconditioner

        bell, _, M = self._sys()
        assert hasattr(M, "inv_diag")
        np.testing.assert_allclose(
            np.asarray(M.inv_diag), 1.0 / np.asarray(bell.diagonal()),
            rtol=1e-6,
        )


class TestFusedRecompute:
    """recompute_r_every composes with the fused path (round-5 VERDICT
    item 3): same trajectory as the unfused restart loop, hot body still
    the two-kernel iteration."""

    def test_trajectory_matches_unfused_restart(self):
        bell, n = _bell_poisson()
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        # MECHANISM parity on a short fixed-length run: over a few dozen
        # iterations f32 association-order differences stay tiny, so the
        # fused and unfused restart trajectories (including the replaced
        # boundary slots at k=8,16,…) must agree closely.  Long-run counts
        # are chaotic in f32 (house rule, CLAUDE.md) — convergence and the
        # solution are the long-run contract, tested below.
        for every in (8, 13):
            _, i_ref = cg_solve(bell, b, tol=0.0, maxiter=32, fused="never",
                                recompute_r_every=every)
            _, i_f = fused_bell_cg_solve(
                bell, b, tol=0.0, maxiter=32, interpret=True,
                recompute_r_every=every)
            np.testing.assert_allclose(
                np.asarray(i_f.rho_history)[:33],
                np.asarray(i_ref.rho_history)[:33], rtol=2e-3)
        # end-to-end: the fused restart solve converges to the same answer
        x_ref, i_ref = cg_solve(bell, b, tol=1e-4, fused="never",
                                recompute_r_every=8)
        x_f, i_f = fused_bell_cg_solve(
            bell, b, tol=1e-4, interpret=True, recompute_r_every=8)
        assert bool(i_f.converged)
        kf, kr = int(i_f.iterations), int(i_ref.iterations)
        assert abs(kf - kr) <= max(4, kr // 20)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_restart_boundary_replaces_history_slot(self):
        # at a boundary the history slot must hold the TRUE ‖r‖², not the
        # recurrence value: solve a system where the two diverge in f32
        bell, n = _bell_poisson(24)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32))
        _, info = fused_bell_cg_solve(
            bell, b, tol=0.0, maxiter=16, interpret=True,
            recompute_r_every=8)
        h = np.asarray(info.rho_history)
        assert np.isfinite(h[8]) and np.isfinite(h[16])

    def test_pcg_trajectory_matches_unfused_restart(self):
        from conjugategradient_tpu import jacobi_preconditioner
        from conjugategradient_tpu.solver.fused import fused_bell_pcg_solve

        rows, cols, vals, shape = banded_spd_coo(600, bandwidth=5, seed=7)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        bell = BlockedEllMatrix.from_csr(csr, bm=128, bn=128)
        n = shape[0]
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        M = jacobi_preconditioner(bell)
        x_ref, i_ref = cg_solve(bell, b, tol=1e-5, fused="never", M=M,
                                recompute_r_every=10)
        x_f, i_f = fused_bell_pcg_solve(
            bell, b, M.inv_diag, tol=1e-5, interpret=True,
            recompute_r_every=10)
        assert int(i_f.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-5)

    def test_stencil_trajectory_matches_unfused_restart(self):
        from conjugategradient_tpu.solver.fused_stencil import (
            fused_stencil_cg_solve,
        )
        from conjugategradient_tpu.types import StencilOperator

        op = StencilOperator.poisson((4, 8, 128), dtype=jnp.float32)
        n = op.shape[0]
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        x_ref, i_ref = cg_solve(op, b, tol=1e-5, fused="never",
                                recompute_r_every=6)
        x_f, i_f = fused_stencil_cg_solve(
            op, b, tol=1e-5, interpret=True, recompute_r_every=6)
        assert int(i_f.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-5)
