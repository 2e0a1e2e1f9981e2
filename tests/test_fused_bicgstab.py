"""Fused BiCGStab kernels (ops/pallas/fused_bicgstab.py,
solver/fused_bicgstab.py) — interpret-mode correctness and
fused-vs-portable trajectory parity on nonsymmetric systems."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import bicgstab_solve
from conjugategradient_tpu.ops.pallas.fused_bicgstab import (
    bicgstab_dir_spmv_dot,
    bicgstab_s_spmv_dot,
    bicgstab_update_dot,
)
from conjugategradient_tpu.ops.spmv import bell_spmv
from conjugategradient_tpu.problems import (
    convection_diffusion_2d_coo,
    reference_rhs,
)
from conjugategradient_tpu.solver.fused_bicgstab import (
    fused_bicgstab_solve,
    fused_bicgstab_supported,
)
from conjugategradient_tpu.types import BlockedEllMatrix, CSRMatrix


def _bell_convdiff(nx=32, peclet=10.0):
    rows, cols, vals, shape = convection_diffusion_2d_coo(nx, peclet=peclet)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    return BlockedEllMatrix.from_csr(csr, bm=128, bn=128), shape[0]


def _to2d(v):
    return jnp.asarray(v.reshape(-1, 128))


def _s11(x):
    return jnp.full((1, 1), np.float32(x))


class TestKernels:
    def test_dir_spmv_dot(self):
        bell, n = _bell_convdiff()
        mp = bell.padded_shape[1]
        rng = np.random.default_rng(0)
        r, p, v, rhat = (rng.standard_normal(mp).astype(np.float32)
                         for _ in range(4))
        beta, omega = np.float32(0.4), np.float32(0.25)
        pn, ph, vn, rv = bicgstab_dir_spmv_dot(
            bell.blocks, bell.block_cols, _to2d(r), _to2d(p), _to2d(v),
            _to2d(rhat), _s11(beta), _s11(omega), interpret=True)
        pn_ref = r + beta * (p - omega * v)
        v_ref = np.zeros(mp, np.float32)
        v_ref[:n] = np.asarray(bell_spmv(bell, jnp.asarray(pn_ref)))
        np.testing.assert_allclose(np.asarray(pn).ravel(), pn_ref,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ph).ravel(), pn_ref,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(vn).ravel(), v_ref,
                                   atol=2e-5)
        np.testing.assert_allclose(float(rv[0, 0]), rhat @ v_ref,
                                   rtol=1e-4)

    def test_dir_spmv_dot_jacobi(self):
        bell, n = _bell_convdiff(16)
        mp = bell.padded_shape[1]
        rng = np.random.default_rng(1)
        r, p, v, rhat = (rng.standard_normal(mp).astype(np.float32)
                         for _ in range(4))
        d = (0.5 + rng.random(mp)).astype(np.float32)
        pn, ph, vn, rv = bicgstab_dir_spmv_dot(
            bell.blocks, bell.block_cols, _to2d(r), _to2d(p), _to2d(v),
            _to2d(rhat), _s11(0.3), _s11(0.7), inv_diag2d=_to2d(d),
            interpret=True)
        pn_ref = r + np.float32(0.3) * (p - np.float32(0.7) * v)
        ph_ref = d * pn_ref
        v_ref = np.zeros(mp, np.float32)
        v_ref[:n] = np.asarray(bell_spmv(bell, jnp.asarray(ph_ref)))
        np.testing.assert_allclose(np.asarray(ph).ravel(), ph_ref,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(vn).ravel(), v_ref,
                                   atol=2e-5)

    def test_s_spmv_dot(self):
        bell, n = _bell_convdiff(16)
        mp = bell.padded_shape[1]
        rng = np.random.default_rng(2)
        r, vn, x, ph = (rng.standard_normal(mp).astype(np.float32)
                        for _ in range(4))
        alpha = np.float32(0.6)
        sv, sh, xh, t, ss, ts, tt = bicgstab_s_spmv_dot(
            bell.blocks, bell.block_cols, _to2d(r), _to2d(vn), _to2d(x),
            _to2d(ph), _s11(alpha), interpret=True)
        s_ref = r - alpha * vn
        t_ref = np.zeros(mp, np.float32)
        t_ref[:n] = np.asarray(bell_spmv(bell, jnp.asarray(s_ref)))
        np.testing.assert_allclose(np.asarray(sv).ravel(), s_ref,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(xh).ravel(), x + alpha * ph,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(t).ravel(), t_ref, atol=2e-5)
        np.testing.assert_allclose(float(ss[0, 0]), s_ref @ s_ref,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(ts[0, 0]), t_ref @ s_ref,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(tt[0, 0]), t_ref @ t_ref,
                                   rtol=1e-4)

    def test_update_dot(self):
        rng = np.random.default_rng(3)
        mp = 2048
        xh, sh, s, t, rhat = (rng.standard_normal(mp).astype(np.float32)
                              for _ in range(5))
        w = np.float32(0.45)
        x, r, rn, rho = bicgstab_update_dot(
            _to2d(xh), _to2d(sh), _to2d(s), _to2d(t), _to2d(rhat),
            _s11(w), interpret=True)
        r_ref = s - w * t
        np.testing.assert_allclose(np.asarray(x).ravel(), xh + w * sh,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(r).ravel(), r_ref, atol=1e-6)
        np.testing.assert_allclose(float(rn[0, 0]), r_ref @ r_ref,
                                   rtol=1e-5)
        np.testing.assert_allclose(float(rho[0, 0]), rhat @ r_ref,
                                   rtol=1e-4)


class TestFusedBicgstabSolve:
    def test_trajectory_parity_convdiff(self):
        bell, n = _bell_convdiff()
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        # mechanism parity: short fixed-length trajectories match tightly
        _, i_ref = bicgstab_solve(bell, b, tol=0.0, maxiter=16,
                                  fused="never")
        _, i_f = fused_bicgstab_solve(bell, b, tol=0.0, maxiter=16,
                                      interpret=True)
        # BiCGStab's recurrence products amplify f32 association-order
        # noise faster than CG/MINRES: tight on the first 10, loose tail
        hf = np.asarray(i_f.rnorm_history)
        hr = np.asarray(i_ref.rnorm_history)
        np.testing.assert_allclose(hf[:11], hr[:11], rtol=5e-3)
        np.testing.assert_allclose(hf[11:17], hr[11:17], rtol=0.15)
        # end-to-end convergence to the same x
        x_ref, i_ref = bicgstab_solve(bell, b, tol=1e-5, maxiter=4 * n,
                                      fused="never")
        x_f, i_f = fused_bicgstab_solve(bell, b, tol=1e-5, maxiter=4 * n,
                                        interpret=True)
        assert bool(i_f.converged)
        kf, kr = int(i_f.iterations), int(i_ref.iterations)
        assert abs(kf - kr) <= max(4, kr // 10)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=5e-3, atol=1e-4)
        assert np.isfinite(float(i_f.rnorm_true))

    def test_jacobi_parity(self):
        from conjugategradient_tpu import jacobi_preconditioner

        bell, n = _bell_convdiff(24, peclet=6.0)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        M = jacobi_preconditioner(bell)
        _, i_ref = bicgstab_solve(bell, b, tol=0.0, maxiter=12, M=M,
                                  fused="never")
        _, i_f = fused_bicgstab_solve(bell, b, tol=0.0, maxiter=12,
                                      inv_diag=M.inv_diag, interpret=True)
        np.testing.assert_allclose(
            np.asarray(i_f.rnorm_history)[:13],
            np.asarray(i_ref.rnorm_history)[:13], rtol=5e-3)
        x_ref, _ = bicgstab_solve(bell, b, tol=1e-5, maxiter=4 * n, M=M,
                                  fused="never")
        x_f, i_f = fused_bicgstab_solve(bell, b, tol=1e-5, maxiter=4 * n,
                                        inv_diag=M.inv_diag,
                                        interpret=True)
        assert bool(i_f.converged)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=5e-3, atol=1e-4)

    def test_half_step_exit(self):
        # a tolerance reachable at a half-step: counts and final norms
        # must mirror the portable loop's half-step semantics
        bell, n = _bell_convdiff(16)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        x_ref, i_ref = bicgstab_solve(bell, b, tol=1e-3, maxiter=4 * n,
                                      fused="never")
        x_f, i_f = fused_bicgstab_solve(bell, b, tol=1e-3, maxiter=4 * n,
                                        interpret=True)
        assert bool(i_f.converged) == bool(i_ref.converged)
        # f32 trajectory chaos near the tolerance: counts within one
        kf, kr = int(i_f.iterations), int(i_ref.iterations)
        assert abs(kf - kr) <= 2, (kf, kr)
        # both solutions meet the tolerance in the true residual
        for xx in (x_f, x_ref):
            r = np.asarray(b) - np.asarray(bell.matvec(xx))[:n]
            assert np.linalg.norm(r) <= 3e-3

    def test_breakdown_keeps_last_finite_iterate(self):
        # pure rotation: the shadow residual de-correlates — the fused
        # path must flag breakdown and return a FINITE iterate, mirroring
        # the portable flags
        theta = np.pi / 2
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]], dtype=np.float32)
        A = np.kron(np.eye(64, dtype=np.float32), rot)  # 128x128 rotation
        rows, cols = np.nonzero(A)
        csr = CSRMatrix.from_coo(rows, cols, A[rows, cols], (128, 128),
                                 dtype=np.float32)
        bell = BlockedEllMatrix.from_csr(csr, bm=128, bn=128)
        rng = np.random.default_rng(4)
        b = jnp.asarray(rng.standard_normal(128).astype(np.float32))
        x_ref, i_ref = bicgstab_solve(bell, b, tol=1e-10, maxiter=64,
                                      fused="never")
        x_f, i_f = fused_bicgstab_solve(bell, b, tol=1e-10, maxiter=64,
                                        interpret=True)
        assert bool(i_f.breakdown) == bool(i_ref.breakdown)
        assert bool(i_f.converged) == bool(i_ref.converged)
        assert np.all(np.isfinite(np.asarray(x_f)))
        if bool(i_ref.breakdown):
            assert int(i_f.iterations) == int(i_ref.iterations)
            np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                       rtol=1e-4, atol=1e-5)

    def test_maxiter_cap(self):
        bell, n = _bell_convdiff(16)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        _, i_f = fused_bicgstab_solve(bell, b, tol=0.0, maxiter=7,
                                      interpret=True)
        assert int(i_f.iterations) == 7
        assert not bool(i_f.converged)

    def test_x0_respected(self):
        bell, n = _bell_convdiff(16)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32)) * 0.01
        _, i_ref = bicgstab_solve(bell, b, x0, tol=0.0, maxiter=8,
                                  fused="never")
        _, i_f = fused_bicgstab_solve(bell, b, x0, tol=0.0, maxiter=8,
                                      interpret=True)
        np.testing.assert_allclose(
            np.asarray(i_f.rnorm_history)[:9],
            np.asarray(i_ref.rnorm_history)[:9], rtol=1e-2)


class TestDispatch:
    def test_supported_gate(self):
        bell, _ = _bell_convdiff(16)
        assert fused_bicgstab_supported(bell, dtype=jnp.float32,
                                        interpret=True)
        assert not fused_bicgstab_supported(bell, dtype=jnp.float64,
                                            interpret=True)

    def test_cpu_backend_not_auto(self):
        bell, n = _bell_convdiff(16)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        x, info = bicgstab_solve(bell, b, tol=1e-4)  # fused="auto"
        assert bool(info.converged)

    def test_always_raises_on_cpu(self):
        bell, n = _bell_convdiff(16)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        with pytest.raises(ValueError, match="TPU backend"):
            bicgstab_solve(bell, b, tol=1e-4, fused="always")

    def test_always_rejects_general_m(self):
        bell, n = _bell_convdiff(16)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        with pytest.raises(ValueError, match="Jacobi"):
            bicgstab_solve(bell, b, tol=1e-4, fused="always",
                           M=lambda r: 0.5 * r)
