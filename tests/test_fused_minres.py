"""Fused MINRES kernels (ops/pallas/fused_minres.py, solver/fused_minres.py)
— interpret-mode correctness and fused-vs-portable trajectory parity.

Parity contract (mirrors tests/test_fused.py): the fused path runs the
SAME Paige–Saunders recurrence as solver/minres.py with the solution
update hoisted one iteration — identical algebra, so short f32
trajectories match tightly and solves converge to the same x.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import minres_solve
from conjugategradient_tpu.ops.pallas.fused_minres import (
    minres_dir_spmv_dot,
    minres_update_dot,
    sym_minres_dir_spmv_dot,
)
from conjugategradient_tpu.ops.spmv import bell_spmv
from conjugategradient_tpu.problems import (
    banded_spd_coo,
    poisson2d_coo,
    reference_rhs,
)
from conjugategradient_tpu.solver.fused_minres import (
    fused_minres_solve,
    fused_minres_supported,
)
from conjugategradient_tpu.types import (
    BlockedEllMatrix,
    CSRMatrix,
    SymBellMatrix,
)


def _bell_poisson(nx=32, bm=128, bn=128):
    rows, cols, vals, shape = poisson2d_coo(nx)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    return BlockedEllMatrix.from_csr(csr, bm=bm, bn=bn), shape[0]


def _bell_banded(n=700, bw=6, seed=3):
    rows, cols, vals, shape = banded_spd_coo(n, bandwidth=bw, seed=seed)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    return BlockedEllMatrix.from_csr(csr, bm=128, bn=128), shape[0]


def _pack_su(inv_beta, shift, oldeps, delta, igamma, phi):
    return jnp.asarray(
        [[inv_beta, shift, oldeps, delta, igamma, phi, 0.0, 0.0]],
        jnp.float32)


class TestKernels:
    def test_spmv_kernel_full(self):
        bell, n = _bell_poisson()
        mp = bell.padded_shape[1]
        rng = np.random.default_rng(0)
        vecs = {k: rng.standard_normal(mp).astype(np.float32)
                for k in ("r2", "r1", "vprev", "wm1", "wm2", "x")}
        inv_beta, shift = np.float32(0.31), np.float32(0.07)
        oldeps, delta = np.float32(0.11), np.float32(0.23)
        igamma, phi = np.float32(0.57), np.float32(0.83)
        su = _pack_su(inv_beta, shift, oldeps, delta, igamma, phi)
        to2d = lambda v: jnp.asarray(v.reshape(-1, 128))
        v, q, w, xo, vq, vr1 = minres_dir_spmv_dot(
            bell.blocks, bell.block_cols,
            to2d(vecs["r2"]), to2d(vecs["r1"]), to2d(vecs["vprev"]),
            to2d(vecs["wm1"]), to2d(vecs["wm2"]), to2d(vecs["x"]),
            su, interpret=True)
        w_ref = (vecs["vprev"] - oldeps * vecs["wm2"]
                 - delta * vecs["wm1"]) * igamma
        x_ref = vecs["x"] + phi * w_ref
        v_ref = vecs["r2"] * inv_beta
        q_ref = np.zeros(mp, np.float32)
        q_ref[:n] = np.asarray(bell_spmv(bell, jnp.asarray(v_ref)))
        q_ref -= shift * v_ref
        np.testing.assert_allclose(np.asarray(w).ravel(), w_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xo).ravel(), x_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v).ravel(), v_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(q).ravel(), q_ref, atol=2e-5)
        np.testing.assert_allclose(float(vq[0, 0]), v_ref @ q_ref,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(vr1[0, 0]), v_ref @ vecs["r1"],
                                   rtol=1e-4)

    @pytest.mark.parametrize("mirror", ["scatter", "banded"])
    def test_spmv_kernel_sym(self, mirror):
        bell, n = _bell_banded()
        sym = SymBellMatrix.from_bell(bell)
        if mirror == "banded" and not sym.banded:
            pytest.skip("operator not block-tridiagonal")
        mp = bell.padded_shape[1]
        rng = np.random.default_rng(1)
        vecs = {k: rng.standard_normal(mp).astype(np.float32)
                for k in ("r2", "r1", "vprev", "wm1", "wm2", "x")}
        su = _pack_su(0.4, 0.09, 0.15, 0.2, 0.6, 0.7)
        to2d = lambda v: jnp.asarray(v.reshape(-1, 128))
        v, q, w, xo, vq, vr1 = sym_minres_dir_spmv_dot(
            sym.diag_blocks, sym.off_blocks, sym.off_cols,
            to2d(vecs["r2"]), to2d(vecs["r1"]), to2d(vecs["vprev"]),
            to2d(vecs["wm1"]), to2d(vecs["wm2"]), to2d(vecs["x"]),
            su, interpret=True, mirror=mirror)
        v_ref = vecs["r2"] * np.float32(0.4)
        q_ref = np.zeros(mp, np.float32)
        q_ref[:n] = np.asarray(bell_spmv(bell, jnp.asarray(v_ref)))
        q_ref -= np.float32(0.09) * v_ref
        np.testing.assert_allclose(np.asarray(q).ravel(), q_ref, atol=3e-5)
        np.testing.assert_allclose(float(vq[0, 0]), v_ref @ q_ref,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(vr1[0, 0]), v_ref @ vecs["r1"],
                                   rtol=1e-4)

    def test_update_kernel(self):
        rng = np.random.default_rng(2)
        mp = 2048
        q, r1, r2 = (rng.standard_normal(mp).astype(np.float32)
                     for _ in range(3))
        c1, ia = np.float32(0.4), np.float32(0.9)
        to2d = lambda v: jnp.asarray(v.reshape(-1, 128))
        r2n, bsq = minres_update_dot(
            to2d(q), to2d(r1), to2d(r2),
            jnp.full((1, 1), c1), jnp.full((1, 1), ia), interpret=True)
        y = q - c1 * r1 - ia * r2
        np.testing.assert_allclose(np.asarray(r2n).ravel(), y, atol=1e-6)
        np.testing.assert_allclose(float(bsq[0, 0]), y @ y, rtol=1e-5)

    def test_update_kernel_jacobi(self):
        rng = np.random.default_rng(3)
        mp = 1024
        q, r1, r2 = (rng.standard_normal(mp).astype(np.float32)
                     for _ in range(3))
        d = (0.5 + rng.random(mp)).astype(np.float32)
        to2d = lambda v: jnp.asarray(v.reshape(-1, 128))
        r2n, bsq = minres_update_dot(
            to2d(q), to2d(r1), to2d(r2),
            jnp.full((1, 1), jnp.float32(0.3)),
            jnp.full((1, 1), jnp.float32(0.7)), inv_diag2d=to2d(d),
            interpret=True)
        y = q - np.float32(0.3) * r1 - np.float32(0.7) * r2
        np.testing.assert_allclose(float(bsq[0, 0]), (d * y) @ y, rtol=1e-5)


class TestFusedMinresSolve:
    def test_trajectory_parity_spd(self):
        bell, n = _bell_poisson()
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        # short fixed-length run: mechanism parity (f32 long-run counts
        # are chaotic — house rule)
        _, i_ref = minres_solve(bell, b, tol=0.0, maxiter=32, fused="never")
        _, i_f = fused_minres_solve(bell, b, tol=0.0, maxiter=32,
                                    interpret=True)
        np.testing.assert_allclose(
            np.asarray(i_f.rnorm_history)[:33],
            np.asarray(i_ref.rnorm_history)[:33], rtol=2e-3)
        # end-to-end convergence to the same x
        x_ref, i_ref = minres_solve(bell, b, tol=1e-4, fused="never")
        x_f, i_f = fused_minres_solve(bell, b, tol=1e-4, interpret=True)
        assert bool(i_f.converged)
        kf, kr = int(i_f.iterations), int(i_ref.iterations)
        assert abs(kf - kr) <= max(4, kr // 20)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-4)
        # honesty check present and consistent with the portable's (f32
        # recurrence drift makes rnorm_true > rnorm here — by design)
        assert np.isfinite(float(i_f.rnorm_true))
        assert float(i_f.rnorm_true) <= 10 * max(
            float(i_ref.rnorm_true), 1e-4)

    def test_trajectory_parity_indefinite_shift(self):
        # (A − σI) with σ inside the spectrum: genuinely indefinite — the
        # case MINRES exists for
        bell, n = _bell_banded()
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        shift = 1.5
        _, i_ref = minres_solve(bell, b, tol=0.0, maxiter=24, shift=shift,
                                fused="never")
        _, i_f = fused_minres_solve(bell, b, tol=0.0, maxiter=24,
                                    shift=shift, interpret=True)
        np.testing.assert_allclose(
            np.asarray(i_f.rnorm_history)[:25],
            np.asarray(i_ref.rnorm_history)[:25], rtol=5e-3)
        x_ref, i_ref = minres_solve(bell, b, tol=1e-4, maxiter=4 * n,
                                    shift=shift, fused="never")
        x_f, i_f = fused_minres_solve(bell, b, tol=1e-4, maxiter=4 * n,
                                      shift=shift, interpret=True)
        assert bool(i_f.converged)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=5e-3, atol=5e-4)

    def test_sym_storage_parity(self):
        bell, n = _bell_banded()
        sym = SymBellMatrix.from_bell(bell)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        _, i_full = fused_minres_solve(bell, b, tol=0.0, maxiter=24,
                                       interpret=True)
        _, i_sym = fused_minres_solve(sym, b, tol=0.0, maxiter=24,
                                      interpret=True)
        np.testing.assert_allclose(
            np.asarray(i_sym.rnorm_history)[:25],
            np.asarray(i_full.rnorm_history)[:25], rtol=2e-3)

    def test_jacobi_parity(self):
        from conjugategradient_tpu import jacobi_preconditioner

        bell, n = _bell_banded(600, 5, seed=9)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        M = jacobi_preconditioner(bell)
        _, i_ref = minres_solve(bell, b, tol=0.0, maxiter=24, M=M,
                                fused="never")
        _, i_f = fused_minres_solve(bell, b, tol=0.0, maxiter=24,
                                    inv_diag=M.inv_diag, interpret=True)
        np.testing.assert_allclose(
            np.asarray(i_f.rnorm_history)[:25],
            np.asarray(i_ref.rnorm_history)[:25], rtol=2e-3)
        x_ref, _ = minres_solve(bell, b, tol=1e-5, M=M, fused="never")
        x_f, i_f = fused_minres_solve(bell, b, tol=1e-5,
                                      inv_diag=M.inv_diag, interpret=True)
        assert bool(i_f.converged)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_maxiter_cap_flushes_pending_update(self):
        # exiting at the cap must still apply the final iteration's
        # hoisted solution update — x equals the portable x at the same cap
        bell, n = _bell_poisson(24)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        for cap in (1, 2, 7):
            x_ref, i_ref = minres_solve(bell, b, tol=0.0, maxiter=cap,
                                        fused="never")
            x_f, i_f = fused_minres_solve(bell, b, tol=0.0, maxiter=cap,
                                          interpret=True)
            assert int(i_f.iterations) == int(i_ref.iterations) == cap
            np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                       rtol=1e-4, atol=1e-6)

    def test_zero_iterations(self):
        # b = 0: done at init, zero iterations, x = x0 = 0 (flush no-ops)
        bell, n = _bell_poisson(24)
        x, info = fused_minres_solve(
            bell, jnp.zeros((n,), jnp.float32), tol=1e-30, interpret=True)
        assert int(info.iterations) == 0
        assert float(jnp.abs(x).max()) == 0.0

    def test_x0_respected(self):
        bell, n = _bell_poisson(24)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32)) * 0.01
        x_ref, i_ref = minres_solve(bell, b, x0, tol=0.0, maxiter=16,
                                    fused="never")
        x_f, i_f = fused_minres_solve(bell, b, x0, tol=0.0, maxiter=16,
                                      interpret=True)
        np.testing.assert_allclose(
            np.asarray(i_f.rnorm_history)[:17],
            np.asarray(i_ref.rnorm_history)[:17], rtol=2e-3)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   rtol=1e-3, atol=1e-5)


class TestDispatch:
    def test_supported_gate(self):
        bell, _ = _bell_poisson()
        assert fused_minres_supported(bell, dtype=jnp.float32,
                                      interpret=True)
        assert not fused_minres_supported(bell, dtype=jnp.float64,
                                          interpret=True)

    def test_cpu_backend_not_auto(self):
        # on the CPU test backend minres_solve must stay portable
        bell, n = _bell_poisson(24)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        x, info = minres_solve(bell, b, tol=1e-4)  # fused="auto"
        assert bool(info.converged)

    def test_always_raises_on_cpu(self):
        bell, n = _bell_poisson(24)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        with pytest.raises(ValueError, match="TPU backend"):
            minres_solve(bell, b, tol=1e-4, fused="always")

    def test_always_rejects_general_m(self):
        bell, n = _bell_poisson(24)
        b = jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
        with pytest.raises(ValueError, match="Jacobi"):
            minres_solve(bell, b, tol=1e-4, fused="always",
                         M=lambda r: 0.5 * r)
