"""Symmetric blocked-ELL storage (types.SymBellMatrix) — packing, matvec,
fused-kernel, and solver parity.

SymBell stores each off-diagonal tile once and applies it twice (B and Bᵀ);
it must run the same MATH as the full blocked-ELL layout: same matvec
values, trajectory-matched CG solves (exact f32 bit-parity is impossible —
the two kernels associate a row's sum differently; see
_assert_storage_parity).  The Pallas kernel runs
in interpret mode on the CPU test backend; the chip numbers live in
docs/performance.md (measured 1.18× faster CG iteration at bench scale —
890-909 GB/s effective vs the 819 GB/s HBM roofline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import cg_solve
from conjugategradient_tpu.ops.pallas.fused_cg import sym_fused_dir_spmv_dot
from conjugategradient_tpu.ops.spmv import bell_spmv, sym_bell_spmv
from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs
from conjugategradient_tpu.solver.fused import (
    fused_bell_cg_solve,
    fused_bell_pcg_solve,
    fused_supported,
)
from conjugategradient_tpu.types import (
    BlockedEllMatrix,
    CSRMatrix,
    SymBellMatrix,
)


def _random_block_sym(rng, nrb=6, bm=8, per_row=2, dtype=np.float64):
    """Random block-sparse SPD matrix (dense per-tile) + its dense form."""
    n = nrb * bm
    A = np.zeros((n, n), dtype)
    for i in range(nrb):
        D = rng.standard_normal((bm, bm)).astype(dtype)
        A[i * bm:(i + 1) * bm, i * bm:(i + 1) * bm] = (
            D + D.T + 20 * np.eye(bm, dtype=dtype)
        )
        hi = np.arange(i + 1, nrb)
        for c in rng.choice(hi, size=min(per_row, len(hi)), replace=False):
            B = rng.standard_normal((bm, bm)).astype(dtype)
            A[i * bm:(i + 1) * bm, c * bm:(c + 1) * bm] = B
            A[c * bm:(c + 1) * bm, i * bm:(i + 1) * bm] = B.T
    return A


def _pack(A, bm):
    n = A.shape[0]
    rows, cols = np.nonzero(A)
    csr = CSRMatrix.from_coo(rows, cols, A[rows, cols], (n, n), dtype=A.dtype)
    bell = BlockedEllMatrix.from_csr(csr, bm=bm, bn=bm)
    return bell, SymBellMatrix.from_bell(bell)


class TestType:
    def test_matvec_matches_dense_and_bell(self, rng):
        A = _random_block_sym(rng)
        bell, sym = _pack(A, 8)
        x = rng.standard_normal(A.shape[0])
        y = np.asarray(sym.matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, A @ x, rtol=1e-12)
        np.testing.assert_allclose(
            y, np.asarray(bell.matvec(jnp.asarray(x))), rtol=1e-12
        )

    def test_storage_smaller_than_full(self, rng):
        A = _random_block_sym(rng)
        bell, sym = _pack(A, 8)
        assert sym.memory_footprint() < bell.memory_footprint()
        assert sym.full_kmax == bell.kmax
        assert sym.full_tile_bytes() == bell.blocks.size * bell.dtype.itemsize

    def test_diagonal_and_to_dense(self, rng):
        A = _random_block_sym(rng)
        _, sym = _pack(A, 8)
        np.testing.assert_allclose(np.asarray(sym.diagonal()), np.diag(A))
        np.testing.assert_allclose(np.asarray(sym.to_dense()), A)

    def test_asymmetric_raises(self, rng):
        A = _random_block_sym(rng)
        A[0, 8] += 1.0  # break mirror of tile (0, 1)
        n = A.shape[0]
        rows, cols = np.nonzero(A)
        csr = CSRMatrix.from_coo(rows, cols, A[rows, cols], (n, n))
        bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=8)
        with pytest.raises(ValueError, match="not symmetric"):
            SymBellMatrix.from_bell(bell, check=True)

    def test_missing_mirror_raises(self, rng):
        A = _random_block_sym(rng)
        A[0:8, 8:16] = rng.standard_normal((8, 8))  # ensure tile (0,1) exists
        A[8:16, 0:8] = 0.0  # delete its lower mirror
        n = A.shape[0]
        rows, cols = np.nonzero(A)
        csr = CSRMatrix.from_coo(rows, cols, A[rows, cols], (n, n))
        bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=8)
        with pytest.raises(ValueError, match="not symmetric"):
            SymBellMatrix.from_bell(bell, check=True)

    def test_astype_and_pytree(self, rng):
        A = _random_block_sym(rng)
        _, sym = _pack(A, 8)
        low = sym.astype(jnp.float32)
        assert low.dtype == jnp.float32
        assert low.off_cols.dtype == sym.off_cols.dtype
        leaves, treedef = jax.tree_util.tree_flatten(sym)
        sym2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert sym2.shape == sym.shape and sym2.full_kmax == sym.full_kmax

    def test_from_csr_roundtrip(self, rng):
        A = _random_block_sym(rng)
        n = A.shape[0]
        rows, cols = np.nonzero(A)
        csr = CSRMatrix.from_coo(rows, cols, A[rows, cols], (n, n))
        sym = SymBellMatrix.from_csr(csr, bm=8, bn=8)
        x = rng.standard_normal(n)
        np.testing.assert_allclose(
            np.asarray(sym.matvec(jnp.asarray(x))), A @ x, rtol=1e-12
        )


class TestKernel:
    def _setup(self, rng, dtype=np.float32):
        A = _random_block_sym(rng, nrb=16, bm=8, per_row=3, dtype=dtype)
        bell, sym = _pack(A, 8)
        n = A.shape[0]
        r = rng.standard_normal(n).astype(dtype)
        p = rng.standard_normal(n).astype(dtype)
        return A, sym, r, p

    def test_dir_spmv_dot_parity(self, rng):
        A, sym, r, p = self._setup(rng)
        n = A.shape[0]
        beta = np.float32(0.37)
        p_new, q, pap = sym_fused_dir_spmv_dot(
            sym.diag_blocks.astype(jnp.float32),
            sym.off_blocks.astype(jnp.float32),
            sym.off_cols,
            jnp.asarray(r.reshape(-1, 8)), jnp.asarray(p.reshape(-1, 8)),
            jnp.full((1, 1), beta), interpret=True, row_group=4,
        )
        pv = r + beta * p
        qv = (A @ pv).astype(np.float32)
        np.testing.assert_allclose(np.asarray(p_new).ravel(), pv, atol=1e-5)
        np.testing.assert_allclose(np.asarray(q).ravel(), qv, rtol=1e-4)
        np.testing.assert_allclose(
            float(pap[0, 0]), float(pv @ qv), rtol=1e-5
        )

    def test_dir_spmv_dot_pcg_parity(self, rng):
        A, sym, r, p = self._setup(rng)
        d = (1.0 / np.diag(A)).astype(np.float32)
        beta = np.float32(0.7)
        p_new, q, pap = sym_fused_dir_spmv_dot(
            sym.diag_blocks.astype(jnp.float32),
            sym.off_blocks.astype(jnp.float32),
            sym.off_cols,
            jnp.asarray(r.reshape(-1, 8)), jnp.asarray(p.reshape(-1, 8)),
            jnp.full((1, 1), beta),
            inv_diag2d=jnp.asarray(d.reshape(-1, 8)),
            interpret=True, row_group=4,
        )
        pv = d * r + beta * p
        qv = (A @ pv).astype(np.float32)
        np.testing.assert_allclose(np.asarray(p_new).ravel(), pv, atol=1e-5)
        np.testing.assert_allclose(np.asarray(q).ravel(), qv, rtol=1e-4)

    def test_row_group_invariance(self, rng):
        A, sym, r, p = self._setup(rng)
        outs = []
        for R in (1, 2, 8):
            _, q, pap = sym_fused_dir_spmv_dot(
                sym.diag_blocks.astype(jnp.float32),
                sym.off_blocks.astype(jnp.float32),
                sym.off_cols,
                jnp.asarray(r.reshape(-1, 8)), jnp.asarray(p.reshape(-1, 8)),
                jnp.zeros((1, 1), jnp.float32), interpret=True, row_group=R,
            )
            outs.append((np.asarray(q), float(pap[0, 0])))
        for q, pap in outs[1:]:
            np.testing.assert_allclose(q, outs[0][0], rtol=1e-5)
            np.testing.assert_allclose(pap, outs[0][1], rtol=1e-5)


def _block_tridiag(rng, nrb=12, bm=8, dtype=np.float64):
    n = nrb * bm
    A = np.zeros((n, n), dtype)
    for i in range(nrb):
        D = rng.standard_normal((bm, bm)).astype(dtype)
        A[i * bm:(i + 1) * bm, i * bm:(i + 1) * bm] = (
            D + D.T + 20 * np.eye(bm, dtype=dtype)
        )
        if i + 1 < nrb:
            B = rng.standard_normal((bm, bm)).astype(dtype)
            A[i * bm:(i + 1) * bm, (i + 1) * bm:(i + 2) * bm] = B
            A[(i + 1) * bm:(i + 2) * bm, i * bm:(i + 1) * bm] = B.T
    return A


class TestMirrorSchemes:
    """The three Bᵀ landing schemes of sym_fused_dir_spmv_dot must be
    numerically interchangeable (same math, different VMEM traffic shape —
    the chip A/B lives in tools/symbell_mirror_ab.py)."""

    def _run(self, sym, r, p, mirror, d=None, R=4):
        return sym_fused_dir_spmv_dot(
            sym.diag_blocks.astype(jnp.float32),
            sym.off_blocks.astype(jnp.float32),
            sym.off_cols,
            jnp.asarray(r.reshape(-1, 8)), jnp.asarray(p.reshape(-1, 8)),
            jnp.full((1, 1), np.float32(0.37)),
            inv_diag2d=None if d is None else jnp.asarray(d.reshape(-1, 8)),
            interpret=True, row_group=R, mirror=mirror,
        )

    def test_split_matches_scatter_general(self, rng):
        A = _random_block_sym(rng, nrb=16, bm=8, per_row=3, dtype=np.float32)
        _, sym = _pack(A, 8)
        n = A.shape[0]
        r = rng.standard_normal(n).astype(np.float32)
        p = rng.standard_normal(n).astype(np.float32)
        d = (1.0 / np.diag(A)).astype(np.float32)
        for dd in (None, d):
            ref = self._run(sym, r, p, "scatter", d=dd)
            out = self._run(sym, r, p, "split", d=dd)
            for a, b_ in zip(ref, out):
                np.testing.assert_allclose(
                    np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-6
                )

    def test_banded_matches_scatter_tridiag(self, rng):
        A = _block_tridiag(rng, nrb=12, bm=8, dtype=np.float32)
        _, sym = _pack(A, 8)
        assert sym.banded
        n = A.shape[0]
        r = rng.standard_normal(n).astype(np.float32)
        p = rng.standard_normal(n).astype(np.float32)
        d = (1.0 / np.diag(A)).astype(np.float32)
        for dd in (None, d):
            for R in (1, 4):
                ref = self._run(sym, r, p, "scatter", d=dd, R=R)
                out = self._run(sym, r, p, "banded", d=dd, R=R)
                for a, b_ in zip(ref, out):
                    np.testing.assert_allclose(
                        np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-6
                    )

    def test_banded_rejects_wide_storage(self, rng):
        A = _random_block_sym(rng, nrb=16, bm=8, per_row=3, dtype=np.float32)
        _, sym = _pack(A, 8)
        assert sym.ku > 1
        r = np.zeros(A.shape[0], np.float32)
        with pytest.raises(ValueError, match="banded"):
            self._run(sym, r, r, "banded")

    def test_step_rejects_banded_on_offband_pattern(self, rng):
        """fused_cg_step must refuse mirror='banded' when the static
        banded flag is unset, even at ku == 1 — the kernel would silently
        land every mirror at row+1."""
        from conjugategradient_tpu.solver.fused import (
            fused_cg_init,
            fused_cg_step,
        )

        nrb, bm = 6, 8
        n = nrb * bm
        A = np.eye(n, dtype=np.float32) * 10
        # single upper tile per row but one of them skips a block-row
        B = rng.standard_normal((bm, bm)).astype(np.float32)
        A[0:bm, 2 * bm:3 * bm] = B
        A[2 * bm:3 * bm, 0:bm] = B.T
        _, sym = _pack(A, bm)
        assert sym.ku == 1 and not sym.banded
        b = jnp.ones((n,), jnp.float32)
        state = fused_cg_init(sym, b, maxiter=4)
        with pytest.raises(ValueError, match="banded"):
            fused_cg_step(sym, state, jnp.asarray(0.0, jnp.float32),
                          interpret=True, mirror="banded")

    def test_unknown_scheme_rejected(self, rng):
        A = _block_tridiag(rng, nrb=4, bm=8, dtype=np.float32)
        _, sym = _pack(A, 8)
        r = np.zeros(A.shape[0], np.float32)
        with pytest.raises(ValueError, match="mirror"):
            self._run(sym, r, r, "registers")


class TestBandedKernel:
    def test_banded_detection(self, rng):
        A = _block_tridiag(rng)
        _, sym = _pack(A, 8)
        assert sym.banded
        A2 = _random_block_sym(rng)  # scattered pattern
        _, sym2 = _pack(A2, 8)
        assert not sym2.banded or sym2.ku == 1  # scattered: almost surely no
        low = sym.astype(jnp.float32)
        assert low.banded  # astype preserves the static pattern fact


def _assert_storage_parity(solve_full, solve_sym, n_fixed=25):
    """Symmetric vs full storage run the SAME math but not the same f32
    rounding: the sym kernel associates a row's sum as mirror + (diag +
    upper) while the full kernel folds tiles left-to-right — so exact
    iteration-count equality is rounding luck (it held at the old R=2
    grouping and broke when the Mosaic block rule moved both kernels to
    R=nrb; CLAUDE.md's stagnation-cliff note is the same phenomenon).
    The real contract: matching residual TRAJECTORIES over a fixed
    iteration window, convergence to the same solution, and iteration
    counts in the same neighborhood."""
    _, inf_f0 = solve_full(0.0, n_fixed)
    _, inf_s0 = solve_sym(0.0, n_fixed)
    hf = np.asarray(inf_f0.rho_history[1: n_fixed + 1], np.float64)
    hs = np.asarray(inf_s0.rho_history[1: n_fixed + 1], np.float64)
    np.testing.assert_allclose(hs, hf, rtol=5e-2)
    xf, inf_f = solve_full(1e-5, 400)
    xs, inf_s = solve_sym(1e-5, 400)
    assert bool(inf_f.converged) and bool(inf_s.converged)
    assert abs(int(inf_s.iterations) - int(inf_f.iterations)) <= 8
    np.testing.assert_allclose(
        np.asarray(xs), np.asarray(xf), rtol=1e-3, atol=1e-4
    )


class TestSolver:
    def test_fused_solve_matches_full_bell(self, rng):
        """Trajectory-matched CG between symmetric and full storage."""
        rows, cols, vals, shape = poisson2d_coo(12)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=8)
        sym = SymBellMatrix.from_bell(bell)
        b = jnp.asarray(reference_rhs(shape[0]), jnp.float32)
        _assert_storage_parity(
            lambda tol, mi: fused_bell_cg_solve(
                bell, b, tol=tol, maxiter=mi, interpret=True
            ),
            lambda tol, mi: fused_bell_cg_solve(
                sym, b, tol=tol, maxiter=mi, interpret=True
            ),
        )

    def test_fused_pcg_solve_matches_full_bell(self, rng):
        rows, cols, vals, shape = poisson2d_coo(12)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=8)
        sym = SymBellMatrix.from_bell(bell)
        b = jnp.asarray(reference_rhs(shape[0]), jnp.float32)
        inv_d = 1.0 / jnp.asarray(np.asarray(bell.diagonal()), jnp.float32)
        _assert_storage_parity(
            lambda tol, mi: fused_bell_pcg_solve(
                bell, b, inv_d, tol=tol, maxiter=mi, interpret=True
            ),
            lambda tol, mi: fused_bell_pcg_solve(
                sym, b, inv_d, tol=tol, maxiter=mi, interpret=True
            ),
        )

    def test_fused_solve_banded_auto_matches_full(self, rng):
        """On a block-tridiagonal operator mirror='auto' routes to the
        banded kernel (solver/fused._auto_mirror); the solve must keep
        storage parity through that path — CG and Jacobi-PCG."""
        from conjugategradient_tpu.solver.fused import _auto_mirror

        A = _block_tridiag(rng, nrb=16, bm=8, dtype=np.float32)
        bell, sym = _pack(A, 8)
        assert _auto_mirror(sym) == "banded"
        b = jnp.asarray(rng.standard_normal(A.shape[0]), jnp.float32)
        _assert_storage_parity(
            lambda tol, mi: fused_bell_cg_solve(
                bell, b, tol=tol, maxiter=mi, interpret=True
            ),
            lambda tol, mi: fused_bell_cg_solve(
                sym, b, tol=tol, maxiter=mi, interpret=True
            ),
            n_fixed=15,
        )
        inv_d = jnp.asarray((1.0 / np.diag(A)).astype(np.float32))
        _assert_storage_parity(
            lambda tol, mi: fused_bell_pcg_solve(
                bell, b, inv_d, tol=tol, maxiter=mi, interpret=True
            ),
            lambda tol, mi: fused_bell_pcg_solve(
                sym, b, inv_d, tol=tol, maxiter=mi, interpret=True
            ),
            n_fixed=15,
        )

    def test_portable_cg_solve_accepts_symbell(self, rng):
        """The unfused (CPU/float64) path solves SymBell via its matvec."""
        A = _random_block_sym(rng)
        _, sym = _pack(A, 8)
        b = jnp.asarray(rng.standard_normal(A.shape[0]))
        x, info = cg_solve(sym, b, tol=1e-12, fused="never")
        np.testing.assert_allclose(
            np.asarray(sym.matvec(x)), np.asarray(b), atol=1e-9
        )

    def test_fused_supported_gating(self, rng):
        A = _random_block_sym(rng)
        _, sym = _pack(A, 8)
        # 8x8 tiles are not lane-aligned -> unsupported
        assert not fused_supported(sym, dtype=jnp.float32)
        # a lane-aligned synthetic sym operator IS supported (interpret)
        nrb, bm = 4, 128
        diag = jnp.asarray(
            np.tile(50 * np.eye(bm, dtype=np.float32), (nrb, 1, 1))
        )
        off = jnp.zeros((nrb, 1, bm, bm), jnp.float32)
        cols = jnp.asarray(
            np.arange(nrb, dtype=np.int32)[:, None]
        )
        sym_ok = SymBellMatrix(diag, off, cols, (nrb * bm, nrb * bm),
                               nrb * bm, 1)
        assert fused_supported(sym_ok, dtype=jnp.float32, interpret=True)
        assert not fused_supported(sym_ok, dtype=jnp.float64, interpret=True)


class TestMultiRHS:
    def test_spmv_multi_matches_dense(self, rng):
        from conjugategradient_tpu.ops.spmv import sym_bell_spmv_multi

        A = _random_block_sym(rng)
        _, sym = _pack(A, 8)
        X = rng.standard_normal((A.shape[0], 5))
        Y = np.asarray(sym_bell_spmv_multi(sym, jnp.asarray(X)))
        np.testing.assert_allclose(Y, A @ X, rtol=1e-12)

    def test_cg_solve_batched_lockstep(self, rng):
        from conjugategradient_tpu import cg_solve, cg_solve_batched

        A = _random_block_sym(rng, nrb=8)
        _, sym = _pack(A, 8)
        n = A.shape[0]
        B = jnp.asarray(rng.standard_normal((3, n)))
        X, info = cg_solve_batched(sym, B, tol=1e-10)
        for i in range(3):
            x_i, inf_i = cg_solve(sym, B[i], tol=1e-10)
            assert int(info.iterations[i]) == int(inf_i.iterations)
            np.testing.assert_allclose(
                np.asarray(X[i]), np.asarray(x_i), rtol=1e-8, atol=1e-10
            )

    def test_block_cg(self, rng):
        from conjugategradient_tpu import block_cg_solve

        A = _random_block_sym(rng, nrb=8)
        bell, sym = _pack(A, 8)
        n = A.shape[0]
        B = jnp.asarray(rng.standard_normal((3, n)))
        Xs, i_s = block_cg_solve(sym, B, tol=1e-10)
        Xf, i_f = block_cg_solve(bell, B, tol=1e-10)
        for i in range(3):
            assert int(i_s.iterations[i]) == int(i_f.iterations[i])
            np.testing.assert_allclose(
                np.asarray(Xs[i]), np.asarray(Xf[i]), rtol=1e-7, atol=1e-9
            )
