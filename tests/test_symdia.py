"""Symmetric DIA storage (types.SymDIAMatrix): only the offsets ≥ 0
stored, each applied along both directions — the banded twin of the
symmetric blocked-ELL layout.  Must be numerically indistinguishable from
the full DIA layout: same matvec values, iteration-identical solves, and
it rides cg_solve's DIA constant-closure dispatch (matvec-generic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, DIAMatrix, SymDIAMatrix, cg_solve
from conjugategradient_tpu.ops.spmv import sym_dia_spmv
from conjugategradient_tpu.problems import banded_spd_coo, reference_rhs


@pytest.fixture(scope="module")
def banded():
    rows, cols, vals, shape = banded_spd_coo(300, bandwidth=9, seed=4)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape)
    dia = DIAMatrix.from_csr(csr)
    return csr, dia, np.asarray(dia.to_dense())


class TestType:
    def test_matvec_matches_dense_and_dia(self, banded, rng):
        csr, dia, A = banded
        sym = SymDIAMatrix.from_dia(dia)
        x = rng.standard_normal(A.shape[0])
        y = np.asarray(sym.matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, A @ x, rtol=1e-12)
        np.testing.assert_allclose(
            y, np.asarray(dia.matvec(jnp.asarray(x))), rtol=1e-12
        )

    def test_storage_nearly_halves(self, banded):
        _, dia, _ = banded
        sym = SymDIAMatrix.from_dia(dia)
        assert all(o >= 0 for o in sym.offsets)
        assert sym.memory_footprint() < 0.6 * dia.memory_footprint()
        assert sym.full_diag_bytes() == dia.diags.size * dia.dtype.itemsize

    def test_diagonal_and_to_dense(self, banded):
        _, dia, A = banded
        sym = SymDIAMatrix.from_dia(dia)
        np.testing.assert_allclose(np.asarray(sym.diagonal()), np.diag(A))
        np.testing.assert_allclose(np.asarray(sym.to_dense()), A)

    def test_asymmetric_raises(self, banded):
        _, dia, A = banded
        A2 = A.copy()
        A2[0, 3] += 1.0  # break the +3 / -3 mirror
        dia2 = DIAMatrix.from_csr(CSRMatrix.from_dense(jnp.asarray(A2)))
        with pytest.raises(ValueError, match="not symmetric"):
            SymDIAMatrix.from_dia(dia2)

    def test_missing_mirror_raises(self, rng):
        n = 40
        A = np.diag(np.full(n, 5.0))
        A[np.arange(n - 2), np.arange(2, n)] = 1.0  # +2 only, no -2
        dia = DIAMatrix.from_csr(CSRMatrix.from_dense(jnp.asarray(A)))
        with pytest.raises(ValueError, match="mirror"):
            SymDIAMatrix.from_dia(dia)

    def test_astype_and_pytree(self, banded):
        _, dia, _ = banded
        sym = SymDIAMatrix.from_dia(dia)
        low = sym.astype(jnp.float32)
        assert low.dtype == jnp.float32 and low.offsets == sym.offsets
        leaves, treedef = jax.tree_util.tree_flatten(sym)
        sym2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert sym2.offsets == sym.offsets and sym2.nnz == sym.nnz

    def test_rectangular_rejected(self):
        d = jnp.ones((1, 4))
        dia = DIAMatrix(d, (0,), (4, 5), 4)
        with pytest.raises(ValueError, match="square"):
            SymDIAMatrix.from_dia(dia)


class TestSolver:
    def test_cg_solve_iteration_identical_to_dia(self, banded):
        csr, dia, A = banded
        sym = SymDIAMatrix.from_dia(dia)
        n = A.shape[0]
        b = jnp.asarray(reference_rhs(n))
        x_d, i_d = cg_solve(dia, b, tol=1e-10)
        x_s, i_s = cg_solve(sym, b, tol=1e-10)
        assert int(i_s.iterations) == int(i_d.iterations)
        np.testing.assert_allclose(
            np.asarray(x_s), np.asarray(x_d), rtol=1e-9, atol=1e-11
        )

    def test_loader_and_tester(self, tmp_path, capsys):
        import tester
        from conjugategradient_tpu.io import write_mtx

        rows, cols, vals, shape = banded_spd_coo(120, bandwidth=5, seed=7)
        path = tmp_path / "banded.mtx"
        write_mtx(path, rows, cols, vals, shape)
        rc = tester.main([str(path), "--layout", "symdia", "--tol", "1e-8"])
        assert rc == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        parts = line.split()
        assert int(parts[0]) == 120 and float(parts[3]) < 1e-10

    def test_jacobi_pcg(self, banded):
        from conjugategradient_tpu import jacobi_preconditioner

        csr, dia, A = banded
        sym = SymDIAMatrix.from_dia(dia)
        b = jnp.asarray(reference_rhs(A.shape[0]))
        x, info = cg_solve(sym, b, tol=1e-10, M=jacobi_preconditioner(sym))
        assert float(jnp.linalg.norm(b - jnp.asarray(A) @ x)) < 1e-8


class TestMultiRHS:
    def test_spmv_multi_matches_dense(self, banded, rng):
        from conjugategradient_tpu.ops.spmv import sym_dia_spmv_multi

        _, dia, A = banded
        sym = SymDIAMatrix.from_dia(dia)
        X = rng.standard_normal((A.shape[0], 4))
        Y = np.asarray(sym_dia_spmv_multi(sym, jnp.asarray(X)))
        np.testing.assert_allclose(Y, A @ X, rtol=1e-12)

    def test_cg_solve_batched_lockstep(self, banded, rng):
        from conjugategradient_tpu import cg_solve_batched

        _, dia, A = banded
        sym = SymDIAMatrix.from_dia(dia)
        n = A.shape[0]
        B = jnp.asarray(rng.standard_normal((3, n)))
        X, info = cg_solve_batched(sym, B, tol=1e-10)
        for i in range(3):
            x_i, inf_i = cg_solve(sym, B[i], tol=1e-10)
            assert int(info.iterations[i]) == int(inf_i.iterations)
            np.testing.assert_allclose(
                np.asarray(X[i]), np.asarray(x_i), rtol=1e-8, atol=1e-10
            )

    def test_block_cg(self, banded, rng):
        from conjugategradient_tpu import block_cg_solve

        _, dia, A = banded
        sym = SymDIAMatrix.from_dia(dia)
        n = A.shape[0]
        B = jnp.asarray(rng.standard_normal((3, n)))
        Xs, i_s = block_cg_solve(sym, B, tol=1e-10)
        Xf, i_f = block_cg_solve(dia, B, tol=1e-10)
        for i in range(3):
            assert int(i_s.iterations[i]) == int(i_f.iterations[i])
            np.testing.assert_allclose(
                np.asarray(Xs[i]), np.asarray(Xf[i]), rtol=1e-7, atol=1e-9
            )


class TestSharded:
    """sharded_symdia_cg_solve: half the DIA operator bytes at the full
    layout's collective count (ring halo + a once-per-solve diagonal
    halo); iteration-identical to single device and to sharded full DIA."""

    N_DEV = 8

    def _setup(self, n=320, bandwidth=6):
        if len(jax.devices()) < self.N_DEV:
            pytest.skip("needs 8 devices")
        from conjugategradient_tpu.parallel import partition_dia_rows

        rows, cols, vals, shape = banded_spd_coo(n, bandwidth=bandwidth,
                                                 seed=11)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape)
        dia = DIAMatrix.from_csr(csr)
        sym = SymDIAMatrix.from_dia(dia)
        diags_sh, n_pad = partition_dia_rows(
            np.asarray(sym.diags), shape, self.N_DEV
        )
        b_pad = jnp.zeros((n_pad,)).at[: shape[0]].set(
            jnp.asarray(reference_rhs(shape[0]))
        )
        return dia, sym, jnp.asarray(diags_sh), b_pad, shape[0]

    def test_matches_single_device(self):
        from conjugategradient_tpu.parallel import sharded_symdia_cg_solve

        dia, sym, diags_sh, b_pad, n = self._setup()
        x1, i1 = cg_solve(sym, jnp.asarray(b_pad[:n]), tol=1e-10)
        x_sh, i_sh = sharded_symdia_cg_solve(
            diags_sh, sym.offsets, b_pad, tol=1e-10, maxiter=n + 1
        )
        assert int(i_sh.iterations) == int(i1.iterations)
        np.testing.assert_allclose(
            np.asarray(x_sh[:n]), np.asarray(x1), rtol=1e-8, atol=1e-9
        )
        k = int(i1.iterations)
        h1 = np.asarray(i1.rho_history)[:k]
        hs = np.asarray(i_sh.rho_history)[:k]
        sel = h1 > h1[0] * 1e-20
        np.testing.assert_allclose(hs[sel], h1[sel], rtol=1e-4)

    def test_matches_sharded_full_dia(self):
        from conjugategradient_tpu.parallel import (
            partition_dia_rows,
            sharded_dia_cg_solve,
            sharded_symdia_cg_solve,
        )

        dia, sym, diags_sh, b_pad, n = self._setup()
        full_sh, _ = partition_dia_rows(
            np.asarray(dia.diags), dia.shape, self.N_DEV
        )
        x_f, i_f = sharded_dia_cg_solve(
            jnp.asarray(full_sh), dia.offsets, b_pad, tol=1e-10,
            maxiter=n + 1,
        )
        x_s, i_s = sharded_symdia_cg_solve(
            diags_sh, sym.offsets, b_pad, tol=1e-10, maxiter=n + 1
        )
        assert int(i_s.iterations) == int(i_f.iterations)
        np.testing.assert_allclose(
            np.asarray(x_s[:n]), np.asarray(x_f[:n]), rtol=1e-9, atol=1e-10
        )

    def test_pcg_pipelined_and_guards(self):
        from conjugategradient_tpu import jacobi_preconditioner
        from conjugategradient_tpu.parallel import sharded_symdia_cg_solve

        dia, sym, diags_sh, b_pad, n = self._setup()
        n_pad = int(b_pad.shape[0])
        inv_d = np.ones((n_pad,))
        inv_d[:n] = 1.0 / np.asarray(sym.diagonal())
        x1, i1 = cg_solve(sym, jnp.asarray(b_pad[:n]), tol=1e-10,
                          M=jacobi_preconditioner(sym))
        x_sh, i_sh = sharded_symdia_cg_solve(
            diags_sh, sym.offsets, b_pad, tol=1e-10, maxiter=n + 1,
            inv_diag=jnp.asarray(inv_d),
        )
        assert int(i_sh.iterations) == int(i1.iterations)
        x2, i2 = cg_solve(sym, jnp.asarray(b_pad[:n]), tol=1e-10)
        x_p, i_p = sharded_symdia_cg_solve(
            diags_sh, sym.offsets, b_pad, tol=1e-10, maxiter=n + 1,
            method="pipelined",
        )
        assert int(i_p.iterations) == int(i2.iterations)
        with pytest.raises(ValueError, match="sstep"):
            sharded_symdia_cg_solve(diags_sh, sym.offsets, b_pad,
                                    method="sstep")
        with pytest.raises(ValueError, match="offsets >= 0"):
            sharded_symdia_cg_solve(diags_sh, (-1, 0, 1), b_pad)


class TestBlockedKernel:
    """The halo'd pre-blocked layout + Pallas windowed symmetric kernel
    (round 4): past cg_solve's 320 MB constant-closure gate the symmetric
    layout upgrades to this instead of forfeiting its half-band saving to
    full pre-blocked DIA."""

    def test_default_block_len_bounds_halo_overhead(self):
        """The default (halo-aware) block length must keep the per-block
        halo ≤ 12.5% extra stream — at stencil-scale bands a fixed 16K
        block streamed 2.25× the stored half-band, erasing the symmetric
        win (measured 664 µs/iter sym vs 656 full at n=2M before the
        halo-aware default; with the Mosaic scoped-vmem cap raised
        per-call the 12.5% target measured 1008 vs 933 GB/s effective
        on chip)."""
        n, w = 1 << 17, 8 * 1024
        offs = tuple(k * 1024 for k in range(w // 1024 + 1))
        diags = jnp.ones((len(offs), n), jnp.float32)
        sym = SymDIAMatrix(diags, offs, (n, n), n * len(offs))
        blk = sym.with_blocked()
        _, _, row_len = blk.diags_blocked.shape
        hw = blk.blocked_halo
        bl = row_len - hw
        assert hw >= w
        assert hw <= 0.125 * bl

    def test_with_blocked_layout_and_halo_contents(self, banded):
        _, dia, _ = banded
        sym = SymDIAMatrix.from_dia(dia)
        blk = sym.with_blocked(block_len=128)
        assert blk.diags_blocked is not None
        assert blk.with_blocked() is blk  # idempotent
        ng, ndiag, row_len = blk.diags_blocked.shape
        hw = blk.blocked_halo
        bl = row_len - hw
        assert hw % 1024 == 0 and bl % 1024 == 0
        assert hw >= max(sym.offsets)
        # block g row j holds d[g*bl - hw + j] with zeros outside [0, n)
        d = np.asarray(sym.diags)
        dpe = np.pad(d, ((0, 0), (hw, ng * bl - d.shape[1])))
        for g in range(ng):
            np.testing.assert_array_equal(
                np.asarray(blk.diags_blocked)[g],
                dpe[:, g * bl : g * bl + hw + bl],
            )

    def test_kernel_parity_multi_block(self, rng):
        """Interpret-mode parity across BLOCK BOUNDARIES: n spans several
        1024-blocks so the mirror term reads the baked-in left halo."""
        from conjugategradient_tpu.ops.pallas.dia_spmv import (
            sym_dia_spmv_pallas_blocked,
        )

        rows, cols, vals, shape = banded_spd_coo(3000, bandwidth=9, seed=5)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        dia = DIAMatrix.from_csr(csr)
        sym = SymDIAMatrix.from_dia(dia)
        blk = sym.with_blocked(block_len=1024)
        assert blk.diags_blocked.shape[0] > 1  # multi-block
        x = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
        y_ref = np.asarray(dia.matvec(x))
        y_blk = sym_dia_spmv_pallas_blocked(
            blk.diags_blocked, blk.offsets, x, n=shape[0],
            hw=blk.blocked_halo, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(y_blk), y_ref, rtol=1e-5, atol=1e-5
        )

    def test_kernel_parity_stencil_scale_offsets(self, rng):
        """Offsets past 1024 (the regime the Pallas kernel exists for):
        the halo exceeds one block, mirror values come from TWO blocks
        back."""
        from conjugategradient_tpu.ops.pallas.dia_spmv import (
            sym_dia_spmv_pallas_blocked,
        )

        n, k = 4096, 1100
        d0 = 4.0 + rng.random(n).astype(np.float32)
        d1 = (0.1 * rng.standard_normal(n)).astype(np.float32)
        d1[n - k:] = 0.0  # out-of-range slots zero by convention
        sym = SymDIAMatrix(
            jnp.asarray(np.stack([d0, d1])), (0, k), (n, n),
            int(n + 2 * (n - k)),
        )
        blk = sym.with_blocked(block_len=1024)
        assert blk.blocked_halo >= k
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y_ref = np.asarray(sym.matvec(x))  # XLA symmetric path
        y_blk = sym_dia_spmv_pallas_blocked(
            blk.diags_blocked, blk.offsets, x, n=n,
            hw=blk.blocked_halo, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(y_blk), y_ref, rtol=1e-5, atol=1e-5
        )

    def test_pytree_astype_and_solve_parity(self, banded, rng):
        _, dia, _ = banded
        sym = SymDIAMatrix.from_dia(dia)
        blk = sym.with_blocked(block_len=128)
        # pytree round-trip keeps the blocked leaf + static halo
        leaves, treedef = jax.tree_util.tree_flatten(blk)
        assert len(leaves) == 2
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert back.diags_blocked is not None
        assert back.blocked_halo == blk.blocked_halo
        # astype casts both copies
        low = blk.astype(jnp.bfloat16)
        assert low.diags_blocked.dtype == jnp.bfloat16
        # solving with the upgraded operator matches the plain one (CPU:
        # the XLA path runs either way, exercising the pytree through jit)
        n = sym.shape[0]
        b = jnp.asarray(rng.standard_normal(n).astype(np.float64))
        x1, i1 = cg_solve(sym, b, tol=1e-10)
        x2, i2 = cg_solve(blk, b, tol=1e-10)
        assert int(i1.iterations) == int(i2.iterations)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-9)

    def test_mixed_bf16_op_f32_x(self, rng):
        """bf16 half-band + f32 vector: x-dtype scratch, promoted output
        (the same contract as the full DIA Pallas kernels)."""
        from conjugategradient_tpu.ops.pallas.dia_spmv import (
            sym_dia_spmv_pallas_blocked,
        )

        rows, cols, vals, shape = banded_spd_coo(2500, bandwidth=7, seed=8)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        sym32 = SymDIAMatrix.from_dia(DIAMatrix.from_csr(csr))
        blk16 = sym32.astype(jnp.bfloat16).with_blocked(block_len=1024)
        x = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
        y_ref = np.asarray(sym32.matvec(x))
        y = sym_dia_spmv_pallas_blocked(
            blk16.diags_blocked, blk16.offsets, x, n=shape[0],
            hw=blk16.blocked_halo, interpret=True,
        )
        assert y.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-2, atol=2e-2)
