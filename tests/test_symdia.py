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
