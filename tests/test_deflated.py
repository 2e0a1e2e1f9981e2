"""Deflated / recycling CG (solver/deflated.py).

The theory being tested (Saad-Yeung-Erhel-Guyomarc'h 2000): deflating the
k lowest eigenmodes runs CG at condition λ_max/λ_{k+1}; with exact
eigenvectors the iteration-count gain follows √κ, with Lanczos/harvested
Ritz vectors the gain tracks basis quality (basis_quality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import (
    CSRMatrix,
    DeflationBasis,
    cg_solve,
    deflated_cg_solve,
    jacobi_preconditioner,
    make_deflation_basis,
)
from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs
from conjugategradient_tpu.solver.deflated import (
    basis_quality,
    deflation_basis_from_vectors,
    harvest_deflation_basis,
)


@pytest.fixture(scope="module")
def poisson():
    rows, cols, vals, shape = poisson2d_coo(24)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = jnp.asarray(reference_rhs(shape[0]))
    _, i_plain = cg_solve(A, b, tol=1e-10)
    return A, b, int(i_plain.iterations)


class TestExactDeflation:
    def test_exact_eigenvectors_cut_iterations(self, poisson):
        A, b, plain_iters = poisson
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        for k, max_iters in ((12, 70), (24, 58)):
            basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :k]))
            x, info = deflated_cg_solve(A, b, basis, tol=1e-10)
            assert int(info.iterations) < plain_iters
            assert int(info.iterations) <= max_iters  # measured 63 / 51
            resid = float(jnp.linalg.norm(b - A.matvec(x)))
            assert resid < 1e-8
            # exact eigenvectors: quality ~ 0
            assert float(basis_quality(A, basis).max()) < 1e-8

    def test_residual_stays_W_orthogonal(self, poisson):
        A, b, _ = poisson
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :8]))
        x, info = deflated_cg_solve(A, b, basis, tol=1e-10)
        r = b - A.matvec(x)
        assert float(jnp.abs(basis.W.T @ r).max()) < 1e-9

    def test_same_solution_as_plain(self, poisson):
        A, b, _ = poisson
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :8]))
        x_d, _ = deflated_cg_solve(A, b, basis, tol=1e-12)
        x_p, _ = cg_solve(A, b, tol=1e-12)
        # both recurrences stagnate near the f64 floor (‖x‖ ~ 1e5 here);
        # compare in the norm that the floor actually bounds
        rel = float(
            jnp.linalg.norm(x_d - x_p) / jnp.linalg.norm(x_p)
        )
        assert rel < 1e-9, rel


class TestLanczosBasis:
    def test_enough_lanczos_beats_plain(self, poisson):
        A, b, plain_iters = poisson
        basis = make_deflation_basis(A, k=12, lanczos_iters=80)
        x, info = deflated_cg_solve(A, b, basis, tol=1e-10)
        assert int(info.iterations) < plain_iters  # measured 84 vs 90
        assert float(jnp.linalg.norm(b - A.matvec(x))) < 1e-8

    def test_quality_improves_with_iters(self, poisson):
        A, b, _ = poisson
        q_small = float(
            basis_quality(A, make_deflation_basis(A, k=8, lanczos_iters=30)).max()
        )
        q_big = float(
            basis_quality(A, make_deflation_basis(A, k=8, lanczos_iters=100)).max()
        )
        assert q_big < q_small

    def test_pytree_roundtrip(self, poisson):
        A, b, _ = poisson
        basis = make_deflation_basis(A, k=4, lanczos_iters=20)
        leaves, treedef = jax.tree_util.tree_flatten(basis)
        b2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert b2.k == basis.k


class TestLobpcgBasis:
    def test_lobpcg_harvest_cuts_iterations(self, poisson):
        A, b, plain_iters = poisson
        basis = make_deflation_basis(A, k=8, method="lobpcg", maxiter=60)
        x, info = deflated_cg_solve(A, b, basis, tol=1e-10)
        assert int(info.iterations) < plain_iters
        assert float(jnp.linalg.norm(b - A.matvec(x))) < 1e-8

    def test_preconditioned_harvest_quality(self, poisson):
        """M-preconditioned LOBPCG at a fixed budget must produce a basis
        at least as good as the unpreconditioned run."""
        A, _, _ = poisson
        M = jacobi_preconditioner(A)
        q_plain = float(
            basis_quality(
                A, make_deflation_basis(A, k=6, method="lobpcg", maxiter=25)
            ).max()
        )
        q_prec = float(
            basis_quality(
                A,
                make_deflation_basis(A, k=6, method="lobpcg", maxiter=25, M=M),
            ).max()
        )
        assert q_prec <= q_plain * 1.5  # Jacobi ≈ identity here; no regression

    def test_method_validation(self, poisson):
        A, _, _ = poisson
        with pytest.raises(ValueError, match="lanczos.*lobpcg"):
            make_deflation_basis(A, k=4, method="arnoldi")
        with pytest.raises(ValueError, match="lobpcg"):
            make_deflation_basis(A, k=4, M=lambda z: z)


class TestRecycling:
    def test_harvested_basis_speeds_second_solve(self, poisson):
        """The recycling workflow: harvest from a solve on b1, deflate a
        solve on an unrelated b2 — fewer iterations than plain CG."""
        A, b, _ = poisson
        n = A.shape[0]
        b2 = jnp.asarray(np.random.default_rng(3).standard_normal(n))
        _, i_plain2 = cg_solve(A, b2, tol=1e-10)
        basis = harvest_deflation_basis(A, b, k=12, m=80)
        x2, i2 = deflated_cg_solve(A, b2, basis, tol=1e-10)
        assert int(i2.iterations) < int(i_plain2.iterations)  # 83 vs 94
        assert float(jnp.linalg.norm(b2 - A.matvec(x2))) < 1e-8

    def test_harvest_matches_lanczos_tridiagonal(self, poisson):
        """The CG-coefficient tridiagonal must reproduce Lanczos Ritz
        values — same Krylov space, same T."""
        A, b, _ = poisson
        basis_h = harvest_deflation_basis(A, b, k=6, m=40)
        # the harvested Ritz values (Rayleigh quotients of W columns)
        W = np.asarray(basis_h.W)
        Ad = np.asarray(A.to_dense())
        theta_h = np.sort(np.diag(W.T @ Ad @ W) / np.diag(W.T @ W))
        # direct Lanczos on the same starting vector b
        from conjugategradient_tpu.solver.deflated import make_deflation_basis

        basis_l = make_deflation_basis(A, k=6, lanczos_iters=40, v0=b)
        Wl = np.asarray(basis_l.W)
        theta_l = np.sort(np.diag(Wl.T @ Ad @ Wl) / np.diag(Wl.T @ Wl))
        np.testing.assert_allclose(theta_h, theta_l, rtol=1e-6)

    def test_early_convergence_truncates(self):
        """Harvest m beyond exact convergence must not NaN the basis."""
        n = 24
        rng = np.random.default_rng(0)
        Q = rng.standard_normal((n, n))
        A = CSRMatrix.from_dense(jnp.asarray(Q @ Q.T + n * np.eye(n)))
        b = jnp.asarray(rng.standard_normal(n))
        basis = harvest_deflation_basis(A, b, k=4, m=n)  # m = n > iters
        assert bool(jnp.all(jnp.isfinite(basis.W)))
        x, info = deflated_cg_solve(A, b, basis, tol=1e-12)
        assert float(jnp.linalg.norm(b - A.matvec(x))) < 1e-8


class TestComposition:
    def test_with_jacobi(self, poisson):
        A, b, _ = poisson
        M = jacobi_preconditioner(A)
        _, i_pcg = cg_solve(A, b, tol=1e-10, M=M)
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :12]))
        x, i_d = deflated_cg_solve(A, b, basis, tol=1e-10, M=M)
        assert float(jnp.linalg.norm(b - A.matvec(x))) < 1e-8
        assert int(i_d.iterations) < int(i_pcg.iterations)

    def test_warm_start(self, poisson):
        A, b, _ = poisson
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :8]))
        x0, _ = deflated_cg_solve(A, b, basis, tol=1e-4)
        x, info = deflated_cg_solve(A, b, basis, x0=x0, tol=1e-10)
        x_cold, info_cold = deflated_cg_solve(A, b, basis, tol=1e-10)
        assert int(info.iterations) < int(info_cold.iterations)
        assert float(jnp.linalg.norm(b - A.matvec(x))) < 1e-8

    def test_bad_k_raises(self, poisson):
        A, b, _ = poisson
        with pytest.raises(ValueError, match="k"):
            make_deflation_basis(A, k=50, lanczos_iters=10)
        with pytest.raises(ValueError, match="k"):
            harvest_deflation_basis(A, b, k=50, m=10)


class TestDivergenceGuard:
    def test_unattainable_tol_stops_not_converged_best_x(self, poisson):
        """tol below the f64 stagnation floor: the projector amplifies
        rounding noise exponentially past the floor (measured 1.4e-21 →
        9.6e12 by the cap); the guard must STOP the loop, report
        converged=False, and return the best iterate, not the diverged
        one."""
        A, b, _ = poisson
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :8]))
        x, info = deflated_cg_solve(A, b, basis, tol=1e-30)
        assert not bool(info.converged)
        assert int(info.iterations) < A.shape[0]  # stopped before the cap
        # best-iterate return: the solution is still at the f64 floor
        resid = float(jnp.linalg.norm(b - A.matvec(x)))
        assert resid < 1e-7, resid


class TestTesterFlag:
    def test_deflate_flag_solves_and_rejects_combos(self, capsys):
        import pathlib
        import tester

        mtx = str(pathlib.Path(__file__).resolve().parent.parent
                  / "problems" / "poisson2d_34.mtx")
        rc = tester.main([mtx, "--deflate", "8", "--tol", "1e-8"])
        assert rc == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        parts = line.split()
        assert len(parts) == 4 and int(parts[0]) == 1156
        assert float(parts[3]) < 1e-10

        rc = tester.main([mtx, "--deflate", "8", "--nrhs", "2"])
        assert rc == 2
        rc = tester.main([mtx, "--deflate", "8", "--method", "sstep"])
        assert rc == 2


class TestShardedDeflation:
    """Deflation on the mesh (sharded_cg_solve(basis=...)): one extra
    (k,)-payload psum per iteration; must be iteration-identical to the
    single-device deflated loop."""

    N_DEV = 8

    def _setup(self):
        import jax

        if len(jax.devices()) < self.N_DEV:
            pytest.skip("needs 8 devices")
        from conjugategradient_tpu.parallel import partition_csr_rows

        rows, cols, vals, shape = poisson2d_coo(16)
        A = CSRMatrix.from_coo(rows, cols, vals, shape)
        n = shape[0]
        blocks, bcols, n_pad = partition_csr_rows(
            np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
            shape, self.N_DEV, bm=8, bn=8,
        )
        b_pad = jnp.zeros((n_pad,)).at[:n].set(
            jnp.asarray(reference_rhs(n))
        )
        return A, jnp.asarray(blocks), jnp.asarray(bcols), b_pad, n

    def test_matches_single_device(self):
        from conjugategradient_tpu.parallel import sharded_cg_solve

        A, blocks, bcols, b_pad, n = self._setup()
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :8]))
        x1, i1 = deflated_cg_solve(A, jnp.asarray(b_pad[:n]), basis,
                                   tol=1e-10)
        x_sh, i_sh = sharded_cg_solve(
            blocks, bcols, b_pad, tol=1e-10, maxiter=n + 1, basis=basis
        )
        assert int(i_sh.iterations) == int(i1.iterations)
        assert bool(i_sh.converged)
        np.testing.assert_allclose(
            np.asarray(x_sh[:n]), np.asarray(x1), rtol=1e-8, atol=1e-9
        )
        k = int(i1.iterations)
        h1 = np.asarray(i1.rho_history)[:k]
        hs = np.asarray(i_sh.rho_history)[:k]
        sel = h1 > h1[0] * 1e-20
        np.testing.assert_allclose(hs[sel], h1[sel], rtol=1e-4)

    def test_with_jacobi(self):
        from conjugategradient_tpu.parallel import sharded_cg_solve

        A, blocks, bcols, b_pad, n = self._setup()
        n_pad = int(b_pad.shape[0])
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :6]))
        M = jacobi_preconditioner(A)
        inv_d = np.ones((n_pad,))
        inv_d[:n] = 1.0 / np.asarray(A.diagonal())
        x1, i1 = deflated_cg_solve(A, jnp.asarray(b_pad[:n]), basis,
                                   tol=1e-10, M=M)
        x_sh, i_sh = sharded_cg_solve(
            blocks, bcols, b_pad, tol=1e-10, maxiter=n + 1, basis=basis,
            inv_diag=jnp.asarray(inv_d),
        )
        assert int(i_sh.iterations) == int(i1.iterations)
        np.testing.assert_allclose(
            np.asarray(x_sh[:n]), np.asarray(x1), rtol=1e-8, atol=1e-9
        )

    def test_rejects_method_combos(self):
        from conjugategradient_tpu.parallel import sharded_cg_solve

        A, blocks, bcols, b_pad, n = self._setup()
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :4]))
        with pytest.raises(ValueError, match="deflation"):
            sharded_cg_solve(blocks, bcols, b_pad, basis=basis,
                             method="pipelined")
        with pytest.raises(ValueError, match="deflation"):
            sharded_cg_solve(blocks, bcols, b_pad, basis=basis,
                             recompute_r_every=5)

    def test_symbell_front_end(self):
        from conjugategradient_tpu.parallel import (
            partition_symbell_rows,
            sharded_symbell_cg_solve,
        )

        A, blocks, bcols, b_pad, n = self._setup()
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :8]))
        parts = partition_symbell_rows(
            np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
            A.shape, self.N_DEV, bn=8,
        )
        diag, off, offc, cross, crossr, crossc, n_pad = parts
        b2 = jnp.zeros((n_pad,)).at[:n].set(b_pad[:n])
        x1, i1 = deflated_cg_solve(A, jnp.asarray(b_pad[:n]), basis,
                                   tol=1e-10)
        x_sh, i_sh = sharded_symbell_cg_solve(
            diag, off, offc, cross, crossr, crossc, b2,
            tol=1e-10, maxiter=n + 1, basis=basis,
        )
        assert int(i_sh.iterations) == int(i1.iterations)
        np.testing.assert_allclose(
            np.asarray(x_sh[:n]), np.asarray(x1), rtol=1e-8, atol=1e-9
        )


class TestHarvestWarmStart:
    def test_harvest_x_warm_starts_first_solve(self, poisson):
        """return_x=True hands back the harvest pass's own iterate: the
        first solve warm-started from it needs fewer iterations than a
        cold deflated solve — the harvest work is never paid twice."""
        A, b, _ = poisson
        basis, x_m = harvest_deflation_basis(A, b, k=12, m=80,
                                             return_x=True)
        x_cold, i_cold = deflated_cg_solve(A, b, basis, tol=1e-10)
        x_warm, i_warm = deflated_cg_solve(A, b, basis, x0=x_m, tol=1e-10)
        assert int(i_warm.iterations) < int(i_cold.iterations)
        assert float(jnp.linalg.norm(b - A.matvec(x_warm))) < 1e-8


class TestChebyshevComposition:
    def test_with_chebyshev_preconditioner(self, poisson):
        """Deflation composes with the polynomial preconditioner: both
        attack the spectrum from opposite ends (deflation clips the low
        tail, Chebyshev compresses the bulk)."""
        from conjugategradient_tpu.solver import (
            chebyshev_preconditioner,
            estimate_spectral_bounds,
        )

        A, b, _ = poisson
        lam_min, lam_max = estimate_spectral_bounds(A, iters=40)
        M = chebyshev_preconditioner(A, lam_min, lam_max, degree=4)
        _, i_cheb = cg_solve(A, b, tol=1e-10, M=M)
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(A, jnp.asarray(V[:, :8]))
        x, i_both = deflated_cg_solve(A, b, basis, tol=1e-10, M=M)
        assert float(jnp.linalg.norm(b - A.matvec(x))) < 1e-8
        assert int(i_both.iterations) <= int(i_cheb.iterations)



class TestShardedDiaDeflation:
    N_DEV = 8

    def test_dia_front_end(self):
        from conjugategradient_tpu.parallel import (
            partition_dia_rows,
            sharded_dia_cg_solve,
        )
        from conjugategradient_tpu.problems import banded_spd_coo
        from conjugategradient_tpu.types import DIAMatrix

        import jax as _jax

        if len(_jax.devices()) < self.N_DEV:
            pytest.skip("needs 8 devices")
        rows, cols, vals, shape = banded_spd_coo(320, bandwidth=5, seed=9)
        A = CSRMatrix.from_coo(rows, cols, vals, shape)
        dia = DIAMatrix.from_csr(A)
        n = shape[0]
        w, V = np.linalg.eigh(np.asarray(A.to_dense()))
        basis = deflation_basis_from_vectors(dia, jnp.asarray(V[:, :6]))
        diags_sh, n_pad = partition_dia_rows(
            np.asarray(dia.diags), shape, self.N_DEV
        )
        b_pad = jnp.zeros((n_pad,)).at[:n].set(
            jnp.asarray(reference_rhs(n))
        )
        x1, i1 = deflated_cg_solve(dia, jnp.asarray(b_pad[:n]), basis,
                                   tol=1e-10)
        x_sh, i_sh = sharded_dia_cg_solve(
            jnp.asarray(diags_sh), dia.offsets, b_pad, tol=1e-10,
            maxiter=n + 1, basis=basis,
        )
        assert int(i_sh.iterations) == int(i1.iterations)
        np.testing.assert_allclose(
            np.asarray(x_sh[:n]), np.asarray(x1), rtol=1e-8, atol=1e-9
        )
