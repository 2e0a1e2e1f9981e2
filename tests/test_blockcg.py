"""Block CG (solver/blockcg.py): shared-Krylov multi-RHS solves.

Beyond-reference capability (the reference solves one RHS per solve(),
CG.hpp:255): these tests pin the properties that make block CG worth having
— per-lane convergence, strictly fewer iterations than the lockstep loop,
exact R=1 degeneration to the solo solver, breakdown-free rank-deficient
lanes, preconditioning, and parity with an independent NumPy float64
replica of the O'Leary recurrences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import block_cg_solve, cg_solve, cg_solve_batched
from conjugategradient_tpu.problems import poisson2d_coo
from conjugategradient_tpu.solver import jacobi_preconditioner
from conjugategradient_tpu.types import CSRMatrix

TOL = 1e-8


@pytest.fixture(scope="module")
def system():
    r, c, v, shape = poisson2d_coo(30)
    A = CSRMatrix.from_coo(r, c, v, shape)
    rng = np.random.default_rng(7)
    B = jnp.asarray(rng.standard_normal((4, shape[0])))
    return A, B


def _true_residuals(A, B, X):
    return np.linalg.norm(
        np.asarray(B) - np.asarray(jax.vmap(A.matvec)(X)), axis=1
    )


class TestBlockCG:
    def test_all_lanes_converge(self, system):
        A, B = system
        X, info = block_cg_solve(A, B, tol=TOL)
        assert bool(np.all(np.asarray(info.converged)))
        # pre-update termination is one iteration late (SURVEY §2.3(5)), so
        # the true residual lands well under the threshold
        assert np.all(_true_residuals(A, B, X) < 10 * TOL)

    def test_fewer_iterations_than_lockstep(self, system):
        A, B = system
        _, ib = block_cg_solve(A, B, tol=TOL)
        _, il = cg_solve_batched(A, B, tol=TOL)
        kb = np.asarray(ib.iterations)
        kl = np.asarray(il.iterations)
        # every lane benefits from the shared space; at R=4 on this problem
        # the reduction is large (measured ~105 -> ~73)
        assert np.all(kb < kl)
        assert kb.max() < 0.85 * kl.max()

    def test_r1_degenerates_to_solo_cg(self, system):
        A, B = system
        X1, i1 = block_cg_solve(A, B[:1], tol=TOL)
        xs, is_ = cg_solve(A, B[0], tol=TOL)
        assert int(np.asarray(i1.iterations)[0]) == int(is_.iterations)
        np.testing.assert_allclose(
            np.asarray(X1[0]), np.asarray(xs), rtol=0, atol=1e-12
        )
        # residual histories match iteration-for-iteration
        h1 = np.asarray(i1.rho_history)[0]
        hs = np.asarray(is_.rho_history)
        k = int(is_.iterations)
        np.testing.assert_allclose(h1[: k + 1], hs[: k + 1], rtol=1e-8)

    def test_rank_deficient_lanes(self, system):
        A, B = system
        Bdup = jnp.stack([B[0], B[0], B[1]])
        X, info = block_cg_solve(A, Bdup, tol=TOL)
        assert bool(np.all(np.asarray(info.converged)))
        assert np.all(_true_residuals(A, Bdup, X) < 10 * TOL)
        # duplicate lanes see the same Krylov space -> identical solutions
        np.testing.assert_allclose(
            np.asarray(X[0]), np.asarray(X[1]), rtol=0, atol=1e-10
        )

    def test_jacobi_preconditioned(self, system):
        A, B = system
        M = jacobi_preconditioner(A)
        X, info = block_cg_solve(A, B, tol=TOL, M=M)
        assert bool(np.all(np.asarray(info.converged)))
        assert np.all(_true_residuals(A, B, X) < 10 * TOL)

    def test_per_lane_tol(self, system):
        A, B = system
        tols = jnp.asarray([TOL, 1e-2, TOL, 1e-2])
        _, info = block_cg_solve(A, B, tol=tols)
        k = np.asarray(info.iterations)
        assert bool(np.all(np.asarray(info.converged)))
        # loose lanes freeze their counters earlier than tight lanes
        assert k[1] < k[0] and k[3] < k[2]

    def test_maxiter_cap_reports_unconverged(self, system):
        A, B = system
        _, info = block_cg_solve(A, B, tol=1e-14, maxiter=5)
        assert np.all(np.asarray(info.iterations) == 5)
        assert not np.any(np.asarray(info.converged))

    def test_callable_operator(self, system):
        A, B = system
        X_csr, _ = block_cg_solve(A, B, tol=TOL)
        X_mf, info = block_cg_solve(A.matvec, B, tol=TOL, n=A.shape[0])
        assert bool(np.all(np.asarray(info.converged)))
        np.testing.assert_allclose(
            np.asarray(X_mf), np.asarray(X_csr), rtol=0, atol=1e-9
        )

    def test_layout_fast_paths_agree(self, system):
        """SELL/blocked-ELL operators ride the lockstep multi-RHS SpMV;
        solutions must agree with the CSR path."""
        from conjugategradient_tpu.types import BlockedEllMatrix, SellMatrix

        A, B = system
        X_csr, i_csr = block_cg_solve(A, B, tol=TOL)
        for layout, Al in (
            ("sell", SellMatrix.from_csr(A)),
            ("bell", BlockedEllMatrix.from_csr(A, bm=8, bn=8)),
        ):
            Xl, il = block_cg_solve(Al, B, tol=TOL)
            assert bool(np.all(np.asarray(il.converged))), layout
            np.testing.assert_allclose(
                np.asarray(Xl), np.asarray(X_csr), rtol=0, atol=1e-8,
                err_msg=layout,
            )

    def test_f32_default_rcond_converges(self):
        """The dtype-adaptive rcond default (1e-4 in f32): cutoffs at the f32
        Gram noise level (1e-10) made this exact configuration diverge to
        ~1e12 residuals before the adaptive default."""
        r, c, v, shape = poisson2d_coo(34)
        A = CSRMatrix.from_coo(
            np.asarray(r), np.asarray(c), np.asarray(v, np.float32), shape
        )
        n = shape[0]
        b = jnp.arange(1, n + 1, dtype=jnp.float32)
        B = jnp.stack([jnp.roll(b, j) for j in range(4)])
        tol = 1e-6 * float(jnp.linalg.norm(b))
        X, info = block_cg_solve(A, B, tol=tol, maxiter=2000)
        assert bool(np.all(np.asarray(info.converged)))
        # f32 attainable-accuracy floor eps*kappa*||b|| ~ 1.3 for this
        # system; scalar f32 CG lands at 0.92 on the same problem
        assert _true_residuals(A, B, X).max() < 2.0

    def test_f32_restart_tightens_true_residual(self):
        """recompute_r_every pins the drifting f32 recurrence back to
        b - A x (measured: 1.2 -> 0.48 at rre=50 on this problem)."""
        r, c, v, shape = poisson2d_coo(34)
        A = CSRMatrix.from_coo(
            np.asarray(r), np.asarray(c), np.asarray(v, np.float32), shape
        )
        n = shape[0]
        b = jnp.arange(1, n + 1, dtype=jnp.float32)
        B = jnp.stack([jnp.roll(b, j) for j in range(4)])
        tol = 1e-6 * float(jnp.linalg.norm(b))
        X0_, _ = block_cg_solve(A, B, tol=tol, maxiter=2000)
        Xr, ir = block_cg_solve(A, B, tol=tol, maxiter=2000,
                                recompute_r_every=50)
        assert bool(np.all(np.asarray(ir.converged)))
        assert (_true_residuals(A, B, Xr).max()
                < 0.75 * _true_residuals(A, B, X0_).max())

    def test_numpy_oracle_parity(self, system):
        """Iteration-for-iteration parity with an independent NumPy float64
        replica of the recurrences (the same oracle discipline the scalar
        solver gets in tests/test_oracle_parity.py)."""
        A, B = system
        rcond = 1e-10
        X, info = block_cg_solve(A, B, tol=TOL, rcond=rcond)

        import scipy.sparse as sp

        An = sp.csr_matrix(
            (np.asarray(A.data), np.asarray(A.indices),
             np.asarray(A.indptr)), shape=A.shape,
        )
        Bt = np.asarray(B, dtype=np.float64).T
        n, R = Bt.shape

        def pinv_apply(W, Y):
            W = 0.5 * (W + W.T)
            w, V = np.linalg.eigh(W)
            keep = w > rcond * max(np.abs(w).max(), np.finfo(np.float64).tiny)
            inv = np.where(keep, 1.0 / np.where(keep, w, 1.0), 0.0)
            return V @ (inv[:, None] * (V.T @ Y))

        Xo = np.zeros_like(Bt)
        Rv = Bt.copy()
        P = Rv.copy()
        rho = Rv.T @ Rv
        hist = [np.sum(Rv * Rv, axis=0)]
        done = np.zeros(R, bool)
        iters = np.zeros(R, int)
        for _ in range(n + 1):
            if done.all():
                break
            rnorm = np.sum(Rv * Rv, axis=0)
            done_new = np.sqrt(rnorm) <= TOL
            Q = An @ P
            alpha = pinv_apply(P.T @ Q, rho)
            Xo += P @ alpha
            Rv = Rv - Q @ alpha
            rho_next = Rv.T @ Rv
            beta = pinv_apply(rho, rho_next)
            P = Rv + P @ beta
            rho = rho_next
            active = ~done
            iters += active
            hist.append(np.sum(Rv * Rv, axis=0))
            done = np.where(active, done_new, done)

        np.testing.assert_array_equal(np.asarray(info.iterations), iters)
        got = np.asarray(info.rho_history)  # (R, maxiter+1)
        want = np.stack(hist).T  # (R, steps+1)
        for j in range(R):
            # a lane's hist is only written while its counter advances
            kj = iters[j]
            np.testing.assert_allclose(
                got[j][: kj + 1], want[j][: kj + 1], rtol=1e-6,
                err_msg=f"lane {j}",
            )
