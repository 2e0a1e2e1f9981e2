"""Differentiable solves (solver/autodiff.implicit_cg_solve).

The implicit-function-theorem VJP must reproduce the analytic gradients of
x(A, b) = A⁻¹b: ∂L/∂b = A⁻¹ḡ and ∂L/∂A = -w xᵀ mapped onto each layout's
stored parameterization.  All checks run in float64 on CPU with tight
tolerances so the "exact at the solution" caveat is immaterial."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import (
    BlockedEllMatrix,
    CSRMatrix,
    DIAMatrix,
    SymBellMatrix,
    implicit_cg_solve,
    jacobi_preconditioner,
)
from conjugategradient_tpu.problems import poisson2d_coo


def _small_spd(rng, n=40):
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    A[np.abs(A) < 0.8 * np.abs(A).max() * 0] = 0  # keep dense-ish
    return A


def _csr(A):
    rows, cols = np.nonzero(A)
    return CSRMatrix.from_coo(rows, cols, A[rows, cols], A.shape)


def _loss(op, b, **kw):
    x, _ = implicit_cg_solve(op, b, tol=0.0, **kw)
    return jnp.sum(x**3)  # nonlinear so ḡ depends on x


class TestGradB:
    def test_matches_dense_analytic(self, rng):
        A = _small_spd(rng)
        op = _csr(A)
        b = jnp.asarray(rng.standard_normal(A.shape[0]))
        gb = jax.grad(_loss, argnums=1)(op, b)
        x = np.linalg.solve(A, np.asarray(b))
        gb_ref = np.linalg.solve(A, 3 * x**2)  # A⁻ᵀ ∂L/∂x, A symmetric
        np.testing.assert_allclose(np.asarray(gb), gb_ref, rtol=1e-9)

    def test_preconditioner_does_not_change_gradient(self, rng):
        A = _small_spd(rng)
        op = _csr(A)
        b = jnp.asarray(rng.standard_normal(A.shape[0]))
        gb_plain = jax.grad(_loss, argnums=1)(op, b)
        M = jacobi_preconditioner(op)
        gb_pcg = jax.grad(_loss, argnums=1)(op, b, M=M)
        np.testing.assert_allclose(
            np.asarray(gb_pcg), np.asarray(gb_plain), rtol=1e-8
        )

    def test_jit_grad_composes(self, rng):
        A = _small_spd(rng)
        op = _csr(A)
        b = jnp.asarray(rng.standard_normal(A.shape[0]))
        g_eager = jax.grad(_loss, argnums=1)(op, b)
        g_jit = jax.jit(jax.grad(_loss, argnums=1))(op, b)
        np.testing.assert_allclose(np.asarray(g_jit), np.asarray(g_eager),
                                   rtol=1e-12)

    def test_x0_gradient_is_zero(self, rng):
        A = _small_spd(rng)
        op = _csr(A)
        b = jnp.asarray(rng.standard_normal(A.shape[0]))
        x0 = jnp.asarray(rng.standard_normal(A.shape[0]))

        def loss(x0):
            x, _ = implicit_cg_solve(op, b, x0, tol=0.0)
            return jnp.sum(x**2)

        g = jax.grad(loss)(x0)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestGradA:
    def test_csr_per_nonzero_gradient(self, rng):
        """∂L/∂a_k = -w[row_k]·x[col_k] for every stored nonzero."""
        rows, cols, vals, shape = poisson2d_coo(8)
        op = CSRMatrix.from_coo(rows, cols, vals, shape)
        A = np.asarray(op.to_dense())
        b = jnp.asarray(rng.standard_normal(shape[0]))
        g_op = jax.grad(_loss, argnums=0, allow_int=True)(op, b)
        x = np.linalg.solve(A, np.asarray(b))
        w = np.linalg.solve(A, 3 * x**2)
        g_ref = -w[np.asarray(op.row_ids)] * x[np.asarray(op.indices)]
        np.testing.assert_allclose(np.asarray(g_op.data), g_ref, rtol=1e-8)
        # structure leaves carry no (float) gradient
        assert g_op.shape == op.shape

    def test_finite_difference_csr(self, rng):
        rows, cols, vals, shape = poisson2d_coo(5)
        op = CSRMatrix.from_coo(rows, cols, vals, shape)
        b = jnp.asarray(rng.standard_normal(shape[0]))
        g_op = jax.grad(_loss, argnums=0, allow_int=True)(op, b)
        eps = 1e-6
        for k in (0, 7, 31):
            dv = np.zeros(op.nnz)
            dv[k] = eps
            import dataclasses

            op_p = dataclasses.replace(op, data=op.data + jnp.asarray(dv))
            op_m = dataclasses.replace(op, data=op.data - jnp.asarray(dv))
            fd = (float(_loss(op_p, b)) - float(_loss(op_m, b))) / (2 * eps)
            np.testing.assert_allclose(float(g_op.data[k]), fd, rtol=1e-4)

    def test_symbell_mirrored_gradient(self, rng):
        """Each stored upper entry receives BOTH mirrored contributions:
        ∂L/∂B[i,j] at tile (r,c) = -(w_r[i]·x_c[j] + w_c[j]·x_r[i])."""
        n, bm = 32, 8
        A = np.zeros((n, n))
        rng_l = np.random.default_rng(7)
        for i in range(4):
            D = rng_l.standard_normal((bm, bm))
            A[i * bm:(i + 1) * bm, i * bm:(i + 1) * bm] = (
                D + D.T + 30 * np.eye(bm)
            )
        B = rng_l.standard_normal((bm, bm))
        A[0:bm, bm:2 * bm] = B
        A[bm:2 * bm, 0:bm] = B.T
        sym = SymBellMatrix.from_bell(
            BlockedEllMatrix.from_csr(_csr(A), bm=bm, bn=bm)
        )
        b = jnp.asarray(rng.standard_normal(n))
        g_op = jax.grad(_loss, argnums=0, allow_int=True)(sym, b)
        x = np.linalg.solve(A, np.asarray(b))
        w = np.linalg.solve(A, 3 * x**2)
        dense = -np.outer(w, x)
        # the (0,1) upper tile's gradient = its own dense block + the
        # transpose of the mirrored (1,0) block
        g_expected = dense[0:bm, bm:2 * bm] + dense[bm:2 * bm, 0:bm].T
        # find the slot holding block-col 1 in row 0
        cols0 = np.asarray(sym.off_cols[0])
        (slot,) = np.nonzero(cols0 == 1)
        got = np.asarray(g_op.off_blocks[0, slot[0]])
        np.testing.assert_allclose(got, g_expected, rtol=1e-8)

    def test_dia_gradient_finite_difference(self, rng):
        rows, cols, vals, shape = poisson2d_coo(5)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape)
        op = DIAMatrix.from_csr(csr)
        b = jnp.asarray(rng.standard_normal(shape[0]))
        g_op = jax.grad(_loss, argnums=0, allow_int=True)(op, b)
        eps = 1e-6
        d, i = 0, 9
        import dataclasses

        dv = np.zeros(np.asarray(op.diags).shape)
        dv[d, i] = eps
        op_p = dataclasses.replace(op, diags=op.diags + jnp.asarray(dv))
        op_m = dataclasses.replace(op, diags=op.diags - jnp.asarray(dv))
        fd = (float(_loss(op_p, b)) - float(_loss(op_m, b))) / (2 * eps)
        np.testing.assert_allclose(float(g_op.diags[d, i]), fd, rtol=1e-4)


class TestForwardValues:
    def test_forward_matches_cg_solve(self, rng):
        from conjugategradient_tpu import cg_solve

        rows, cols, vals, shape = poisson2d_coo(8)
        op = CSRMatrix.from_coo(rows, cols, vals, shape)
        b = jnp.asarray(rng.standard_normal(shape[0]))
        x1, i1 = implicit_cg_solve(op, b, tol=1e-12)
        x2, i2 = cg_solve(op, b, tol=1e-12)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        assert int(i1.iterations) == int(i2.iterations)


class TestImplicitGmres:
    """implicit_gmres_solve — the NONSYMMETRIC implicit rule (adjoint
    system is Aᵀ w = ḡ via jax.linear_transpose, solver/autodiff.py)."""

    def _convdiff(self):
        import scipy.sparse as sp
        from conjugategradient_tpu.problems import convection_diffusion_2d_coo

        rows, cols, vals, shape = convection_diffusion_2d_coo(8, peclet=15.0)
        return sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()

    def test_matches_dense_analytic_adjoint(self, rng):
        from conjugategradient_tpu import implicit_gmres_solve

        A_sp = self._convdiff()
        n = A_sp.shape[0]
        op = CSRMatrix.from_scipy(A_sp)
        b = jnp.asarray(rng.standard_normal(n))

        def loss(op_, b_):
            x, _ = implicit_gmres_solve(op_, b_, tol=1e-12, maxiter=4 * n)
            return jnp.sum(x ** 3)

        g_op, g_b = jax.grad(loss, argnums=(0, 1), allow_int=True)(op, b)
        Ad = A_sp.toarray()
        x = np.linalg.solve(Ad, np.asarray(b))
        # the TRANSPOSED system — implicit CG's symmetric shortcut would
        # solve A w = ḡ instead and be wrong here
        w = np.linalg.solve(Ad.T, 3 * x ** 2)
        np.testing.assert_allclose(np.asarray(g_b), w, atol=1e-12)
        gA_ref = -(w[:, None] * x[None, :])
        data_ref = np.array(
            [gA_ref[i, j] for i, j in zip(*A_sp.nonzero())])
        np.testing.assert_allclose(np.asarray(g_op.data), data_ref,
                                   atol=1e-12)

    def test_symmetric_shortcut_would_be_wrong(self, rng):
        """On a genuinely nonsymmetric A, A⁻ᵀḡ ≠ A⁻¹ḡ — pin that the
        gmres rule picks the transpose (guards against a future
        'reuse the forward operator' simplification)."""
        A_sp = self._convdiff()
        n = A_sp.shape[0]
        b = np.asarray(rng.standard_normal(n))
        Ad = A_sp.toarray()
        x = np.linalg.solve(Ad, b)
        g = 3 * x ** 2
        w_t = np.linalg.solve(Ad.T, g)
        w_s = np.linalg.solve(Ad, g)
        assert np.abs(w_t - w_s).max() > 1e-3 * np.abs(w_t).max()

    def test_dense_operator_gradient(self, rng):
        """Gradients flow to a dense-array operator's values (array leaves
        of the operator pytree; bare callables closing over traced arrays
        are NOT differentiable — their closure is static aux data, same
        contract as implicit_cg_solve)."""
        from conjugategradient_tpu import implicit_gmres_solve

        A_sp = self._convdiff()
        n = A_sp.shape[0]
        dense = jnp.asarray(A_sp.toarray())
        b = jnp.asarray(rng.standard_normal(n))

        def loss(dense_, b_):
            x, _ = implicit_gmres_solve(
                dense_, b_, tol=1e-12, maxiter=4 * n)
            return jnp.sum(x ** 2)

        g_dense, g_b = jax.grad(loss, argnums=(0, 1))(dense, b)
        Ad = np.asarray(dense)
        x = np.linalg.solve(Ad, np.asarray(b))
        w = np.linalg.solve(Ad.T, 2 * x)
        np.testing.assert_allclose(np.asarray(g_b), w, atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(g_dense), -(w[:, None] * x[None, :]), atol=1e-11)

    def test_forward_matches_gmres_solve(self, rng):
        from conjugategradient_tpu import gmres_solve, implicit_gmres_solve

        A_sp = self._convdiff()
        op = CSRMatrix.from_scipy(A_sp)
        b = jnp.asarray(rng.standard_normal(A_sp.shape[0]))
        x1, i1 = implicit_gmres_solve(op, b, tol=1e-10, restart=20)
        x2, i2 = gmres_solve(op, b, tol=1e-10, restart=20)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        assert int(i1.iterations) == int(i2.iterations)


class TestAdjointPreconditioner:
    """ADVICE r4: the adjoint GMRES solve preconditions with Mᵀ when M is
    linear (a good M ≈ A⁻¹ gives Mᵀ ≈ A⁻ᵀ for the transposed system)."""

    def _convdiff(self):
        import scipy.sparse as sp

        from conjugategradient_tpu.problems import convection_diffusion_2d_coo

        rows, cols, vals, shape = convection_diffusion_2d_coo(8, peclet=15.0)
        return sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()

    def test_linear_m_gradient_unchanged(self, rng):
        """The converged gradient is M-independent whether or not M is
        transposed — but a NON-symmetric linear M must not change it."""
        from conjugategradient_tpu import implicit_gmres_solve

        A_sp = self._convdiff()
        n = A_sp.shape[0]
        op = CSRMatrix.from_scipy(A_sp)
        b = jnp.asarray(rng.standard_normal(n))
        # a deliberately NON-symmetric linear M: circular-shifted scaling
        d = jnp.asarray(1.0 / A_sp.diagonal())

        def m_shift(v):
            return d * (0.8 * v + 0.2 * jnp.roll(v, 1))

        def loss(b_, M=None):
            x, _ = implicit_gmres_solve(op, b_, tol=1e-12, maxiter=4 * n,
                                        M=M)
            return jnp.sum(x ** 3)

        g_plain = jax.grad(loss)(b)
        g_m = jax.grad(lambda b_: loss(b_, M=m_shift))(b)
        np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_plain),
                                   atol=1e-10)

    def test_nonlinear_m_falls_back(self, rng):
        """A structurally nonlinear M cannot be linear-transposed; the rule
        must fall back to untransposed M and still produce the converged
        (M-independent) gradient rather than raise."""
        from conjugategradient_tpu import implicit_gmres_solve

        A_sp = self._convdiff()
        n = A_sp.shape[0]
        op = CSRMatrix.from_scipy(A_sp)
        b = jnp.asarray(rng.standard_normal(n))

        def m_nl(v):
            return v / (1.0 + 0.1 * jnp.abs(v))

        def loss(b_, M=None):
            # flexible right-preconditioning is what a nonlinear M needs
            # in the forward solve; the adjoint uses plain gmres with the
            # fallback M
            x, _ = implicit_gmres_solve(op, b_, tol=1e-12, maxiter=4 * n,
                                        M=M)
            return jnp.sum(x ** 3)

        g_plain = jax.grad(loss)(b)
        g_m = jax.grad(lambda b_: loss(b_, M=m_nl))(b)
        np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_plain),
                                   atol=1e-10)
