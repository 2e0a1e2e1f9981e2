"""scipy.sparse.linalg.cg drop-in front-end (scipy_compat.cg)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.problems import poisson2d_coo
from conjugategradient_tpu.scipy_compat import cg

scipy_sparse = pytest.importorskip("scipy.sparse")


def _scipy_problem(nx=12):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = scipy_sparse.csr_matrix((vals, (rows, cols)), shape=shape)
    b = np.arange(1, shape[0] + 1, dtype=np.float64)
    return A, b


def test_matches_scipy_result():
    from scipy.sparse.linalg import cg as scipy_cg

    A, b = _scipy_problem()
    x, info = cg(A, b, rtol=1e-10)
    xs, infos = scipy_cg(A, b, rtol=1e-10)
    assert info == 0 and infos == 0
    np.testing.assert_allclose(np.asarray(x), xs, rtol=1e-7, atol=1e-9)
    # true residual meets scipy's termination contract
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(r) <= 1.01 * 1e-10 * np.linalg.norm(b)


def test_info_positive_on_cap():
    A, b = _scipy_problem()
    x, info = cg(A, b, rtol=1e-12, maxiter=3)
    assert info == 3


def test_atol_only():
    A, b = _scipy_problem(8)
    x, info = cg(A, b, rtol=0.0, atol=1e-8)
    assert info == 0
    assert np.linalg.norm(b - A @ np.asarray(x)) <= 1.1e-8


def test_preconditioner_operator():
    """scipy-style M ~ A^-1 (here: inverse-diagonal as a scipy matrix)."""
    A, b = _scipy_problem()
    M = scipy_sparse.diags(1.0 / A.diagonal())
    x, info = cg(A, b, rtol=1e-10, M=M)
    assert info == 0
    np.testing.assert_allclose(
        A @ np.asarray(x), b, rtol=1e-7, atol=1e-7
    )


def test_callback_sees_every_iterate():
    A, b = _scipy_problem(6)
    seen = []
    x, info = cg(A, b, rtol=1e-10, callback=lambda xk: seen.append(xk.copy()))
    assert info == 0
    assert len(seen) >= 2
    np.testing.assert_allclose(seen[-1], np.asarray(x))
    # iterates improve monotonically in the A-norm (CG property)
    errs = [np.linalg.norm(b - A @ xk) for xk in seen[:-1]]
    assert errs[-1] < errs[0]


def test_x0_warm_start():
    A, b = _scipy_problem()
    x_cold, _ = cg(A, b, rtol=1e-10)
    x, info = cg(A, b, x0=np.asarray(x_cold), rtol=1e-10)
    assert info == 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_cold), rtol=1e-9)


def test_matrix_free_callable_A():
    """scipy accepts LinearOperator A; the shim accepts any JAX-traceable
    callable, with n taken from b."""
    import jax.numpy as jnp

    A, b = _scipy_problem(8)
    Ad = jnp.asarray(A.toarray())
    x, info = cg(lambda v: Ad @ v, b, rtol=1e-10)
    assert info == 0
    np.testing.assert_allclose(A @ np.asarray(x), b, rtol=1e-7, atol=1e-7)


def test_numpy_backed_linear_operator_rejected_clearly():
    """A numpy-backed scipy LinearOperator cannot run inside jit; the shim
    must fail at setup with an actionable message, not a tracer error from
    the compiled loop."""
    from scipy.sparse.linalg import LinearOperator

    A, b = _scipy_problem(8)
    lo = LinearOperator(A.shape, matvec=lambda v: A @ np.asarray(v))
    try:
        cg(lo, b, rtol=1e-8)
        assert False, "expected TypeError"
    except TypeError as e:
        assert "JAX-traceable" in str(e)
    # same contract for M
    M = LinearOperator(A.shape, matvec=lambda v: np.asarray(v) / A.diagonal())
    try:
        cg(A, b, rtol=1e-8, M=M)
        assert False, "expected TypeError"
    except TypeError as e:
        assert "JAX-traceable" in str(e)


class TestMinres:
    """scipy.sparse.linalg.minres drop-in (scipy_compat.minres)."""

    def _indefinite(self, n=40, seed=21):
        rng = np.random.default_rng(seed)
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        eigs = np.concatenate(
            [np.linspace(-2.0, -0.5, n // 2),
             np.linspace(0.5, 2.0, n - n // 2)])
        Ad = Q @ np.diag(eigs) @ Q.T
        b = rng.standard_normal(n)
        return Ad, b

    def test_matches_scipy_minres(self):
        from conjugategradient_tpu.scipy_compat import minres
        from scipy.sparse.linalg import minres as scipy_minres

        Ad, b = self._indefinite()
        x, info = minres(jnp.asarray(Ad), b, rtol=1e-10, maxiter=400)
        xs, infos = scipy_minres(Ad, b, rtol=1e-10)
        assert info == 0 and infos == 0
        np.testing.assert_allclose(np.asarray(x), xs, rtol=1e-6, atol=1e-7)
        r = b - Ad @ np.asarray(x)
        assert np.linalg.norm(r) <= 1.01e-10 * np.linalg.norm(b)

    def test_scipy_sparse_input_and_shift(self):
        from conjugategradient_tpu.scipy_compat import minres

        A, b = _scipy_problem(10)
        sigma = 0.05  # below lambda_min of the Poisson operator: still definite
        x, info = minres(A, b, shift=sigma, rtol=1e-10)
        assert info == 0
        r = b - (A @ np.asarray(x) - sigma * np.asarray(x))
        assert np.linalg.norm(r) <= 1.01e-10 * np.linalg.norm(b)

    def test_callback_sees_every_iterate(self):
        from conjugategradient_tpu.scipy_compat import minres

        Ad, b = self._indefinite(24, seed=22)
        seen = []
        x, info = minres(jnp.asarray(Ad), b, rtol=1e-9, maxiter=200,
                         callback=lambda xk: seen.append(xk.copy()))
        assert info == 0
        assert len(seen) >= 2
        np.testing.assert_array_equal(seen[-1], np.asarray(x))
        # iterates must actually progress
        assert np.linalg.norm(b - Ad @ seen[0]) > np.linalg.norm(
            b - Ad @ seen[-1])

    def test_callback_path_matches_compiled_path(self):
        from conjugategradient_tpu.scipy_compat import minres

        Ad, b = self._indefinite(24, seed=23)
        x_c, info_c = minres(jnp.asarray(Ad), b, rtol=1e-9, maxiter=200)
        x_e, info_e = minres(jnp.asarray(Ad), b, rtol=1e-9, maxiter=200,
                             callback=lambda xk: None)
        assert info_c == info_e == 0
        np.testing.assert_allclose(np.asarray(x_c), np.asarray(x_e),
                                   rtol=1e-12, atol=1e-14)

    def test_info_positive_on_cap(self):
        from conjugategradient_tpu.scipy_compat import minres

        Ad, b = self._indefinite()
        x, info = minres(jnp.asarray(Ad), b, rtol=1e-14, maxiter=3)
        assert info == 3


class TestEigsh:
    """scipy.sparse.linalg.eigsh drop-in (scipy_compat.eigsh)."""

    def _problem(self, nx=12):
        A, _ = _scipy_problem(nx)
        return A

    @pytest.mark.parametrize("which", ["LM", "LA", "SM", "SA"])
    def test_matches_scipy_both_ends(self, which):
        from scipy.sparse.linalg import eigsh as scipy_eigsh

        from conjugategradient_tpu.scipy_compat import eigsh

        A = self._problem()
        w, v = eigsh(A, k=4, which=which)
        w_ref = np.sort(scipy_eigsh(A, k=4, which=which)[0])
        np.testing.assert_allclose(w, w_ref, rtol=1e-8)
        assert list(w) == sorted(w)  # ascending regardless of which
        resid = np.linalg.norm(A @ v - v * w, axis=0)
        assert (resid <= 1e-6 * np.abs(w)).all()

    def test_return_eigenvectors_false_and_v0(self):
        from conjugategradient_tpu.scipy_compat import eigsh

        A = self._problem()
        n = A.shape[0]
        w = eigsh(A, k=3, return_eigenvectors=False,
                  v0=np.ones(n) / np.sqrt(n))
        assert w.shape == (3,) and list(w) == sorted(w)

    def test_generalized_pencil(self):
        import scipy.linalg

        from conjugategradient_tpu.scipy_compat import eigsh

        A = self._problem()
        n = A.shape[0]
        B = scipy_sparse.diags(np.linspace(1.0, 2.0, n)).tocsr()
        # tol must sit above LOBPCG's residual floor for the pencil
        # (~1e-8·λ_max here); tighter tols honestly raise NoConvergence
        w, v = eigsh(A, k=3, which="SM", M=B, tol=1e-6)
        w_ref = scipy.linalg.eigh(A.toarray(), B.toarray(),
                                  eigvals_only=True)[:3]
        np.testing.assert_allclose(w, w_ref, rtol=1e-6)
        # B-orthonormal Ritz vectors
        g = v.T @ (B @ v)
        np.testing.assert_allclose(g, np.eye(3), atol=1e-6)

    def test_subspace_doubles_until_converged(self):
        """A deliberately tiny ncv must still converge (the adaptive
        doubling, ARPACK's implicit-restart analogue)."""
        from conjugategradient_tpu.scipy_compat import eigsh

        A = self._problem(16)
        w, v = eigsh(A, k=2, which="SM", ncv=4, tol=1e-8)
        resid = np.linalg.norm(A @ v - v * w, axis=0)
        assert (resid <= 1e-7 * np.abs(w)).all()

    def test_rejections(self):
        from conjugategradient_tpu.scipy_compat import eigsh

        A = self._problem()
        with pytest.raises(NotImplementedError, match="shift-invert"):
            eigsh(A, k=2, sigma=0.5)
        with pytest.raises(NotImplementedError, match="BE"):
            eigsh(A, k=2, which="BE")
        with pytest.raises(ValueError, match="k="):
            eigsh(A, k=0)

    def test_no_convergence_raises_arpack_exception(self):
        from scipy.sparse.linalg import ArpackNoConvergence

        from conjugategradient_tpu.scipy_compat import eigsh

        A = scipy_sparse.diags(np.linspace(1.0, 1e4, 400)).tocsr()
        B = scipy_sparse.diags(np.linspace(1.0, 2.0, 400)).tocsr()
        with pytest.raises(ArpackNoConvergence):
            eigsh(A, k=3, which="SM", M=B, maxiter=1)
        with pytest.raises(ArpackNoConvergence):
            eigsh(A, k=3, which="SM", maxiter=5, tol=1e-10)

    def test_degenerate_spectrum_returns_k_pairs(self):
        """Identity-like operators break Lanczos down after one step; the
        LOBPCG (or dense) fallback must still deliver k pairs."""
        from conjugategradient_tpu.scipy_compat import eigsh

        w, v = eigsh(scipy_sparse.identity(10, format="csr"), k=3)
        np.testing.assert_allclose(w, 1.0)
        assert v.shape == (10, 3)
        # v0 spanning an invariant subspace must not truncate the return
        w2 = eigsh(scipy_sparse.diags(np.arange(1.0, 11.0)).tocsr(), k=3,
                   which="SM", v0=np.eye(10)[0],
                   return_eigenvectors=False)
        np.testing.assert_allclose(w2, [1.0, 2.0, 3.0], rtol=1e-10)
        # n < 3k: the dense fallback corner
        w3 = eigsh(scipy_sparse.identity(5, format="csr"), k=2,
                   return_eigenvectors=False)
        np.testing.assert_allclose(w3, 1.0)

    def test_multiplicity_resolved_like_arpack(self):
        """Hypothesis-caught: one Lanczos pass finds at most ONE copy of a
        repeated eigenvalue; scipy/ARPACK splits multiplicities, so must
        the drop-in (explicit deflation passes).  Both falsifying
        examples pinned."""
        from conjugategradient_tpu.scipy_compat import eigsh

        # degenerate smallest pair: spectrum {1, 1, 1.264}
        d = np.array([[1.0, 0, 0],
                      [0, 1.132, -0.132],
                      [0, -0.132, 1.132]])
        w = eigsh(scipy_sparse.csr_matrix(d), k=2, which="SM",
                  return_eigenvectors=False, tol=1e-8)
        np.testing.assert_allclose(w, [1.0, 1.0], rtol=1e-10)
        # block-diagonal multiplicity 4 at both ends
        d2 = np.kron(np.eye(4), np.array([[2.0, -1], [-1, 2]]))
        w2, v2 = eigsh(scipy_sparse.csr_matrix(d2), k=3, which="SM")
        np.testing.assert_allclose(w2, 1.0, rtol=1e-9)
        np.testing.assert_allclose(v2.T @ v2, np.eye(3), atol=1e-8)
        w3 = eigsh(scipy_sparse.csr_matrix(d2), k=3, which="LM",
                   return_eigenvectors=False)
        np.testing.assert_allclose(w3, 3.0, rtol=1e-9)

    def test_deflation_shift_does_not_discard_genuine_pairs(self):
        """Hypothesis-caught: the old shifted-copy eigenvalue filter
        threw away genuine eigenvalues above sigma/2 — [2.911, 4.397]
        came back as [1.0, 4.397]."""
        from conjugategradient_tpu.scipy_compat import eigsh

        d = np.array([[2.351, 0.905, 0.446],
                      [0.905, 3.208, -1.303],
                      [0.446, -1.303, 2.749]])
        w = eigsh(scipy_sparse.csr_matrix(d), k=2, which="LM",
                  return_eigenvectors=False, tol=1e-8)
        w_true = np.linalg.eigvalsh(d)[1:]
        np.testing.assert_allclose(w, w_true, rtol=1e-9)


def test_gmres_restart_zero_rejected():
    """ADVICE r4: restart=0 used to surface as ZeroDivisionError from the
    default-cycle-count computation — now a clear ValueError."""
    import scipy.sparse as sp

    from conjugategradient_tpu.scipy_compat import gmres

    A = sp.eye(8, format="csr") * 2.0
    b = np.ones(8)
    with pytest.raises(ValueError, match="restart"):
        gmres(A, b, restart=0)
    with pytest.raises(ValueError, match="restart"):
        gmres(A, b, restart=-3)
