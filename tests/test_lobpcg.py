"""LOBPCG tests (solver/lobpcg.py).

Contracts: eigenvalues match a dense eigh at both spectrum ends; every
framework preconditioner (Jacobi/FSAI/AMG) slashes the iteration count
(that is LOBPCG's whole point); all device layouts give the same pairs
(the block matvec rides the layout multi-RHS kernels); fixed seed ⇒
deterministic; guards reject bad k/which/X0."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import (
    CSRMatrix,
    DIAMatrix,
    fsai_preconditioner,
    jacobi_preconditioner,
    lobpcg_eigs,
    smoothed_aggregation_preconditioner,
)
from conjugategradient_tpu.problems import (
    banded_spd_coo,
    poisson2d_coo,
    random_spd_dense,
)


def _poisson2d(nx):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    return A, shape[0]


@pytest.fixture(scope="module")
def poisson20():
    A, n = _poisson2d(20)
    w = np.linalg.eigvalsh(np.asarray(A.to_dense()))
    return A, n, w


def test_smallest_match_dense(poisson20):
    A, n, w = poisson20
    res = lobpcg_eigs(A, k=4, tol=1e-9, maxiter=400)
    assert np.all(res.converged)
    np.testing.assert_allclose(res.values, w[:4], rtol=1e-8)
    # Ritz residuals really are ||A x - lam x||
    X = np.asarray(res.vectors)
    Ad = np.asarray(A.to_dense())
    rn = np.linalg.norm(Ad @ X - X * res.values[None, :], axis=0)
    np.testing.assert_allclose(res.residuals, rn, rtol=1e-6, atol=1e-12)


def test_largest_match_dense(poisson20):
    A, n, w = poisson20
    res = lobpcg_eigs(A, k=3, which="largest", tol=1e-9, maxiter=400)
    assert np.all(res.converged)
    np.testing.assert_allclose(res.values, w[-3:][::-1], rtol=1e-8)


@pytest.mark.parametrize(
    "make_m",
    [
        # Jacobi needs a VARIABLE diagonal to help (on constant-diagonal
        # Poisson it is a pure scaling — identical trajectory), so every
        # case runs on the diagonally-scaled Laplacian
        lambda A: jacobi_preconditioner(A),
        lambda A: fsai_preconditioner(A, power=2, dtype=np.float64),
        lambda A: smoothed_aggregation_preconditioner(A, dtype=np.float64),
    ],
    ids=["jacobi", "fsai2", "amg"],
)
def test_preconditioner_cuts_iterations(make_m):
    import scipy.sparse as sp

    rows, cols, vals, shape = poisson2d_coo(20)
    L = sp.csr_matrix((vals, (rows, cols)), shape=shape)
    rng = np.random.default_rng(9)
    s = np.exp(rng.uniform(-1.5, 1.5, shape[0]))
    A_sp = (sp.diags(s) @ L @ sp.diags(s)).tocsr()
    A = CSRMatrix.from_arrays(A_sp.data, A_sp.indices, A_sp.indptr,
                              tuple(shape))
    w = np.linalg.eigvalsh(A_sp.toarray())
    plain = lobpcg_eigs(A, k=4, tol=1e-8, maxiter=800)
    pre = lobpcg_eigs(A, k=4, M=make_m(A), tol=1e-8, maxiter=800)
    assert np.all(pre.converged)
    np.testing.assert_allclose(pre.values, w[:4], rtol=1e-6)
    assert pre.iters < plain.iters, (pre.iters, plain.iters)


def test_layouts_agree(poisson20):
    A, n, w = poisson20
    res_csr = lobpcg_eigs(A, k=4, tol=1e-9, maxiter=400, seed=7)
    res_dia = lobpcg_eigs(DIAMatrix.from_csr(A), k=4, tol=1e-9,
                          maxiter=400, seed=7)
    np.testing.assert_allclose(res_dia.values, res_csr.values, rtol=1e-9)
    np.testing.assert_allclose(res_dia.values, w[:4], rtol=1e-8)


def test_deterministic(poisson20):
    A, n, w = poisson20
    a = lobpcg_eigs(A, k=3, tol=1e-8, maxiter=200, seed=5)
    b = lobpcg_eigs(A, k=3, tol=1e-8, maxiter=200, seed=5)
    assert a.iters == b.iters
    np.testing.assert_array_equal(a.values, b.values)
    np.testing.assert_array_equal(np.asarray(a.vectors), np.asarray(b.vectors))


def test_x0_warm_start(poisson20):
    A, n, w = poisson20
    # warm-start with the converged vectors: should finish almost instantly
    ref = lobpcg_eigs(A, k=3, tol=1e-9, maxiter=400)
    warm = lobpcg_eigs(A, k=3, X0=ref.vectors, tol=1e-9, maxiter=400)
    assert warm.iters <= 2, warm.iters
    np.testing.assert_allclose(warm.values, w[:3], rtol=1e-8)


def test_scipy_and_matvec_ingest():
    A = random_spd_dense(40, seed=3)
    w = np.linalg.eigvalsh(A)
    res = lobpcg_eigs(A, k=2, tol=1e-10, maxiter=400)
    np.testing.assert_allclose(res.values, w[:2], rtol=1e-8)
    res_mv = lobpcg_eigs(
        lambda x: jnp.asarray(A) @ x, k=2, n=40, tol=1e-10, maxiter=400,
        dtype=jnp.float64,  # matrix-free callables default to f32
    )
    np.testing.assert_allclose(res_mv.values, w[:2], rtol=1e-8)


def test_banded_multiplicity():
    rows, cols, vals, shape = banded_spd_coo(150, bandwidth=3, seed=1)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    w = np.linalg.eigvalsh(np.asarray(A.to_dense()))
    res = lobpcg_eigs(A, k=5, tol=1e-9, maxiter=600)
    np.testing.assert_allclose(res.values, w[:5], rtol=1e-7)


def test_guards(poisson20):
    A, n, w = poisson20
    with pytest.raises(ValueError, match="which"):
        lobpcg_eigs(A, which="middle")
    with pytest.raises(ValueError, match="k >= 1"):
        lobpcg_eigs(A, k=0)
    with pytest.raises(ValueError, match="3k <= n"):
        lobpcg_eigs(random_spd_dense(8, seed=0), k=3)
    with pytest.raises(ValueError, match="X0 must have shape"):
        lobpcg_eigs(A, k=3, X0=jnp.zeros((n, 2)))
    with pytest.raises(ValueError, match="maxiter"):
        lobpcg_eigs(A, maxiter=0)


def test_generalized_pencil():
    # A x = lam B x — FEM stiffness/mass shape; compare to scipy eigh(a, b)
    import scipy.linalg

    rng = np.random.default_rng(11)
    n = 60
    A = random_spd_dense(n, seed=4)
    C = rng.standard_normal((n, n)) / np.sqrt(n)
    B = C @ C.T + np.eye(n)  # SPD mass
    w_ref = scipy.linalg.eigh(A, B, eigvals_only=True)
    res = lobpcg_eigs(A, k=3, B=B, tol=1e-9, maxiter=500)
    np.testing.assert_allclose(res.values, w_ref[:3], rtol=1e-7)
    # Ritz vectors come out B-orthonormal
    X = np.asarray(res.vectors, np.float64)
    np.testing.assert_allclose(X.T @ B @ X, np.eye(3), atol=1e-6)
    # residuals are the generalized ||A x - lam B x||
    rn = np.linalg.norm(A @ X - (B @ X) * res.values[None, :], axis=0)
    np.testing.assert_allclose(res.residuals, rn, rtol=1e-5, atol=1e-10)


def test_generalized_identity_B_matches_standard(poisson20):
    A, n, w = poisson20
    std = lobpcg_eigs(A, k=3, tol=1e-9, maxiter=400, seed=3)
    gen = lobpcg_eigs(A, k=3, B=jnp.eye(n, dtype=jnp.float64),
                      tol=1e-9, maxiter=400, seed=3)
    np.testing.assert_allclose(gen.values, std.values, rtol=1e-9)


def test_history_and_absolute_tol(poisson20):
    A, n, w = poisson20
    res, lam_h, rn_h = lobpcg_eigs(
        A, k=3, tol=1e-6, tol_absolute=True, maxiter=400,
        return_history=True)
    assert np.all(res.converged)
    assert np.all(res.residuals <= 1e-6)
    assert lam_h.shape == (res.iters + 1, 3)
    assert rn_h.shape == (res.iters + 1, 3)
    # final history rows are the returned values/residuals
    np.testing.assert_allclose(lam_h[-1], res.values, rtol=1e-12)
    np.testing.assert_allclose(rn_h[-1], res.residuals, rtol=1e-6)
    # no NaN fill leaked into the trimmed window
    assert np.all(np.isfinite(lam_h)) and np.all(np.isfinite(rn_h))


class TestScipyDropIn:
    def test_matches_scipy_lobpcg(self):
        import scipy.sparse as sp
        from scipy.sparse.linalg import lobpcg as scipy_lobpcg

        from conjugategradient_tpu.scipy_compat import lobpcg

        rows, cols, vals, shape = poisson2d_coo(16)
        A_sp = sp.csr_matrix((vals, (rows, cols)), shape=shape)
        rng = np.random.default_rng(2)
        X = rng.standard_normal((shape[0], 3))
        w_ref, _ = scipy_lobpcg(A_sp, X.copy(), largest=False,
                                maxiter=300, tol=1e-8)
        w, v = lobpcg(A_sp, X, largest=False, maxiter=300, tol=1e-8)
        np.testing.assert_allclose(np.sort(w), np.sort(w_ref), rtol=1e-6)
        assert v.shape == (shape[0], 3)

    def test_largest_descending_and_default_order(self):
        from conjugategradient_tpu.scipy_compat import lobpcg

        A = np.diag(np.arange(1.0, 61.0))
        rng = np.random.default_rng(0)
        X = rng.standard_normal((60, 3))
        w, v = lobpcg(A, X, maxiter=200, tol=1e-8)  # largest=True default
        np.testing.assert_allclose(w, [60.0, 59.0, 58.0], rtol=1e-7)

    def test_histories_are_lists(self):
        from conjugategradient_tpu.scipy_compat import lobpcg

        A = np.diag(np.arange(1.0, 41.0))
        rng = np.random.default_rng(1)
        X = rng.standard_normal((40, 2))
        out = lobpcg(A, X, largest=False, maxiter=60, tol=1e-8,
                     retLambdaHistory=True, retResidualNormsHistory=True)
        assert len(out) == 4
        w, v, lh, rh = out
        assert isinstance(lh, list) and isinstance(rh, list)
        assert len(lh) == len(rh) and len(lh) >= 2
        assert lh[0].shape == (2,)
        np.testing.assert_allclose(lh[-1], w, rtol=1e-12)

    def test_generalized_and_preconditioned(self):
        import scipy.linalg
        import scipy.sparse as sp

        from conjugategradient_tpu.scipy_compat import lobpcg

        rows, cols, vals, shape = poisson2d_coo(12)
        A_sp = sp.csr_matrix((vals, (rows, cols)), shape=shape)
        n = shape[0]
        B = sp.diags(np.linspace(1.0, 2.0, n)).tocsr()
        w_ref = scipy.linalg.eigh(A_sp.toarray(), B.toarray(),
                                  eigvals_only=True)
        rng = np.random.default_rng(3)
        X = rng.standard_normal((n, 3))
        Minv = sp.diags(1.0 / A_sp.diagonal()).tocsr()
        w, v = lobpcg(A_sp, X, B=B, M=Minv, largest=False,
                      maxiter=400, tol=1e-8)
        np.testing.assert_allclose(w, w_ref[:3], rtol=1e-6)

    def test_Y_rejected(self):
        from conjugategradient_tpu.scipy_compat import lobpcg

        A = np.eye(30)
        X = np.ones((30, 2))
        with pytest.raises(NotImplementedError, match="deflation"):
            lobpcg(A, X, Y=np.ones((30, 1)))


class TestTesterEigsFlag:
    """tester.py --eigs: the eigensolver CLI lane."""

    def _mtx(self):
        import pathlib

        return str(pathlib.Path(__file__).resolve().parent.parent
                   / "problems" / "poisson2d_34.mtx")

    def test_lobpcg_lane_prints_protocol_and_json(self, capsys):
        import json

        import tester

        rc = tester.main([self._mtx(), "--eigs", "4", "--dtype", "float32",
                          "--precond", "jacobi", "--eigs-iters", "80"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        parts = out[-2].split()
        assert len(parts) == 4 and int(parts[0]) == 1156
        rec = json.loads(out[-1])
        assert rec["method"] == "lobpcg" and rec["which"] == "smallest"
        lam = rec["eigenvalues"]
        assert lam == sorted(lam) and len(lam) == 4
        # 2-D Poisson h=1/35: lambda_min = 2*(2 - cos(pi h) - cos(pi h))
        lam_min = 4.0 * (1.0 - np.cos(np.pi / 35.0))
        np.testing.assert_allclose(lam[0], lam_min, rtol=1e-3)

    def test_lanczos_lane_and_rejections(self, capsys):
        import json

        import tester

        rc = tester.main([self._mtx(), "--eigs", "3", "--eigs-method",
                          "lanczos", "--eigs-which", "largest",
                          "--eigs-iters", "60", "--dtype", "float32"])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        lam = rec["eigenvalues"]
        assert lam == sorted(lam, reverse=True)
        assert lam[0] > 7.0  # lambda_max of 2-D Poisson -> 8

        assert tester.main([self._mtx(), "--eigs", "3", "--eigs-method",
                            "lanczos", "--precond", "jacobi"]) == 2
        assert tester.main([self._mtx(), "--eigs", "3", "--nrhs", "2"]) == 2
        assert tester.main([self._mtx(), "--eigs", "3", "--eigs-method",
                            "lanczos", "--history"]) == 2

    def test_history_flag_lobpcg(self, capsys):
        import json

        import tester

        rc = tester.main([self._mtx(), "--eigs", "2", "--dtype", "float32",
                          "--eigs-iters", "15", "--history"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        hist = json.loads(out[-1])
        rec = json.loads(out[-2])
        assert len(hist["eigenvalue_history"]) == rec["iterations"] + 1
        assert len(hist["eigenvalue_history"][0]) == 2
