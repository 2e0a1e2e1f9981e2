"""Row-sharded LOBPCG tests (parallel/sharded_lobpcg.py) on 8 virtual CPU
devices.

Contracts: eigenvalues match a dense eigh at both spectrum ends; values
agree with the single-device lobpcg_eigs to f64 roundoff (association
order differs — psum'd Gram partials — so iteration counts are NOT
pinned, per the round-4 storage-parity lesson); padded rows stay exactly
zero and contribute no spurious zero eigenvalues; the sharded
preconditioner hooks (bare callable + ShardedPreconditioner/AMG) cut
iterations; guards reject bad k/which/X0."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, lobpcg_eigs
from conjugategradient_tpu.parallel import (
    partition_csr_rows,
    sharded_lobpcg_eigs,
)
from conjugategradient_tpu.problems import poisson2d_coo

N_DEV = 8


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


def _setup(nx=20, bm=8, bn=8, dtype=np.float64):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=dtype)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=bm, bn=bn,
    )
    return A, jnp.asarray(blocks), jnp.asarray(bcols), shape[0], n_pad


@pytest.fixture(scope="module")
def poisson20():
    A, blocks, bcols, n, n_pad = _setup(20)
    w = np.linalg.eigvalsh(np.asarray(A.to_dense()))
    return A, blocks, bcols, n, n_pad, w


def test_smallest_match_dense(poisson20):
    A, blocks, bcols, n, n_pad, w = poisson20
    # n=400 < n_pad: the mask must keep the zero-padded rows out of the
    # spectrum, or "smallest" would return spurious zeros
    assert n_pad > n
    res = sharded_lobpcg_eigs(blocks, bcols, k=4, n=n, tol=1e-9,
                              maxiter=400)
    assert np.all(res.converged)
    np.testing.assert_allclose(res.values, w[:4], rtol=1e-8)
    X = np.asarray(res.vectors)
    assert X.shape == (n_pad, 4)
    np.testing.assert_array_equal(X[n:], 0.0)
    # residuals really are ||A x - lam x|| over the true rows
    Ad = np.asarray(A.to_dense())
    rn = np.linalg.norm(Ad @ X[:n] - X[:n] * res.values[None, :], axis=0)
    np.testing.assert_allclose(res.residuals, rn, rtol=1e-6, atol=1e-12)


def test_largest_match_dense(poisson20):
    A, blocks, bcols, n, n_pad, w = poisson20
    res = sharded_lobpcg_eigs(blocks, bcols, k=3, n=n, which="largest",
                              tol=1e-9, maxiter=400)
    assert np.all(res.converged)
    np.testing.assert_allclose(res.values, w[-3:][::-1], rtol=1e-8)


def test_matches_single_device(poisson20):
    A, blocks, bcols, n, n_pad, w = poisson20
    single = lobpcg_eigs(A, k=4, tol=1e-9, maxiter=400, seed=7)
    # same X0 through both paths: pad the single-device block
    rng = np.random.default_rng(7)
    X0 = rng.standard_normal((n, 4))
    X0_pad = np.zeros((n_pad, 4))
    X0_pad[:n] = X0
    single = lobpcg_eigs(A, k=4, X0=jnp.asarray(X0), tol=1e-9, maxiter=400)
    sh = sharded_lobpcg_eigs(blocks, bcols, k=4, n=n,
                             X0=jnp.asarray(X0_pad), tol=1e-9, maxiter=400)
    np.testing.assert_allclose(sh.values, single.values, rtol=1e-9)
    np.testing.assert_allclose(sh.values, w[:4], rtol=1e-8)


def test_preconditioner_callable_cuts_iterations():
    import scipy.sparse as sp

    rows, cols, vals, shape = poisson2d_coo(20)
    L = sp.csr_matrix((vals, (rows, cols)), shape=shape)
    rng = np.random.default_rng(9)
    s = np.exp(rng.uniform(-1.5, 1.5, shape[0]))
    A_sp = (sp.diags(s) @ L @ sp.diags(s)).tocsr()
    blocks, bcols, n_pad = partition_csr_rows(
        A_sp.data, A_sp.indices, A_sp.indptr, shape, N_DEV, bm=8, bn=8)
    blocks, bcols = jnp.asarray(blocks), jnp.asarray(bcols)
    n = shape[0]
    w = np.linalg.eigvalsh(A_sp.toarray())

    inv_diag = np.ones(n_pad)
    inv_diag[:n] = 1.0 / A_sp.diagonal()
    inv_local = jnp.asarray(inv_diag.reshape(N_DEV, -1))

    plain = sharded_lobpcg_eigs(blocks, bcols, k=4, n=n, tol=1e-8,
                                maxiter=800)

    def m_local(r_local):  # per-shard Jacobi via replicated-closure slice
        i = jax.lax.axis_index("rows")
        return inv_local[i] * r_local

    pre = sharded_lobpcg_eigs(blocks, bcols, k=4, n=n, M_local=m_local,
                              tol=1e-8, maxiter=800)
    assert np.all(pre.converged)
    np.testing.assert_allclose(pre.values, w[:4], rtol=1e-6)
    assert pre.iters < plain.iters, (pre.iters, plain.iters)


def test_sharded_amg_preconditioner_hook(poisson20):
    A, blocks, bcols, n, n_pad, w = poisson20
    from conjugategradient_tpu.parallel import sharded_amg_preconditioner

    M = sharded_amg_preconditioner(A, N_DEV, n_pad, dtype=np.float64)
    plain = sharded_lobpcg_eigs(blocks, bcols, k=3, n=n, tol=1e-8,
                                maxiter=600, seed=2)
    pre = sharded_lobpcg_eigs(blocks, bcols, k=3, n=n, M_local=M,
                              tol=1e-8, maxiter=600, seed=2)
    assert np.all(pre.converged)
    np.testing.assert_allclose(pre.values, w[:3], rtol=1e-7)
    assert pre.iters < plain.iters, (pre.iters, plain.iters)


def test_deterministic(poisson20):
    A, blocks, bcols, n, n_pad, w = poisson20
    a = sharded_lobpcg_eigs(blocks, bcols, k=3, n=n, tol=1e-8,
                            maxiter=200, seed=5)
    b = sharded_lobpcg_eigs(blocks, bcols, k=3, n=n, tol=1e-8,
                            maxiter=200, seed=5)
    assert a.iters == b.iters
    np.testing.assert_array_equal(a.values, b.values)
    np.testing.assert_array_equal(np.asarray(a.vectors),
                                  np.asarray(b.vectors))


def test_guards(poisson20):
    A, blocks, bcols, n, n_pad, w = poisson20
    with pytest.raises(ValueError, match="which"):
        sharded_lobpcg_eigs(blocks, bcols, k=2, n=n, which="middle")
    with pytest.raises(ValueError, match="k >= 1"):
        sharded_lobpcg_eigs(blocks, bcols, k=0, n=n)
    with pytest.raises(ValueError, match="3k <= n"):
        sharded_lobpcg_eigs(blocks, bcols, k=2, n=5)
    with pytest.raises(ValueError, match="X0 must have shape"):
        sharded_lobpcg_eigs(blocks, bcols, k=2, n=n,
                            X0=jnp.zeros((n_pad, 3)))
    with pytest.raises(ValueError, match="maxiter"):
        sharded_lobpcg_eigs(blocks, bcols, k=2, n=n, maxiter=0)
