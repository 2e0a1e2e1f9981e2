"""SellMatrix (degree-bucketed ELL) — the scattered-matrix fast layout.

Why it exists: on TPU, random access costs ~7-8 ns/element (scalar floor)
and the CSR path pays it twice per nonzero (gather + scalar segment-sum,
measured 15.8 ns/nnz at n=1.5M); SELL pays it once (8.0 ns/nnz) — a 2x
measured win on the power-law north-star problem (docs/performance.md).
These tests pin the layout's numerics: construction round-trip, matvec
parity with CSR on every generator family, the diagonal split, padding
bounds from the geometric ladder, jit/pytree transparency, and an
end-to-end CG solve with oracle-parity iteration counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, SellMatrix, cg_solve, jacobi_preconditioner
from conjugategradient_tpu.ops import sell_spmv
from conjugategradient_tpu.problems import (
    banded_spd_coo,
    poisson2d_coo,
    powerlaw_spd_coo,
    reference_rhs,
)
from conjugategradient_tpu.types import _sell_ladder


@pytest.fixture(scope="module")
def scattered():
    rows, cols, vals, shape = powerlaw_spd_coo(1138, seed=0)
    return CSRMatrix.from_coo(rows, cols, vals, shape)


@pytest.mark.parametrize(
    "gen,args",
    [
        (powerlaw_spd_coo, (997,)),
        (banded_spd_coo, (1000, 6)),
        (poisson2d_coo, (17,)),
    ],
)
def test_matvec_parity_with_csr(gen, args):
    rows, cols, vals, shape = gen(*args)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape)
    sell = SellMatrix.from_csr(csr)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(shape[0]))
    np.testing.assert_allclose(
        np.asarray(sell.matvec(x)), np.asarray(csr.matvec(x)), rtol=1e-12, atol=1e-12
    )


def test_to_dense_roundtrip(scattered):
    np.testing.assert_array_equal(
        np.asarray(SellMatrix.from_csr(scattered).to_dense()),
        np.asarray(scattered.to_dense()),
    )


def test_diagonal_is_free_and_exact(scattered):
    sell = SellMatrix.from_csr(scattered)
    np.testing.assert_array_equal(
        np.asarray(sell.diagonal()), np.asarray(scattered.diagonal())
    )
    # the split diagonal feeds Jacobi directly — no gather in the setup
    M = jacobi_preconditioner(sell)
    r = jnp.ones(scattered.shape[0])
    np.testing.assert_allclose(
        np.asarray(M(r)), 1.0 / np.asarray(scattered.diagonal()), rtol=1e-12
    )


def test_ladder_bounds_padding():
    # every rung is <= 1.5x the previous, so per-row padding <= 1.5
    for maxd in (1, 2, 3, 7, 100, 5000):
        ks = _sell_ladder(maxd)
        assert ks[0] == 1 and ks[-1] == maxd
        for a, b in zip(ks, ks[1:]):
            assert b <= -(-3 * a // 2)  # next rung within ceil(1.5x)


def test_padding_ratio_small(scattered):
    sell = SellMatrix.from_csr(scattered)
    assert sell.padding_ratio() <= 1.6
    assert sell.memory_footprint() > 0


def test_pure_diagonal_matrix():
    csr = CSRMatrix.from_coo(
        np.arange(10), np.arange(10), 2.0 * np.ones(10), (10, 10)
    )
    sell = SellMatrix.from_csr(csr)
    assert sell.bucket_meta == ((10, 0),)
    x = jnp.arange(10.0)
    np.testing.assert_array_equal(np.asarray(sell.matvec(x)), 2.0 * np.arange(10.0))


def test_missing_diagonal_entries():
    # rows without a stored diagonal must still matvec correctly (diag=0)
    csr = CSRMatrix.from_coo(
        np.array([0, 1, 1]), np.array([0, 1, 0]), np.array([2.0, 3.0, 1.0]), (3, 3)
    )
    sell = SellMatrix.from_csr(csr)
    x = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(sell.matvec(x)), np.asarray(csr.matvec(x)), rtol=1e-14
    )


def test_jit_and_pytree_transparency(scattered):
    sell = SellMatrix.from_csr(scattered)
    leaves, treedef = jax.tree_util.tree_flatten(sell)
    sell2 = jax.tree_util.tree_unflatten(treedef, leaves)
    x = jnp.ones(scattered.shape[0])
    f = jax.jit(lambda a, v: a.matvec(v))
    np.testing.assert_array_equal(
        np.asarray(f(sell2, x)), np.asarray(sell.matvec(x))
    )
    # sell_spmv is the same function matvec dispatches to
    np.testing.assert_array_equal(
        np.asarray(sell_spmv(sell, x)), np.asarray(sell.matvec(x))
    )


def test_cg_solve_parity_with_csr_layout(scattered):
    """The solve on the SELL operator must follow the CSR solve
    iteration-for-iteration (identical recurrences, different layout)."""
    n = scattered.shape[0]
    b = jnp.asarray(reference_rhs(n))
    sell = SellMatrix.from_csr(scattered)
    x_csr, info_csr = cg_solve(scattered, b, tol=1e-8, maxiter=n + 1)
    x_sell, info_sell = cg_solve(sell, b, tol=1e-8, maxiter=n + 1)
    assert int(info_sell.iterations) == int(info_csr.iterations)
    assert bool(info_sell.converged) and bool(info_csr.converged)
    np.testing.assert_allclose(np.asarray(x_sell), np.asarray(x_csr), rtol=1e-8, atol=1e-10)


def test_loader_auto_picks_sell(tmp_path):
    from conjugategradient_tpu.io import write_mtx
    from conjugategradient_tpu.io.loader import load_matrix

    rows, cols, vals, shape = powerlaw_spd_coo(512, seed=3)
    path = tmp_path / "scattered.mtx"
    write_mtx(path, rows, cols, vals, shape)
    op = load_matrix(path, layout="auto", dtype=np.float64)
    assert isinstance(op, SellMatrix)
    # and the explicit layouts still load the same matrix
    csr = load_matrix(path, layout="csr", dtype=np.float64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape[0]))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(csr.matvec(x)), rtol=1e-12, atol=1e-12
    )


def test_sell_spmv_multi_parity(scattered):
    from conjugategradient_tpu.ops import sell_spmv_multi

    sell = SellMatrix.from_csr(scattered)
    n = scattered.shape[0]
    X = jnp.asarray(np.random.default_rng(5).standard_normal((n, 7)))
    Y = sell_spmv_multi(sell, X)
    for j in range(7):
        np.testing.assert_allclose(
            np.asarray(Y[:, j]), np.asarray(sell.matvec(X[:, j])),
            rtol=1e-12, atol=1e-12,
        )


def test_batched_solve_on_sell_matches_solo(scattered):
    """The lockstep multi-RHS loop on a SELL operator must track solo solves
    per lane: same solutions, convergence flags, and iteration counts to ±1
    (the (N,R)-layout dot reduces in a different summation order than the
    solo solver's, which can move the tolerance crossing by one iteration
    on an ill-conditioned scattered matrix)."""
    from conjugategradient_tpu import cg_solve_batched

    sell = SellMatrix.from_csr(scattered)
    n = scattered.shape[0]
    rng = np.random.default_rng(6)
    B = jnp.asarray(rng.standard_normal((3, n)))
    X, info = cg_solve_batched(sell, B, tol=1e-8, maxiter=n + 1)
    for j in range(3):
        xj, ij = cg_solve(sell, B[j], tol=1e-8, maxiter=n + 1)
        assert bool(info.converged[j]) and bool(ij.converged)
        assert abs(int(info.iterations[j]) - int(ij.iterations)) <= 1
        np.testing.assert_allclose(
            np.asarray(X[j]), np.asarray(xj), rtol=1e-9, atol=1e-10
        )


def test_degree_sort_reorder_makes_pos_identity(tmp_path):
    """load_matrix(reorder=True) on a scattered pattern composes a stable
    degree sort so the SELL pack's pos is the identity (the matvec skips
    its order-restore gather); the permuted solve must still map back to
    the unpermuted solution."""
    import jax.numpy as jnp

    from conjugategradient_tpu.io.loader import load_matrix
    from conjugategradient_tpu.io.mtx import write_mtx
    from conjugategradient_tpu.problems import powerlaw_spd_coo
    from conjugategradient_tpu.reorder import unpermute_vector

    rows, cols, vals, shape = powerlaw_spd_coo(300, avg_degree=4.0, seed=3)
    path = str(tmp_path / "p.mtx")
    write_mtx(path, rows, cols, vals, shape, symmetric=True)

    plain = load_matrix(path, layout="sell", dtype=np.float64)
    assert not plain.pos_identity
    op, perm = load_matrix(path, layout="sell", dtype=np.float64, reorder=True)
    assert op.pos_identity
    assert np.array_equal(np.asarray(op.pos), np.arange(shape[0]))

    n = shape[0]
    b = np.random.default_rng(4).standard_normal(n)
    x_plain, info_plain = cg_solve(plain, jnp.asarray(b), tol=1e-10)
    y, info_perm = cg_solve(op, jnp.asarray(b[perm]), tol=1e-10)
    assert bool(info_plain.converged) and bool(info_perm.converged)
    x_back = unpermute_vector(np.asarray(y), perm)
    np.testing.assert_allclose(x_back, np.asarray(x_plain), rtol=1e-8, atol=1e-9)
