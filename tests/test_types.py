"""Operator container tests (rebuild of LinearAlgebraTypes.hpp's Matrix/
Vector/Scalar contract, SURVEY §2.1 C3-C5, as JAX pytrees)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.problems import poisson2d_coo
from conjugategradient_tpu.types import (
    BlockedEllMatrix,
    CSRMatrix,
    DenseOperator,
    MatrixFreeOperator,
    StencilOperator,
    as_linear_operator,
)


@pytest.fixture(scope="module")
def csr():
    rows, cols, vals, shape = poisson2d_coo(9, 11)
    return CSRMatrix.from_coo(rows, cols, vals, shape)


def test_csr_from_dense_roundtrip(rng):
    a = rng.standard_normal((12, 12))
    a[np.abs(a) < 0.8] = 0
    m = CSRMatrix.from_dense(a)
    np.testing.assert_allclose(np.asarray(m.to_dense()), a, rtol=1e-12)


def test_from_coo_sums_duplicates():
    m = CSRMatrix.from_coo(
        np.array([0, 0, 0, 1]), np.array([1, 1, 1, 0]), np.array([1.0, 2.0, 3.0, 4.0]),
        (2, 2),
    )
    np.testing.assert_array_equal(np.asarray(m.to_dense()), [[0, 6], [4, 0]])
    assert m.nnz == 2


def test_csr_diagonal(csr):
    np.testing.assert_allclose(
        np.asarray(csr.diagonal()), np.diag(np.asarray(csr.to_dense())), rtol=1e-14
    )


def test_bell_diagonal(csr):
    bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=128)
    np.testing.assert_allclose(
        np.asarray(bell.diagonal()), np.asarray(csr.diagonal()), rtol=1e-12
    )


def test_bell_to_dense(csr):
    bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=128)
    np.testing.assert_allclose(
        np.asarray(bell.to_dense()), np.asarray(csr.to_dense()), rtol=1e-12
    )


def test_pytree_roundtrip(csr):
    leaves, treedef = jax.tree_util.tree_flatten(csr)
    re = jax.tree_util.tree_unflatten(treedef, leaves)
    assert re.shape == csr.shape
    np.testing.assert_array_equal(np.asarray(re.data), np.asarray(csr.data))

    bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=128)
    leaves, treedef = jax.tree_util.tree_flatten(bell)
    re = jax.tree_util.tree_unflatten(treedef, leaves)
    assert re.shape == bell.shape and re.nnz == bell.nnz

    st = StencilOperator.poisson((3, 4, 5))
    leaves, treedef = jax.tree_util.tree_flatten(st)
    re = jax.tree_util.tree_unflatten(treedef, leaves)
    assert re.grid_shape == st.grid_shape


def test_operator_passes_through_jit(csr):
    @jax.jit
    def apply(a, x):
        return a.matvec(x)

    x = jnp.ones((csr.shape[1],))
    np.testing.assert_allclose(
        np.asarray(apply(csr, x)), np.asarray(csr.matvec(x)), rtol=1e-12
    )


def test_as_linear_operator_dense(rng):
    a = rng.standard_normal((5, 5))
    op = as_linear_operator(jnp.asarray(a))
    assert isinstance(op, DenseOperator)
    with pytest.raises(ValueError):
        as_linear_operator(jnp.ones((3, 4)))


def test_as_linear_operator_callable():
    op = as_linear_operator(lambda x: 2.0 * x, n=7)
    assert isinstance(op, MatrixFreeOperator)
    assert op.shape == (7, 7)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.ones(7))), 2.0)
    with pytest.raises(ValueError):
        as_linear_operator(lambda x: x)  # missing n


def test_memory_footprints(csr):
    # CSR: data f64 + indices i32 + indptr i32 + row_ids i32
    expect = csr.nnz * 8 + csr.nnz * 4 + (csr.shape[0] + 1) * 4 + csr.nnz * 4
    assert csr.memory_footprint() == expect
    bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=128)
    assert bell.memory_footprint() == bell.blocks.size * 8 + bell.block_cols.size * 4
    assert StencilOperator.poisson((4, 4, 4)).memory_footprint() == 0


def test_matmul_operator_sugar(csr):
    x = jnp.ones((csr.shape[1],))
    np.testing.assert_allclose(
        np.asarray(csr @ x), np.asarray(csr.matvec(x)), rtol=1e-14
    )


def test_poisson3d_coo_matches_loop_assembly():
    """Vectorized 3-D Poisson generator == the loop-built CSR (north-star
    scale generation uses the vectorized path)."""
    import jax.numpy as jnp

    from conjugategradient_tpu.ops.stencil import poisson7_csr
    from conjugategradient_tpu.problems import poisson3d_coo
    from conjugategradient_tpu.types import CSRMatrix

    r, c, v, s = poisson3d_coo(5, 4, 3)
    a = CSRMatrix.from_coo(r, c, v, s)
    b = poisson7_csr((5, 4, 3))
    x = np.random.default_rng(0).standard_normal(s[0])
    np.testing.assert_array_equal(
        np.asarray(a.matvec(jnp.asarray(x))), np.asarray(b.matvec(jnp.asarray(x)))
    )


class TestJaxSparseIngest:
    """BCOO/BCSR ingest (CSRMatrix.from_bcoo / as_linear_operator hook)."""

    def _bcoo(self, nse=None):
        from jax.experimental import sparse as jsparse

        rows, cols, vals, shape = poisson2d_coo(8)
        d = np.zeros(shape)
        d[rows, cols] = vals
        return jsparse.BCOO.fromdense(jnp.asarray(d), nse=nse), d

    def test_bcoo_roundtrip_matvec(self):
        m, d = self._bcoo()
        A = CSRMatrix.from_bcoo(m)
        assert A.nnz == int((d != 0).sum())
        x = np.random.default_rng(0).standard_normal(d.shape[0])
        np.testing.assert_allclose(
            np.asarray(A.matvec(jnp.asarray(x))), d @ x, rtol=1e-12)

    def test_padded_bcoo_drops_oob_entries(self):
        _, d = self._bcoo()
        nse_true = int((d != 0).sum())
        m, d = self._bcoo(nse=nse_true + 17)  # over-padded buffer
        A = CSRMatrix.from_bcoo(m)
        assert A.nnz == nse_true
        np.testing.assert_allclose(np.asarray(A.to_dense()), d, rtol=1e-12)

    def test_bcsr_ingest(self):
        from jax.experimental import sparse as jsparse

        _, d = self._bcoo()
        m = jsparse.BCSR.fromdense(jnp.asarray(d))
        A = CSRMatrix.from_bcoo(m)
        np.testing.assert_allclose(np.asarray(A.to_dense()), d, rtol=1e-12)

    def test_as_linear_operator_dispatch(self):
        m, d = self._bcoo()
        op = as_linear_operator(m, dtype=jnp.float64)
        assert isinstance(op, CSRMatrix) and op.dtype == jnp.float64

    def test_batched_bcoo_rejected(self):
        from jax.experimental import sparse as jsparse

        dense = jnp.asarray(np.random.default_rng(1).random((2, 4, 4)))
        m = jsparse.BCOO.fromdense(dense, n_batch=1)
        with pytest.raises(ValueError, match="n_batch"):
            CSRMatrix.from_bcoo(m)
        with pytest.raises(TypeError, match="BCOO"):
            CSRMatrix.from_bcoo(np.ones((3, 3)))

    def test_to_bcoo_export(self):
        from jax.experimental import sparse as jsparse

        m, d = self._bcoo()
        A = CSRMatrix.from_bcoo(m)
        out = A.to_bcoo()
        assert isinstance(out, jsparse.BCOO)
        np.testing.assert_allclose(np.asarray(out.todense()), d, rtol=1e-12)

    def test_cg_solve_on_bcoo(self):
        from conjugategradient_tpu import cg_solve

        m, d = self._bcoo()
        n = d.shape[0]
        b = jnp.arange(1.0, n + 1)
        x, info = cg_solve(m, b, tol=1e-12)
        assert bool(info.converged)
        np.testing.assert_allclose(d @ np.asarray(x), np.asarray(b),
                                   atol=1e-9)
