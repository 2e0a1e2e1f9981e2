"""PyTorch interop: CSRMatrix.from_torch / to_torch + as_linear_operator.

The reference's foreign-framework ingest is the HiFlow ``setMatrix``
overload (CG.hpp:105-151); torch sparse tensors are the third ecosystem
(after scipy.sparse and jax.experimental.sparse) operators arrive from, so
the ingest surface covers them too.  torch is a baked-in CPU wheel here —
these tests skip cleanly if it ever isn't.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conjugategradient_tpu.problems import poisson2d_coo
from conjugategradient_tpu.solver.cg import cg_solve
from conjugategradient_tpu.types import CSRMatrix, DenseOperator, as_linear_operator


def _poisson_torch_csr(nx=9, ny=11, dtype=torch.float64):
    rows, cols, vals, shape = poisson2d_coo(nx, ny)
    coo = torch.sparse_coo_tensor(
        torch.from_numpy(np.stack([rows, cols]).astype(np.int64)),
        torch.from_numpy(np.asarray(vals)).to(dtype),
        size=shape,
    )
    return coo.coalesce().to_sparse_csr()


class TestFromTorch:
    def test_csr_roundtrip_matvec(self):
        t = _poisson_torch_csr()
        A = CSRMatrix.from_torch(t)
        assert A.dtype == jnp.float64
        x = np.random.default_rng(0).standard_normal(A.n)
        want = (t @ torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(A.matvec(jnp.asarray(x))), want,
                                   rtol=1e-12)

    def test_coo_uncoalesced_duplicates_sum(self):
        # duplicates in an uncoalesced COO must sum, matching from_scipy's
        # sum_duplicates canonicalization
        idx = torch.tensor([[0, 0, 1], [1, 1, 0]])
        vals = torch.tensor([1.0, 2.0, 4.0], dtype=torch.float64)
        t = torch.sparse_coo_tensor(idx, vals, size=(2, 2))
        A = CSRMatrix.from_torch(t)
        np.testing.assert_array_equal(np.asarray(A.to_dense()),
                                      [[0.0, 3.0], [4.0, 0.0]])
        assert A.nnz == 2

    def test_csc_converts(self):
        t = _poisson_torch_csr().to_sparse_csc()
        A = CSRMatrix.from_torch(t)
        B = CSRMatrix.from_torch(_poisson_torch_csr())
        np.testing.assert_allclose(np.asarray(A.to_dense()),
                                   np.asarray(B.to_dense()), rtol=0)

    def test_bfloat16_values_survive(self):
        t = _poisson_torch_csr(dtype=torch.bfloat16)
        A = CSRMatrix.from_torch(t)
        assert A.dtype == jnp.bfloat16
        # and the dtype= override still wins
        A32 = CSRMatrix.from_torch(t, dtype=jnp.float32)
        assert A32.dtype == jnp.float32

    def test_dtype_override(self):
        A = CSRMatrix.from_torch(_poisson_torch_csr(), dtype=jnp.float32)
        assert A.dtype == jnp.float32

    def test_rejects_complex(self):
        t = torch.sparse_coo_tensor(
            torch.tensor([[0], [0]]), torch.tensor([1 + 1j]), size=(2, 2))
        with pytest.raises(ValueError, match="complex"):
            CSRMatrix.from_torch(t)

    def test_rejects_non_2d(self):
        t = torch.sparse_coo_tensor(
            torch.tensor([[0], [0], [0]]), torch.tensor([1.0]), size=(2, 2, 2))
        with pytest.raises(ValueError, match="2-D"):
            CSRMatrix.from_torch(t)

    def test_rejects_dense_with_pointer(self):
        with pytest.raises(ValueError, match="as_linear_operator"):
            CSRMatrix.from_torch(torch.eye(3))

    def test_rejects_non_tensor(self):
        with pytest.raises(TypeError, match="torch.Tensor"):
            CSRMatrix.from_torch(np.eye(3))

    def test_requires_grad_detaches(self):
        t = _poisson_torch_csr(dtype=torch.float32).requires_grad_(True)
        A = CSRMatrix.from_torch(t)
        assert A.dtype == jnp.float32


class TestToTorch:
    def test_roundtrip(self):
        t = _poisson_torch_csr()
        A = CSRMatrix.from_torch(t)
        back = A.to_torch()
        assert back.layout == torch.sparse_csr
        np.testing.assert_allclose(back.to_dense().numpy(),
                                   t.to_dense().numpy(), rtol=0)

    def test_bf16_roundtrip(self):
        A = CSRMatrix.from_torch(_poisson_torch_csr(dtype=torch.bfloat16))
        back = A.to_torch()
        assert back.dtype == torch.bfloat16


class TestAsLinearOperatorHook:
    def test_sparse_goes_csr(self):
        op = as_linear_operator(_poisson_torch_csr())
        assert isinstance(op, CSRMatrix)

    def test_dense_goes_dense(self):
        a = np.array([[4.0, 1.0], [1.0, 3.0]])
        op = as_linear_operator(torch.from_numpy(a))
        assert isinstance(op, DenseOperator)
        np.testing.assert_allclose(np.asarray(op.a), a, rtol=0)

    def test_dense_bf16(self):
        op = as_linear_operator(torch.eye(4, dtype=torch.bfloat16))
        assert isinstance(op, DenseOperator)
        assert op.dtype == jnp.bfloat16

    def test_end_to_end_solve(self):
        # a torch-built operator hands straight to cg_solve
        t = _poisson_torch_csr(16, 16)
        n = t.shape[0]
        b = jnp.asarray(np.random.default_rng(1).standard_normal(n))
        x, info = cg_solve(t, b, tol=1e-10)
        assert bool(info.converged)
        r = b - jnp.asarray(
            (t @ torch.from_numpy(np.asarray(x))).numpy())
        assert float(jnp.linalg.norm(r)) <= 1e-9 * float(jnp.linalg.norm(b))
