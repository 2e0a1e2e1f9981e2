"""Operator ABC, dense/matrix-free wrappers, and the universal ingest
dispatcher (``as_linear_operator``).  Split out of the round-1..4
``types.py`` god-module (round-5 VERDICT item 8); the public import
surface is unchanged — everything re-exports through
``conjugategradient_tpu.types``."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class LinearOperator:
    """Minimal abstract operator: ``y = A @ x`` plus metadata.

    Mirrors the role of the reference's ``Matrix<DT>`` (the only operator it
    supports, LinearAlgebraTypes.hpp:57-132) but generalized so the CG driver
    (solver/cg.py) is agnostic to storage: CSR, blocked-ELL, dense, stencil,
    or an arbitrary callable.
    """

    shape: Tuple[int, int]

    def matvec(self, x: jax.Array) -> jax.Array:  # pragma: no cover - interface
        raise NotImplementedError

    def diagonal(self) -> jax.Array:
        """diag(A), used by the Jacobi preconditioner. Optional."""
        raise NotImplementedError(
            f"{type(self).__name__} does not expose a diagonal; "
            "pass an explicit preconditioner instead."
        )

    @property
    def dtype(self):  # pragma: no cover - trivial
        raise NotImplementedError

    def memory_footprint(self) -> int:
        """Bytes of device memory this operator occupies. 0 for matrix-free."""
        return 0

    def astype(self, dtype) -> "LinearOperator":
        """Copy of this operator with its VALUES cast to ``dtype`` (index /
        structure arrays keep their integer types).  The storage side of the
        mixed-precision ladder (solver/refine.py): a ``bfloat16`` copy halves
        the value bytes every SpMV streams, while the solver recurrences run
        in the vector dtype (the matvecs accumulate in the promoted type)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support astype; "
            "construct the operator at the target dtype instead."
        )

    def __matmul__(self, x):
        return self.matvec(x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DenseOperator(LinearOperator):
    """Dense SPD operator; SpMV is a plain MXU matvec."""

    a: jax.Array

    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        return tuple(self.a.shape)

    @property
    def dtype(self):
        return self.a.dtype

    def matvec(self, x):
        from ..ops.spmv import dense_spmv

        return dense_spmv(self.a, x)

    def diagonal(self):
        return jnp.diagonal(self.a)

    def memory_footprint(self) -> int:
        return self.a.size * self.a.dtype.itemsize

    def astype(self, dtype) -> "DenseOperator":
        return DenseOperator(self.a.astype(dtype))


@jax.tree_util.register_pytree_node_class
class MatrixFreeOperator(LinearOperator):
    """Wrap an arbitrary ``x -> Ax`` callable (must be jit-traceable)."""

    def __init__(self, fn: Callable[[jax.Array], jax.Array], n: int, dtype=jnp.float32):
        self.fn = fn
        self._n = int(n)
        self._dtype = jnp.dtype(dtype)

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return self._dtype

    def matvec(self, x):
        return self.fn(x)

    def tree_flatten(self):
        return (), (self.fn, self._n, self._dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2])


def _is_scipy_sparse(a: Any) -> bool:
    """Duck-typed scipy.sparse check (no hard scipy dependency): every scipy
    sparse class exposes ``tocsr`` + ``shape`` + ``nnz``; jax/numpy arrays
    expose none of the first."""
    return (
        hasattr(a, "tocsr") and hasattr(a, "shape") and hasattr(a, "nnz")
        and not isinstance(a, (jnp.ndarray, np.ndarray))
    )


def _is_jax_sparse(a: Any) -> bool:
    """jax.experimental.sparse check by module path — no import cost when
    the feature is unused, and no isinstance against a lazily-loaded class."""
    return (type(a).__module__ or "").startswith("jax.experimental.sparse")


def _is_torch_tensor(a: Any) -> bool:
    """torch.Tensor check by module path — torch never imports unless a
    torch object actually shows up at the ingest point."""
    return (type(a).__module__ or "").split(".")[0] == "torch"


def as_linear_operator(a: Any, n: Optional[int] = None, dtype=None) -> LinearOperator:
    """Coerce common inputs into a LinearOperator.

    Accepts LinearOperator instances, scipy.sparse matrices (duck-typed),
    jax.experimental.sparse BCOO/BCSR matrices, torch tensors (sparse
    layouts → CSRMatrix, dense → DenseOperator), dense 2-D arrays, and
    callables (requires ``n``).  This is the rebuild of
    the reference's family of ``setMatrix`` overloads (CG.hpp:87-151) — incl.
    the external-framework adapter overload (CG.hpp:105-151) — as one
    functional ingest point.
    """
    # local import: base cannot import csr at module level (csr imports
    # LinearOperator from here)
    from .csr import CSRMatrix

    if isinstance(a, LinearOperator):
        return a
    if _is_jax_sparse(a):
        return CSRMatrix.from_bcoo(a, dtype=dtype)
    if _is_scipy_sparse(a):
        return CSRMatrix.from_scipy(a, dtype=dtype)
    if _is_torch_tensor(a):
        import torch

        if isinstance(a, torch.Tensor) and a.layout != torch.strided:
            return CSRMatrix.from_torch(a, dtype=dtype)
        if isinstance(a, torch.Tensor):
            # dense tensor → the DenseOperator branch below (bf16 widens
            # through f32 in transit, numpy has no bfloat16)
            t = a.detach().cpu()
            target = jnp.bfloat16 if t.dtype == torch.bfloat16 else None
            if t.dtype == torch.bfloat16:
                t = t.float()
            a = jnp.asarray(t.numpy())
            if target is not None:
                a = a.astype(dtype or target)
    if callable(a) and not isinstance(a, (jnp.ndarray, np.ndarray)):
        if n is None:
            raise ValueError("matrix-free callables need n= (system dimension)")
        return MatrixFreeOperator(a, n, dtype or jnp.float32)
    arr = jnp.asarray(a)
    if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
        raise ValueError(f"expected a square 2-D operator, got shape {arr.shape}")
    return DenseOperator(arr)
