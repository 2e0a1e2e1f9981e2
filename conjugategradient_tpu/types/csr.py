"""Faithful CSR container — the portable / oracle layout
(reference: ``Matrix<DT>``, LinearAlgebraTypes.hpp:57-132)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import LinearOperator, _cdiv, _is_scipy_sparse


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CSRMatrix(LinearOperator):
    """CSR sparse matrix (the reference's storage, LinearAlgebraTypes.hpp:57-132).

    ``data[nnz]`` values, ``indices[nnz]`` column indices, ``indptr[n+1]`` row
    offsets — exactly the three device arrays the reference's ``Matrix<DT>``
    owns.  ``row_ids[nnz]`` is additionally precomputed (host-side, once) so
    that SpMV on TPU is ``segment_sum(data * x[indices], row_ids)`` — one
    gather and one sorted segmented reduction instead of the reference's
    one-work-item-per-row serial loop (VectorOperations.hpp:438-466).
    """

    data: jax.Array
    indices: jax.Array
    indptr: jax.Array
    row_ids: jax.Array
    shape: Tuple[int, int]

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data, self.indices, self.indptr, self.row_ids), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, indices, indptr, row_ids = children
        return cls(data, indices, indptr, row_ids, aux)

    # -- constructors --------------------------------------------------------
    @staticmethod
    def from_arrays(
        data: np.ndarray,
        indices: np.ndarray,
        indptr: np.ndarray,
        shape: Optional[Tuple[int, int]] = None,
        dtype=None,
    ) -> "CSRMatrix":
        """Build from host CSR arrays (the reference's ``setMatrix``, CG.hpp:87-93)."""
        data = np.asarray(data)
        if dtype is not None:
            data = data.astype(dtype)
        indices = np.asarray(indices, dtype=np.int32)
        indptr = np.asarray(indptr, dtype=np.int32)
        n = len(indptr) - 1
        if shape is None:
            ncols = int(indices.max()) + 1 if len(indices) else n
            shape = (n, max(n, ncols))
        row_ids = np.repeat(
            np.arange(n, dtype=np.int32), np.diff(indptr).astype(np.int64)
        )
        return CSRMatrix(
            jnp.asarray(data),
            jnp.asarray(indices),
            jnp.asarray(indptr),
            jnp.asarray(row_ids),
            tuple(shape),
        )

    @staticmethod
    def from_coo(
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        shape: Tuple[int, int],
        dtype=None,
        sum_duplicates: bool = True,
    ) -> "CSRMatrix":
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        if sum_duplicates and len(rows):
            # vectorized duplicate summing (same bincount formulation as
            # io/mtx.read_mtx_csr — the two ingest paths must agree): one
            # group id per (row, col) run, accumulated in one pass
            first = np.ones(len(rows), dtype=bool)
            first[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
            if not first.all():
                group = np.cumsum(first) - 1
                vals = np.bincount(group, weights=vals).astype(vals.dtype)
                rows, cols = rows[first], cols[first]
        indptr = np.zeros(shape[0] + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        return CSRMatrix.from_arrays(vals, cols, indptr, shape, dtype=dtype)

    @staticmethod
    def from_dense(a: np.ndarray, dtype=None) -> "CSRMatrix":
        a = np.asarray(a)
        rows, cols = np.nonzero(a)
        return CSRMatrix.from_coo(rows, cols, a[rows, cols], a.shape, dtype=dtype)

    @staticmethod
    def from_scipy(a: Any, dtype=None) -> "CSRMatrix":
        """Ingest a scipy.sparse matrix (any format) — duck-typed, no hard
        scipy dependency.

        The reference's external-framework ingest is the HiFlow ``setMatrix``
        overload (CG.hpp:105-151), which scans a foreign matrix into CSR; the
        TPU-era foreign sparse format is scipy.sparse, so this is its
        equivalent (SURVEY.md C20 row).  Accepts anything that either already
        carries CSR arrays (``data``/``indices``/``indptr``) or can convert
        itself via ``tocsr()``.
        """
        if not _is_scipy_sparse(a):
            raise TypeError(f"not a scipy.sparse-like matrix: {type(a)!r}")
        if not hasattr(a, "indptr") or getattr(a, "format", "csr") != "csr":
            a = a.tocsr()
        elif hasattr(a, "copy"):
            # canonicalization below mutates in place — never restructure
            # the CALLER's matrix (nnz can shrink, index order changes)
            a = a.copy()
        # scipy may carry unsorted indices or explicit duplicates depending
        # on how the matrix was built; canonicalize like the reference's
        # ingest scan does
        if hasattr(a, "sum_duplicates"):
            a.sum_duplicates()
        if hasattr(a, "sort_indices"):
            a.sort_indices()
        return CSRMatrix.from_arrays(
            np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr),
            tuple(a.shape), dtype=dtype,
        )

    @staticmethod
    def from_bcoo(a: Any, dtype=None) -> "CSRMatrix":
        """Ingest a ``jax.experimental.sparse`` matrix (BCOO or BCSR).

        The JAX-ecosystem counterpart of :meth:`from_scipy` (the reference's
        foreign-matrix ``setMatrix`` overload, CG.hpp:105-151): models built
        on jax.experimental.sparse hand their operator straight to the
        solver.  BCOO buffers padded past the true nse carry OUT-OF-BOUNDS
        indices with zero data (that is ``bcoo_fromdense``'s padding
        convention) — those entries are dropped here.  Batched
        (``n_batch > 0``) and dense-block (``n_dense > 0``) layouts have no
        CSR equivalent and are rejected.
        """
        from jax.experimental import sparse as jsparse

        if isinstance(a, jsparse.BCSR):
            a = a.to_bcoo()
        if not isinstance(a, jsparse.BCOO):
            raise TypeError(
                f"not a jax.experimental.sparse BCOO/BCSR: {type(a)!r}")
        if a.n_batch or a.n_dense:
            raise ValueError(
                "BCOO with batch/dense dimensions (n_batch="
                f"{a.n_batch}, n_dense={a.n_dense}) has no CSR equivalent; "
                "index a single unbatched (n_batch=0, n_dense=0) matrix out"
            )
        if len(a.shape) != 2:
            raise ValueError(
                f"expected a 2-D sparse matrix, got shape {tuple(a.shape)}")
        ind = np.asarray(a.indices)
        vals = np.asarray(a.data)
        rows, cols = ind[:, 0], ind[:, 1]
        keep = (rows >= 0) & (rows < a.shape[0]) \
            & (cols >= 0) & (cols < a.shape[1])
        return CSRMatrix.from_coo(
            rows[keep], cols[keep], vals[keep], tuple(a.shape), dtype=dtype)

    def to_bcoo(self):
        """Export as a ``jax.experimental.sparse.BCOO``.

        The ``indices_sorted``/``unique_indices`` flags are VERIFIED, not
        assumed: ``from_coo`` canonicalizes, but ``from_arrays``/
        ``from_scipy`` accept valid CSR whose in-row columns are unsorted
        or duplicated, and wrongly claiming uniqueness makes downstream
        bcoo ops (duplicate-sum elision, dot_general transposes)
        undefined.  The check is one host pass over concrete index
        arrays; under tracing it conservatively claims neither flag."""
        from jax.experimental import sparse as jsparse

        ind = jnp.stack(
            [self.row_ids.astype(jnp.int32), self.indices.astype(jnp.int32)],
            axis=1,
        )
        sorted_unique = False
        try:
            keys = (np.asarray(self.row_ids, np.int64) * self.shape[1]
                    + np.asarray(self.indices, np.int64))
            sorted_unique = bool(np.all(np.diff(keys) > 0))
        except jax.errors.TracerArrayConversionError:
            pass
        return jsparse.BCOO(
            (self.data, ind), shape=self.shape,
            indices_sorted=sorted_unique, unique_indices=sorted_unique,
        )

    @staticmethod
    def from_torch(a: Any, dtype=None) -> "CSRMatrix":
        """Ingest a PyTorch sparse matrix (``torch.sparse_csr`` / ``_coo`` /
        ``_csc`` / blocked layouts).

        The PyTorch counterpart of :meth:`from_scipy` / :meth:`from_bcoo` —
        the reference's foreign-framework ``setMatrix`` overload
        (CG.hpp:105-151) for the third ecosystem operators arrive from.
        Conversion is host-side, once at ingest (like every other setup
        pass): the tensor is detached and moved to CPU, COO inputs are
        coalesced (duplicates summed — the same canonicalization
        ``from_scipy`` applies), CSC/BSR/BSC go through torch's own
        ``to_sparse_csr``.  bfloat16 values survive the trip (numpy cannot
        hold bf16, so they widen to f32 in transit and land as
        ``jnp.bfloat16`` unless ``dtype`` overrides).  Complex tensors are
        rejected — the framework is real-symmetric only, matching the
        MatrixMarket ingest contract (io/mtx.py).
        """
        import torch

        if not isinstance(a, torch.Tensor):
            raise TypeError(f"not a torch.Tensor: {type(a)!r}")
        if a.is_complex():
            raise ValueError(
                "complex torch operators are not supported: CG/MINRES here "
                "cover the real-symmetric domain (same contract as the "
                "MatrixMarket ingest, io/mtx.py)")
        if a.dim() != 2:
            raise ValueError(
                f"expected a 2-D sparse matrix, got shape {tuple(a.shape)}")
        if a.layout == torch.strided:
            raise ValueError(
                "dense (strided) torch tensor: pass it to as_linear_operator "
                "(dense operators stay dense — DenseOperator), or call "
                ".to_sparse_csr() first if CSR is really wanted")
        a = a.detach().cpu()
        shape = tuple(int(s) for s in a.shape)
        if dtype is None and a.dtype == torch.bfloat16:
            dtype = jnp.bfloat16

        def _np(t):
            # numpy has no bfloat16 — widen; dtype= above restores it
            if t.dtype == torch.bfloat16:
                t = t.float()
            return t.numpy()

        if a.layout == torch.sparse_coo:
            a = a.coalesce()
            idx = a.indices().numpy()
            return CSRMatrix.from_coo(
                idx[0], idx[1], _np(a.values()), shape, dtype=dtype)
        if a.layout != torch.sparse_csr:
            try:
                a = a.to_sparse_csr()
            except (RuntimeError, NotImplementedError) as e:
                raise ValueError(
                    f"torch layout {a.layout} has no CSR conversion in this "
                    f"torch build: {e}") from e
        return CSRMatrix.from_arrays(
            _np(a.values()),
            a.col_indices().numpy(),
            a.crow_indices().numpy(),
            shape,
            dtype=dtype,
        )

    def to_torch(self):
        """Export as a CPU ``torch.sparse_csr_tensor`` (the round-trip twin
        of :meth:`from_torch`; bf16 data widens through f32 in transit and
        lands as ``torch.bfloat16``)."""
        import torch

        # np.asarray of a device buffer is read-only — copy so torch owns
        # writable storage (torch.from_numpy aliases, it doesn't copy)
        data = np.array(jax.device_get(self.data))
        if self.data.dtype == jnp.bfloat16:
            vals = torch.from_numpy(data.astype(np.float32)).to(torch.bfloat16)
        else:
            vals = torch.from_numpy(data)
        return torch.sparse_csr_tensor(
            torch.from_numpy(np.array(jax.device_get(self.indptr),
                                      dtype=np.int64)),
            torch.from_numpy(np.array(jax.device_get(self.indices),
                                      dtype=np.int64)),
            vals,
            size=self.shape,
        )

    # -- properties ----------------------------------------------------------
    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    # -- ops -------------------------------------------------------------
    def matvec(self, x: jax.Array) -> jax.Array:
        from ..ops.spmv import csr_spmv

        return csr_spmv(self, x)

    def diagonal(self) -> jax.Array:
        on_diag = self.indices == self.row_ids
        return jax.ops.segment_sum(
            jnp.where(on_diag, self.data, jnp.zeros_like(self.data)),
            self.row_ids,
            num_segments=self.shape[0],
            indices_are_sorted=True,
        )

    def to_dense(self) -> jax.Array:
        out = jnp.zeros(self.shape, dtype=self.dtype)
        return out.at[self.row_ids, self.indices].add(self.data)

    def memory_footprint(self) -> int:
        return (
            self.data.size * self.data.dtype.itemsize
            + self.indices.size * self.indices.dtype.itemsize
            + self.indptr.size * self.indptr.dtype.itemsize
            + self.row_ids.size * self.row_ids.dtype.itemsize
        )

    def astype(self, dtype) -> "CSRMatrix":
        return dataclasses.replace(self, data=self.data.astype(dtype))
