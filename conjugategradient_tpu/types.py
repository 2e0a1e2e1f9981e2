"""Operator containers: the TPU-native rebuild of the reference's device types.

The reference (``src/LinearAlgebraTypes.hpp``) holds a CSR matrix as three raw
USM device arrays (``Matrix<DT>``, LinearAlgebraTypes.hpp:57-132) plus
``Vector``/``Scalar`` containers.  On TPU all of that collapses into JAX device
arrays living in HBM; what remains worth designing is the *layout*:

* :class:`CSRMatrix` — faithful CSR (data/indices/indptr), with a
  precomputed ``row_ids`` array so SpMV is a single gather + segment-sum.
  This is the portable / oracle layout.
* :class:`BlockedEllMatrix` — the TPU-fast layout: rows padded to blocks of
  ``bm``, columns grouped into blocks of ``bn``; each row-block stores a fixed
  number ``kmax`` of dense ``(bm, bn)`` tiles plus the column-block index of
  each tile.  SpMV becomes dense tile × vector products that the MXU/VPU can
  stream at HBM bandwidth (see ``ops/pallas/ell_spmv.py``).
* :class:`DenseOperator` — dense SPD systems ride the MXU directly.
* :class:`StencilOperator` — matrix-free 3-D 7-point stencil (no matrix in
  memory at all; the reference has no equivalent, it is a north-star
  extension).
* :class:`MatrixFreeOperator` — wraps any ``x -> Ax`` callable.

All containers are registered pytrees, so they pass through ``jit``,
``lax.while_loop`` carries, and ``shard_map`` untouched.
"""

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
        from .ops.spmv import csr_spmv

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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BlockedEllMatrix(LinearOperator):
    """Blocked-ELL layout: the TPU-fast sparse format.

    Rows are grouped into ``nrb = ceil(n / bm)`` row-blocks; columns into
    ``ncb = ceil(ncols / bn)`` column-blocks.  Every row-block stores exactly
    ``kmax`` dense ``(bm, bn)`` tiles (``blocks``) and, per tile, the index of
    the column-block it multiplies (``block_cols``).  Padding tiles are zero
    and point at column-block 0, so no masking is needed in the hot loop.

    SpMV = for each row-block: sum_k blocks[i, k] @ x_blocks[block_cols[i, k]]
    — dense (bm, bn) x (bn,) products, MXU/VPU-friendly, streaming ``blocks``
    from HBM exactly once.  This replaces the reference's scalar-row CSR
    kernel (VectorOperations.hpp:438-466) with a layout the hardware likes.
    """

    blocks: jax.Array  # (nrb, kmax, bm, bn)
    block_cols: jax.Array  # (nrb, kmax) int32
    shape: Tuple[int, int]
    nnz: int  # true nnz (pre-padding), static metadata

    def tree_flatten(self):
        return (self.blocks, self.block_cols), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        blocks, block_cols = children
        return cls(blocks, block_cols, aux[0], aux[1])

    @staticmethod
    def _pack_host_arrays(
        data: np.ndarray,
        indices: np.ndarray,
        indptr: np.ndarray,
        shape: Tuple[int, int],
        bm: int = 128,
        bn: int = 128,
        dtype=None,
    ):
        """CSR -> blocked-ELL as NUMPY arrays: ``(blocks, block_cols, nnz)``.

        The packing core of :meth:`from_csr_host`, exposed so consumers
        that repack further on the host (SymBellMatrix) never round-trip
        through device arrays — ``np.asarray`` of a multi-GB jax array
        measured 26 MB/s (91 s for a 2.4 GB tile stream), dwarfing the
        pack itself.
        """
        n, ncols = shape
        nrb = _cdiv(n, bm)
        ncb = _cdiv(ncols, bn)
        data = np.asarray(data)
        if dtype is not None:
            data = data.astype(dtype)
        indices = np.asarray(indices, dtype=np.int64)
        indptr = np.asarray(indptr, dtype=np.int64)
        nnz = int(len(data))

        if data.dtype in (np.float32, np.float64):
            from .io import native as _native

            if _native.available():
                blocks, block_cols, _ = _native.ell_pack_native(
                    data, indices, indptr, shape, bm, bn, dtype=data.dtype
                )
                return blocks, np.asarray(block_cols, np.int32), nnz

        # NumPy fallback, O(nnz log nnz): sort entries by (row-block,
        # col-block) once, find each row-block's distinct col-blocks from the
        # sorted runs, and scatter all values in a single np.add.at.
        row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        rb = row_ids // bm
        cb = indices // bn
        order = np.lexsort((cb, rb))
        rb_s, cb_s = rb[order], cb[order]
        # distinct (rb, cb) pairs in sorted order
        key = rb_s * np.int64(ncb) + cb_s
        first = np.ones(len(key), dtype=bool)
        first[1:] = key[1:] != key[:-1]
        pair_rb = rb_s[first]
        pair_cb = cb_s[first]
        counts = np.bincount(pair_rb, minlength=nrb)  # tiles per row-block
        kmax = max(int(counts.max()) if len(counts) else 1, 1)
        # slot of each distinct pair within its row-block
        pair_slot = np.arange(len(pair_rb)) - np.concatenate(
            [[0], np.cumsum(counts)[:-1]]
        )[pair_rb]
        block_cols = np.zeros((nrb, kmax), dtype=np.int32)
        block_cols[pair_rb, pair_slot] = pair_cb
        # slot of every nnz entry = its pair's slot (pairs indexed by cumsum
        # over the `first` flags along the sorted order)
        pair_idx_sorted = np.cumsum(first) - 1
        slot_sorted = pair_slot[pair_idx_sorted]
        slot = np.empty(len(slot_sorted), dtype=np.int64)
        slot[order] = slot_sorted

        blocks = np.zeros((nrb, kmax, bm, bn), dtype=data.dtype)
        np.add.at(
            blocks,
            (rb, slot, row_ids - rb * bm, indices - cb * bn),
            data,
        )
        return blocks, block_cols, nnz

    @staticmethod
    def from_csr_host(
        data: np.ndarray,
        indices: np.ndarray,
        indptr: np.ndarray,
        shape: Tuple[int, int],
        bm: int = 128,
        bn: int = 128,
        dtype=None,
    ) -> "BlockedEllMatrix":
        """Host-side CSR -> blocked-ELL conversion (done once at ingest).

        Uses the native C++ packer (native/ell_pack.cpp) when built — an
        O(nnz) single pass — else a vectorizable NumPy fallback.
        """
        blocks, block_cols, nnz = BlockedEllMatrix._pack_host_arrays(
            data, indices, indptr, shape, bm=bm, bn=bn, dtype=dtype
        )
        return BlockedEllMatrix(
            jnp.asarray(blocks), jnp.asarray(block_cols),
            (shape[0], shape[1]), nnz,
        )

    @staticmethod
    def from_csr(csr: CSRMatrix, bm: int = 128, bn: int = 128) -> "BlockedEllMatrix":
        return BlockedEllMatrix.from_csr_host(
            np.asarray(csr.data),
            np.asarray(csr.indices),
            np.asarray(csr.indptr),
            csr.shape,
            bm=bm,
            bn=bn,
        )

    @property
    def bm(self) -> int:
        return int(self.blocks.shape[2])

    @property
    def bn(self) -> int:
        return int(self.blocks.shape[3])

    @property
    def kmax(self) -> int:
        return int(self.blocks.shape[1])

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return (
            self.blocks.shape[0] * self.bm,
            _cdiv(self.shape[1], self.bn) * self.bn,
        )

    def matvec(self, x: jax.Array) -> jax.Array:
        from .ops.spmv import bell_spmv

        return bell_spmv(self, x)

    def diagonal(self) -> jax.Array:
        n = self.shape[0]
        nrb, kmax, bm, bn = self.blocks.shape
        # row r (global) lives in row-block r//bm at local row r%bm; its
        # diagonal element sits in the tile whose block_col == r//bn, at
        # local column r%bn.  Gather that single element per (row, k) —
        # shape (n_pad, kmax) — NOT the whole (n_pad, kmax, bn) lane slab,
        # which is bn=128x larger and OOMs Jacobi setup at n~1M.
        rows = jnp.arange(nrb * bm)
        rb = rows // bm
        rl = rows % bm
        target_cb = rows // bn
        cl = rows % bn
        tiles_cols = self.block_cols[rb]  # (nrb*bm, kmax)
        hit = tiles_cols == target_cb[:, None]  # (nrb*bm, kmax)
        ks = jnp.arange(kmax)[None, :]
        picked = self.blocks[rb[:, None], ks, rl[:, None], cl[:, None]]  # (n_pad, kmax)
        diag_padded = jnp.sum(jnp.where(hit, picked, 0), axis=1)
        return diag_padded[:n]

    def to_dense(self) -> jax.Array:
        nrb, kmax, bm, bn = self.blocks.shape
        np_, mp = self.padded_shape
        out = jnp.zeros((np_, mp), dtype=self.dtype)
        for i in range(nrb):
            for k in range(kmax):
                c = self.block_cols[i, k]
                idx = (jnp.asarray(i * bm, c.dtype), c * jnp.asarray(bn, c.dtype))
                out = jax.lax.dynamic_update_slice(
                    out,
                    jax.lax.dynamic_slice(out, idx, (bm, bn)) + self.blocks[i, k],
                    idx,
                )
        return out[: self.shape[0], : self.shape[1]]

    def memory_footprint(self) -> int:
        return (
            self.blocks.size * self.blocks.dtype.itemsize
            + self.block_cols.size * self.block_cols.dtype.itemsize
        )

    def padding_ratio(self) -> float:
        """Stored slots / true nnz — the bandwidth overhead of the layout."""
        return float(self.blocks.size) / max(self.nnz, 1)

    def astype(self, dtype) -> "BlockedEllMatrix":
        return dataclasses.replace(self, blocks=self.blocks.astype(dtype))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SymBellMatrix(LinearOperator):
    """Symmetric blocked-ELL: each off-diagonal tile stored ONCE.

    CG's domain is symmetric (SPD) matrices — the reference harness even
    mirrors every off-diagonal entry at ingest to expand symmetric
    MatrixMarket storage into full CSR (mm_reader.cpp:68-74) and then
    streams both halves through the SpMV every iteration
    (VectorOperations.hpp:438-466).  On TPU the SpMV is HBM-bandwidth-bound,
    so the mirrored half is pure wasted traffic: this layout keeps the block
    upper triangle only and applies each stored tile twice per matvec —
    ``q[r] += B @ x[c]`` and ``q[c] += Bᵀ @ x[r]`` — cutting the streamed
    operator bytes by up to 2× (exactly 1.5× for a block-tridiagonal band).
    The transposed application is a broadcast-multiply reduced along the
    OTHER axis — no data movement, no physical transpose.

    Storage (square matrices, square ``bm == bn`` tiles):

    * ``diag_blocks[i]`` — the full (bm, bn) tile at block position (i, i)
      (itself symmetric; storing it whole costs nothing extra and keeps the
      diagonal apply a plain streaming product).
    * ``off_blocks[i, k]`` / ``off_cols[i, k]`` — the strictly-upper tiles
      of block-row ``i`` (``off_cols[i, k] > i`` for real tiles); padding
      slots are zero tiles pointing at their own row, which contribute
      nothing through either application.

    ``full_kmax`` records the tiles-per-row of the equivalent full
    :class:`BlockedEllMatrix` — the bytes a full-storage iteration would
    have streamed, which is what effective-bandwidth accounting credits
    (the symmetric-SpMV convention; see docs/performance.md).
    """

    diag_blocks: jax.Array  # (nrb, bm, bn)
    off_blocks: jax.Array  # (nrb, ku, bm, bn) — strictly-upper tiles
    off_cols: jax.Array  # (nrb, ku) int32 block-col per tile
    shape: Tuple[int, int]
    nnz: int  # true nnz of the FULL (expanded) matrix, static metadata
    full_kmax: int  # kmax of the equivalent full BlockedEllMatrix, static
    #: block-tridiagonal pattern (ku == 1, every real upper tile targets the
    #: next block-row) — static pack-time fact that lets the fused kernel
    #: carry the mirror in a register instead of scatter stores
    banded: bool = False

    def tree_flatten(self):
        return (
            (self.diag_blocks, self.off_blocks, self.off_cols),
            (self.shape, self.nnz, self.full_kmax, self.banded),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        diag_blocks, off_blocks, off_cols = children
        return cls(diag_blocks, off_blocks, off_cols, *aux)

    @staticmethod
    def from_bell(bell: "BlockedEllMatrix", check: bool = True) -> "SymBellMatrix":
        """Repack a full blocked-ELL operator into symmetric storage.

        Host-side, O(tiles), fully vectorized.  ``check=True`` verifies
        each dropped lower tile equals the transpose of its stored upper
        mirror (one pass over the tile stream) — pass ``check=False`` for
        ingest paths that already guarantee symmetry (e.g. the
        MatrixMarket reader's symmetric expansion).

        Note: ``bell`` holds DEVICE arrays, and pulling a multi-GB tile
        stream back to numpy is slow (measured 26 MB/s); at scale, ingest
        via :meth:`from_csr_host`, which packs host-side end-to-end.
        """
        return SymBellMatrix._pack_np(
            np.asarray(bell.blocks),
            np.asarray(bell.block_cols).astype(np.int64),
            bell.padded_shape, bell.shape, bell.nnz, check,
        )

    @staticmethod
    def from_csr_host(
        data: np.ndarray,
        indices: np.ndarray,
        indptr: np.ndarray,
        shape: Tuple[int, int],
        bn: int = 128,
        dtype=None,
        check: bool = True,
    ) -> "SymBellMatrix":
        """Host-side CSR -> symmetric blocked-ELL, no device round-trips.

        Packs to full blocked-ELL in numpy (native C++ packer when built)
        and repacks symmetric before anything touches the device — the
        at-scale ingest path (from_bell on a device-resident 2.4 GB
        operator paid 91 s just converting back to numpy).
        """
        blocks, block_cols, nnz = BlockedEllMatrix._pack_host_arrays(
            data, indices, indptr, shape, bm=bn, bn=bn, dtype=dtype
        )
        nrb = blocks.shape[0]
        padded = (nrb * bn, _cdiv(shape[1], bn) * bn)
        return SymBellMatrix._pack_np(
            blocks, block_cols.astype(np.int64), padded, shape, nnz, check
        )

    @staticmethod
    def _pack_np(blocks, cols, padded_shape, shape, nnz, check):
        nrb, kmax, bm, bn = blocks.shape
        if bm != bn:
            raise ValueError(f"symmetric layout needs square tiles, got {bm}x{bn}")
        np_, mp = padded_shape
        if np_ != mp:
            raise ValueError(f"symmetric layout needs a square system, got {shape}")
        # fully vectorized repack: per-slot classification by (col vs row),
        # zero-tile detection in one pass — the per-tile Python loop this
        # replaces dominated 1.5M-row ingest
        rows_idx = np.arange(nrb, dtype=np.int64)[:, None]  # (nrb, 1)
        nonzero = blocks.reshape(nrb, kmax, -1).any(axis=2)  # (nrb, kmax)
        diag = np.zeros((nrb, bm, bn), dtype=blocks.dtype)
        for k in range(kmax):  # kmax is small; nrb axis vectorized
            sel = cols[:, k] == rows_idx[:, 0]
            diag[sel] += blocks[sel, k]
        up_mask = (cols > rows_idx) & nonzero
        lo_mask = (cols < rows_idx) & nonzero
        u_r, u_k = np.nonzero(up_mask)
        if check:
            l_r, l_k = np.nonzero(lo_mask)
            u_keys = u_r * nrb + cols[u_r, u_k]
            # lower tile at (row, col) mirrors upper (col, row)
            l_keys = cols[l_r, l_k] * nrb + l_r
            ou, ol = np.argsort(u_keys), np.argsort(l_keys)
            if len(u_keys) != len(l_keys) or not np.array_equal(
                u_keys[ou], l_keys[ol]
            ):
                only = set(u_keys.tolist()) ^ set(l_keys.tolist())
                key = sorted(only)[0]
                raise ValueError(
                    f"tile ({key // nrb}, {key % nrb}) is not symmetric "
                    "(nonzero on one side of the diagonal only)"
                )
            U = blocks[u_r[ou], u_k[ou]]
            L = blocks[l_r[ol], l_k[ol]]
            if not np.allclose(U, np.swapaxes(L, 1, 2)):
                bad = np.nonzero(
                    ~np.isclose(U, np.swapaxes(L, 1, 2)).all(axis=(1, 2))
                )[0][0]
                key = int(u_keys[ou][bad])
                raise ValueError(
                    f"tile ({key // nrb}, {key % nrb}) is not symmetric"
                )
        counts = up_mask.sum(axis=1)
        ku = max(int(counts.max()) if len(counts) else 1, 1)
        slot = np.cumsum(up_mask, axis=1) - 1  # slot within row, valid at mask
        off_blocks = np.zeros((nrb, ku, bm, bn), dtype=blocks.dtype)
        off_cols = np.tile(
            np.arange(nrb, dtype=np.int32)[:, None], (1, ku)
        )  # padding points at own row (zero tiles: inert both ways)
        off_blocks[u_r, slot[u_r, u_k]] = blocks[u_r, u_k]
        off_cols[u_r, slot[u_r, u_k]] = cols[u_r, u_k].astype(np.int32)
        banded = bool(
            ku == 1
            and nrb > 1
            and np.array_equal(
                off_cols[:-1, 0], np.arange(1, nrb, dtype=np.int32)
            )
            and off_cols[-1, 0] == nrb - 1  # last row: inert padding slot
        )
        return SymBellMatrix(
            jnp.asarray(diag),
            jnp.asarray(off_blocks),
            jnp.asarray(off_cols),
            shape,
            nnz,
            kmax,
            banded,
        )

    @staticmethod
    def from_csr(csr: "CSRMatrix", bm: int = 128, bn: int = 128) -> "SymBellMatrix":
        return SymBellMatrix.from_bell(
            BlockedEllMatrix.from_csr(csr, bm=bm, bn=bn), check=False
        )

    @property
    def bm(self) -> int:
        return int(self.diag_blocks.shape[1])

    @property
    def bn(self) -> int:
        return int(self.diag_blocks.shape[2])

    @property
    def ku(self) -> int:
        return int(self.off_blocks.shape[1])

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.diag_blocks.dtype

    @property
    def padded_shape(self) -> Tuple[int, int]:
        np_ = self.diag_blocks.shape[0] * self.bm
        return (np_, np_)

    def matvec(self, x: jax.Array) -> jax.Array:
        from .ops.spmv import sym_bell_spmv

        return sym_bell_spmv(self, x)

    def diagonal(self) -> jax.Array:
        n = self.shape[0]
        nrb, bm, bn = self.diag_blocks.shape
        rows = jnp.arange(nrb * bm)
        d = self.diag_blocks[rows // bm, rows % bm, rows % bn]
        return d[:n]

    def to_dense(self) -> jax.Array:
        nrb = self.diag_blocks.shape[0]
        bm, bn = self.bm, self.bn
        np_, _ = self.padded_shape
        out = jnp.zeros((np_, np_), dtype=self.dtype)
        for i in range(nrb):
            out = out.at[i * bm : (i + 1) * bm, i * bn : (i + 1) * bn].add(
                self.diag_blocks[i]
            )
            for k in range(self.ku):
                c = self.off_cols[i, k]
                idx = (jnp.asarray(i * bm, c.dtype), c * jnp.asarray(bn, c.dtype))
                blk = self.off_blocks[i, k]
                out = jax.lax.dynamic_update_slice(
                    out, jax.lax.dynamic_slice(out, idx, (bm, bn)) + blk, idx
                )
                idx_t = (idx[1], idx[0])
                out = jax.lax.dynamic_update_slice(
                    out,
                    jax.lax.dynamic_slice(out, idx_t, (bn, bm)) + blk.T,
                    idx_t,
                )
        return out[: self.shape[0], : self.shape[1]]

    def memory_footprint(self) -> int:
        return (
            self.diag_blocks.size * self.diag_blocks.dtype.itemsize
            + self.off_blocks.size * self.off_blocks.dtype.itemsize
            + self.off_cols.size * self.off_cols.dtype.itemsize
        )

    def full_tile_bytes(self) -> int:
        """Operator bytes the equivalent FULL blocked-ELL layout streams per
        SpMV — the useful-content byte count effective-bandwidth accounting
        credits symmetric storage with (each stored off tile does the work
        of two full-layout tiles)."""
        nrb = self.diag_blocks.shape[0]
        return nrb * self.full_kmax * self.bm * self.bn * self.dtype.itemsize

    def padding_ratio(self) -> float:
        stored = self.diag_blocks.size + self.off_blocks.size
        # each stored off slot carries two of the full layout's nnz
        return float(stored + self.off_blocks.size) / max(self.nnz, 1)

    def astype(self, dtype) -> "SymBellMatrix":
        return dataclasses.replace(
            self,
            diag_blocks=self.diag_blocks.astype(dtype),
            off_blocks=self.off_blocks.astype(dtype),
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DIAMatrix(LinearOperator):
    """Diagonal (DIA) sparse layout — the TPU-ideal format for banded SPD
    matrices.

    Storage: ``diags[d, i] = A[i, i + offsets[d]]`` for each stored diagonal
    offset (``offsets`` is static metadata, so the SpMV loop over diagonals
    unrolls at trace time).  Slots that fall outside the matrix are zero.

    SpMV is ``y = sum_d diags[d] * shift(x, offsets[d])`` — no index arrays,
    no gathers: ndiag+2 contiguous vector streams that XLA fuses into one
    pass at HBM bandwidth.  The reference's CSR kernel
    (VectorOperations.hpp:438-466) does one serial dot per row with random
    access into x; DIA removes both the index traffic (nnz ints in CSR) and
    the irregular access entirely.  With RCM reordering (reorder.py), most
    SuiteSparse SPD problems become banded enough for this layout.
    """

    diags: jax.Array  # (ndiag, n)
    offsets: Tuple[int, ...]  # static
    shape: Tuple[int, int]
    nnz: int  # true nnz (pre-padding), static metadata
    # Optional pre-blocked copy (ng, ndiag, bl) for the Pallas windowed
    # kernel: a (ndiag, bl) BlockSpec block of the row-major (ndiag, n)
    # array is ndiag strided row segments and XLA inserts a PER-ITERATION
    # relayout in front of the custom call when the operator is a jit
    # argument (measured 3.2× at 99 diagonals); each blocked slice is one
    # contiguous tiled region, which streams clean.  Built once by
    # :meth:`with_blocked`; `ops/spmv.dia_spmv` prefers it when present.
    diags_blocked: Optional[jax.Array] = None

    def tree_flatten(self):
        if self.diags_blocked is None:
            return (self.diags,), (self.offsets, self.shape, self.nnz, False)
        return (self.diags, self.diags_blocked), (
            self.offsets, self.shape, self.nnz, True,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        blocked = children[1] if aux[3] else None
        return cls(children[0], aux[0], aux[1], aux[2], blocked)

    def with_blocked(self, block_len: int = 16384) -> "DIAMatrix":
        """Return a copy carrying the Pallas-blocked diagonal layout (one
        device pass; do this ONCE per operator, outside jit)."""
        if self.diags_blocked is not None:
            return self
        ndiag, n_stored = self.diags.shape
        # Mosaic's 1-D memref slices must be 1024-aligned, so the block
        # length (and hence every scratch-window offset) must be a 1024
        # multiple — round up rather than fail in lowering
        bl = -(-min(block_len, max(n_stored, 1)) // 1024) * 1024
        n_pad = -(-n_stored // bl) * bl
        dp = self.diags
        if n_pad != n_stored:
            dp = jnp.pad(dp, ((0, 0), (0, n_pad - n_stored)))
        blocked = dp.reshape(ndiag, n_pad // bl, bl).transpose(1, 0, 2)
        return DIAMatrix(
            self.diags, self.offsets, self.shape, self.nnz, blocked
        )

    @staticmethod
    def from_csr_host(
        data: np.ndarray,
        indices: np.ndarray,
        indptr: np.ndarray,
        shape: Tuple[int, int],
        dtype=None,
        max_diags: Optional[int] = None,
    ) -> "DIAMatrix":
        """Host-side CSR -> DIA.  Raises ValueError if the matrix touches
        more than ``max_diags`` distinct diagonals (caller should fall back
        to blocked-ELL)."""
        n, ncols = shape
        data = np.asarray(data)
        if dtype is not None:
            data = data.astype(dtype)
        indices = np.asarray(indices, dtype=np.int64)
        indptr = np.asarray(indptr, dtype=np.int64)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        offs = indices - row_ids
        uniq = np.unique(offs)
        if max_diags is not None and len(uniq) > max_diags:
            raise ValueError(
                f"matrix touches {len(uniq)} diagonals > max_diags={max_diags}"
            )
        slot = np.searchsorted(uniq, offs)
        diags = np.zeros((len(uniq), n), dtype=data.dtype)
        np.add.at(diags, (slot, row_ids), data)
        return DIAMatrix(
            jnp.asarray(diags),
            tuple(int(o) for o in uniq),
            (n, ncols),
            int(len(data)),
        )

    @staticmethod
    def from_csr(csr: "CSRMatrix", max_diags: Optional[int] = None) -> "DIAMatrix":
        return DIAMatrix.from_csr_host(
            np.asarray(csr.data),
            np.asarray(csr.indices),
            np.asarray(csr.indptr),
            csr.shape,
            max_diags=max_diags,
        )

    @property
    def ndiag(self) -> int:
        return len(self.offsets)

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.diags.dtype

    def matvec(self, x: jax.Array) -> jax.Array:
        from .ops.spmv import dia_spmv

        return dia_spmv(self, x)

    def diagonal(self) -> jax.Array:
        if 0 in self.offsets:
            return self.diags[self.offsets.index(0)]
        # a zero diagonal would silently turn Jacobi's 1/diag into inf;
        # an SPD matrix always has a positive main diagonal, so a DIA
        # operator without one is a construction error — fail loudly
        raise ValueError(
            "DIAMatrix stores no main diagonal (offset 0); diagonal() is "
            "undefined for it — an SPD operator must have one"
        )

    def to_dense(self) -> jax.Array:
        n, ncols = self.shape
        out = jnp.zeros((n, ncols), dtype=self.dtype)
        rows = jnp.arange(n)
        for d, off in enumerate(self.offsets):
            cols = rows + off
            valid = (cols >= 0) & (cols < ncols)
            out = out.at[rows[valid], cols[valid]].add(self.diags[d][valid])
        return out

    def memory_footprint(self) -> int:
        return self.diags.size * self.diags.dtype.itemsize

    def padding_ratio(self) -> float:
        """Stored slots / true nnz — the bandwidth overhead of the layout."""
        return float(self.diags.size) / max(self.nnz, 1)

    def astype(self, dtype) -> "DIAMatrix":
        return dataclasses.replace(
            self,
            diags=self.diags.astype(dtype),
            diags_blocked=(
                None if self.diags_blocked is None
                else self.diags_blocked.astype(dtype)
            ),
        )


def _sell_ladder(max_degree: int) -> Tuple[int, ...]:
    """Geometric row-width ladder {1,2,3,4,6,8,12,16,...}: padding a row to
    the next rung wastes at most 50% of its slots."""
    ks = []
    k = 1
    while k < max_degree:
        ks += [k, k + (k + 1) // 2] if k > 1 else [1, 2]
        k *= 2
    ks = sorted({v for v in ks if v <= max_degree} | {max_degree})
    return tuple(ks)


def _sell_pack_rows(data, indices, indptr, shape, n_shards: int):
    """Host-side CSR → degree-bucketed SELL slabs, split into ``n_shards``
    shape-homogeneous row blocks.

    The ONE packer behind both :meth:`SellMatrix.from_csr_host`
    (``n_shards=1``) and the sharded partitioner
    (``parallel.partition_sell_rows``): rows bucket by off-diagonal degree
    on one global geometric ladder, every shard's per-bucket row count is
    maxed over shards (virtual padding rows own all-zero slab space that
    ``pos`` never references), the main diagonal splits out as a stream,
    and each row's entries keep CSR order inside its slab.  Column indices
    stay GLOBAL.

    Returns ``(diag (S, m), pos (S, m) int32, cols_flat (S, T) int32,
    vals_flat (S, T), bucket_meta, n_padded)`` with ``m = n_padded /
    n_shards``.
    """
    n, ncols = shape
    m = -(-n // n_shards)
    n_padded = m * n_shards
    data = np.asarray(data)
    indices = np.asarray(indices, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))

    on_diag = indices == row_ids
    deg = np.bincount(row_ids[~on_diag], minlength=n).astype(np.int64)
    max_deg = int(deg.max()) if len(deg) else 0

    # one global ladder; k=0 collects degree-0 (and virtual padding) rows
    ladder = (
        np.asarray(_sell_ladder(max_deg), dtype=np.int64)
        if max_deg > 0
        else np.zeros((0,), np.int64)
    )
    k_of_row = np.zeros(n_padded, np.int64)
    if max_deg > 0:
        k_of_row[:n] = np.where(deg > 0, ladder[np.searchsorted(ladder, deg)], 0)
    ks_all = np.concatenate([[0], ladder])
    shard_of_row = np.arange(n_padded, dtype=np.int64) // m
    k_idx = np.searchsorted(ks_all, k_of_row)
    counts = np.zeros((n_shards, len(ks_all)), np.int64)
    np.add.at(counts, (shard_of_row, k_idx), 1)
    nb_max = counts.max(axis=0)
    keep = nb_max > 0
    ks, nb = ks_all[keep], nb_max[keep]
    meta = tuple((int(b), int(k)) for b, k in zip(nb, ks))
    k_idx = np.searchsorted(ks, k_of_row)  # every row's k survives keep

    slab_sizes = nb * ks
    slab_base = np.concatenate([[0], np.cumsum(slab_sizes)[:-1]])
    sorted_base = np.concatenate([[0], np.cumsum(nb)[:-1]])
    total = int(slab_sizes.sum())

    # rank of each row within its (shard, bucket) group, row order kept
    grp = shard_of_row * len(ks) + k_idx
    order = np.argsort(grp, kind="stable")
    grp_sorted = grp[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(grp_sorted)) + 1])
    run_lengths = np.diff(np.concatenate([starts, [n_padded]]))
    rank = np.empty(n_padded, np.int64)
    rank[order] = np.arange(n_padded) - np.repeat(starts, run_lengths)

    diag = np.zeros((n_shards, m), dtype=data.dtype)
    dr = row_ids[on_diag]
    np.add.at(diag, (dr // m, dr % m), data[on_diag])
    pos = (sorted_base[k_idx] + rank).astype(np.int32).reshape(n_shards, m)

    off_r = row_ids[~on_diag]
    off_c = indices[~on_diag]
    off_v = data[~on_diag]
    off_row_start = np.concatenate([[0], np.cumsum(deg)[:-1]])
    slot = np.arange(len(off_r), dtype=np.int64) - off_row_start[off_r]
    row_start = slab_base[k_idx] + rank * ks[k_idx]  # (n_padded,)
    flat_idx = row_start[off_r] + slot
    cols_flat = np.zeros((n_shards, total), dtype=np.int32)
    vals_flat = np.zeros((n_shards, total), dtype=data.dtype)
    cols_flat[shard_of_row[off_r], flat_idx] = off_c.astype(np.int32)
    vals_flat[shard_of_row[off_r], flat_idx] = off_v
    return diag, pos, cols_flat, vals_flat, meta, n_padded


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SymDIAMatrix(LinearOperator):
    """Symmetric DIA: only the offsets ≥ 0 stored — the banded twin of
    :class:`SymBellMatrix`.

    A symmetric matrix's −k diagonal is its +k diagonal re-indexed
    (``A[i, i−k] = A[i−k, i] = diags₊ₖ[i−k]``), so storing both halves
    streams every off-diagonal value twice per SpMV for zero information.
    This layout keeps ``diags[d, i] = A[i, i + offsets[d]]`` for
    ``offsets[d] ≥ 0`` only and applies each stored diagonal both ways:

        y += diags[d] * shift(x, +k)          (the stored direction)
        y += shift(diags[d] * x, −k)          (its mirror — same stream,
                                               no extra diagonal read)

    Near-2× fewer operator bytes on wide bands ((w/2+1)/(w+1) of the full
    stream).  Because :func:`~conjugategradient_tpu.cg_solve`'s DIA
    constant-closure cache is matvec-generic, SymDIA rides it directly —
    and the halved constant footprint doubles the size reach of the
    320 MB relay-limit gate (a Flan-class 608 MB full-DIA operator that
    dies at the relay limit packs to ~304 MB symmetric).

    At stencil-scale offsets (max ≥ 1024, where XLA's shift formulation
    collapses) the Pallas windowed SYMMETRIC kernel takes over when the
    operator carries the halo'd pre-blocked layout (:meth:`with_blocked`;
    ``ops/pallas/dia_spmv.sym_dia_spmv_pallas_blocked``) — past the
    320 MB constant-closure gate ``cg_solve`` performs that upgrade
    automatically, so the half-band saving survives at Flan-class sizes.
    """

    diags: jax.Array  # (ndiag_nonneg, n)
    offsets: Tuple[int, ...]  # static, all >= 0, ascending
    shape: Tuple[int, int]
    nnz: int  # true nnz of the FULL (expanded) matrix, static metadata
    # Optional halo'd pre-blocked copy (ng, ndiag, hw + bl) for the Pallas
    # windowed symmetric kernel: block g's row carries
    # ``d_k[g·bl − hw + j]`` (zeros outside [0, n)) so the MIRROR term's
    # left-of-block diagonal values ship inside the block — one contiguous
    # tiled region per grid step, no per-iteration relayout when the
    # operator is a jit argument (the same reason DIAMatrix.with_blocked
    # exists).  Built once by :meth:`with_blocked`; ``ops/spmv.sym_dia_spmv``
    # prefers it on TPU at stencil-scale offsets.
    diags_blocked: Optional[jax.Array] = None
    blocked_halo: int = 0  # hw (static; 1024-aligned)

    def tree_flatten(self):
        if self.diags_blocked is None:
            return (self.diags,), (self.offsets, self.shape, self.nnz,
                                   False, 0)
        return (self.diags, self.diags_blocked), (
            self.offsets, self.shape, self.nnz, True, self.blocked_halo,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        blocked = children[1] if aux[3] else None
        return cls(children[0], aux[0], aux[1], aux[2], blocked, aux[4])

    def with_blocked(self, block_len: Optional[int] = None) -> "SymDIAMatrix":
        """Return a copy carrying the halo'd Pallas-blocked layout (one
        device pass; do this ONCE per operator, outside jit).

        ``block_len=None`` (the default every production call site uses)
        picks a halo-aware length; an explicit value is honored exactly
        (tests use small blocks to force halo-crossing coverage).
        """
        if self.diags_blocked is not None:
            return self
        ndiag, n_stored = self.diags.shape
        w = max(self.offsets) if self.offsets else 0
        # halo and block length both 1024-aligned (Mosaic 1-D memref rule;
        # also keeps every block row lane-aligned)
        hw = -(-w // 1024) * 1024 if w else 0
        if block_len is None:
            # The halo costs hw/bl EXTRA stream per diagonal.  At
            # stencil-scale bands a fixed bl=16K is smaller than the halo
            # itself — a w=20·1024 half-band would stream 2.25× its stored
            # bytes, MORE than the full layout (measured: 664 µs/iter sym
            # vs 656 full at n=2M — the symmetric win erased).  Grow bl
            # until the halo is ≤ 12.5% overhead, inside a 64 MB budget
            # for the two in-flight (ndiag, hw+bl) blocks.  Grid-blocked
            # operands normally pipeline through a 16 MB scoped-vmem stack
            # (a 48 MB budget died in AOT compile with "Scoped allocation
            # 19.69M exceeded scoped vmem limit 16.00M"), so the kernel
            # raises the cap per-call via CompilerParams(vmem_limit_bytes)
            # sized from this layout (ops/pallas/dia_spmv.py); 64 MB for
            # the diagonal blocks leaves the double-buffered x window and
            # y output blocks comfortably inside the 128 MB VMEM.
            itemsize = jnp.dtype(self.diags.dtype).itemsize
            budget = 64 * 1024 * 1024
            bl_cap = budget // (2 * max(ndiag, 1) * itemsize) - hw
            bl_cap = (bl_cap // 1024) * 1024  # floor: never exceed budget
            block_len = min(max(16384, 8 * hw), max(bl_cap, 1024))
        bl = -(-min(block_len, max(n_stored, 1)) // 1024) * 1024
        n_pad = -(-n_stored // bl) * bl
        ng = n_pad // bl
        dp = self.diags
        if n_pad != n_stored:
            dp = jnp.pad(dp, ((0, 0), (0, n_pad - n_stored)))
        dpe = jnp.pad(dp, ((0, 0), (hw, 0)))  # zeros left of row 0
        idx = (
            jnp.arange(ng, dtype=jnp.int32)[:, None] * bl
            + jnp.arange(hw + bl, dtype=jnp.int32)[None, :]
        )
        blocked = dpe[:, idx].transpose(1, 0, 2)  # (ng, ndiag, hw + bl)
        return SymDIAMatrix(
            self.diags, self.offsets, self.shape, self.nnz, blocked, hw
        )

    @staticmethod
    def from_dia(dia: "DIAMatrix", check: bool = True) -> "SymDIAMatrix":
        """Repack a full DIA operator into symmetric storage.

        ``check=True`` verifies each dropped −k diagonal equals its +k
        mirror re-indexed (vectorized, one pass); a +k diagonal whose −k
        partner is missing must itself be all-zero outside the overlap.
        """
        n, ncols = dia.shape
        if n != ncols:
            raise ValueError(f"symmetric layout needs a square system, got {dia.shape}")
        diags = np.asarray(dia.diags)
        offs = dia.offsets
        pos = [d for d, o in enumerate(offs) if o >= 0]
        by_off = {o: d for d, o in enumerate(offs)}
        if check:
            for d, o in enumerate(offs):
                if o >= 0:
                    continue
                k = -o
                dneg = diags[d]
                if k in by_off:
                    dpos = diags[by_off[k]]
                    # A[i, i−k] = A[i−k, i]: dneg[i] == dpos[i−k] for i >= k
                    if not (
                        np.allclose(dneg[k:], dpos[: n - k])
                        and not dneg[:k].any()
                    ):
                        raise ValueError(f"diagonal {o} is not symmetric")
                elif dneg.any():
                    raise ValueError(
                        f"diagonal {o} has no +{k} mirror and is nonzero"
                    )
            for d, o in enumerate(offs):
                if o > 0 and -o not in by_off and diags[d].any():
                    raise ValueError(
                        f"diagonal +{o} has no -{o} mirror and is nonzero"
                    )
        return SymDIAMatrix(
            jnp.asarray(diags[pos]),
            tuple(offs[d] for d in pos),
            dia.shape,
            dia.nnz,
        )

    @staticmethod
    def from_csr(csr: "CSRMatrix", max_diags: Optional[int] = None,
                 check: bool = True) -> "SymDIAMatrix":
        return SymDIAMatrix.from_dia(
            DIAMatrix.from_csr(csr, max_diags=max_diags), check=check
        )

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.diags.dtype

    def matvec(self, x: jax.Array) -> jax.Array:
        from .ops.spmv import sym_dia_spmv

        return sym_dia_spmv(self, x)

    def diagonal(self) -> jax.Array:
        if 0 in self.offsets:
            return self.diags[self.offsets.index(0)]
        # same contract as DIAMatrix.diagonal(): a silent zero diagonal
        # would turn Jacobi's 1/diag into inf — fail loudly
        raise ValueError(
            "SymDIAMatrix stores no main diagonal (offset 0); diagonal() "
            "is undefined for it — an SPD operator must have one"
        )

    def to_dense(self) -> jax.Array:
        n = self.shape[0]
        out = jnp.zeros((n, n), dtype=self.dtype)
        rows = jnp.arange(n)
        for d, off in enumerate(self.offsets):
            cols = rows + off
            ok = cols < n
            out = out.at[
                jnp.where(ok, rows, 0), jnp.where(ok, cols, 0)
            ].add(jnp.where(ok, self.diags[d], 0))
            if off > 0:
                out = out.at[
                    jnp.where(ok, cols, 0), jnp.where(ok, rows, 0)
                ].add(jnp.where(ok, self.diags[d], 0))
        return out

    def memory_footprint(self) -> int:
        return self.diags.size * self.diags.dtype.itemsize

    def full_diag_bytes(self) -> int:
        """Bytes the equivalent FULL DIA layout streams per SpMV (each
        stored off-diagonal serves both halves)."""
        n_off = sum(1 for o in self.offsets if o > 0)
        ndiag_full = len(self.offsets) + n_off
        return ndiag_full * self.shape[0] * self.dtype.itemsize

    def astype(self, dtype) -> "SymDIAMatrix":
        return dataclasses.replace(
            self,
            diags=self.diags.astype(dtype),
            diags_blocked=(
                None if self.diags_blocked is None
                else self.diags_blocked.astype(dtype)
            ),
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SellMatrix(LinearOperator):
    """Degree-bucketed ELL ("sliced-ELL") — the TPU layout for SCATTERED
    sparse matrices, where DIA/blocked-ELL padding explodes and CSR falls
    back to gather + segment-sum.

    Measured motivation (v5e, docs/performance.md): random access on TPU has
    a hard ~7-8 ns/element scalar floor, and the CSR path pays it TWICE — a
    gather of ``x[indices]`` plus a scalar segmented reduction (15.9 ns/nnz
    total).  This layout pays it exactly once: rows are grouped into buckets
    by (off-diagonal) degree, each bucket stores dense ``(rows, k)`` column/
    value slabs, and the per-slot products reduce along the k axis with
    vectorized adds — no segment-sum at all (7.3 ns/nnz, the gather-only
    rate).  The main diagonal is split out as a plain stream (every SPD
    matrix has one), which both removes its entries from the gather and
    makes ``diagonal()`` (Jacobi setup) free.

    Storage: ``diag[n]``; ONE flat slot array pair ``cols_flat``/``vals_flat``
    holding every bucket's row-major (nb, k) slab back to back (padding
    slots: col 0, val 0 — gathering x[0]*0 needs no masking); and ``pos[n]``
    mapping row → its slot in the degree-sorted concatenation, so ``matvec``
    restores row order with one gather.  The slabs are flat rather than
    per-bucket arrays because each separate XLA gather op pays a fixed cost
    — measured at n=1.5M/30 buckets, per-bucket gathers ran at 12.3 ns/nnz
    vs 6.9 for one flat gather.  Replaces the reference's scalar-row CSR
    kernel (VectorOperations.hpp:438-466) for irregular SuiteSparse-class
    patterns (bus networks, circuits) where no banded/blocked layout exists
    even after RCM.
    """

    diag: jax.Array  # (n,)
    pos: jax.Array  # (n,) int32: row i's index in the bucket concatenation
    cols_flat: jax.Array  # (total_slots,) int32
    vals_flat: jax.Array  # (total_slots,)
    bucket_meta: Tuple[Tuple[int, int], ...]  # per bucket: (nb, k), static
    shape: Tuple[int, int]
    nnz: int  # true nnz (pre-padding), static metadata
    # True when rows already arrive in bucket order (pos == identity) —
    # e.g. after reorder.degree_sort_permutation — so the matvec can skip
    # the order-restore gather (~20% of the gather-bound matvec at 1.5M).
    # Static so the skip compiles away.
    pos_identity: bool = False

    def tree_flatten(self):
        return (self.diag, self.pos, self.cols_flat, self.vals_flat), (
            self.bucket_meta,
            self.shape,
            self.nnz,
            self.pos_identity,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        diag, pos, cols_flat, vals_flat = children
        return cls(diag, pos, cols_flat, vals_flat, *aux)

    @staticmethod
    def from_csr_host(
        data: np.ndarray,
        indices: np.ndarray,
        indptr: np.ndarray,
        shape: Tuple[int, int],
        dtype=None,
    ) -> "SellMatrix":
        """Host-side CSR → bucketed ELL (done once at ingest, O(nnz)).

        The single-shard case of :func:`_sell_pack_rows` — the sharded
        partitioner (``parallel.partition_sell_rows``) is the same packer
        with ``n_shards > 1``, so bucket/slab conventions cannot drift.
        """
        data = np.asarray(data)
        if dtype is not None:
            data = data.astype(dtype)
        diag, pos, cols_flat, vals_flat, meta, _ = _sell_pack_rows(
            data, indices, indptr, shape, 1
        )
        return SellMatrix(
            jnp.asarray(diag[0]),
            jnp.asarray(pos[0]),
            jnp.asarray(cols_flat[0]),
            jnp.asarray(vals_flat[0]),
            meta,
            shape,
            int(len(data)),
            pos_identity=bool(
                np.array_equal(pos[0], np.arange(shape[0], dtype=pos.dtype))
            ),
        )

    @staticmethod
    def from_csr(csr: "CSRMatrix") -> "SellMatrix":
        return SellMatrix.from_csr_host(
            np.asarray(csr.data),
            np.asarray(csr.indices),
            np.asarray(csr.indptr),
            csr.shape,
        )

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.diag.dtype

    def matvec(self, x: jax.Array) -> jax.Array:
        from .ops.spmv import sell_spmv

        return sell_spmv(self, x)

    def diagonal(self) -> jax.Array:
        return self.diag

    def to_dense(self) -> jax.Array:
        n, ncols = self.shape
        out = jnp.zeros((n, ncols), dtype=self.dtype)
        out = out.at[jnp.arange(n), jnp.arange(n)].add(self.diag)
        row_perm = jnp.argsort(self.pos)
        start, base = 0, 0
        for nb, k in self.bucket_meta:
            if k == 0:
                start += nb
                continue
            cb = self.cols_flat[base : base + nb * k]
            vb = self.vals_flat[base : base + nb * k]
            rows = jnp.repeat(row_perm[start : start + nb], k)
            # padding slots carry val 0 — the scatter-add of 0 is harmless
            out = out.at[rows, cb].add(vb)
            start += nb
            base += nb * k
        return out

    def memory_footprint(self) -> int:
        return (
            self.diag.size * self.diag.dtype.itemsize
            + self.pos.size * self.pos.dtype.itemsize
            + self.cols_flat.size * self.cols_flat.dtype.itemsize
            + self.vals_flat.size * self.vals_flat.dtype.itemsize
        )

    def padding_ratio(self) -> float:
        """Stored slots / true nnz — the bandwidth overhead of the layout."""
        slots = self.diag.size + int(self.vals_flat.size)
        return float(slots) / max(self.nnz, 1)

    def astype(self, dtype) -> "SellMatrix":
        return dataclasses.replace(
            self,
            diag=self.diag.astype(dtype),
            vals_flat=self.vals_flat.astype(dtype),
        )


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
        from .ops.spmv import dense_spmv

        return dense_spmv(self.a, x)

    def diagonal(self):
        return jnp.diagonal(self.a)

    def memory_footprint(self) -> int:
        return self.a.size * self.a.dtype.itemsize

    def astype(self, dtype) -> "DenseOperator":
        return DenseOperator(self.a.astype(dtype))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StencilOperator(LinearOperator):
    """Matrix-free 3-D 7-point stencil (north-star config 4).

    ``y = center * x + off * (sum of 6 axis neighbors)`` on a ``grid_shape``
    box with homogeneous Dirichlet (zero) boundaries.  For the standard
    Poisson operator use ``center=6, off=-1`` (SPD).  The reference has no
    matrix-free path; this is the extension mandated by BASELINE.json.
    Vectors are flat ``(nx*ny*nz,)``; ``matvec`` reshapes internally.
    """

    center: jax.Array  # scalar
    off: jax.Array  # scalar
    grid_shape: Tuple[int, int, int]

    def tree_flatten(self):
        return (self.center, self.off), self.grid_shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @staticmethod
    def poisson(grid_shape: Tuple[int, int, int], dtype=jnp.float32) -> "StencilOperator":
        return StencilOperator(
            jnp.asarray(6.0, dtype=dtype), jnp.asarray(-1.0, dtype=dtype), tuple(grid_shape)
        )

    @property
    def shape(self):
        n = int(np.prod(self.grid_shape))
        return (n, n)

    @property
    def dtype(self):
        return self.center.dtype

    @property
    def nnz(self) -> int:
        """LOGICAL nonzero count of the never-formed matrix: 7 per interior
        point, minus the Dirichlet-truncated couplings on each face."""
        nx, ny, nz = self.grid_shape
        n = nx * ny * nz
        return 7 * n - 2 * (ny * nz + nx * nz + nx * ny)

    def matvec(self, x: jax.Array) -> jax.Array:
        from .ops.stencil import stencil7_matvec

        return stencil7_matvec(self, x)

    def diagonal(self) -> jax.Array:
        n = int(np.prod(self.grid_shape))
        return jnp.full((n,), self.center, dtype=self.dtype)

    def astype(self, dtype) -> "StencilOperator":
        return StencilOperator(
            self.center.astype(dtype), self.off.astype(dtype), self.grid_shape
        )


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
