"""Blocked-ELL layouts — the TPU-fast dense-tile containers (full and
symmetric upper-triangle storage)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import LinearOperator, _cdiv

from .csr import CSRMatrix


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
            from ..io import native as _native

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
        from ..ops.spmv import bell_spmv

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
        from ..ops.spmv import sym_bell_spmv

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
