"""SELL (sliced-ELL, degree-bucketed) layout — the irregular/power-law
pattern container (gather-bound SpMV at the scalar-access floor)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import LinearOperator, _cdiv

from .csr import CSRMatrix


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
        from ..ops.spmv import sell_spmv

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
