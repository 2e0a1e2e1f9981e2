"""Host-side operator partitioners for the row-sharded mesh solvers.

Each partitioner splits one host-side layout into shape-homogeneous
per-shard pieces (an SPMD requirement) stacked on a leading shard axis.
They run once at ingest; the sharded front-ends in ``sharded_cg.py``
consume their outputs.  See that module's docstring for the
parallelization contract (SURVEY §2.4 / §5).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..types import BlockedEllMatrix


def make_row_mesh(devices=None, axis: str = "rows") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def _cdiv(a, b):
    return -(-a // b)


def partition_csr_rows(
    data: np.ndarray,
    indices: np.ndarray,
    indptr: np.ndarray,
    shape: Tuple[int, int],
    n_shards: int,
    bm: int = 128,
    bn: int = 128,
):
    """Split host CSR into per-shard blocked-ELL row blocks.

    Every shard gets the same number of padded row-blocks and the same kmax
    (global maximum) so shards are shape-homogeneous — a requirement for
    SPMD.  Column-block indices stay GLOBAL; the SpMV gathers from the
    all-gathered p.  Returns (blocks, block_cols) stacked on a leading shard
    axis plus the padded global n.
    """
    n, ncols = shape
    rows_per_shard = _cdiv(_cdiv(n, n_shards), bm) * bm
    n_padded = rows_per_shard * n_shards

    indptr = np.asarray(indptr, dtype=np.int64)
    shard_bells = []
    for s in range(n_shards):
        r0 = min(s * rows_per_shard, n)
        r1 = min((s + 1) * rows_per_shard, n)
        lo, hi = indptr[r0], indptr[r1]
        sub_indptr = np.concatenate(
            [
                indptr[r0 : r1 + 1] - lo,
                np.full(rows_per_shard - (r1 - r0), indptr[r1] - lo, dtype=np.int64),
            ]
        )
        bell = BlockedEllMatrix.from_csr_host(
            np.asarray(data)[lo:hi],
            np.asarray(indices)[lo:hi],
            sub_indptr,
            (rows_per_shard, ncols),
            bm=bm,
            bn=bn,
        )
        shard_bells.append(bell)

    kmax = max(b.kmax for b in shard_bells)
    nrb = max(b.blocks.shape[0] for b in shard_bells)
    blocks = np.zeros(
        (n_shards, nrb, kmax, bm, bn), dtype=np.asarray(shard_bells[0].blocks).dtype
    )
    block_cols = np.zeros((n_shards, nrb, kmax), dtype=np.int32)
    for s, b in enumerate(shard_bells):
        bb = np.asarray(b.blocks)
        bc = np.asarray(b.block_cols)
        blocks[s, : bb.shape[0], : bb.shape[1]] = bb
        block_cols[s, : bc.shape[0], : bc.shape[1]] = bc
    return blocks, block_cols, n_padded


def partition_sell_rows(
    data: np.ndarray,
    indices: np.ndarray,
    indptr: np.ndarray,
    shape: Tuple[int, int],
    n_shards: int,
):
    """Split host CSR into shape-homogeneous per-shard SELL row blocks.

    The single-device answer to scattered patterns (``SellMatrix``: pay the
    ~8 ns random-access floor once per nonzero instead of CSR's twice)
    extended to the row-sharded mesh: every shard stores its rows'
    off-diagonal entries in degree-bucketed slabs with GLOBAL column
    indices, and the sharded matvec is one flat gather from the all-gathered
    p.  The blocked-ELL partitioner pays tile padding ∝ the scattered
    column footprint (catastrophic on power-law patterns — the same blowup
    ``choose_layout`` flees on one device); this one stores exactly the
    true nonzeros plus ≤50% bucket padding.

    SPMD needs shape-homogeneous shards, so every shard shares ONE bucket
    ladder and per-bucket row counts maxed over shards (virtual padding
    rows own all-zero slab space that ``pos`` never references).

    Returns ``(diag (S, m), pos (S, m), cols_flat (S, T), vals_flat (S, T),
    bucket_meta, n_padded)`` — feed to :func:`~.sharded_cg.sharded_sell_cg_solve`.
    """
    from ..types import _sell_pack_rows

    # one packer shared with SellMatrix.from_csr_host (its n_shards=1 case)
    # so bucket/slab conventions cannot drift between the two
    return _sell_pack_rows(data, indices, indptr, shape, n_shards)


def partition_symbell_rows(
    data: np.ndarray,
    indices: np.ndarray,
    indptr: np.ndarray,
    shape: Tuple[int, int],
    n_shards: int,
    bn: int = 128,
):
    """Split host CSR into per-shard SYMMETRIC blocked-ELL row blocks.

    The symmetric layout stores each off-diagonal tile once and applies it
    as B and Bᵀ (types.SymBellMatrix) — on the mesh, the Bᵀ scatter must
    stay shard-local, so tiles split by ownership:

    * **intra-shard** tiles (both block-row and block-col inside the
      shard's row range) keep symmetric storage — their mirror lands in
      the shard's own q rows;
    * **cross-shard** tiles are stored FULLY on the row-owning shard (both
      (r,c) and its mirror (c,r), exactly like the full layout) so every
      shard computes its q rows completely locally against the
      all-gathered p — zero new collectives.  They cluster in the shard's
      boundary block-rows (on banded matrices: exactly two rows per
      shard), so they pack COMPACTLY: only rows that own a cross tile get
      slots, addressed by an explicit local row-index array — a slot per
      row-block (the naive layout) would cost the same as one extra kmax
      and erase the symmetric saving on tridiagonal bands.

    Returns ``(diag (S,nrb,bn,bn), off (S,nrb,ku,bn,bn), off_cols (S,nrb,ku)
    LOCAL block ids, cross (S,nxr,kx,bn,bn), cross_rows (S,nxr) LOCAL block
    ids, cross_cols (S,nxr,kx) GLOBAL block ids, n_padded)`` — feed to
    :func:`~.sharded_cg.sharded_symbell_cg_solve`.
    """
    from ..types import SymBellMatrix

    n, ncols = shape
    rows_per_shard = _cdiv(_cdiv(n, n_shards), bn) * bn
    n_padded = rows_per_shard * n_shards

    data = np.asarray(data)
    indices = np.asarray(indices, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)

    syms, crosses = [], []
    for s in range(n_shards):
        r0 = min(s * rows_per_shard, n)
        r1 = min((s + 1) * rows_per_shard, n)
        lo, hi = indptr[r0], indptr[r1]
        rows_l = (
            np.repeat(np.arange(r0, r1), np.diff(indptr[r0 : r1 + 1])) - r0
        )
        cols_g = indices[lo:hi]
        vals = data[lo:hi]
        base = s * rows_per_shard
        intra = (cols_g >= base) & (cols_g < base + rows_per_shard)

        def _sub_csr(rows_sub, cols_sub, vals_sub, sub_shape):
            counts = np.bincount(rows_sub, minlength=sub_shape[0])
            sub_indptr = np.concatenate(
                [[0], np.cumsum(counts)]
            ).astype(np.int64)
            order = np.lexsort((cols_sub, rows_sub))
            return vals_sub[order], cols_sub[order], sub_indptr

        v_i, c_i, p_i = _sub_csr(
            rows_l[intra], cols_g[intra] - base, vals[intra],
            (rows_per_shard, rows_per_shard),
        )
        bell_i = BlockedEllMatrix.from_csr_host(
            v_i, c_i, p_i, (rows_per_shard, rows_per_shard), bm=bn, bn=bn
        )
        # the intra block of a symmetric matrix is symmetric by
        # construction; skip the O(tiles) re-verify
        syms.append(SymBellMatrix.from_bell(bell_i, check=False))

        v_x, c_x, p_x = _sub_csr(
            rows_l[~intra], cols_g[~intra], vals[~intra],
            (rows_per_shard, ncols),
        )
        bell_x = BlockedEllMatrix.from_csr_host(
            v_x, c_x, p_x, (rows_per_shard, ncols), bm=bn, bn=bn
        )
        # compact to the rows that actually own a cross tile
        xb = np.asarray(bell_x.blocks)
        xc = np.asarray(bell_x.block_cols)
        nonzero_rows = np.nonzero(
            np.abs(xb).sum(axis=(1, 2, 3)) > 0
        )[0].astype(np.int32)
        crosses.append((xb[nonzero_rows], xc[nonzero_rows], nonzero_rows))

    nrb = rows_per_shard // bn
    ku = max(sy.ku for sy in syms)
    nxr = max(max(len(r) for _, _, r in crosses), 1)
    kx = max(max((b.shape[1] for b, _, _ in crosses if b.size), default=1), 1)
    dt = np.asarray(syms[0].diag_blocks).dtype
    diag = np.zeros((n_shards, nrb, bn, bn), dtype=dt)
    off = np.zeros((n_shards, nrb, ku, bn, bn), dtype=dt)
    # local padding slots point at their own (local) row with zero tiles
    off_cols = np.tile(
        np.arange(nrb, dtype=np.int32)[None, :, None], (n_shards, 1, ku)
    )
    cross = np.zeros((n_shards, nxr, kx, bn, bn), dtype=dt)
    cross_rows = np.zeros((n_shards, nxr), dtype=np.int32)
    cross_cols = np.zeros((n_shards, nxr, kx), dtype=np.int32)
    for s, (sy, (xb, xc, xr)) in enumerate(zip(syms, crosses)):
        diag[s] = np.asarray(sy.diag_blocks)
        off[s, :, : sy.ku] = np.asarray(sy.off_blocks)
        off_cols[s, :, : sy.ku] = np.asarray(sy.off_cols)
        if len(xr):
            cross[s, : len(xr), : xb.shape[1]] = xb
            cross_rows[s, : len(xr)] = xr
            cross_cols[s, : len(xr), : xb.shape[1]] = xc
    return diag, off, off_cols, cross, cross_rows, cross_cols, n_padded


def make_mesh_2d(p: int, devices=None,
                 axes: Tuple[str, str] = ("rp", "cp")) -> Mesh:
    """A p×p 2-D device mesh (the 2-D block decomposition's substrate)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size < p * p:
        raise ValueError(f"need {p * p} devices for a {p}x{p} mesh, "
                         f"have {devices.size}")
    return Mesh(devices.reshape(-1)[: p * p].reshape(p, p), axes)


def partition_csr_blocks_2d(
    data: np.ndarray,
    indices: np.ndarray,
    indptr: np.ndarray,
    shape: Tuple[int, int],
    p: int,
    bm: int = 128,
    bn: int = 128,
):
    """Split host CSR into a p×p grid of blocked-ELL blocks (2-D
    decomposition): device (i, j) owns rows [i·S, (i+1)·S) × cols
    [j·S, (j+1)·S) with LOCAL column indices.

    The 2-D SpMV replaces the 1-D scheme's all_gather of the whole
    operand (n bytes into every device) with a mesh TRANSPOSE ppermute
    (n/p bytes) plus a psum of the partial products over the column axis
    (n/p bytes) — per-device collective bytes drop from n to 2n/p, the
    classic 2-D sparse decomposition (the scaling-book shape for
    matrices whose column footprint spans every shard, where no ring
    halo exists).  Use the 1-D ring (DIA) for banded operators instead;
    kmax here is homogenized over ALL p² blocks, so banded patterns pay
    empty-block padding.

    Returns ``(blocks (p, p, nrb, kmax, bm, bn), block_cols (p, p, nrb,
    kmax) LOCAL, n_padded)`` — feed to
    :func:`~.sharded_cg.sharded_cg_solve_2d`.
    """
    n, ncols = shape
    if n != ncols:
        raise ValueError(f"2-D decomposition needs a square system, got {shape}")
    if bm != bn:
        raise ValueError("2-D decomposition needs square tiles (stripes "
                         "serve as both row and column ranges)")
    stripe = _cdiv(_cdiv(n, p), bm) * bm
    n_padded = stripe * p

    data = np.asarray(data)
    indices = np.asarray(indices, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)

    bells = []
    for i in range(p):
        r0 = min(i * stripe, n)
        r1 = min((i + 1) * stripe, n)
        lo, hi = indptr[r0], indptr[r1]
        rows_l = (
            np.repeat(np.arange(r0, r1), np.diff(indptr[r0 : r1 + 1])) - r0
        )
        cols_g = indices[lo:hi]
        vals = data[lo:hi]
        row_of = []
        for j in range(p):
            c0 = j * stripe
            sel = (cols_g >= c0) & (cols_g < c0 + stripe)
            rows_s, cols_s, vals_s = rows_l[sel], cols_g[sel] - c0, vals[sel]
            counts = np.bincount(rows_s, minlength=stripe)
            sub_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(
                np.int64
            )
            order = np.lexsort((cols_s, rows_s))
            row_of.append(
                BlockedEllMatrix.from_csr_host(
                    vals_s[order], cols_s[order], sub_indptr,
                    (stripe, stripe), bm=bm, bn=bn,
                )
            )
        bells.append(row_of)

    nrb = stripe // bm
    kmax = max(b.kmax for row in bells for b in row)
    dt = np.asarray(bells[0][0].blocks).dtype
    blocks = np.zeros((p, p, nrb, kmax, bm, bn), dtype=dt)
    block_cols = np.zeros((p, p, nrb, kmax), dtype=np.int32)
    for i in range(p):
        for j in range(p):
            bb = np.asarray(bells[i][j].blocks)
            bc = np.asarray(bells[i][j].block_cols)
            blocks[i, j, :, : bb.shape[1]] = bb
            block_cols[i, j, :, : bc.shape[1]] = bc
    return blocks, block_cols, n_padded


def partition_dia_rows(
    diags: np.ndarray,
    shape: Tuple[int, int],
    n_shards: int,
):
    """Split DIA diagonals into equal row shards.

    Returns ``(diags_sharded (n_shards, ndiag, rows_per_shard), n_padded)``.
    Padding rows carry zero diagonal slots, so they stay inert.
    """
    ndiag, n_stored = np.asarray(diags).shape
    n = shape[0]
    rows_per_shard = _cdiv(n, n_shards)
    n_padded = rows_per_shard * n_shards
    dp = np.zeros((ndiag, n_padded), dtype=np.asarray(diags).dtype)
    dp[:, :n_stored] = np.asarray(diags)
    out = dp.reshape(ndiag, n_shards, rows_per_shard).transpose(1, 0, 2)
    return np.ascontiguousarray(out), n_padded
