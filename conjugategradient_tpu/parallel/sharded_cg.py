"""Row-sharded multi-chip CG (north-star config 5; absent in the reference —
SURVEY §2.4 documents that the reference is strictly single-device).

Parallelization contract (SURVEY §2.4 / §5):

* 1-D device mesh over axis "rows"; each chip owns a contiguous block of rows
  of A and the matching shards of x/b/r/p;
* per iteration, the SpMV's remote-column reads are satisfied either by an
  ``all_gather`` of p over ICI (blocked-ELL operators, and SELL operators
  for scattered patterns — column footprint may span all shards) or by a
  ring ``ppermute`` halo exchange (DIA/banded operators — only ±bandwidth
  neighbor elements are remote);
* the two dot products reduce with ``psum`` over ICI;
* the whole while_loop runs inside one ``shard_map``-ed jit: collectives are
  compiled into the loop body, zero host involvement — strictly better than
  the reference's per-iteration host sync (CG.hpp:425).

Numerical semantics match solver/cg.py (and therefore the float64 oracle):
recurrence residual, Hestenes–Stiefel α/β, pre-update termination test on
‖r‖², N+1-style cap, optional Jacobi preconditioning.
"""

from __future__ import annotations

import functools

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..solver.cg import CGInfo
from ..solver.restart import while_with_periodic_restart
from ..solver.sstep import _default_rcond as _sstep_default_rcond
from ..solver.sstep import make_sstep_loop
from ..types import BlockedEllMatrix


def make_row_mesh(devices=None, axis: str = "rows") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# partitioners (host-side, once at ingest)
# ---------------------------------------------------------------------------


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
    bucket_meta, n_padded)`` — feed to :func:`sharded_sell_cg_solve`.
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
    :func:`sharded_symbell_cg_solve`.
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


def _local_symbell_matvec(diag_s, off_s, offcols_s, cross_s, crossrows_s,
                          crosscols_s, p_full_2d, base_block):
    """Per-shard symmetric blocked-ELL SpMV against the gathered operand.

    Intra-shard tiles apply twice (B along storage, Bᵀ via a shard-LOCAL
    block-granular scatter-add); the compact cross-shard tiles apply once
    against the global gathered p, scattered into their owning rows.
    Accumulation promotes with the operand dtype like the single-device
    path (ops/spmv.sym_bell_spmv).
    """
    nrb, bn = diag_s.shape[0], diag_s.shape[-1]
    acc = jnp.promote_types(
        jnp.promote_types(diag_s.dtype, p_full_2d.dtype), jnp.float32
    )
    out_dtype = jnp.promote_types(diag_s.dtype, p_full_2d.dtype)
    local = jax.lax.dynamic_slice_in_dim(p_full_2d, base_block, nrb)
    kw = dict(preferred_element_type=acc,
              precision=jax.lax.Precision.HIGHEST)
    qd = jnp.einsum("rmn,rn->rm", diag_s, local, **kw)
    qu = jnp.einsum("rkmn,rkn->rm", off_s, local[offcols_s], **kw)
    v = jnp.einsum("rkmn,rm->rkn", off_s, local, **kw)
    qt = jnp.zeros((nrb, bn), acc).at[offcols_s.reshape(-1)].add(
        v.reshape(-1, bn)
    )
    qx = jnp.einsum("rkmn,rkn->rm", cross_s, p_full_2d[crosscols_s], **kw)
    q = qd + qu + qt
    q = q.at[crossrows_s].add(qx)
    return q.reshape(-1).astype(out_dtype)


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
    kmax) LOCAL, n_padded)`` — feed to :func:`sharded_cg_solve_2d`.
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


# ---------------------------------------------------------------------------
# local matvecs (run inside shard_map; may use collectives)
# ---------------------------------------------------------------------------


def _local_bell_matvec(blocks, block_cols, p_full_2d):
    """Local row-block SpMV against the gathered operand.

    Accumulation promotes with the operand dtype like the single-device
    einsum path (ops/spmv._bell_spmv_jnp) so sharded f64 runs keep oracle
    parity.
    """
    gathered = p_full_2d[block_cols]  # (nrb, kmax, bn)
    acc = jnp.promote_types(
        jnp.promote_types(blocks.dtype, p_full_2d.dtype), jnp.float32
    )
    y = jnp.einsum(
        "rkmn,rkn->rm",
        blocks,
        gathered,
        preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(-1).astype(jnp.promote_types(blocks.dtype, p_full_2d.dtype))


def ring_halo(p_local: jax.Array, w: int, axis: str) -> jax.Array:
    """Halo-extend a row shard by ``w`` elements from each ring neighbor.

    Returns ``concat([left_tail, p_local, right_head])`` of length m + 2w,
    where the edge shards receive zeros (ppermute semantics) — exactly the
    Dirichlet-style zero padding the DIA layout expects.  Two ppermutes over
    ICI, O(w) bytes each, versus O(n) for an all_gather.
    """
    if w > p_local.shape[0]:
        raise ValueError(
            f"halo width {w} exceeds the local shard length "
            f"{p_local.shape[0]}; a one-hop ring cannot supply it"
        )
    ns = jax.lax.axis_size(axis)
    # receive the left neighbor's tail: shard i-1 sends to i
    left = jax.lax.ppermute(
        p_local[-w:], axis, [(i, i + 1) for i in range(ns - 1)]
    )
    # receive the right neighbor's head: shard i+1 sends to i
    right = jax.lax.ppermute(
        p_local[:w], axis, [(i + 1, i) for i in range(ns - 1)]
    )
    return jnp.concatenate([left, p_local, right])


def _local_dia_matvec(diags_s, offsets, p_local, axis):
    """Banded SpMV on one row shard with ring-halo'd operand."""
    m = p_local.shape[0]
    w = max(max(abs(o) for o in offsets), 1)
    window = ring_halo(p_local, w, axis)  # (m + 2w,)
    acc = jnp.promote_types(
        jnp.promote_types(diags_s.dtype, p_local.dtype), jnp.float32
    )
    y = jnp.zeros((m,), dtype=acc)
    for d, off in enumerate(offsets):
        lo = off + w
        y = y + diags_s[d].astype(acc) * jax.lax.slice(
            window, (lo,), (lo + m,)
        ).astype(acc)
    return y.astype(jnp.promote_types(diags_s.dtype, p_local.dtype))


def _symdia_left_halo(diags_s, w: int, axis: str) -> jax.Array:
    """Left-neighbor tails of every stored diagonal ((ndiag, w); shard 0
    receives zeros) — loop-invariant, fetched ONCE per solve: the
    symmetric mirror term needs the NEIGHBOR's diagonal values, not just
    its vector entries."""
    ns = jax.lax.axis_size(axis)
    return jax.lax.ppermute(
        diags_s[:, -w:], axis, [(i, i + 1) for i in range(ns - 1)]
    )


def _local_symdia_matvec(diags_s, dleft, offsets, p_local, axis):
    """Symmetric-DIA SpMV on one row shard: the stored (≥0-offset) half
    band applied both ways.  Forward terms ride the usual ring halo of p;
    mirror terms ``y[i] += d[i−k]·x[i−k]`` additionally need the LEFT
    w values of each diagonal — supplied once per solve by
    :func:`_symdia_left_halo` (``dleft``).  Per iteration this costs
    exactly the full layout's collectives (one ring halo = 2 ppermutes)
    on half the operator bytes."""
    m = p_local.shape[0]
    w = max(max(offsets), 1) if offsets else 1
    window = ring_halo(p_local, w, axis)  # (m + 2w,)
    acc = jnp.promote_types(
        jnp.promote_types(diags_s.dtype, p_local.dtype), jnp.float32
    )
    xe = window[: w + m].astype(acc)  # left halo + local x
    y = jnp.zeros((m,), dtype=acc)
    for d, off in enumerate(offsets):
        dv = diags_s[d].astype(acc)
        lo = off + w
        y = y + dv * jax.lax.slice(window, (lo,), (lo + m,)).astype(acc)
        if off > 0:
            de = jnp.concatenate([dleft[d].astype(acc), dv])  # (m + w,)
            t = de * xe
            y = y + jax.lax.slice(t, (w - off,), (w - off + m,))
    return y.astype(jnp.promote_types(diags_s.dtype, p_local.dtype))


def _make_dia_mpk_basis(diags_s, offsets, axis: str, s: int):
    """Matrix-powers-kernel basis for banded shards (the CA-CG companion of
    the s-step loop, after Demmel/Hoemmen): K = [r, Ar, …, Aˢr] computed
    from ONE ring halo of width s·w — 2 ppermutes per s-iteration block
    instead of the 2s a matvec-at-a-time basis pays.  The neighbor rows'
    diagonal VALUES are haloed once per solve (loop-invariant, width
    (s−1)·w), so each level-j product is a purely local banded apply on a
    window that shrinks by w per level.  Level-by-level arithmetic (same
    multiplies, same accumulation order, same per-level dtype cast) matches
    `_local_dia_matvec` chained s times, so results are bit-comparable.

    Returns None when s·w exceeds the shard length (a one-hop ring cannot
    supply the block halo) — callers fall back to the per-matvec basis.
    """
    m = int(diags_s.shape[1])
    w = max(max(abs(o) for o in offsets), 1)
    if s * w > m:
        return None
    H = (s - 1) * w
    # once-per-solve halo of the diagonal values: rows [-H, m+H) — zeros
    # past the global edges, which is exactly the band truncation there
    diags_ext = ring_halo(diags_s.T, H, axis).T if H else diags_s

    def basis(r_local, inv_nu):
        vdt = jnp.promote_types(diags_s.dtype, r_local.dtype)
        acc = jnp.promote_types(vdt, jnp.float32)
        cur = ring_halo(r_local, s * w, axis)  # rows [-sw, m+sw)
        rows = [r_local]
        for level in range(s, 0, -1):
            lh = (level - 1) * w  # output halo width
            mm = m + 2 * lh
            y = jnp.zeros((mm,), dtype=acc)
            for d, off in enumerate(offsets):
                dv = jax.lax.slice(
                    diags_ext, (d, H - lh), (d + 1, H - lh + mm)
                )[0]
                xv = jax.lax.slice(cur, (off + w,), (off + w + mm,))
                y = y + dv.astype(acc) * xv.astype(acc)
            # ν-scale per level (solver/sstep.py's scaled monomial basis),
            # then the per-matvec cast the chained form pays
            cur = (y * inv_nu.astype(acc)).astype(vdt)
            rows.append(jax.lax.slice(cur, (lh,), (lh + m,)))
        return jnp.stack(rows, axis=0)

    return basis


def _local_sell_matvec(diag_s, pos_s, cols_s, vals_s, meta, p_local, axis):
    """Bucketed-ELL SpMV on one row shard against the all-gathered operand.

    Mirrors ops/spmv.sell_spmv: one flat gather over every stored slot
    (GLOBAL column ids into the gathered p), vectorized per-bucket k-axis
    reductions, diagonal applied to the LOCAL slice as a plain stream.
    """
    from ..ops.spmv import sell_bucket_reduce

    p_full = jax.lax.all_gather(p_local, axis, tiled=True)
    acc = jnp.promote_types(
        jnp.promote_types(vals_s.dtype, p_local.dtype), jnp.float32
    )
    prods = vals_s.astype(acc) * p_full[cols_s].astype(acc)
    y_sorted = sell_bucket_reduce(prods, meta)
    y = diag_s.astype(acc) * p_local.astype(acc) + y_sorted[pos_s]
    return y.astype(jnp.promote_types(vals_s.dtype, p_local.dtype))


def _local_bell_matvec_multi(blocks, block_cols, p_full_3d):
    """Multi-RHS local row-block SpMV against the gathered (ncb, bn, R)
    operand: the tile stream is read ONCE for all R lanes and the products
    are (bm, bn)×(bn, R) MXU matmuls — ops/spmv.bell_spmv_multi's
    amortization under shard_map."""
    gathered = p_full_3d[block_cols]  # (nrb, kmax, bn, R)
    acc = jnp.promote_types(
        jnp.promote_types(blocks.dtype, p_full_3d.dtype), jnp.float32
    )
    y = jnp.einsum(
        "rkmn,rknB->rmB",
        blocks,
        gathered,
        preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.promote_types(blocks.dtype, p_full_3d.dtype)
    return y.reshape(-1, y.shape[-1]).astype(out)


# ---------------------------------------------------------------------------
# the sharded PCG loop (shared by the operator front-ends)
# ---------------------------------------------------------------------------


def _sharded_lockstep_pcg(
    local_matvec_multi: Callable[[jax.Array], jax.Array],
    B_s: jax.Array,  # (R, m) — this shard's slice of every lane
    X0_s: jax.Array,
    inv_diag_s: Optional[jax.Array],  # (m,) or None
    tol_arr: jax.Array,  # scalar or (R,)
    maxiter: int,
    axis: str,
    recompute_r_every: int = 0,
):
    """Multi-RHS lockstep (P)CG per shard: the sharded composition of
    solver/batched.py's lane-masked loop — per-lane α/β/termination, psum'd
    (R,) lane dots, finished lanes frozen.  Per-lane semantics identical to
    the single-device lockstep loop (including per-lane residual-replacement
    restarts: only lanes that executed this body restart, so frozen lanes
    keep their converged state exactly)."""

    def pdot(U, V):
        acc = jnp.promote_types(U.dtype, jnp.float32)
        return jax.lax.psum(
            jnp.sum(U.astype(acc) * V.astype(acc), axis=0), axis
        )  # (R,)

    def precond(Rv):
        return Rv if inv_diag_s is None else inv_diag_s[:, None] * Rv

    Bt = B_s.T  # (m, R)
    X = X0_s.T
    R = Bt.shape[1]

    r0 = Bt - local_matvec_multi(X)
    z0 = precond(r0)
    rnorm0 = pdot(r0, r0)
    rho0 = rnorm0 if inv_diag_s is None else pdot(r0, z0)
    hist = jnp.full((maxiter + 1, R), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    carry = (
        jnp.zeros((R,), jnp.int32),
        jnp.zeros((R,), bool),
        X,
        r0,
        z0,  # p
        rho0,
        rnorm0,
        hist,
    )

    def body(c):
        k, done, X, Rv, P, rho, rnorm, hist = c
        active = (~done) & (k < maxiter)
        Q = local_matvec_multi(P)
        pap = pdot(P, Q)
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        am = jnp.where(active, alpha, 0)
        X = X + am * P
        Rv = Rv - am * Q
        done_new = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        Z = precond(Rv)
        rnorm_next = pdot(Rv, Rv)
        rho_next = rnorm_next if inv_diag_s is None else pdot(Rv, Z)
        beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, rho))
        P = jnp.where(active, Z + beta * P, P)
        k = jnp.where(active, k + 1, k)
        rho = jnp.where(active, rho_next, rho)
        rnorm = jnp.where(active, rnorm_next, rnorm)
        hist_col = jnp.where(
            active, rnorm_next, jnp.take_along_axis(hist, k[None, :], 0)[0]
        )
        hist = hist.at[k, jnp.arange(R)].set(hist_col)
        done = jnp.where(active, done_new, done)
        return (k, done, X, Rv, P, rho, rnorm, hist)

    def replace(c):
        # per-lane residual-replacement full restart; applied at while-loop
        # boundaries (solver/restart.py: a lax.cond in the hot body cost
        # ~40% of the iteration on TPU even when never taken).  Active
        # lanes advance k together, so the mask covers every still-active
        # lane at a restart boundary and nothing otherwise.  No `k < maxiter`
        # term (matches _pcg_replace_fn / cg.py / batched.py): a lane capping
        # exactly on a boundary still replaces, so the reported rnorm is the
        # true residual, not the drifted recurrence.
        k, done, X, Rv, P, rho, rnorm, hist = c
        restart = (~done) & (k % recompute_r_every == 0)
        Rt = Bt - local_matvec_multi(X)
        rnorm_t = pdot(Rt, Rt)
        Zt = precond(Rt)
        rho_t = rnorm_t if inv_diag_s is None else pdot(Rt, Zt)
        Rv = jnp.where(restart, Rt, Rv)
        P = jnp.where(restart, Zt, P)
        rho = jnp.where(restart, rho_t, rho)
        rnorm = jnp.where(restart, rnorm_t, rnorm)
        hist_col = jnp.where(
            restart, rnorm_t,
            jnp.take_along_axis(hist, k[None, :], 0)[0],
        )
        hist = hist.at[k, jnp.arange(R)].set(hist_col)
        return (k, done, X, Rv, P, rho, rnorm, hist)

    def cond(c):
        k, done = c[0], c[1]
        return jnp.any((~done) & (k < maxiter))

    k, done, X, Rv, P, rho, rnorm, hist = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda c: jnp.max(c[0]), carry
    )
    return X.T, k, done, rho, rnorm, hist.T


def _sharded_block_cg(
    local_matvec_multi: Callable[[jax.Array], jax.Array],
    B_s: jax.Array,  # (R, m) — this shard's slice of every lane
    X0_s: jax.Array,
    inv_diag_s: Optional[jax.Array],  # (m,) or None
    tol_arr: jax.Array,  # scalar or (R,)
    maxiter: int,
    axis: str,
    recompute_r_every: int = 0,
    rcond: float = 1e-10,
):
    """Block CG per shard (solver/blockcg.py's O'Leary recurrences under
    shard_map): the R×R Gram blocks psum over the mesh, every device runs
    the identical replicated eigh pseudo-solve, and the (m,R)×(R,R) update
    matmuls stay local.  Same collective count per iteration as the
    lockstep loop — two psums, (R,R) payload instead of (R,)."""
    from ..solver.blockcg import _spd_pinv_apply

    def pgram(U, V):  # psum'd (R, R) Gram block
        acc = jnp.promote_types(U.dtype, jnp.float32)
        return jax.lax.psum(
            jnp.einsum("mi,mj->ij", U.astype(acc), V.astype(acc),
                       precision=jax.lax.Precision.HIGHEST), axis
        )

    def pdot_diag(U):  # psum'd per-lane ‖·‖²
        acc = jnp.promote_types(U.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(U.astype(acc) ** 2, axis=0), axis)

    def precond(Rv):
        return Rv if inv_diag_s is None else inv_diag_s[:, None] * Rv

    hi = jax.lax.Precision.HIGHEST
    Bt = B_s.T  # (m, R)
    X = X0_s.T
    R = Bt.shape[1]

    r0 = Bt - local_matvec_multi(X)
    z0 = precond(r0)
    rnorm0 = pdot_diag(r0)
    rho0 = pgram(r0, z0 if inv_diag_s is not None else r0)
    hist = jnp.full((maxiter + 1, R), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    carry = (
        jnp.zeros((R,), jnp.int32),
        jnp.zeros((R,), bool),
        X,
        r0,
        z0,  # p
        rho0,
        rnorm0,
        hist,
    )

    def body(c):
        k, done, X, Rv, Pv, rho, rnorm, hist = c
        active = (~done) & (k < maxiter)
        Q = local_matvec_multi(Pv)
        W = pgram(Pv, Q)
        alpha = _spd_pinv_apply(W, rho, rcond)  # (R, R), replicated
        X = X + jnp.einsum("mi,ij->mj", Pv, alpha, precision=hi)
        Rv = Rv - jnp.einsum("mi,ij->mj", Q, alpha, precision=hi)
        done_new = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        Z = precond(Rv)
        rnorm_next = pdot_diag(Rv)
        rho_next = pgram(Rv, Z if inv_diag_s is not None else Rv)
        beta = _spd_pinv_apply(rho, rho_next, rcond)
        Pv = Z + jnp.einsum("mi,ij->mj", Pv, beta, precision=hi)
        k = jnp.where(active, k + 1, k)
        hist_col = jnp.where(
            active, rnorm_next, jnp.take_along_axis(hist, k[None, :], 0)[0]
        )
        hist = hist.at[k, jnp.arange(R)].set(hist_col)
        done = jnp.where(active, done_new, done)
        return (k, done, X, Rv, Pv, rho_next, rnorm_next, hist)

    def replace(c):
        # all-lane full restart (solver/blockcg.py semantics: the shared
        # space restarts as a block; only counters are per-lane).  Applied
        # at while-loop boundaries (solver/restart.py), masked by the
        # scalar `fire` so off-cadence boundaries are bit-identical no-ops.
        # No `k < maxiter` term here (matches _pcg_replace_fn): lanes capping
        # exactly on a boundary still replace and report the true residual.
        k, done, X, Rv, Pv, rho, rnorm, hist = c
        active = ~done
        fire = jnp.any(active) & (
            jnp.max(jnp.where(active, k, 0)) % recompute_r_every == 0
        )
        Rt = Bt - local_matvec_multi(X)
        Zt = precond(Rt)
        rnorm_t = pdot_diag(Rt)
        rho_t = pgram(Rt, Zt if inv_diag_s is not None else Rt)
        hist_col = jnp.where(
            fire & active, rnorm_t,
            jnp.take_along_axis(hist, k[None, :], 0)[0],
        )
        hist = hist.at[k, jnp.arange(R)].set(hist_col)
        return (
            k, done, X,
            jnp.where(fire, Rt, Rv),
            jnp.where(fire, Zt, Pv),
            jnp.where(fire, rho_t, rho),
            jnp.where(fire, rnorm_t, rnorm),
            hist,
        )

    def cond(c):
        k, done = c[0], c[1]
        return jnp.any((~done) & (k < maxiter))

    k, done, X, Rv, Pv, rho, rnorm, hist = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda c: jnp.max(c[0]), carry
    )
    return X.T, k, done, jnp.diagonal(rho), rnorm, hist.T


# Gram cutoff ladder: the one copy lives in solver/blockcg.py
_default_rcond = _sstep_default_rcond


def _batched_loop(method: str, recompute_r_every: int, rcond: float):
    """Select the inner multi-RHS loop for the sharded batched front-ends."""
    if method == "block":
        return functools.partial(
            _sharded_block_cg,
            recompute_r_every=recompute_r_every, rcond=rcond,
        )
    if method != "lockstep":
        raise ValueError(f"method must be 'lockstep' or 'block', got {method!r}")
    return functools.partial(
        _sharded_lockstep_pcg, recompute_r_every=recompute_r_every
    )


def _pcg_init_carry(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    inv_diag_s: Optional[jax.Array],
    maxiter: int,
    axis: str,
):
    """Initial per-shard PCG carry (k, done, x, r, p, rho, rnorm, hist)."""

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    r0 = b_s - local_matvec(x0_s)
    z0 = r0 if inv_diag_s is None else inv_diag_s * r0
    rnorm0 = pdot(r0, r0)
    rho0 = rnorm0 if inv_diag_s is None else pdot(r0, z0)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    return (
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        x0_s,
        r0,
        z0,
        rho0,
        rnorm0,
        hist,
    )


def _pcg_body_fn(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    inv_diag_s: Optional[jax.Array],
    tol_arr: jax.Array,
    axis: str,
):
    """One per-shard PCG iteration; shared by the one-shot solve and the
    checkpointable chunked driver so resumed solves are bit-identical.
    Restart logic lives in _pcg_replace_fn (solver/restart.py structure)."""

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def precond(r):
        return r if inv_diag_s is None else inv_diag_s * r

    def body(c):
        k, done, x, r, p, rho, rnorm, hist = c
        q = local_matvec(p)
        pap = pdot(p, q)
        # exact-convergence guard (see solver/cg.cg_step): rho == 0 would
        # otherwise poison x with 0/0 in the body that observes convergence
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        x = x + alpha * p
        r = r - alpha * q
        # termination tests the PRE-update residual (CG.hpp:401-402, SURVEY §2.3(5))
        done = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        z = precond(r)
        rnorm_next = pdot(r, r)
        rho_next = rnorm_next if inv_diag_s is None else pdot(r, z)
        beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, rho))
        p = z + beta * p
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        return (k, done, x, r, p, rho_next, rnorm_next, hist)

    return body


def _pcg_replace_fn(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    inv_diag_s: Optional[jax.Array],
    maxiter: int,
    axis: str,
    recompute_r_every: int,
):
    """Residual-replacement full restart for the per-shard loop: true
    residual AND direction reset — same semantics as solver/cg.py's
    single-device restart (a replaced r with the drifted p diverges; see
    cg.py).  The extra SpMV's all_gather/ring halo and the psum dot ride
    the same collectives as a normal iteration.  Applied at while-loop
    boundaries by solver/restart.py (a lax.cond in the hot body cost ~40%
    of the iteration on TPU even when never taken) and masked so chunk
    boundaries off the restart cadence are bit-identical no-ops."""

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def precond(r):
        return r if inv_diag_s is None else inv_diag_s * r

    def replace(c):
        k, done, x, r, p, rho, rnorm, hist = c
        # no `k < maxiter` term — capping on a boundary still replaces
        # the reported residual with the true one (solver/cg.py)
        mask = (~done) & (k % recompute_r_every == 0)
        r_true = b_s - local_matvec(x)
        rnorm_t = pdot(r_true, r_true)
        z_t = precond(r_true)
        rho_t = rnorm_t if inv_diag_s is None else pdot(r_true, z_t)
        hist = hist.at[k].set(jnp.where(mask, rnorm_t, hist[k]))
        return (
            k, done, x,
            jnp.where(mask, r_true, r),
            jnp.where(mask, z_t, p),
            jnp.where(mask, rho_t, rho),
            jnp.where(mask, rnorm_t, rnorm),
            hist,
        )

    return replace


def shard_deflation_basis(basis, n_padded: int, n_shards: int):
    """Row-shard a solver/deflated.DeflationBasis for the mesh loops.

    Returns ``(W_sh (S, m, k), AW_sh (S, m, k), E_chol (k, k))`` — the
    tall-skinny factors split like every other vector (zero-padded rows
    are inert through both applications), the k×k Cholesky factor
    replicated.
    """
    W = np.asarray(basis.W)
    AW = np.asarray(basis.AW)
    n, k = W.shape
    m = n_padded // n_shards
    Wp = np.zeros((n_padded, k), W.dtype)
    Wp[:n] = W
    AWp = np.zeros((n_padded, k), AW.dtype)
    AWp[:n] = AW
    return (
        Wp.reshape(n_shards, m, k),
        AWp.reshape(n_shards, m, k),
        jnp.asarray(basis.E_chol),
    )


def _sharded_deflated_pcg(
    local_matvec, b_s, x0_s, inv_diag_s, W_s, AW_s, E_chol,
    tol_arr, maxiter: int, axis: str,
):
    """Deflated (P)CG per shard — solver/deflated._deflated_core with the
    dots and the tall-skinny projector products psum'd over the mesh.

    Per iteration the deflation adds ONE extra (k,)-payload psum (the
    (AW)ᵀz product) on top of standard CG's two scalar rounds; the k×k
    triangular solve replicates.  Carries the same divergence guard and
    best-iterate return as the single-device loop (the projector's E⁻¹
    amplifies post-stagnation rounding noise exponentially).
    """
    from jax.scipy.linalg import cho_solve

    hi = jax.lax.Precision.HIGHEST

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def psum_vec(v):
        return jax.lax.psum(v, axis)

    def precond(r):
        return r if inv_diag_s is None else inv_diag_s * r

    def solve_E(y):
        return cho_solve((E_chol, True), y)

    def project(z):
        mu = solve_E(psum_vec(jnp.matmul(AW_s.T, z, precision=hi)))
        return z - jnp.matmul(W_s, mu, precision=hi)

    # Galerkin initial correction (Wᵀ r₀ = 0)
    r = b_s - local_matvec(x0_s)
    mu = solve_E(psum_vec(jnp.matmul(W_s.T, r, precision=hi)))
    x = x0_s + jnp.matmul(W_s, mu, precision=hi)
    r = r - jnp.matmul(AW_s, mu, precision=hi)

    z = precond(r)
    p = project(z)
    rnorm0 = pdot(r, r)
    rho0 = rnorm0 if inv_diag_s is None else pdot(r, z)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    carry = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
             x, r, p, rho0, rnorm0, hist, x, rnorm0, jnp.asarray(False))

    def cond(c):
        return (c[0] < maxiter) & (~c[1]) & (~c[10])

    def body(c):
        k, done, x, r, p, rho, rnorm, hist, x_best, rnorm_min, divg = c
        q = local_matvec(p)
        pap = pdot(p, q)
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        x = x + alpha * p
        r = r - alpha * q
        tol_met = jnp.sqrt(rnorm) <= tol_arr
        diverged = (rnorm > 1e6 * rnorm_min) & ~tol_met
        done = jnp.isnan(rnorm) | tol_met
        z = precond(r)
        rnorm_next = pdot(r, r)
        rho_next = rnorm_next if inv_diag_s is None else pdot(r, z)
        beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, rho))
        p = project(z) + beta * p
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        better = rnorm_next < rnorm_min
        x_best = jnp.where(better, x, x_best)
        rnorm_min = jnp.where(better, rnorm_next, rnorm_min)
        return (k, done, x, r, p, rho_next, rnorm_next, hist,
                x_best, rnorm_min, divg | diverged)

    (k, done, x, r, p, rho, rnorm, hist, x_best, rnorm_min,
     divg) = jax.lax.while_loop(cond, body, carry)
    use_best = rnorm_min < rnorm
    x = jnp.where(use_best, x_best, x)
    rnorm_out = jnp.where(use_best, rnorm_min, rnorm)
    # diverged exits report done=False downstream (converged=False)
    return x, k, done & ~divg, rho, rnorm_out, hist


def _sharded_pcg(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    inv_diag_s: Optional[jax.Array],
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    recompute_r_every: int = 0,
):
    """PCG body executed per shard; semantics mirror solver/cg.py exactly
    (including the optional residual-replacement full restart — the f32
    recurrence-drift fix matters MOST at the mesh scales this loop targets)."""
    carry = _pcg_init_carry(local_matvec, b_s, x0_s, inv_diag_s, maxiter, axis)
    body = _pcg_body_fn(local_matvec, b_s, inv_diag_s, tol_arr, axis)
    replace = _pcg_replace_fn(local_matvec, b_s, inv_diag_s, maxiter, axis,
                              recompute_r_every)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    k, done, x, r, p, rho, rnorm, hist = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda c: c[0], carry
    )
    return x, k, done, rho, rnorm, hist


def _sharded_fused_cg(
    blocks_s: jax.Array,
    cols_s: jax.Array,
    b_s: jax.Array,
    x0_s: jax.Array,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    bn: int,
    interpret: bool,
    inv_diag_s: Optional[jax.Array] = None,
):
    """Per-shard (P)CG loop built from the fused Pallas kernels: the local
    SpMV and the p·q partial run as one kernel
    (ops/pallas/fused_cg.bell_spmv_dot on the all-gathered operand), the x/r
    updates and the ‖r‖² (+ρ = r·M⁻¹r with Jacobi) partials as another
    (fused_update_dot / fused_update_dot_pcg); the partials psum over ICI.
    Same semantics as _sharded_pcg, f32.

    The direction update stays a fused XLA elementwise op: it must complete
    BEFORE the all_gather, so it cannot be folded into the SpMV kernel the
    way the single-chip path does (solver/fused.py)."""
    from ..ops.pallas.fused_cg import (
        bell_spmv_dot,
        fused_update_dot,
        fused_update_dot_pcg,
    )

    m = b_s.shape[0]
    offset = (jax.lax.axis_index(axis) * m).astype(jnp.int32).reshape(1)
    precond = inv_diag_s is not None
    d2 = (
        inv_diag_s.astype(jnp.float32).reshape(m // 128, 128)
        if precond
        else None
    )

    def matvec_dot(v_local2):
        v_full = jax.lax.all_gather(v_local2.reshape(-1), axis, tiled=True)
        q, pap_l = bell_spmv_dot(
            blocks_s, cols_s, v_full.reshape(-1, bn), offset,
            interpret=interpret,
        )
        return q.reshape(v_local2.shape), jax.lax.psum(pap_l[0, 0], axis)

    b2 = b_s.astype(jnp.float32).reshape(m // 128, 128)
    x2 = x0_s.astype(jnp.float32).reshape(m // 128, 128)
    ax0, _ = matvec_dot(x2)
    r2 = b2 - ax0
    rnorm0 = jax.lax.psum(jnp.sum(r2 * r2), axis)
    if precond:
        p0 = d2 * r2
        rho0 = jax.lax.psum(jnp.sum(r2 * p0), axis)
    else:
        p0, rho0 = r2, rnorm0
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)
    hist = hist.at[0].set(rnorm0)
    carry = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
             x2, r2, p0, rho0, rnorm0, hist)

    def body(c):
        k, done, x, r, p, rho, rnorm, hist = c
        q, pap = matvec_dot(p)
        exact = rho == 0
        alpha = jnp.where(exact, 0.0, rho / jnp.where(exact, 1.0, pap))
        a11 = alpha.reshape(1, 1).astype(jnp.float32)
        if precond:
            x, r, rnorm_l, rho_l = fused_update_dot_pcg(
                x, p, r, q, d2, a11, interpret=interpret,
            )
            rnorm_next = jax.lax.psum(rnorm_l[0, 0], axis)
            rho_next = jax.lax.psum(rho_l[0, 0], axis)
        else:
            x, r, rnorm_l = fused_update_dot(x, p, r, q, a11,
                                             interpret=interpret)
            rnorm_next = jax.lax.psum(rnorm_l[0, 0], axis)
            rho_next = rnorm_next
        # pre-update termination on ‖r_k‖² (CG.hpp:401-402)
        done = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        beta = jnp.where(exact, 0.0, rho_next / jnp.where(exact, 1.0, rho))
        z = d2 * r if precond else r
        p = z + beta * p
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        return (k, done, x, r, p, rho_next, rnorm_next, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    k, done, x, r, p, rho, rnorm, hist = jax.lax.while_loop(cond, body, carry)
    return x.reshape(-1), k, done, rho, rnorm, hist


def _sharded_pipelined_cg(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
):
    """Chronopoulos–Gear single-sync CG per shard: ONE psum (of the stacked
    [γ, δ] pair) per iteration instead of standard CG's two sequential
    reduction rounds — halves the collective latency on real meshes
    (solver/pipelined.py documents the recurrences and the rounding trade)."""
    acc = jnp.promote_types(b_s.dtype, jnp.float32)

    def local_pair(r, s):
        part = jnp.stack([
            jnp.sum(r.astype(acc) * r.astype(acc)),
            jnp.sum(r.astype(acc) * s.astype(acc)),
        ])
        return jax.lax.psum(part, axis)  # the iteration's ONLY collective sum

    r0 = b_s - local_matvec(x0_s)
    gamma0 = jax.lax.psum(jnp.sum(r0.astype(acc) * r0.astype(acc)), axis)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=gamma0.dtype)
    hist = hist.at[0].set(gamma0)
    zerov = jnp.zeros_like(r0)
    one = jnp.ones_like(gamma0)
    carry = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
             x0_s, r0, zerov, zerov, gamma0, one, gamma0, hist)

    def body(c):
        k, done, x, r, p, q, gamma_old, alpha_old, rnorm, hist = c
        s = local_matvec(r)
        pair = local_pair(r, s)
        gamma, delta = pair[0], pair[1]
        # γ IS the pre-update ‖r_k‖² — the same quantity the standard path
        # tests (SURVEY §2.3(5)); it falls out of the single reduction, so
        # termination and history need NO extra collective.
        hist = hist.at[k].set(gamma)
        done = jnp.isnan(gamma) | (jnp.sqrt(gamma) <= tol_arr)
        first = k == 0
        exact = gamma == 0
        beta = jnp.where(first | exact, 0.0, gamma / gamma_old)
        denom = jnp.where(first, delta, delta - beta * gamma / alpha_old)
        safe = jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(exact, 0.0, gamma / safe)
        alpha = jnp.where(denom == 0, jnp.nan * one, alpha)
        alpha = jnp.where(exact, 0.0, alpha)
        p = r + (beta * p).astype(r.dtype)
        q = s + (beta * q).astype(s.dtype)
        x = (x + alpha * p).astype(x.dtype)
        r = (r - alpha * q).astype(r.dtype)
        return (k + 1, done, x, r, p, q, gamma, alpha, gamma, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    k, done, x, r, p, q, gamma, alpha, rnorm, hist = jax.lax.while_loop(
        cond, body, carry
    )
    # one post-loop reduction records the final residual
    rnorm_final = jax.lax.psum(jnp.sum(r.astype(acc) * r.astype(acc)), axis)
    hist = hist.at[k].set(rnorm_final)
    return x, k, done, rnorm_final, rnorm_final, hist


def _sharded_sstep_cg(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    s: int,
    rcond: float,
    basis_fn=None,
):
    """s-step (communication-avoiding) CG per shard: ONE psum — of the
    (3s+1)² stacked Gram — per s iterations, versus standard CG's 2s
    sequential reduction rounds.  The SpMV/halo count per iteration is
    unchanged (s matvecs per block) unless ``basis_fn`` fuses it (the DIA
    matrix-powers kernel drops the halos to 2 ppermutes per block too);
    what drops is collective LATENCY, the binding constraint for
    small-per-shard solves on large meshes.  Algebra and rounding trade
    documented in solver/sstep.py."""
    x, k, done, rnorm, hist = make_sstep_loop(
        local_matvec,
        lambda G: jax.lax.psum(G, axis),
        b_s,
        x0_s,
        s=s,
        tol_arr=tol_arr,
        maxiter=maxiter,
        rcond=rcond,
        basis_fn=basis_fn,
    )
    return x, k, done, rnorm, rnorm, hist


def _fused_shards_supported(blocks, b, with_m: bool, interpret: bool) -> bool:
    # with_m no longer disqualifies: Jacobi-PCG rides fused_update_dot_pcg
    # (round-3; the kernels existed since round 2 but were never wired)
    del with_m
    n_shards, nrb, kmax, bm, bn = blocks.shape
    m = b.shape[0] // n_shards  # rows per shard
    ok = (
        bm == bn
        and bn % 128 == 0
        and m % 128 == 0
        and jnp.dtype(b.dtype) == jnp.dtype(jnp.float32)
        and kmax <= 64
        # the all-gathered operand must sit in VMEM next to the tile pipeline
        and b.shape[0] * 4 + 2 * 8 * kmax * bm * bn * 4 <= 64 * 1024 * 1024
    )
    if not ok:
        return False
    if interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# public solvers
# ---------------------------------------------------------------------------

# Compiled-solve cache: jax.jit keyed on a fresh closure would retrace every
# call, paying full XLA compilation of the collective while_loop per solve.
# Key on everything the closure bakes in; values are the jitted shard_map'd
# functions, reused across calls with the same configuration.  LRU-bounded so
# sweeps over distinct maxiter/tol values can't grow it without limit (each
# entry pins a compiled executable).
from collections import OrderedDict

_SOLVE_CACHE: "OrderedDict" = OrderedDict()
_SOLVE_CACHE_MAX = 32


def _cache_get(key):
    fn = _SOLVE_CACHE.get(key)
    if fn is not None:
        _SOLVE_CACHE.move_to_end(key)
    return fn


def _cache_put(key, fn):
    _SOLVE_CACHE[key] = fn
    _SOLVE_CACHE.move_to_end(key)
    while len(_SOLVE_CACHE) > _SOLVE_CACHE_MAX:
        _SOLVE_CACHE.popitem(last=False)


def _mesh_key(mesh: Mesh):
    return (tuple(int(d.id) for d in mesh.devices.flat), mesh.axis_names)


def _resolve_single_rhs_method(method, with_m, recompute_r_every, s, rcond, dtype):
    """Validate the single-RHS method triple and normalize the s-step
    hyperparameters: (s_eff, rcond_eff) are baked into the compiled solve
    (and its cache key), so non-sstep methods pin them to inert constants."""
    if method not in ("standard", "pipelined", "sstep"):
        raise ValueError(f"unknown method {method!r}")
    if method != "standard":
        if with_m:
            raise ValueError(
                f"method={method!r} is unpreconditioned (inv_diag=None)"
            )
        if recompute_r_every:
            raise ValueError(
                f"method={method!r} has no residual-replacement variant "
                "(recompute_r_every must be 0)"
            )
    if method != "sstep":
        return 0, 0.0
    s = int(s)
    if s < 1:
        raise ValueError(f"s must be >= 1, got {s}")
    return s, (_sstep_default_rcond(dtype) if rcond is None else float(rcond))


def sharded_cg_solve(
    blocks,
    block_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    ncols_padded: Optional[int] = None,
    use_fused: str = "auto",
    interpret: bool = False,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
    basis=None,
):
    """Row-sharded (P)CG over a 1-D mesh, blocked-ELL operator.

    Args:
      blocks: (n_shards, nrb, kmax, bm, bn) per-shard blocked-ELL tiles
        (from :func:`partition_csr_rows`).
      block_cols: (n_shards, nrb, kmax) global column-block ids.
      b: (n_padded,) global RHS (zero-padded rows beyond the true n).
      inv_diag: optional (n_padded,) 1/diag(A) for Jacobi PCG (zero-padded
        entries should be 1 to stay inert).
      mesh: 1-D device mesh (defaults to all devices).
      maxiter: iteration cap (static); None (default) means N_padded + 1.
      use_fused: "auto" runs each shard's iteration on the fused Pallas
        kernels (SpMV + p·q partial in one pass, x/r updates + ‖r‖² partial
        in another — the single-chip fast path's kernels, partials psum'd)
        when the operator qualifies on a TPU backend; "never"/"always"
        override.  Jacobi-PCG (``inv_diag``) rides the same kernels via
        fused_update_dot_pcg (the M⁻¹ apply folds into the update pass and
        the r·z reduction).  ``interpret`` runs those kernels in interpret
        mode (CPU testing).
      method: "standard" (Hestenes–Stiefel, two psum rounds/iteration),
        "pipelined" (Chronopoulos–Gear, ONE psum of the stacked [γ, δ]
        pair/iteration — halves collective latency; see solver/pipelined.py
        for the rounding trade), or "sstep" (communication-avoiding, ONE
        psum of a (3s+1)² Gram per ``s`` iterations — see solver/sstep.py
        for the algebra and the κ(A)ˢ rounding trade).  Both extensions are
        unpreconditioned.
      recompute_r_every: if > 0, replace the recurrence residual with the
        true residual AND reset the direction every that many iterations
        (full restart — solver/cg.py's residual-replacement semantics on the
        mesh).  Takes the XLA per-shard path (no fused variant, like the
        single-device dispatch) and excludes method="pipelined"/"sstep".
      s / rcond: s-step block size and Gram-pseudoinverse cutoff (None =
        dtype-adaptive); only read when method="sstep".
      basis: optional solver/deflated.DeflationBasis — runs the DEFLATED
        per-shard loop (directions A-orthogonal to the basis; one extra
        (k,)-payload psum per iteration for the projector).  Standard
        method only; excludes recompute_r_every and the fused path.

    Returns (x, CGInfo); x is row-sharded but exposed as a global jax.Array.
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert blocks.shape[0] == n_shards, (blocks.shape, n_shards)
    n_padded = int(b.shape[0])
    bn = int(blocks.shape[-1])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)

    x0 = jnp.zeros_like(b) if x0 is None else x0
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    s_eff, rcond_eff = _resolve_single_rhs_method(
        method, with_m, recompute_r_every, s, rcond, b.dtype
    )
    with_basis = basis is not None
    if with_basis and (method != "standard" or recompute_r_every):
        raise ValueError(
            "deflation (basis=) runs the standard per-shard loop "
            "(no method=pipelined/sstep, no recompute_r_every)"
        )
    if use_fused == "always" and with_basis:
        raise ValueError(
            "use_fused='always' has no deflated variant — the projector "
            "runs the per-shard XLA loop (basis=None to force fused)"
        )
    if use_fused == "always" and recompute_r_every:
        raise ValueError(
            "use_fused='always' has no residual-replacement variant — "
            "restarts run the per-shard XLA path (recompute_r_every=0 "
            "to force fused)"
        )
    fused = (
        method == "standard" and recompute_r_every == 0 and not with_basis
        and (
            use_fused == "always"
            or (use_fused == "auto"
                and _fused_shards_supported(blocks, b, with_m, interpret))
        )
    )

    key = ("bell", _mesh_key(mesh), axis, maxiter, float(tol), with_m, bn,
           str(b.dtype), fused, interpret, method, recompute_r_every,
           s_eff, rcond_eff,
           (basis.k if with_basis else 0))
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(blocks_s, cols_s, b_s, x0_s, *rest):
            blocks_s = blocks_s[0]
            cols_s = cols_s[0]
            i = 0
            inv_diag_s = None
            if with_m:
                inv_diag_s = rest[i]
                i += 1
            if with_basis:
                W_s, AW_s, E_chol_r = rest[i][0], rest[i + 1][0], rest[i + 2]

            if fused:
                return _sharded_fused_cg(
                    blocks_s, cols_s, b_s, x0_s,
                    tol_arr.astype(jnp.float32), maxiter, axis, bn, interpret,
                    inv_diag_s=inv_diag_s,
                )

            def local_matvec(v_local):
                v_full = jax.lax.all_gather(v_local, axis, tiled=True)
                return _local_bell_matvec(blocks_s, cols_s, v_full.reshape(-1, bn))

            if with_basis:
                return _sharded_deflated_pcg(
                    local_matvec, b_s, x0_s, inv_diag_s,
                    W_s, AW_s, E_chol_r, tol_arr, maxiter, axis,
                )

            if method == "pipelined":
                return _sharded_pipelined_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis
                )
            if method == "sstep":
                return _sharded_sstep_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis,
                    s_eff, rcond_eff,
                )

            return _sharded_pcg(
                local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter, axis,
                recompute_r_every=recompute_r_every,
            )

        in_specs = [P(axis)] * (5 if with_m else 4)
        if with_basis:
            in_specs += [P(axis), P(axis), P()]
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec=P(axis): jax.device_put(a, NamedSharding(mesh, spec))
    args = [put(blocks), put(block_cols), put(b), put(x0)]
    if with_m:
        args.append(put(inv_diag))
    if with_basis:
        W_sh, AW_sh, E_chol = shard_deflation_basis(
            basis, n_padded, n_shards
        )
        args += [put(jnp.asarray(W_sh)), put(jnp.asarray(AW_sh)),
                 put(E_chol, P())]

    x, k, done, rho, rnorm, hist = solve_jit(*args)
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info


def sharded_symbell_cg_solve(
    diag,
    off,
    off_cols,
    cross,
    cross_rows,
    cross_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    interpret: bool = False,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
    basis=None,
):
    """Row-sharded (P)CG on SYMMETRIC blocked-ELL storage.

    The flagship single-chip layout (types.SymBellMatrix — each
    off-diagonal tile stored once, 890-909 GB/s effective vs the 819 GB/s
    roofline) on the mesh: intra-shard tiles stay symmetric (their Bᵀ
    mirror scatters into the shard's own q rows), cross-shard tiles are
    stored fully on the row-owner (see :func:`partition_symbell_rows`), so
    the iteration keeps EXACTLY the full layout's collective pattern — one
    all_gather of p plus two psum dots (one for pipelined, one per s for
    sstep) — while streaming up to 2× fewer operator bytes per shard.

    Args mirror :func:`sharded_cg_solve` (including ``basis=`` for the
    deflated per-shard loop); the six operator arrays come from
    :func:`partition_symbell_rows`.  Returns ``(x, CGInfo)``.
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert diag.shape[0] == n_shards, (diag.shape, n_shards)
    n_padded = int(b.shape[0])
    bn = int(diag.shape[-1])
    nrb = int(diag.shape[1])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)

    x0 = jnp.zeros_like(b) if x0 is None else x0
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    s_eff, rcond_eff = _resolve_single_rhs_method(
        method, with_m, recompute_r_every, s, rcond, b.dtype
    )
    with_basis = basis is not None
    if with_basis and (method != "standard" or recompute_r_every):
        raise ValueError(
            "deflation (basis=) runs the standard per-shard loop "
            "(no method=pipelined/sstep, no recompute_r_every)"
        )

    key = ("symbell", _mesh_key(mesh), axis, maxiter, float(tol), with_m,
           bn, str(b.dtype), interpret, method, recompute_r_every,
           s_eff, rcond_eff, (basis.k if with_basis else 0))
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(diag_s, off_s, offcols_s, cross_s, crossrows_s,
                        crosscols_s, b_s, x0_s, *rest):
            diag_s, off_s, offcols_s = diag_s[0], off_s[0], offcols_s[0]
            cross_s, crossrows_s = cross_s[0], crossrows_s[0]
            crosscols_s = crosscols_s[0]
            i = 0
            inv_diag_s = None
            if with_m:
                inv_diag_s = rest[i]
                i += 1
            if with_basis:
                W_s, AW_s, E_chol_r = rest[i][0], rest[i + 1][0], rest[i + 2]
            base_block = jax.lax.axis_index(axis) * nrb

            def local_matvec(v_local):
                v_full = jax.lax.all_gather(v_local, axis, tiled=True)
                return _local_symbell_matvec(
                    diag_s, off_s, offcols_s, cross_s, crossrows_s,
                    crosscols_s, v_full.reshape(-1, bn), base_block,
                )

            if with_basis:
                return _sharded_deflated_pcg(
                    local_matvec, b_s, x0_s, inv_diag_s,
                    W_s, AW_s, E_chol_r, tol_arr, maxiter, axis,
                )
            if method == "pipelined":
                return _sharded_pipelined_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis
                )
            if method == "sstep":
                return _sharded_sstep_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis,
                    s_eff, rcond_eff,
                )
            return _sharded_pcg(
                local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter, axis,
                recompute_r_every=recompute_r_every,
            )

        in_specs = [P(axis)] * (9 if with_m else 8)
        if with_basis:
            in_specs += [P(axis), P(axis), P()]
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec=P(axis): jax.device_put(a, NamedSharding(mesh, spec))
    args = [put(jnp.asarray(diag)), put(jnp.asarray(off)),
            put(jnp.asarray(off_cols)), put(jnp.asarray(cross)),
            put(jnp.asarray(cross_rows)), put(jnp.asarray(cross_cols)),
            put(b), put(x0)]
    if with_m:
        args.append(put(inv_diag))
    if with_basis:
        W_sh, AW_sh, E_chol = shard_deflation_basis(
            basis, n_padded, n_shards
        )
        args += [put(jnp.asarray(W_sh)), put(jnp.asarray(AW_sh)),
                 put(E_chol, P())]

    x, k, done, rho, rnorm, hist = solve_jit(*args)
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info


def sharded_cg_solve_2d(
    blocks,
    block_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
):
    """(P)CG on a p×p 2-D block decomposition of A.

    Device (i, j) owns block A_ij (:func:`partition_csr_blocks_2d`); all
    vectors live as ROW pieces (piece i on mesh row i, replicated along
    the column axis).  Per SpMV: ONE mesh-transpose ``ppermute`` moves
    piece j to device (i, j) (n/p bytes) and ONE ``psum`` over the
    column axis reduces the partial products (n/p bytes) — versus the
    1-D scheme's n-byte all_gather into every device.  Dot products
    psum over the row axis only (pieces are replicated along columns).
    The loop itself is the SAME per-shard machinery as every 1-D
    front-end (_sharded_pcg / pipelined / sstep), so restart, Jacobi-PCG
    and the communication-avoiding methods compose unchanged.

    ``mesh``: a ("rp", "cp") p×p mesh (default: :func:`make_mesh_2d`
    over ⌊√n_devices⌋²).  Returns ``(x, CGInfo)``.
    """
    if mesh is None:
        p = int(np.sqrt(len(jax.devices())))
        mesh = make_mesh_2d(max(p, 1))
    rp_ax, cp_ax = mesh.axis_names
    p = mesh.devices.shape[0]
    assert mesh.devices.shape == (p, p), mesh.devices.shape
    assert blocks.shape[:2] == (p, p), (blocks.shape, p)
    n_padded = int(b.shape[0])
    bn = int(blocks.shape[-1])
    nrb = int(blocks.shape[2])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)

    x0 = jnp.zeros_like(b) if x0 is None else x0
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    s_eff, rcond_eff = _resolve_single_rhs_method(
        method, with_m, recompute_r_every, s, rcond, b.dtype
    )
    transpose_perm = [
        (a * p + c, c * p + a) for a in range(p) for c in range(p)
    ]

    key = ("bell2d", _mesh_key(mesh), maxiter, float(tol), with_m, bn,
           str(b.dtype), method, recompute_r_every, s_eff, rcond_eff)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(blocks_s, cols_s, b_s, x0_s, inv_diag_s=None):
            blocks_ij = blocks_s[0, 0]
            cols_ij = cols_s[0, 0]

            def local_matvec(v_row):
                # mesh transpose: device (i, j) trades its row piece i
                # for piece j — the SpMV operand for block A_ij
                v_col = jax.lax.ppermute(
                    v_row, (rp_ax, cp_ax), transpose_perm
                )
                q_part = _local_bell_matvec(
                    blocks_ij, cols_ij, v_col.reshape(-1, bn)
                )
                # partial products reduce along the block row
                return jax.lax.psum(q_part, cp_ax)

            if method == "pipelined":
                return _sharded_pipelined_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, rp_ax
                )
            if method == "sstep":
                return _sharded_sstep_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, rp_ax,
                    s_eff, rcond_eff,
                )
            return _sharded_pcg(
                local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter,
                rp_ax, recompute_r_every=recompute_r_every,
            )

        n_op = 5 if with_m else 4
        in_specs = [P(rp_ax, cp_ax), P(rp_ax, cp_ax)] + [P(rp_ax)] * (
            n_op - 2
        )
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(rp_ax), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put_op = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(rp_ax, cp_ax))
    )
    put_v = lambda a: jax.device_put(a, NamedSharding(mesh, P(rp_ax)))
    args = [put_op(jnp.asarray(blocks)), put_op(jnp.asarray(block_cols)),
            put_v(b), put_v(x0)]
    if with_m:
        args.append(put_v(inv_diag))

    x, k, done, rho, rnorm, hist = solve_jit(*args)
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info


def sharded_dia_cg_solve(
    diags_sharded,
    offsets: Tuple[int, ...],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
    basis=None,
):
    """Row-sharded (P)CG with a DIA (banded) operator and ring-halo SpMV.

    The per-iteration communication is two ``ppermute``s of the bandwidth-
    sized halo (O(w) bytes over ICI) plus the two ``psum`` dots — the
    ring-attention-shaped pattern applied to SpMV (SURVEY §5), versus the
    all_gather (O(n) bytes) the general blocked-ELL path needs.

    Args:
      diags_sharded: (n_shards, ndiag, rows_per_shard) from
        :func:`partition_dia_rows`.
      offsets: static diagonal offsets (must satisfy |off| <= rows_per_shard).
      method: "standard" (two psum rounds/iteration), "pipelined"
        (Chronopoulos–Gear, ONE psum round), or "sstep" (ONE Gram psum per
        ``s`` iterations; see solver/sstep.py).  Extensions are
        unpreconditioned; the ring-halo SpMV count is unchanged.
      s / rcond: s-step block size / Gram cutoff (method="sstep" only).
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert diags_sharded.shape[0] == n_shards, (diags_sharded.shape, n_shards)
    rows_per_shard = int(diags_sharded.shape[-1])
    w = max(max(abs(o) for o in offsets), 1)
    if w > rows_per_shard:
        raise ValueError(
            f"bandwidth {w} exceeds rows_per_shard {rows_per_shard}; "
            "use fewer shards or the blocked-ELL path"
        )
    n_padded = int(b.shape[0])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    offsets = tuple(int(o) for o in offsets)
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    s_eff, rcond_eff = _resolve_single_rhs_method(
        method, with_m, recompute_r_every, s, rcond, b.dtype
    )
    with_basis = basis is not None
    if with_basis and (method != "standard" or recompute_r_every):
        raise ValueError(
            "deflation (basis=) runs the standard per-shard loop "
            "(no method=pipelined/sstep, no recompute_r_every)"
        )

    key = ("dia", _mesh_key(mesh), axis, maxiter, float(tol), with_m, offsets,
           str(b.dtype), method, recompute_r_every, s_eff, rcond_eff,
           (basis.k if with_basis else 0))
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(diags_s, b_s, x0_s, *rest):
            diags_s = diags_s[0]
            i = 0
            inv_diag_s = None
            if with_m:
                inv_diag_s = rest[i]
                i += 1
            if with_basis:
                W_s, AW_s, E_chol_r = rest[i][0], rest[i + 1][0], rest[i + 2]

            def local_matvec(v_local):
                return _local_dia_matvec(diags_s, offsets, v_local, axis)

            if with_basis:
                return _sharded_deflated_pcg(
                    local_matvec, b_s, x0_s, inv_diag_s,
                    W_s, AW_s, E_chol_r, tol_arr, maxiter, axis,
                )

            if method == "pipelined":
                return _sharded_pipelined_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis
                )
            if method == "sstep":
                # matrix-powers kernel: the whole s-matvec basis from ONE
                # widened ring halo (None when s*w > rows_per_shard — the
                # loop then falls back to halo-per-matvec, same algebra)
                mpk = _make_dia_mpk_basis(diags_s, offsets, axis, s_eff)
                return _sharded_sstep_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis,
                    s_eff, rcond_eff, basis_fn=mpk,
                )
            return _sharded_pcg(
                local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter, axis,
                recompute_r_every=recompute_r_every,
            )

        in_specs = [P(axis)] * (4 if with_m else 3)
        if with_basis:
            in_specs += [P(axis), P(axis), P()]
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec=P(axis): jax.device_put(a, NamedSharding(mesh, spec))
    args = [put(jnp.asarray(diags_sharded)), put(b), put(x0)]
    if with_m:
        args.append(put(inv_diag))
    if with_basis:
        W_sh, AW_sh, E_chol = shard_deflation_basis(
            basis, n_padded, n_shards
        )
        args += [put(jnp.asarray(W_sh)), put(jnp.asarray(AW_sh)),
                 put(E_chol, P())]

    x, k, done, rho, rnorm, hist = solve_jit(*args)
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info


def sharded_symdia_cg_solve(
    diags_sharded,
    offsets: Tuple[int, ...],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    method: str = "standard",
    recompute_r_every: int = 0,
):
    """Row-sharded (P)CG on SYMMETRIC DIA storage (offsets ≥ 0 only).

    Half of :func:`sharded_dia_cg_solve`'s operator bytes at exactly its
    per-iteration collective count: the forward terms ride the usual ring
    halo of p (2 ppermutes, O(w) bytes), the mirror terms reuse the halo's
    LEFT side plus a once-per-solve (ndiag, w) halo of the neighbor's
    diagonal values (:func:`_symdia_left_halo` — loop-invariant, hoisted
    out of the while_loop by construction).

    Args:
      diags_sharded: (n_shards, ndiag_nonneg, rows_per_shard) — shard the
        SymDIAMatrix's ≥0-offset diagonals with :func:`partition_dia_rows`.
      offsets: static offsets, all ≥ 0, with max(offsets) <= rows_per_shard.
      method: "standard" or "pipelined" (the s-step matrix-powers kernel
        has no symmetric variant yet — use the full DIA layout for sstep).
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert diags_sharded.shape[0] == n_shards, (diags_sharded.shape, n_shards)
    rows_per_shard = int(diags_sharded.shape[-1])
    offsets = tuple(int(o) for o in offsets)
    if any(o < 0 for o in offsets):
        raise ValueError(f"symmetric DIA stores offsets >= 0 only, got {offsets}")
    w = max(max(offsets), 1) if offsets else 1
    if w > rows_per_shard:
        raise ValueError(
            f"bandwidth {w} exceeds rows_per_shard {rows_per_shard}; "
            "use fewer shards or the blocked-ELL path"
        )
    if method not in ("standard", "pipelined"):
        raise ValueError(
            "sharded symmetric DIA supports method='standard'/'pipelined' "
            f"(got {method!r}); use the full DIA layout for sstep"
        )
    n_padded = int(b.shape[0])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    if method == "pipelined" and (with_m or recompute_r_every):
        raise ValueError("method='pipelined' is unpreconditioned with "
                         "recompute_r_every=0")

    key = ("symdia", _mesh_key(mesh), axis, maxiter, float(tol), with_m,
           offsets, str(b.dtype), method, recompute_r_every)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(diags_s, b_s, x0_s, inv_diag_s=None):
            diags_s = diags_s[0]
            # loop-invariant: the left neighbor's diagonal tails, once
            dleft = _symdia_left_halo(diags_s, w, axis)

            def local_matvec(v_local):
                return _local_symdia_matvec(
                    diags_s, dleft, offsets, v_local, axis
                )

            if method == "pipelined":
                return _sharded_pipelined_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis
                )
            return _sharded_pcg(
                local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter, axis,
                recompute_r_every=recompute_r_every,
            )

        in_specs = [P(axis)] * (4 if with_m else 3)
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a: jax.device_put(a, NamedSharding(mesh, P(axis)))
    args = [put(jnp.asarray(diags_sharded)), put(b), put(x0)]
    if with_m:
        args.append(put(inv_diag))

    x, k, done, rho, rnorm, hist = solve_jit(*args)
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info


def sharded_sell_cg_solve(
    sell_sharded,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
):
    """Row-sharded (P)CG with a SELL (degree-bucketed) operator — the
    scattered-pattern path (north-star config 5 on power-law/circuit
    matrices, where blocked-ELL tile padding explodes).

    Per iteration: all_gather of p over ICI (a scattered column footprint
    spans all shards — the same reason the single-device layout exists),
    one flat gather per shard at the stored global indices (the per-shard
    random-access cost is nnz_shard/n_shards of the single-device solve —
    the scalar floor shards linearly), and the psum'd dots.

    Args:
      sell_sharded: the (diag, pos, cols_flat, vals_flat, bucket_meta,
        n_padded) tuple from :func:`partition_sell_rows`.
      method: "standard" (two psum rounds/iteration), "pipelined"
        (Chronopoulos–Gear, ONE psum round), or "sstep" (ONE Gram psum per
        ``s`` iterations; solver/sstep.py).  Extensions are unpreconditioned.
      s / rcond: s-step block size / Gram cutoff (method="sstep" only).
    """
    diag, pos, cols_flat, vals_flat, meta, n_padded_meta = sell_sharded
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert np.asarray(diag).shape[0] == n_shards, (np.asarray(diag).shape, n_shards)
    n_padded = int(b.shape[0])
    assert n_padded == int(n_padded_meta), (n_padded, n_padded_meta)
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    s_eff, rcond_eff = _resolve_single_rhs_method(
        method, with_m, recompute_r_every, s, rcond, b.dtype
    )

    key = ("sell", _mesh_key(mesh), axis, maxiter, float(tol), with_m,
           meta, str(b.dtype), method, recompute_r_every, s_eff, rcond_eff)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(diag_s, pos_s, cols_s, vals_s, b_s, x0_s, inv_diag_s=None):
            diag_s, pos_s = diag_s[0], pos_s[0]
            cols_s, vals_s = cols_s[0], vals_s[0]

            def local_matvec(v_local):
                return _local_sell_matvec(
                    diag_s, pos_s, cols_s, vals_s, meta, v_local, axis
                )

            if method == "pipelined":
                return _sharded_pipelined_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis
                )
            if method == "sstep":
                return _sharded_sstep_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis,
                    s_eff, rcond_eff,
                )
            return _sharded_pcg(
                local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter, axis,
                recompute_r_every=recompute_r_every,
            )

        in_specs = [P(axis)] * (7 if with_m else 6)
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P(axis)))
    args = [put(diag), put(pos), put(cols_flat), put(vals_flat), put(b), put(x0)]
    if with_m:
        args.append(put(inv_diag))

    x, k, done, rho, rnorm, hist = solve_jit(*args)
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info


def _lockstep_info(k, done, rho, rnorm, hist) -> CGInfo:
    return CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )


def sharded_cg_solve_batched(
    blocks,
    block_cols,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol=0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
    method: str = "lockstep",
    rcond: Optional[float] = None,
):
    """Row-sharded multi-RHS (P)CG — the mesh × lanes composition: each
    chip owns its row block of A and an (m, R) slab of every lane's
    vectors; per iteration ONE all_gather moves all R lanes' p, the tile
    stream is read once for all lanes (MXU (bm,bn)×(bn,R) products), and
    the two dot rounds psum (R,) lane vectors — R solves for one solve's
    collective latency AND one solve's operator traffic.

    Args:
      blocks / block_cols: per-shard blocked-ELL tiles from
        :func:`partition_csr_rows`.
      B: (R, n_padded) right-hand sides.
      tol: scalar or (R,) per-lane ABSOLUTE tolerances on ‖r‖₂.
      inv_diag: optional (n_padded,) Jacobi diagonal, shared by all lanes.
      method: "lockstep" (independent lanes) or "block" (O'Leary shared
        Krylov space, solver/blockcg.py: the R×R Gram blocks psum over the
        mesh — same two collectives per iteration, (R,R) payload).
      rcond: block method's Gram cutoff (None = dtype-adaptive).

    Returns (X (R, n_padded), CGInfo with a leading/trailing lane axis:
    iterations/converged/rho/rnorm_sq are (R,), rho_history (R, maxiter+1)).
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert blocks.shape[0] == n_shards, (blocks.shape, n_shards)
    if B.ndim != 2:
        raise ValueError(f"B must be (nrhs, n_padded), got {B.shape}")
    R, n_padded = int(B.shape[0]), int(B.shape[1])
    bn = int(blocks.shape[-1])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=B.dtype)
    if tol_arr.ndim == 1 and tol_arr.shape[0] != R:
        raise ValueError(f"per-lane tol has length {tol_arr.shape[0]}, expected {R}")
    X0 = jnp.zeros_like(B) if X0 is None else X0
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    rcond = _default_rcond(B.dtype) if rcond is None else float(rcond)
    loop = _batched_loop(method, recompute_r_every, rcond)

    key = ("bell-batched", _mesh_key(mesh), axis, maxiter, R, bn,
           str(B.dtype), with_m, tol_arr.shape, recompute_r_every,
           method, rcond)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(blocks_s, cols_s, tol_a, B_s, X0_s, inv_diag_s=None):
            blocks_s, cols_s = blocks_s[0], cols_s[0]

            def local_matvec_multi(v_local):  # (m, R)
                v_full = jax.lax.all_gather(v_local, axis, tiled=True)
                return _local_bell_matvec_multi(
                    blocks_s, cols_s, v_full.reshape(-1, bn, R)
                )

            X, k, done, rho, rnorm, hist = loop(
                local_matvec_multi, B_s, X0_s, inv_diag_s, tol_a,
                maxiter, axis,
            )
            return X, k, done, rho, rnorm, hist

        in_specs = [P(axis), P(axis), P(), P(None, axis), P(None, axis)]
        if with_m:
            in_specs.append(P(axis))
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
    args = [put(blocks, P(axis)), put(block_cols, P(axis)),
            put(jnp.broadcast_to(tol_arr, tol_arr.shape), P()),
            put(B, P(None, axis)), put(X0, P(None, axis))]
    if with_m:
        args.append(put(inv_diag, P(axis)))
    X, k, done, rho, rnorm, hist = solve_jit(*args)
    return X, _lockstep_info(k, done, rho, rnorm, hist)


def sharded_sell_cg_solve_batched(
    sell_sharded,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol=0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
    method: str = "lockstep",
    rcond: Optional[float] = None,
):
    """Row-sharded multi-RHS (P)CG on the scattered-pattern SELL layout —
    where multi-RHS matters most: the flat gather at each shard's stored
    global indices fetches R contiguous lane values per index, so the
    ~8 ns/index random-access floor amortizes over lanes (10× measured at
    R=8 single-device) AND shards linearly over the mesh.

    Same contract as :func:`sharded_cg_solve_batched`; ``sell_sharded`` is
    :func:`partition_sell_rows`'s return tuple.
    """
    diag, pos, cols_flat, vals_flat, meta, n_padded_meta = sell_sharded
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert np.asarray(diag).shape[0] == n_shards, (np.asarray(diag).shape, n_shards)
    if B.ndim != 2:
        raise ValueError(f"B must be (nrhs, n_padded), got {B.shape}")
    R, n_padded = int(B.shape[0]), int(B.shape[1])
    assert n_padded == int(n_padded_meta), (n_padded, n_padded_meta)
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=B.dtype)
    if tol_arr.ndim == 1 and tol_arr.shape[0] != R:
        raise ValueError(f"per-lane tol has length {tol_arr.shape[0]}, expected {R}")
    X0 = jnp.zeros_like(B) if X0 is None else X0
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    rcond = _default_rcond(B.dtype) if rcond is None else float(rcond)
    loop = _batched_loop(method, recompute_r_every, rcond)

    key = ("sell-batched", _mesh_key(mesh), axis, maxiter, R, meta,
           str(B.dtype), with_m, tol_arr.shape, recompute_r_every,
           method, rcond)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(diag_s, pos_s, cols_s, vals_s, tol_a, B_s, X0_s,
                        inv_diag_s=None):
            diag_s, pos_s = diag_s[0], pos_s[0]
            cols_s, vals_s = cols_s[0], vals_s[0]

            def local_matvec_multi(v_local):  # (m, R)
                from ..ops.spmv import sell_bucket_reduce

                v_full = jax.lax.all_gather(v_local, axis, tiled=True)
                acc = jnp.promote_types(
                    jnp.promote_types(vals_s.dtype, v_local.dtype), jnp.float32
                )
                prods = vals_s.astype(acc)[:, None] * v_full[cols_s].astype(acc)
                y_sorted = sell_bucket_reduce(prods, meta)
                y = diag_s.astype(acc)[:, None] * v_local.astype(acc) + y_sorted[pos_s]
                return y.astype(jnp.promote_types(vals_s.dtype, v_local.dtype))

            return loop(
                local_matvec_multi, B_s, X0_s, inv_diag_s, tol_a, maxiter,
                axis,
            )

        in_specs = [P(axis)] * 4 + [P(), P(None, axis), P(None, axis)]
        if with_m:
            in_specs.append(P(axis))
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
    args = [put(diag, P(axis)), put(pos, P(axis)), put(cols_flat, P(axis)),
            put(vals_flat, P(axis)),
            put(jnp.broadcast_to(tol_arr, tol_arr.shape), P()),
            put(B, P(None, axis)), put(X0, P(None, axis))]
    if with_m:
        args.append(put(inv_diag, P(axis)))
    X, k, done, rho, rnorm, hist = solve_jit(*args)
    return X, _lockstep_info(k, done, rho, rnorm, hist)


def _local_dia_matvec_multi(diags_s, offsets, P_local, axis):
    """Multi-RHS banded SpMV on one row shard: ONE ring halo moves all R
    lanes' boundary slabs ((w, R) bytes per neighbor), the diagonal stream
    is read once for all lanes."""
    m, R = P_local.shape
    w = max(max(abs(o) for o in offsets), 1)
    window = ring_halo(P_local, w, axis)  # (m + 2w, R); rank-agnostic halo
    acc = jnp.promote_types(
        jnp.promote_types(diags_s.dtype, P_local.dtype), jnp.float32
    )
    Y = jnp.zeros((m, R), dtype=acc)
    for d, off in enumerate(offsets):
        lo = off + w
        Y = Y + diags_s[d].astype(acc)[:, None] * jax.lax.slice(
            window, (lo, 0), (lo + m, R)
        ).astype(acc)
    return Y.astype(jnp.promote_types(diags_s.dtype, P_local.dtype))


def sharded_dia_cg_solve_batched(
    diags_sharded,
    offsets: Tuple[int, ...],
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol=0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
    method: str = "lockstep",
    rcond: Optional[float] = None,
):
    """Row-sharded multi-RHS (P)CG on the banded (DIA) layout — the ring
    variant of :func:`sharded_cg_solve_batched`: per iteration two
    ``ppermute``s move only the bandwidth-wide boundary of ALL R lanes
    (O(w·R) bytes vs the all-gather's O(n·R)), the diagonal stream is read
    once for all lanes, and the dots psum (R,) lane vectors.

    Same contract as the bell variant; ``diags_sharded`` comes from
    :func:`partition_dia_rows` and ``|off| <= rows_per_shard`` must hold.
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert diags_sharded.shape[0] == n_shards, (diags_sharded.shape, n_shards)
    rows_per_shard = int(diags_sharded.shape[-1])
    w = max(max(abs(o) for o in offsets), 1)
    if w > rows_per_shard:
        raise ValueError(
            f"bandwidth {w} exceeds rows_per_shard {rows_per_shard}; "
            "use fewer shards or the blocked-ELL path"
        )
    if B.ndim != 2:
        raise ValueError(f"B must be (nrhs, n_padded), got {B.shape}")
    R, n_padded = int(B.shape[0]), int(B.shape[1])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=B.dtype)
    if tol_arr.ndim == 1 and tol_arr.shape[0] != R:
        raise ValueError(f"per-lane tol has length {tol_arr.shape[0]}, expected {R}")
    X0 = jnp.zeros_like(B) if X0 is None else X0
    offsets = tuple(int(o) for o in offsets)
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    rcond = _default_rcond(B.dtype) if rcond is None else float(rcond)
    loop = _batched_loop(method, recompute_r_every, rcond)

    key = ("dia-batched", _mesh_key(mesh), axis, maxiter, R, offsets,
           str(B.dtype), with_m, tol_arr.shape, recompute_r_every,
           method, rcond)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(diags_s, tol_a, B_s, X0_s, inv_diag_s=None):
            diags_s = diags_s[0]

            def local_matvec_multi(v_local):  # (m, R)
                return _local_dia_matvec_multi(diags_s, offsets, v_local, axis)

            return loop(
                local_matvec_multi, B_s, X0_s, inv_diag_s, tol_a, maxiter,
                axis,
            )

        in_specs = [P(axis), P(), P(None, axis), P(None, axis)]
        if with_m:
            in_specs.append(P(axis))
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
    args = [put(diags_sharded, P(axis)),
            put(jnp.broadcast_to(tol_arr, tol_arr.shape), P()),
            put(B, P(None, axis)), put(X0, P(None, axis))]
    if with_m:
        args.append(put(inv_diag, P(axis)))
    X, k, done, rho, rnorm, hist = solve_jit(*args)
    return X, _lockstep_info(k, done, rho, rnorm, hist)


# ---------------------------------------------------------------------------
# checkpoint / resume for long sharded solves (round 3; SURVEY §5 extended
# to the mesh: the carry is an explicit pytree of global arrays, so saving
# is serializing leaves and resuming is re-sharding them)
# ---------------------------------------------------------------------------

import dataclasses


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedCGState:
    """Row-sharded PCG carry.  ``x/r/p`` are global (n_padded,) arrays
    (row-sharded on device, gatherable for serialization); scalars and
    ``hist`` are replicated.  Serialize with ``solver.checkpoint.save_state``
    — the mesh/operator are re-supplied at resume (layout metadata lives in
    the operator arrays, not the carry)."""

    k: jax.Array
    done: jax.Array
    x: jax.Array
    r: jax.Array
    p: jax.Array
    rho: jax.Array
    rnorm: jax.Array
    hist: jax.Array

    def tree_flatten(self):
        return (
            self.k, self.done, self.x, self.r, self.p,
            self.rho, self.rnorm, self.hist,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _bell_local_matvec_fn(blocks_s, cols_s, bn, axis):
    def local_matvec(v_local):
        v_full = jax.lax.all_gather(v_local, axis, tiled=True)
        return _local_bell_matvec(blocks_s, cols_s, v_full.reshape(-1, bn))

    return local_matvec


_STATE_SPECS = lambda axis: (
    P(), P(), P(axis), P(axis), P(axis), P(), P(), P()
)


def _generic_sharded_init(
    kind, extra_key, op_arrays, make_lm, b, x0, inv_diag, mesh, axis, maxiter
) -> ShardedCGState:
    """Shared init core: shard_map the carry construction over the mesh.

    ``op_arrays`` are the layout's shard-axis arrays; ``make_lm`` builds the
    per-shard local matvec from the (leading-dim-stripped) shards and closes
    over the statics recorded in ``extra_key`` (which keys the compiled-fn
    cache alongside everything else static)."""
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert op_arrays[0].shape[0] == n_shards, (op_arrays[0].shape, n_shards)
    n_padded = int(b.shape[0])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    with_m = inv_diag is not None
    nop = len(op_arrays)

    key = (f"{kind}-init", _mesh_key(mesh), axis, maxiter, with_m,
           extra_key, str(b.dtype))
    init_jit = _cache_get(key)
    if init_jit is None:
        def init_shard(*args_s):
            op_shards = [a[0] for a in args_s[:nop]]
            b_s, x0_s = args_s[nop], args_s[nop + 1]
            inv_diag_s = args_s[nop + 2] if with_m else None
            lm = make_lm(op_shards)
            return _pcg_init_carry(lm, b_s, x0_s, inv_diag_s, maxiter, axis)

        in_specs = [P(axis)] * (nop + (3 if with_m else 2))
        init_jit = jax.jit(shard_map(
            init_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=_STATE_SPECS(axis),
            check_vma=False,
        ))
        _cache_put(key, init_jit)

    put = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P(axis)))
    args = [put(a) for a in op_arrays] + [put(b), put(x0)]
    if with_m:
        args.append(put(inv_diag))
    return ShardedCGState(*init_jit(*args))


def _generic_sharded_run(
    kind, extra_key, op_arrays, make_lm, state, tol, steps, b, inv_diag,
    recompute_r_every, mesh, axis
) -> ShardedCGState:
    """Shared resume core: ONE shard_map'd while_loop from the given carry,
    bounded by ``steps``, body == _pcg_body_fn (bit-identical to the
    uninterrupted solve)."""
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert op_arrays[0].shape[0] == n_shards, (op_arrays[0].shape, n_shards)
    maxiter = int(state.hist.shape[0]) - 1
    limit = (
        maxiter if steps is None
        else min(maxiter, int(state.k) + int(steps))
    )
    recompute_r_every = int(recompute_r_every)
    if recompute_r_every > 0 and b is None:
        raise ValueError("recompute_r_every > 0 needs b (the RHS)")
    with_m = inv_diag is not None
    with_b = b is not None
    tol_arr = jnp.asarray(tol, dtype=state.x.dtype)
    nop = len(op_arrays)

    # ``limit`` rides as a DYNAMIC replicated scalar: a static limit would
    # recompile the whole shard_map program every chunk (limit = k + steps
    # moves each call)
    key = (f"{kind}-run", _mesh_key(mesh), axis, maxiter, float(tol),
           with_m, with_b, extra_key, str(state.x.dtype), recompute_r_every)
    run_jit = _cache_get(key)
    if run_jit is None:
        def run_shard(limit_s, *args_s):
            op_shards = [a[0] for a in args_s[:nop]]
            i = nop
            b_s = args_s[i] if with_b else None
            i += 1 if with_b else 0
            inv_diag_s = args_s[i] if with_m else None
            i += 1 if with_m else 0
            carry = tuple(args_s[i:])
            lm = make_lm(op_shards)
            body = _pcg_body_fn(lm, b_s, inv_diag_s, tol_arr, axis)
            replace = _pcg_replace_fn(lm, b_s, inv_diag_s, maxiter, axis,
                                      recompute_r_every)

            def cond(c):
                return (c[0] < limit_s) & (~c[1])

            return while_with_periodic_restart(
                cond, body, replace, recompute_r_every, lambda c: c[0], carry
            )

        in_specs = (
            [P()]
            + [P(axis)] * nop
            + ([P(axis)] if with_b else [])
            + ([P(axis)] if with_m else [])
            + list(_STATE_SPECS(axis))
        )
        run_jit = jax.jit(shard_map(
            run_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=_STATE_SPECS(axis),
            check_vma=False,
        ))
        _cache_put(key, run_jit)

    put = lambda a, spec=P(axis): jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, spec)
    )
    args = [put(jnp.asarray(limit, jnp.int32), P())]
    args.extend(put(a) for a in op_arrays)
    if with_b:
        args.append(put(b))
    if with_m:
        args.append(put(inv_diag))
    specs = _STATE_SPECS(axis)
    leaves, _ = state.tree_flatten()
    args.extend(put(leaf, spec) for leaf, spec in zip(leaves, specs))
    return ShardedCGState(*run_jit(*args))


def sharded_cg_init(
    blocks,
    block_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
) -> ShardedCGState:
    """Build the row-sharded (blocked-ELL) PCG carry — the checkpoint/resume
    entry point for mesh-scale solves (the reference loses all state when
    interrupted, CG.hpp:276-302; here save/resume is save_state/load_state
    plus this init's sibling :func:`sharded_run_cg`)."""
    bn = int(blocks.shape[-1])
    make_lm = lambda sh: _bell_local_matvec_fn(sh[0], sh[1], bn, axis)
    return _generic_sharded_init(
        "bell", (bn,), (blocks, block_cols), make_lm, b, x0, inv_diag,
        mesh, axis, maxiter,
    )


def sharded_run_cg(
    blocks,
    block_cols,
    state: ShardedCGState,
    *,
    tol=0.0,
    steps: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    b: Optional[jax.Array] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
) -> ShardedCGState:
    """Advance a row-sharded solve by up to ``steps`` iterations (or to
    convergence / history capacity) inside ONE shard_map'd while_loop.

    ``inv_diag`` must match what the state was initialized with; ``b`` is
    required only when ``recompute_r_every > 0`` (restarts recompute the
    true residual).  Chunks compose bit-identically with
    :func:`sharded_cg_solve`'s uninterrupted XLA path — the body is the same
    function (_pcg_body_fn)."""
    bn = int(blocks.shape[-1])
    make_lm = lambda sh: _bell_local_matvec_fn(sh[0], sh[1], bn, axis)
    return _generic_sharded_run(
        "bell", (bn,), (blocks, block_cols), make_lm, state, tol, steps, b,
        inv_diag, recompute_r_every, mesh, axis,
    )


def sharded_dia_cg_init(
    diags_sharded,
    offsets,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
) -> ShardedCGState:
    """Checkpointable carry for the ring-halo (DIA/banded) sharded solve —
    the Flan-class long-solve case where resume matters most."""
    offsets = tuple(int(o) for o in offsets)
    make_lm = lambda sh: (
        lambda v: _local_dia_matvec(sh[0], offsets, v, axis)
    )
    return _generic_sharded_init(
        "dia", (offsets,), (jnp.asarray(diags_sharded),), make_lm, b, x0,
        inv_diag, mesh, axis, maxiter,
    )


def sharded_dia_run_cg(
    diags_sharded,
    offsets,
    state: ShardedCGState,
    *,
    tol=0.0,
    steps: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    b: Optional[jax.Array] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
) -> ShardedCGState:
    """Resume sibling of :func:`sharded_dia_cg_init` (ring-halo SpMV)."""
    offsets = tuple(int(o) for o in offsets)
    make_lm = lambda sh: (
        lambda v: _local_dia_matvec(sh[0], offsets, v, axis)
    )
    return _generic_sharded_run(
        "dia", (offsets,), (jnp.asarray(diags_sharded),), make_lm, state,
        tol, steps, b, inv_diag, recompute_r_every, mesh, axis,
    )


def sharded_sell_cg_init(
    sell_sharded,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
) -> ShardedCGState:
    """Checkpointable carry for the scattered-pattern (SELL) sharded solve;
    ``sell_sharded`` is :func:`partition_sell_rows`'s tuple."""
    diag, pos, cols_flat, vals_flat, meta, _ = sell_sharded
    make_lm = lambda sh: (
        lambda v: _local_sell_matvec(sh[0], sh[1], sh[2], sh[3], meta, v, axis)
    )
    ops = tuple(jnp.asarray(a) for a in (diag, pos, cols_flat, vals_flat))
    return _generic_sharded_init(
        "sell", (meta,), ops, make_lm, b, x0, inv_diag, mesh, axis, maxiter,
    )


def sharded_sell_run_cg(
    sell_sharded,
    state: ShardedCGState,
    *,
    tol=0.0,
    steps: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    b: Optional[jax.Array] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
) -> ShardedCGState:
    """Resume sibling of :func:`sharded_sell_cg_init`."""
    diag, pos, cols_flat, vals_flat, meta, _ = sell_sharded
    make_lm = lambda sh: (
        lambda v: _local_sell_matvec(sh[0], sh[1], sh[2], sh[3], meta, v, axis)
    )
    ops = tuple(jnp.asarray(a) for a in (diag, pos, cols_flat, vals_flat))
    return _generic_sharded_run(
        "sell", (meta,), ops, make_lm, state, tol, steps, b, inv_diag,
        recompute_r_every, mesh, axis,
    )


def sharded_state_result(state: ShardedCGState):
    """(x, CGInfo) from a carry — what :func:`sharded_cg_solve` returns."""
    info = CGInfo(
        iterations=state.k,
        converged=state.done & ~jnp.isnan(state.rnorm),
        rho=state.rho,
        rnorm_sq=state.rnorm,
        rho_history=state.hist,
    )
    return state.x, info
