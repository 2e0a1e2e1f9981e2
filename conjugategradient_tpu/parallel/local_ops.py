"""Per-shard local matvecs and halo exchanges for the sharded solvers.

These run INSIDE ``shard_map`` and may issue collectives (``all_gather``
for layouts whose column footprint spans shards, ``ppermute`` ring halos
for banded layouts).  Each mirrors its single-device sibling in
``ops/spmv.py`` bit-for-bit in accumulation order and dtype promotion so
sharded f64 runs keep oracle parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def _local_sell_matvec_multi(diag_s, pos_s, cols_s, vals_s, meta, P_local,
                             axis):
    """Multi-RHS bucketed-ELL SpMV on one row shard: the flat gather at the
    stored global indices fetches R CONTIGUOUS lane values per index, so
    the ~8 ns/index random-access floor amortizes over lanes (10× measured
    at R=8 single-device) AND shards linearly over the mesh."""
    from ..ops.spmv import sell_bucket_reduce

    v_full = jax.lax.all_gather(P_local, axis, tiled=True)
    acc = jnp.promote_types(
        jnp.promote_types(vals_s.dtype, P_local.dtype), jnp.float32
    )
    prods = vals_s.astype(acc)[:, None] * v_full[cols_s].astype(acc)
    y_sorted = sell_bucket_reduce(prods, meta)
    y = diag_s.astype(acc)[:, None] * P_local.astype(acc) + y_sorted[pos_s]
    return y.astype(jnp.promote_types(vals_s.dtype, P_local.dtype))


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
