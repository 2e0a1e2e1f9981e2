"""Row-sharded multi-chip CG (north-star config 5; absent in the reference —
SURVEY §2.4 documents that the reference is strictly single-device).

Parallelization contract (SURVEY §2.4 / §5):

* 1-D device mesh over axis "rows"; each chip owns a contiguous block of rows
  of A (blocked-ELL tiles with *global* column-block indices) and the
  matching shards of x/b/r/p;
* per iteration: ``all_gather(p)`` over ICI for the SpMV's remote columns
  (halo), local tile products, and the two dot products reduced with
  ``psum`` — the XLA-collective equivalents of what NCCL allreduce would be
  elsewhere;
* the whole while_loop runs inside one ``shard_map``-ed jit: collectives are
  compiled into the loop body, zero host involvement.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = jax.shard_map
except Exception:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..solver.cg import CGInfo
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


def _local_bell_matvec(blocks, block_cols, p_full_2d):
    """Local row-block SpMV against the gathered operand."""
    gathered = p_full_2d[block_cols]  # (nrb, kmax, bn)
    acc = jnp.promote_types(blocks.dtype, jnp.float32)
    y = jnp.einsum(
        "rkmn,rkn->rm",
        blocks,
        gathered,
        preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(-1).astype(blocks.dtype)


def sharded_cg_solve(
    blocks,
    block_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: int = 0,
    ncols_padded: Optional[int] = None,
):
    """Row-sharded CG over a 1-D mesh.

    Args:
      blocks: (n_shards, nrb, kmax, bm, bn) per-shard blocked-ELL tiles
        (from :func:`partition_csr_rows`).
      block_cols: (n_shards, nrb, kmax) global column-block ids.
      b: (n_padded,) global RHS (zero-padded rows beyond the true n).
      mesh: 1-D device mesh (defaults to all devices).
      maxiter: iteration cap (static).
      ncols_padded: global padded column count (defaults to n_padded).

    Returns (x, CGInfo) with x fully replicated? No — x is sharded like b;
    callers see a global jax.Array.
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert blocks.shape[0] == n_shards, (blocks.shape, n_shards)
    n_padded = int(b.shape[0])
    bn = int(blocks.shape[-1])
    ncols_padded = int(ncols_padded or n_padded)
    maxiter = int(maxiter or (n_padded + 1))
    tol_arr = jnp.asarray(tol, dtype=b.dtype)

    x0 = jnp.zeros_like(b) if x0 is None else x0

    def pdot(u, v):
        return jax.lax.psum(jnp.sum(u * v), axis)

    def local_step(blocks_s, cols_s, carry):
        k, done, x, r, p, rho, hist = carry
        p_full = jax.lax.all_gather(p, axis, tiled=True)  # ICI all-gather
        q = _local_bell_matvec(blocks_s, cols_s, p_full.reshape(-1, bn))
        pap = pdot(p, q)
        alpha = rho / pap
        x = x + alpha * p
        r = r - alpha * q
        done = jnp.isnan(rho) | (jnp.sqrt(rho) <= tol_arr)
        rho_next = pdot(r, r)
        beta = rho_next / rho
        p = r + beta * p
        k = k + 1
        hist = hist.at[k].set(rho_next)
        return (k, done, x, r, p, rho_next, hist)

    def solve_shard(blocks_s, cols_s, b_s, x0_s):
        # init: r0 = b - A x0 (needs one gather of x0)
        blocks_s = blocks_s[0]
        cols_s = cols_s[0]
        x_full = jax.lax.all_gather(x0_s, axis, tiled=True)
        r0 = b_s - _local_bell_matvec(blocks_s, cols_s, x_full.reshape(-1, bn))
        rho0 = pdot(r0, r0)
        hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rho0.dtype)
        hist = hist.at[0].set(rho0)
        carry = (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            x0_s,
            r0,
            r0,
            rho0,
            hist,
        )

        def cond(c):
            return (c[0] < maxiter) & (~c[1])

        carry = jax.lax.while_loop(
            cond, lambda c: local_step(blocks_s, cols_s, c), carry
        )
        k, done, x, r, p, rho, hist = carry
        return x, k, done, rho, hist

    solve = shard_map(
        solve_shard,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(), P(), P(), P()),
        check_vma=False,
    )

    blocks = jax.device_put(blocks, NamedSharding(mesh, P(axis)))
    block_cols = jax.device_put(block_cols, NamedSharding(mesh, P(axis)))
    b = jax.device_put(b, NamedSharding(mesh, P(axis)))
    x0 = jax.device_put(x0, NamedSharding(mesh, P(axis)))

    x, k, done, rho, hist = jax.jit(solve)(blocks, block_cols, b, x0)
    info = CGInfo(
        iterations=k, converged=done, rho=rho, rnorm_sq=rho, rho_history=hist
    )
    return x, info
