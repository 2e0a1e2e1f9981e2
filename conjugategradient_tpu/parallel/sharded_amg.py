"""Row-sharded algebraic multigrid for assembled SPD matrices.

The sharded counterpart of :func:`~conjugategradient_tpu.
smoothed_aggregation_preconditioner` — the SAME hierarchy (literally:
both builders call ``solver.amg._build_hierarchy``, so aggregates,
prolongators, and Galerkin operators are identical by construction) and
the same V-cycle math, executed over the solver's row-sharded mesh so
AMG-PCG on assembled matrices scales past one chip's HBM the way the
geometric version (parallel/sharded_multigrid.py) does for stencils.

Communication structure per V-cycle (all inside the solver's one jitted
shard_map program):

* **Smoothing / residual at a sharded level:** each damped-Jacobi sweep's
  matvec ``all_gather``s the level vector (general sparse patterns have
  no banded halo to exploit — the same collective the sharded CSR CG
  matvec itself uses), then applies the shard's blocked-ELL row block.
* **Transfers:** restriction is the shard's rows of ``P^T`` against the
  all-gathered fine residual; prolongation the shard's rows of ``P``
  against the all-gathered coarse correction.  One all_gather each.
* **Coarse tail:** levels at or below ``agglomerate_below`` total points
  replicate after one small all_gather and run the SINGLE-DEVICE cycle
  (``solver.amg._make_vcycle`` — the same code object), exactly like the
  geometric agglomeration: tiny levels are latency-bound, replication
  costs one collective instead of gather-starved sharded sweeps.

Operator data is threaded through the solver's shard_map as sharded
ARGUMENTS via :class:`~.sharded_cg.ShardedPreconditioner` (a bare-callable
M_local would replicate its closure constants on every device — wrong for
multi-level sparse operators).

Padding convention: each sharded level ``l`` pads its true size ``n_l``
to ``n_l_padded = S * rps_l`` rows (padding at the END of the global row
space, zero rows / zero inv-diag, so padded entries stay exactly zero
through every sweep and transfer); level 0 uses the SOLVER's ``n_padded``
so the apply's shards line up with the CG loop's.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..solver.amg import (
    _build_hierarchy,
    _cheb_interval,
    _cheb_smooth_steps,
    _coarse_solver,
    _device_levels,
    _make_vcycle,
    _to_scipy_csr,
)
from ..types import CSRMatrix
from .local_ops import _local_bell_matvec
from .partition import partition_csr_rows
from .sharded_cg import ShardedPreconditioner


def _pad_csr(M, nrows_p: int, ncols_p: int):
    """Zero-extend a scipy CSR to (nrows_p, ncols_p) — padding rows are
    empty, padding columns never referenced."""
    import scipy.sparse as sp

    M = M.tocsr()
    assert nrows_p >= M.shape[0] and ncols_p >= M.shape[1], (
        (nrows_p, ncols_p), M.shape)
    indptr = np.concatenate([
        M.indptr,
        np.full(nrows_p - M.shape[0], M.indptr[-1], dtype=M.indptr.dtype),
    ])
    return sp.csr_matrix(
        (M.data, M.indices, indptr), shape=(nrows_p, ncols_p)
    )


def _block_of(rps: int) -> int:
    """Largest block edge in {8,4,2,1} dividing the per-shard row count —
    blocked-ELL bm/bn must divide it so the partition pads to exactly
    rps rows per shard."""
    return math.gcd(rps, 8)


def _partition_level_op(M, n_shards: int, rps_rows: int, n_cols_padded: int,
                        bn_src: int, dtype):
    """Partition a (padded) level operator into per-shard blocked-ELL
    blocks: rows split S-ways at rps_rows each, column-block ids GLOBAL
    into the source level's padded vector reshaped (-1, bn_src)."""
    bm = _block_of(rps_rows)
    Mp = _pad_csr(M, rps_rows * n_shards, n_cols_padded)
    blocks, cols, n_out = partition_csr_rows(
        Mp.data.astype(np.float64), Mp.indices, Mp.indptr,
        (rps_rows * n_shards, n_cols_padded), n_shards, bm=bm, bn=bn_src,
    )
    assert n_out == rps_rows * n_shards, (n_out, rps_rows, n_shards)
    return blocks.astype(np.dtype(dtype)), cols


def sharded_amg_preconditioner(
    A: Any,
    n_shards: int,
    n_padded: int,
    *,
    axis: str = "rows",
    theta: float = 0.08,
    nu: int = 2,
    omega: float = 2.0 / 3.0,
    smooth_prolongator: bool = True,
    cycles: int = 1,
    coarse_size: int = 400,
    max_levels: int = 20,
    dense_cap: Optional[int] = None,
    level_layout: str = "auto",
    smoother: str = "jacobi",
    cheb_lower: float = 1.0 / 6.0,
    near_nullspace=None,
    blocksize: int = 1,
    agglomerate_below: int = 32768,
    dtype=None,
) -> ShardedPreconditioner:
    """Build the row-sharded smoothed-aggregation AMG ``M_local`` for
    :func:`~conjugategradient_tpu.parallel.sharded_cg_solve`.

    Args mirror :func:`~conjugategradient_tpu.
    smoothed_aggregation_preconditioner` (same defaults, same hierarchy —
    parity with the single-device apply to roundoff is the design
    invariant, asserted by tests/test_sharded_amg.py), plus:

      n_shards: mesh size (must match the solve's mesh).
      n_padded: the SOLVER's padded global size — the third return of
        :func:`~conjugategradient_tpu.parallel.partition_csr_rows` — so
        level-0 shards line up with the CG loop's vectors.
      axis: mesh axis name (must match the solve's).
      agglomerate_below: levels with at or below this many total points
        replicate after one all_gather and run the single-device tail
        (they are latency-bound; default 32K points).  The coarsest
        (dense/Jacobi) level always replicates.
      level_layout: layout policy for the REPLICATED tail's operators
        (sharded levels always use per-shard blocked-ELL row blocks).
      smoother / cheb_lower: as in the single-device builder — Chebyshev
        smoothing is pure SpMV + elementwise work with STATIC step
        coefficients, so it adds no collectives beyond the Jacobi path's
        per-sweep all_gather.

    Returns a :class:`~.sharded_cg.ShardedPreconditioner`; pass it as
    ``M_local=`` (reuse across solves to reuse the compiled program).
    Diagnostics: ``.level_sizes``, ``.n_levels``, ``.split`` (number of
    sharded levels).
    """
    if nu < 1:
        raise ValueError(f"nu must be >= 1, got {nu}")
    if cycles < 1:
        raise ValueError(f"cycles must be >= 1, got {cycles}")
    if not (0.0 < omega < 2.0):
        raise ValueError(f"omega must be in (0, 2), got {omega}")
    if level_layout not in ("auto", "csr"):
        raise ValueError(
            f"level_layout must be 'auto' or 'csr', got {level_layout!r}")
    if smoother not in ("jacobi", "chebyshev"):
        raise ValueError(
            f"smoother must be 'jacobi' or 'chebyshev', got {smoother!r}")
    if not (0.0 < cheb_lower < 1.0):
        raise ValueError(f"cheb_lower must be in (0, 1), got {cheb_lower}")
    if dtype is None:
        dtype = A.dtype if isinstance(A, CSRMatrix) else (
            jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        )
    A0 = _to_scipy_csr(A)
    n0 = A0.shape[0]
    if A0.shape[0] != A0.shape[1]:
        raise ValueError(f"AMG needs a square operator, got {A0.shape}")
    if n_padded < n0:
        raise ValueError(f"n_padded={n_padded} < matrix size {n0}")
    if n_padded % n_shards:
        raise ValueError(
            f"n_padded={n_padded} not divisible by n_shards={n_shards}")

    level_mats, A_coarse_sp = _build_hierarchy(
        A0, theta=theta, smooth_prolongator=smooth_prolongator,
        coarse_size=coarse_size, max_levels=max_levels,
        near_nullspace=near_nullspace, blocksize=blocksize,
    )
    if dense_cap is None:
        dense_cap = max(coarse_size, 4000)

    L = len(level_mats)
    sizes = [m["A"].shape[0] for m in level_mats] + [A_coarse_sp.shape[0]]

    # sharded prefix: levels big enough to be worth the gather traffic
    split = 0
    while split < L and sizes[split] > agglomerate_below:
        split += 1

    # padded per-shard row counts for levels 0..split (split included:
    # its VECTOR arrives as local shards even though its operator is
    # replicated in the tail)
    cdiv = lambda a, b: -(-a // b)
    rps = [0] * (split + 1)
    rps[0] = n_padded // n_shards
    for l in range(1, split + 1):
        rps[l] = cdiv(cdiv(sizes[l], n_shards), 8) * 8
    padded = [r * n_shards for r in rps]
    for l in range(split + 1):
        if padded[l] < sizes[l]:
            raise AssertionError((l, padded[l], sizes[l]))

    # ---- replicated tail: literally the single-device cycle ------------
    tail_levels = _device_levels(level_mats[split:], dtype, level_layout,
                                 omega, smoother=smoother,
                                 cheb_lower=cheb_lower)
    coarse_apply, coarse_residual, coarse_meta = _coarse_solver(
        A_coarse_sp, dense_cap=dense_cap, dtype=dtype,
        level_layout=level_layout, omega=omega, nu=nu,
    )
    tail_vcycle = _make_vcycle(tail_levels, coarse_apply, nu,
                               smoother=smoother)

    # ---- sharded levels: per-shard blocked-ELL operator arrays ---------
    # For chebyshev, invd carries the RAW 1/d (the polynomial owns the
    # step sizes) and cheb_steps the static per-level coefficient
    # schedule (Python floats baked into the closure — no device scalars,
    # no extra collectives).
    op_arrays = []
    per_level_bn = []
    cheb_steps = []
    diag_scale = omega if smoother == "jacobi" else 1.0
    for l in range(split):
        m = level_mats[l]
        A_l = m["A"]
        d = A_l.diagonal()
        invd = np.zeros(padded[l])
        invd[: sizes[l]] = diag_scale / np.where(np.abs(d) > 0, d, 1.0)
        if smoother == "chebyshev":
            cheb_steps.append(
                _cheb_smooth_steps(*_cheb_interval(A_l, cheb_lower), nu)
            )
        bn_l = _block_of(rps[l])
        bn_c = _block_of(rps[l + 1])
        A_blocks, A_cols = _partition_level_op(
            A_l, n_shards, rps[l], padded[l], bn_l, dtype)
        PT_blocks, PT_cols = _partition_level_op(
            m["P"].T.tocsr(), n_shards, rps[l + 1], padded[l], bn_l, dtype)
        P_blocks, P_cols = _partition_level_op(
            m["P"], n_shards, rps[l], padded[l + 1], bn_c, dtype)
        op_arrays += [
            A_blocks, A_cols,
            invd.reshape(n_shards, rps[l]).astype(np.dtype(dtype)),
            PT_blocks, PT_cols, P_blocks, P_cols,
        ]
        per_level_bn.append((bn_l, bn_c))

    n_split = sizes[split]
    rps_split = rps[split]

    def make_local_apply(shards):
        # shards: 7 arrays per sharded level, in level order
        lv = [
            dict(zip(("A_b", "A_c", "invd", "PT_b", "PT_c", "P_b", "P_c"),
                     shards[7 * l : 7 * l + 7]))
            for l in range(split)
        ]

        def lmv(blocks, cols, bn, v_local):
            v_full = jax.lax.all_gather(v_local, axis, tiled=True)
            return _local_bell_matvec(blocks, cols, v_full.reshape(-1, bn))

        def a_mv(l, v_local):
            return lmv(lv[l]["A_b"], lv[l]["A_c"], per_level_bn[l][0],
                       v_local)

        def tail_at_split(b_local):
            full = jax.lax.all_gather(b_local, axis, tiled=True)
            z_true = tail_vcycle(0, full[:n_split])
            z_full = jnp.zeros_like(full).at[:n_split].set(z_true)
            return jax.lax.dynamic_slice_in_dim(
                z_full, jax.lax.axis_index(axis) * rps_split, rps_split
            )

        def pre_smooth(l, b_local):
            e = lv[l]
            if smoother == "chebyshev":
                step1, coeffs = cheb_steps[l]
                d = step1 * (e["invd"] * b_local)
                u = d
                for c_d, c_z in coeffs:
                    z = e["invd"] * (b_local - a_mv(l, u))
                    d = c_d * d + c_z * z
                    u = u + d
                return u
            u = e["invd"] * b_local  # first sweep from the zero guess
            for _ in range(nu - 1):
                u = u + e["invd"] * (b_local - a_mv(l, u))
            return u

        def post_smooth(l, u, b_local):
            e = lv[l]
            if smoother == "chebyshev":
                step1, coeffs = cheb_steps[l]
                z = e["invd"] * (b_local - a_mv(l, u))
                d = step1 * z
                u = u + d
                for c_d, c_z in coeffs:
                    z = e["invd"] * (b_local - a_mv(l, u))
                    d = c_d * d + c_z * z
                    u = u + d
                return u
            for _ in range(nu):
                u = u + e["invd"] * (b_local - a_mv(l, u))
            return u

        def v_cycle(l, b_local):
            if l == split:
                return tail_at_split(b_local)
            e = lv[l]
            u = pre_smooth(l, b_local)
            r = b_local - a_mv(l, u)
            r_c = lmv(e["PT_b"], e["PT_c"], per_level_bn[l][0], r)
            e_c = v_cycle(l + 1, r_c)
            u = u + lmv(e["P_b"], e["P_c"], per_level_bn[l][1], e_c)
            return post_smooth(l, u, b_local)

        def apply(r_local):
            z = v_cycle(0, r_local)
            for _ in range(cycles - 1):
                if split:
                    r = r_local - a_mv(0, z)
                else:
                    # whole hierarchy replicated: residual via the tail's
                    # level-0 operator (or the coarse solve's)
                    full_z = jax.lax.all_gather(z, axis, tiled=True)
                    full_r = jax.lax.all_gather(r_local, axis, tiled=True)
                    if tail_levels:
                        res = full_r[:n_split] - tail_levels[0]["A"].matvec(
                            full_z[:n_split])
                    else:
                        res = coarse_residual(full_r[:n_split],
                                              full_z[:n_split])
                    res_full = jnp.zeros_like(full_r).at[:n_split].set(res)
                    r = jax.lax.dynamic_slice_in_dim(
                        res_full, jax.lax.axis_index(axis) * rps[0], rps[0]
                    )
                z = z + v_cycle(0, r)
            return z

        return apply

    pre = ShardedPreconditioner(
        op_arrays=tuple(op_arrays),
        make_local_apply=make_local_apply,
        op_specs=(P(axis),) * len(op_arrays),
    )
    pre.level_sizes = tuple(sizes)
    pre.n_levels = L + 1
    pre.split = split
    pre.stalled_coarse = coarse_meta["stalled"]
    return pre
