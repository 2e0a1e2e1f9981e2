"""Row(x-slab)-sharded geometric multigrid for the matrix-free stencil.

Runs the SAME operator as :func:`~conjugategradient_tpu.solver.multigrid.
multigrid_preconditioner` — identical smoothing, transfers, scale factors,
and dense coarsest solve — but over a shard_map'd x-slab decomposition
(the decomposition of parallel/sharded_stencil.py), so MG-PCG scales the
grid past one chip's HBM with the iteration counts of the single-device
cycle.  Parity is the design invariant, asserted by
tests/test_sharded_multigrid.py: the sharded apply must match the
single-device apply to f64 roundoff, and sharded MG-PCG must track the
single-device iteration count exactly.

Communication structure per V-cycle level (all inside the one jitted
shard_map program):

* **Smoothing / residual:** each sweep's 7-point apply needs one y-z plane
  from each x-neighbor — 2 ``ppermute``s of ``ny_l * nz_l`` floats
  (``ring_halo``), shrinking 4x per level.
* **x-restriction:** coarse slab point ``cc`` (global odd-index
  convention) reads fine ``f[2cc], f[2cc+1], f[2cc+2]``; the last read
  crosses to the right neighbor — the same ring halo supplies it, and the
  edge shards' ppermute zeros ARE the zero padding the single-device
  ``_restrict_axis0`` applies.  y/z restriction is shard-local.
* **x-prolongation:** even fine plane ``2cc`` reads coarse ``e[cc-1]``,
  crossing to the left neighbor — ring halo again; interleave is the same
  stack+reshape as the single-device path (no scatters).
* **Coarse-grid agglomeration:** when the local slab thins to
  ``sx_l < 2`` (or the whole level fits ``agglomerate_below``), one
  ``all_gather`` of the tiny coarse residual replicates it and every
  shard runs the remaining levels of the SINGLE-DEVICE cycle
  (``solver.multigrid._make_vcycle`` — literally the same code object)
  deterministically, then slices back its own slab.  This is the standard
  answer to "coarse grids don't shard": below a few thousand points the
  volume is latency-bound anyway, and replication costs one small
  collective instead of log-depth halo traffic on starved shards.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..solver.multigrid import (
    _dense_stencil_inverse,
    _level_shapes,
    _make_vcycle,
    _prolong,
    _restrict,
    _stencil_rho_bound,
)
from .local_ops import ring_halo
from .sharded_stencil import _local_stencil_matvec


def _halo_window(u: jax.Array, axis: str) -> jax.Array:
    """(sx, ny, nz) slab -> (sx+2, ny, nz) with neighbor x-planes (edge
    shards get zeros = the Dirichlet boundary)."""
    sx, ny, nz = u.shape
    return ring_halo(u.reshape(-1), ny * nz, axis).reshape(sx + 2, ny, nz)


def _local_apply(u: jax.Array, center, off, axis: str) -> jax.Array:
    sx, ny, nz = u.shape
    return _local_stencil_matvec(
        u.reshape(-1), center, off, sx, ny, nz, axis
    ).reshape(sx, ny, nz)


def _restrict_x_sharded(f: jax.Array, axis: str) -> jax.Array:
    """Full-weighting x-restriction on a slab whose EVEN local length keeps
    the global odd-index convention aligned (asserted at build time)."""
    sx, ny, nz = f.shape
    sxc = sx // 2
    w = _halo_window(f, axis)
    a = w[1 : 2 * sxc : 2]        # f[2cc]
    b = w[2 : 2 * sxc + 1 : 2]    # f[2cc+1]
    c = w[3 : 2 * sxc + 2 : 2]    # f[2cc+2]; last one is the right halo
    return 0.25 * a + 0.5 * b + 0.25 * c


def _prolong_x_sharded(e: jax.Array, axis: str) -> jax.Array:
    sxc, ny, nz = e.shape
    ew = _halo_window(e, axis)
    even = 0.5 * (ew[:-2] + ew[1:-1])  # e[cc-1] + e[cc]; cc=0 reads halo
    odd = ew[1:-1]
    return jnp.stack([even, odd], axis=1).reshape(2 * sxc, ny, nz)


def sharded_multigrid_preconditioner(
    grid_shape: Tuple[int, int, int],
    n_shards: int,
    *,
    axis: str = "rows",
    center: float = 6.0,
    off: float = -1.0,
    dtype=jnp.float32,
    nu: int = 2,
    omega: float = 0.85,
    cycles: int = 1,
    coarse_size: int = 512,
    agglomerate_below: int = 32768,
    smoother: str = "jacobi",
    cheb_lower: float = 1.0 / 6.0,
) -> Callable[[jax.Array], jax.Array]:
    """Build the per-shard V-cycle apply for ``sharded_stencil_cg_solve``.

    Returns ``M_local(r_local_flat) -> z_local_flat`` meant to execute
    INSIDE the solver's shard_map (it issues ring-halo ppermutes and one
    coarse all_gather per cycle).  The operator it applies is numerically
    the single-device :func:`multigrid_preconditioner`'s — pass the same
    ``nu/omega/cycles/coarse_size`` to both and iteration counts match.

    Args mirror the single-device builder, plus:
      grid_shape / n_shards / axis: the x-slab decomposition (``nx`` must
        be divisible by ``n_shards``, like the sharded stencil solve).
      agglomerate_below: levels whose TOTAL point count falls at or below
        this run replicated after one all_gather (they are latency-bound;
        default 32K points = 128 KB f32).  Agglomeration also triggers
        when a shard's slab would thin below 2 planes, where the odd-index
        coarsening can no longer stay shard-aligned.
      smoother / cheb_lower: as in the single-device builder ("chebyshev"
        = the degree-nu semi-iteration; same ring-halo count per sweep
        set as Jacobi since every polynomial step is one stencil apply).
    """
    nx, ny, nz = grid_shape
    if nx % n_shards:
        raise ValueError(f"nx={nx} must be divisible by n_shards={n_shards}")
    if center <= 0.0:
        raise ValueError(
            f"stencil center must be positive for an SPD operator, got {center}"
        )
    if nu < 1:
        raise ValueError(f"nu must be >= 1, got {nu}")
    if cycles < 1:
        raise ValueError(f"cycles must be >= 1, got {cycles}")
    if smoother not in ("jacobi", "chebyshev"):
        raise ValueError(
            f"smoother must be 'jacobi' or 'chebyshev', got {smoother!r}")
    if not (0.0 < cheb_lower < 1.0):
        raise ValueError(f"cheb_lower must be in (0, 1), got {cheb_lower}")

    shapes = _level_shapes(grid_shape, coarse_size, None)
    # sharded prefix: levels whose slab stays even-length and worth sharding
    split = 0
    while split < len(shapes) - 1:
        nx_l = shapes[split][0]
        sx_l = nx_l // n_shards
        if (
            nx_l % n_shards
            or sx_l % 2
            or int(np.prod(shapes[split])) <= agglomerate_below
        ):
            break
        split += 1

    c_arr = jnp.asarray(center, dtype=dtype)
    o_arr = jnp.asarray(off, dtype=dtype)
    cheb_steps = None
    if smoother == "chebyshev":
        from ..solver.amg import _cheb_smooth_steps

        rho_b = _stencil_rho_bound(shapes[0], center, off)
        cheb_steps = _cheb_smooth_steps(cheb_lower * rho_b, rho_b, nu)
        inv_diag_omega = jnp.asarray(1.0 / center, dtype=dtype)
    else:
        inv_diag_omega = jnp.asarray(omega / center, dtype=dtype)
    inv_coarse = jnp.asarray(
        _dense_stencil_inverse(shapes[-1], center, off), dtype=dtype
    )
    # the replicated tail is literally the single-device cycle over the
    # remaining hierarchy — same code object, so parity is by construction
    tail_vcycle = _make_vcycle(
        shapes[split:], c_arr, o_arr, inv_diag_omega, inv_coarse, nu,
        smoother=smoother, cheb_steps=cheb_steps,
    )
    sx_top = shapes[0][0] // n_shards

    def smooth(u, b, axis_name):
        if smoother == "chebyshev":
            step1, coeffs = cheb_steps
            z = inv_diag_omega * (b - _local_apply(u, c_arr, o_arr, axis_name))
            d = step1 * z
            u = u + d
            for c_d, c_z in coeffs:
                z = inv_diag_omega * (
                    b - _local_apply(u, c_arr, o_arr, axis_name))
                d = c_d * d + c_z * z
                u = u + d
            return u
        for _ in range(nu):
            u = u + inv_diag_omega * (b - _local_apply(u, c_arr, o_arr, axis_name))
        return u

    def smooth_from_zero(b, axis_name):
        if smoother == "chebyshev":
            step1, coeffs = cheb_steps
            d = step1 * (inv_diag_omega * b)
            u = d
            for c_d, c_z in coeffs:
                z = inv_diag_omega * (
                    b - _local_apply(u, c_arr, o_arr, axis_name))
                d = c_d * d + c_z * z
                u = u + d
            return u
        u = inv_diag_omega * b  # sweep 1 from the zero guess
        for _ in range(nu - 1):
            u = u + inv_diag_omega * (b - _local_apply(u, c_arr, o_arr, axis_name))
        return u

    def v_cycle(level: int, b: jax.Array) -> jax.Array:
        if level == split:
            full = jax.lax.all_gather(b, axis, axis=0, tiled=True)
            e_full = tail_vcycle(0, full)
            sx_l = shapes[level][0] // n_shards
            return jax.lax.dynamic_slice_in_dim(
                e_full, jax.lax.axis_index(axis) * sx_l, sx_l, 0
            )
        u = smooth_from_zero(b, axis)
        r = b - _local_apply(u, c_arr, o_arr, axis)
        fine_local = (shapes[level][0] // n_shards,) + shapes[level][1:]
        coarse_local = (shapes[level + 1][0] // n_shards,) + shapes[level + 1][1:]
        r = _restrict_x_sharded(r, axis)
        # y/z restriction is shard-local: reuse the single-device transfer
        # (it skips the already-coarsened x axis via the shape comparison)
        r_c = 4.0 * _restrict(r, coarse_local)
        e_c = v_cycle(level + 1, r_c)
        # prolong x first, then y/z — the same axis order as the
        # single-device _prolong, so the roundings line up too
        e = _prolong_x_sharded(e_c, axis)
        u = u + _prolong(e, fine_local)
        return smooth(u, b, axis)

    def apply(rhs_flat: jax.Array) -> jax.Array:
        b = rhs_flat.reshape(sx_top, ny, nz)
        z = v_cycle(0, b)
        for _ in range(cycles - 1):
            z = z + v_cycle(0, b - _local_apply(z, c_arr, o_arr, axis))
        return z.reshape(rhs_flat.shape)

    return apply
