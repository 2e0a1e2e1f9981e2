"""Row-sharded matrix-free stencil CG (north-star configs 4+5 combined).

The 3-D 7-point operator (types.StencilOperator) sharded over the leading
grid axis: each chip owns ``sx = nx / n_shards`` x-slabs of the volume and
the matching slices of x/b/r/p.  The SpMV halo is exactly one y-z plane
(ny*nz elements) from each ring neighbor — the flattened vector's first and
last ``ny*nz`` entries — so the existing :func:`~.sharded_cg.ring_halo`
primitive applies unchanged, and edge shards' zero fill from ppermute is the
operator's Dirichlet boundary.

Communication per iteration: two ppermutes of ny*nz floats + two psum dots.
No matrix bytes exist at all; per-chip traffic is the compulsory
read-x/write-y streams of its slab block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..solver.cg import CGInfo
from .sharded_cg import _next_m_token, _sharded_pcg, make_row_mesh, ring_halo


def _local_stencil_matvec(p_local, center, off, sx, ny, nz, axis):
    """7-point apply on one shard's slab block with ring-halo'd x planes."""
    plane = ny * nz
    window = ring_halo(p_local, plane, axis)  # (sx+2)*plane flat
    u = window.reshape(sx + 2, ny, nz)
    cur = u[1:-1]
    xm = u[:-2]
    xp = u[2:]
    zrow = jnp.zeros((sx, 1, nz), dtype=cur.dtype)
    zcol = jnp.zeros((sx, ny, 1), dtype=cur.dtype)
    yp = jnp.concatenate([cur[:, 1:, :], zrow], axis=1)
    ym = jnp.concatenate([zrow, cur[:, :-1, :]], axis=1)
    zp = jnp.concatenate([cur[:, :, 1:], zcol], axis=2)
    zm = jnp.concatenate([zcol, cur[:, :, :-1]], axis=2)
    y = center * cur + off * (xm + xp + yp + ym + zp + zm)
    return y.reshape(-1)


def sharded_stencil_cg_solve(
    grid_shape: Tuple[int, int, int],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    center: float = 6.0,
    off: float = -1.0,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    M_local=None,
):
    """Row(x-slab)-sharded CG on the matrix-free 7-point operator.

    Args:
      grid_shape: (nx, ny, nz); nx must divide evenly by the mesh size.
      b: flat (nx*ny*nz,) RHS.
      center/off: stencil coefficients (Poisson: 6, -1).
      inv_diag: optional Jacobi (for constant-coefficient stencils this is a
        uniform scaling with no convergence effect; accepted for parity).
      M_local: optional per-shard preconditioner apply ``r_local ->
        z_local`` executed INSIDE the shard_map (it may issue its own
        collectives) — build with
        :func:`~conjugategradient_tpu.parallel.sharded_multigrid.
        sharded_multigrid_preconditioner`.  Mutually exclusive with
        ``inv_diag``.  Reuse the same closure across solves to reuse the
        compiled program (the jit cache keys on its identity).

    Returns (x, CGInfo); x sharded like b.
    """
    nx, ny, nz = grid_shape
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    if nx % n_shards:
        raise ValueError(f"nx={nx} must be divisible by n_shards={n_shards}")
    sx = nx // n_shards
    n = nx * ny * nz
    assert b.shape == (n,), (b.shape, n)
    maxiter = int(n + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    c = float(center)
    o = float(off)
    if inv_diag is not None and M_local is not None:
        raise ValueError("pass either inv_diag or M_local, not both")
    with_m = inv_diag is not None

    from .sharded_cg import _SOLVE_CACHE, _mesh_key

    if M_local is not None and not hasattr(M_local, "_cg_cache_token"):
        # a stable identity token: raw id() can be recycled after GC and
        # would silently reuse a stale compiled program
        M_local._cg_cache_token = _next_m_token()
    key = ("stencil", _mesh_key(mesh), axis, maxiter, float(tol), with_m,
           (sx, ny, nz, c, o), str(b.dtype),
           None if M_local is None else M_local._cg_cache_token)
    solve_jit = _SOLVE_CACHE.get(key)
    if solve_jit is None:
        def solve_shard(b_s, x0_s, inv_diag_s=None):
            def local_matvec(v_local):
                return _local_stencil_matvec(
                    v_local.astype(b.dtype), c, o, sx, ny, nz, axis
                )

            return _sharded_pcg(
                local_matvec, b_s, x0_s,
                M_local if inv_diag_s is None else inv_diag_s,
                tol_arr, maxiter, axis,
            )

        in_specs = [P(axis)] * (3 if with_m else 2)
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _SOLVE_CACHE[key] = solve_jit

    put = lambda a: jax.device_put(a, NamedSharding(mesh, P(axis)))
    args = [put(b), put(x0)]
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
