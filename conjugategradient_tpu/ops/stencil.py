"""Matrix-free 3-D 7-point stencil operator (north-star config 4).

``y = center·x + off·(x[i±1] + x[j±1] + x[k±1])`` with zero-Dirichlet
boundaries.  The jnp implementation below expresses the six neighbor shifts
as padded slices; XLA fuses them into a single pass over the volume, which is
already close to streaming speed.  A hand-tiled Pallas version lives in
``ops/pallas/stencil.py`` (opt-in via ``use_pallas="always"``); measured on
v5e the XLA path is faster, so "auto" resolves to XLA.

The reference has no matrix-free path at all (its only operator is CSR,
LinearAlgebraTypes.hpp:57-132) — this subsystem is the BASELINE.json
extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _neighbor_sum(u: jax.Array) -> jax.Array:
    """Sum of the six axis neighbors with zero boundaries, via shifted pads."""
    s = jnp.pad(u, ((1, 1), (0, 0), (0, 0)))[2:, :, :] + jnp.pad(
        u, ((1, 1), (0, 0), (0, 0))
    )[:-2, :, :]
    s = s + jnp.pad(u, ((0, 0), (1, 1), (0, 0)))[:, 2:, :] + jnp.pad(
        u, ((0, 0), (1, 1), (0, 0))
    )[:, :-2, :]
    s = s + jnp.pad(u, ((0, 0), (0, 0), (1, 1)))[:, :, 2:] + jnp.pad(
        u, ((0, 0), (0, 0), (1, 1))
    )[:, :, :-2]
    return s


def stencil7_matvec(op, x: jax.Array, use_pallas: str = "auto") -> jax.Array:
    """Apply the 7-point operator to a flat vector."""
    nx, ny, nz = op.grid_shape
    u = x.reshape(nx, ny, nz)

    # Measured on v5e, 256^3 f32 (K=128 in-jit chains): XLA-fused shifts
    # 0.395 ms (340 GB/s ideal-traffic) vs the Pallas halo-window kernel
    # 0.589 ms — XLA wins (its pipelined blocks overlap better than the
    # kernel's manual double buffering), so "auto" resolves to XLA and the
    # Pallas kernel stays opt-in via "always".
    pick_pallas = use_pallas == "always"

    if pick_pallas:
        from .pallas.stencil import stencil7_pallas

        y = stencil7_pallas(u, op.center, op.off)
    else:
        y = op.center * u + op.off * _neighbor_sum(u)
    return y.reshape(-1)


def poisson7_csr(grid_shape, dtype=np.float64):
    """Explicit CSR assembly of the same operator (for cross-checking the
    matrix-free path against the sparse path on small grids)."""
    nx, ny, nz = grid_shape
    n = nx * ny * nz

    def idx(i, j, k):
        return (i * ny + j) * nz + k

    rows, cols, vals = [], [], []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                r = idx(i, j, k)
                rows.append(r)
                cols.append(r)
                vals.append(6.0)
                for di, dj, dk in (
                    (-1, 0, 0),
                    (1, 0, 0),
                    (0, -1, 0),
                    (0, 1, 0),
                    (0, 0, -1),
                    (0, 0, 1),
                ):
                    ii, jj, kk = i + di, j + dj, k + dk
                    if 0 <= ii < nx and 0 <= jj < ny and 0 <= kk < nz:
                        rows.append(r)
                        cols.append(idx(ii, jj, kk))
                        vals.append(-1.0)
    from ..types import CSRMatrix

    return CSRMatrix.from_coo(
        np.array(rows), np.array(cols), np.array(vals, dtype=dtype), (n, n)
    )
