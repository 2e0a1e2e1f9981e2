"""Pallas 3-D 7-point stencil kernel (north-star config 4, 256³ grid).

Grid over x-slabs: program ``i`` owns slice ``u[i, :, :]`` and reads its two
x-neighbors.  The input is zero-padded by one slab on each x side so the
boundary needs no branches; y/z neighbor shifts happen in-register on the
(ny, nz) tile via concatenation with a zero edge (Dirichlet).

Per slab the kernel reads 3·ny·nz and writes ny·nz floats, but consecutive
programs re-read overlapping slabs from the pipeline's VMEM windows, so the
effective HBM traffic approaches read-once + write-once — the stencil
analogue of streaming SpMV at roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(prev_ref, cur_ref, next_ref, c_ref, off_ref, y_ref):
    cur = cur_ref[0]  # (ny, nz)
    ny, nz = cur.shape
    zrow = jnp.zeros((1, nz), dtype=cur.dtype)
    zcol = jnp.zeros((ny, 1), dtype=cur.dtype)
    up = jnp.concatenate([cur[1:, :], zrow], axis=0)
    down = jnp.concatenate([zrow, cur[:-1, :]], axis=0)
    right = jnp.concatenate([cur[:, 1:], zcol], axis=1)
    left = jnp.concatenate([zcol, cur[:, :-1]], axis=1)
    nb = prev_ref[0] + next_ref[0] + up + down + left + right
    y_ref[0] = c_ref[0] * cur + off_ref[0] * nb


@functools.partial(jax.jit, static_argnames=("interpret",))
def stencil7_pallas(u: jax.Array, center, off, interpret: bool = False) -> jax.Array:
    """y = center·u + off·(6-neighbor sum), zero Dirichlet boundaries.

    u: (nx, ny, nz); nz should be a multiple of 128 and ny of 8 for clean
    tiling (the dispatcher in ops/stencil.py enforces this).
    """
    nx, ny, nz = u.shape
    dtype = u.dtype
    up = jnp.pad(u, ((1, 1), (0, 0), (0, 0)))
    c = jnp.full((1,), center, dtype=dtype)
    o = jnp.full((1,), off, dtype=dtype)

    y = pl.pallas_call(
        _kernel,
        grid=(nx,),
        in_specs=[
            pl.BlockSpec((1, ny, nz), lambda i: (i, 0, 0)),  # prev (padded idx i)
            pl.BlockSpec((1, ny, nz), lambda i: (i + 1, 0, 0)),  # cur
            pl.BlockSpec((1, ny, nz), lambda i: (i + 2, 0, 0)),  # next
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ny, nz), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * nx * ny * nz,
            bytes_accessed=2 * nx * ny * nz * u.dtype.itemsize,
            transcendentals=0,
        ),
    )(up, up, up, c, o)
    return y
