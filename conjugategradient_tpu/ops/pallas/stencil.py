"""Pallas 3-D 7-point stencil kernel (north-star config 4, 256^3 grid).

Design: the grid iterates over groups of SX x-slabs.  Each step DMAs one
(SX+2, ny, nz) halo-inclusive window of the zero-padded input from HBM into
VMEM — a single megabyte-scale contiguous stream — and computes SX output
slabs entirely on-chip: the x-neighbors are adjacent slabs of the loaded
window, and the y/z neighbor shifts are in-register concatenations with a
zero edge (Dirichlet).  Adjacent windows re-read 2 halo slabs, so HBM
traffic is (1 + 2/SX) reads + 1 write per point — ~1.25x compulsory at
SX = 8.

The halo window starts at element offset g*SX, which is not a multiple of
the window length; BlockSpec index maps work in block units, so the input
stays in HBM (memory_space ANY) and the kernel issues its own DMA.

A first version streamed prev/cur/next as three separate (1, ny, nz) block
inputs; that triple-fetched every slab in 256 KB DMAs and ran ~1000x off
the roofline.  Lesson: one big overlapping manual window beats many aliased
pipeline blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(sx: int):
    def _window_dma(u_hbm, u_vmem, sems, g, slot):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(g * sx, sx + 2)],
            u_vmem.at[slot],
            sems.at[slot],
        )

    def _kernel(u_hbm, c_ref, off_ref, y_ref, u_vmem, sems):
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        two = jnp.asarray(2, g.dtype)
        slot = jax.lax.rem(g, two)
        nslot = jax.lax.rem(g + 1, two)

        # double buffering: window g was started at step g-1 (or here for
        # g == 0); start window g+1 before computing on window g.
        @pl.when(g == 0)
        def _():
            _window_dma(u_hbm, u_vmem, sems, 0, 0).start()

        @pl.when(g + 1 < ng)
        def _():
            _window_dma(u_hbm, u_vmem, sems, g + 1, nslot).start()

        _window_dma(u_hbm, u_vmem, sems, g, slot).wait()

        c = c_ref[0]
        w = off_ref[0]
        blk = u_vmem[slot]  # (sx+2, ny, nz)
        cur = blk[1:-1]  # (sx, ny, nz)
        xm = blk[:-2]
        xp = blk[2:]
        ny, nz = cur.shape[1], cur.shape[2]
        zrow = jnp.zeros((sx, 1, nz), dtype=cur.dtype)
        zcol = jnp.zeros((sx, ny, 1), dtype=cur.dtype)
        yp = jnp.concatenate([cur[:, 1:, :], zrow], axis=1)
        ym = jnp.concatenate([zrow, cur[:, :-1, :]], axis=1)
        zp = jnp.concatenate([cur[:, :, 1:], zcol], axis=2)
        zm = jnp.concatenate([zcol, cur[:, :, :-1]], axis=2)
        y_ref[...] = c * cur + w * (xm + xp + yp + ym + zp + zm)

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret", "slab_group"))
def stencil7_pallas(
    u: jax.Array, center, off, interpret: bool = False, slab_group: int = 8
) -> jax.Array:
    """y = center*u + off*(6-neighbor sum), zero Dirichlet boundaries.

    u: (nx, ny, nz); requires nz % 128 == 0 and ny % 8 == 0 for clean
    tiling (validated here — the auto dispatcher no longer guards this since
    the XLA path became the default and this kernel is opt-in).
    """
    nx, ny, nz = u.shape
    if nz % 128 or ny % 8:
        raise ValueError(
            f"stencil7_pallas needs nz % 128 == 0 and ny % 8 == 0, got "
            f"(ny={ny}, nz={nz}); use the XLA path (use_pallas='never')"
        )
    dtype = u.dtype
    sx = slab_group
    while nx % sx:
        sx //= 2
    sx = max(sx, 1)
    # VMEM budget: 2 input windows (sx+2 slabs each) + double-buffered output
    # blocks (2*sx slabs) must stay under the ~16 MB scoped limit.
    slab_bytes = ny * nz * jnp.dtype(dtype).itemsize
    while sx > 1 and (4 * sx + 4) * slab_bytes > 10 * 1024 * 1024:
        sx //= 2
    # the VMEM halving can break divisibility (e.g. nx=15, sx 5 -> 2 would
    # drop the last slab); restore it or the output tail is garbage
    while nx % sx:
        sx -= 1

    up = jnp.pad(u, ((1, 1), (0, 0), (0, 0)))
    c = jnp.full((1,), center, dtype=dtype)
    o = jnp.full((1,), off, dtype=dtype)

    y = pl.pallas_call(
        _make_kernel(sx),
        grid=(nx // sx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded u stays in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((sx, ny, nz), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), dtype),
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((2, sx + 2, ny, nz), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * nx * ny * nz,
            bytes_accessed=2 * nx * ny * nz * u.dtype.itemsize,
            transcendentals=0,
        ),
    )(up, c, o)
    return y
