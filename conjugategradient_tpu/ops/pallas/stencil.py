"""Pallas 3-D 7-point stencil kernel, v2 (north-star config 4, 256^3 grid).

Design: the grid iterates over groups of SX x-slabs.  Each step DMAs the
(SX, ny, nz) body plus two single-plane halos straight from the UNPADDED
input in HBM into a (SX+2)-plane VMEM window (edge steps zero the missing
halo plane — the Dirichlet boundary), then computes SX output slabs on-chip:

* x-neighbors are adjacent planes of the loaded window (free slices);
* y/z neighbors are ``pltpu.roll`` lane/sublane rotations with the wrapped
  row/column masked to zero — in-register shuffles, NOT the v1
  ``jnp.concatenate``-with-zero-edges which forced Mosaic relayouts.

HBM traffic is (1 + 2/SX) reads + 1 write per point.  v1 additionally
``jnp.pad``-ed the whole volume before the kernel — a full extra read+write
of the 67 MB volume per matvec that halved the achieved "ideal" bandwidth;
v2 reads the input in place.

A v0 streamed prev/cur/next as three separate (1, ny, nz) block inputs;
that triple-fetched every slab in 256 KB DMAs and ran ~1000x off the
roofline.  Lesson: one big overlapping manual window beats many aliased
pipeline blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(sx: int, nx: int):
    ng = nx // sx

    def _start_window(u_hbm, u_vmem, sems, g, slot):
        """DMA window g into slot: body planes [g*sx, g*sx+sx) -> rows
        1..sx, plus halo planes g*sx-1 -> row 0 and g*sx+sx -> row sx+1
        when they exist.  Missing halos are zeroed at compute time."""
        body = pltpu.make_async_copy(
            u_hbm.at[pl.ds(g * sx, sx)],
            u_vmem.at[slot, pl.ds(1, sx)],
            sems.at[slot, 0],
        )
        body.start()

        @pl.when(g > 0)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(g * sx - 1, 1)],
                u_vmem.at[slot, pl.ds(0, 1)],
                sems.at[slot, 1],
            ).start()

        @pl.when(g < ng - 1)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(g * sx + sx, 1)],
                u_vmem.at[slot, pl.ds(sx + 1, 1)],
                sems.at[slot, 2],
            ).start()

    def _wait_window(u_hbm, u_vmem, sems, g, slot):
        pltpu.make_async_copy(
            u_hbm.at[pl.ds(g * sx, sx)],
            u_vmem.at[slot, pl.ds(1, sx)],
            sems.at[slot, 0],
        ).wait()

        @pl.when(g > 0)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(g * sx - 1, 1)],
                u_vmem.at[slot, pl.ds(0, 1)],
                sems.at[slot, 1],
            ).wait()

        @pl.when(g < ng - 1)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(g * sx + sx, 1)],
                u_vmem.at[slot, pl.ds(sx + 1, 1)],
                sems.at[slot, 2],
            ).wait()

    def _kernel(u_hbm, c_ref, off_ref, y_ref, u_vmem, sems):
        g = pl.program_id(0)
        two = jnp.asarray(2, g.dtype)
        slot = jax.lax.rem(g, two)
        nslot = jax.lax.rem(g + 1, two)

        # double buffering: window g was started at step g-1 (or here for
        # g == 0); start window g+1 before computing on window g.
        @pl.when(g == 0)
        def _():
            _start_window(u_hbm, u_vmem, sems, 0, 0)

        @pl.when(g + 1 < ng)
        def _():
            _start_window(u_hbm, u_vmem, sems, g + 1, nslot)

        _wait_window(u_hbm, u_vmem, sems, g, slot)

        # Dirichlet: the grid-edge windows have no halo plane — zero it
        @pl.when(g == 0)
        def _():
            u_vmem[slot, 0] = jnp.zeros_like(u_vmem[slot, 0])

        @pl.when(g == ng - 1)
        def _():
            u_vmem[slot, sx + 1] = jnp.zeros_like(u_vmem[slot, sx + 1])

        c = c_ref[0]
        w = off_ref[0]
        blk = u_vmem[slot]  # (sx+2, ny, nz)
        cur = blk[1:-1]  # (sx, ny, nz)
        xm = blk[:-2]
        xp = blk[2:]
        ny, nz = cur.shape[1], cur.shape[2]
        # y/z neighbor shifts: circular roll (in-register sublane/lane
        # rotation) with the wrapped row/column zeroed via an iota mask
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        # pltpu.roll wants non-negative shifts: a -1 roll is a size-1 roll
        ym = jnp.where(rows == 0, 0.0, pltpu.roll(cur, 1, axis=1))
        yp = jnp.where(rows == ny - 1, 0.0, pltpu.roll(cur, ny - 1, axis=1))
        zm = jnp.where(cols == 0, 0.0, pltpu.roll(cur, 1, axis=2))
        zp = jnp.where(cols == nz - 1, 0.0, pltpu.roll(cur, nz - 1, axis=2))
        y_ref[...] = c * cur + w * ((xm + xp) + (ym + yp) + (zm + zp))

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret", "slab_group"))
def stencil7_pallas(
    u: jax.Array, center, off, interpret: bool = False, slab_group: int = 16
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
    # blocks (2*sx slabs); bigger sx = less halo re-read (1 + 2/sx reads).
    slab_bytes = ny * nz * jnp.dtype(dtype).itemsize
    while sx > 1 and (4 * sx + 4) * slab_bytes > 24 * 1024 * 1024:
        sx //= 2
    # the VMEM halving can break divisibility (e.g. nx=15, sx 5 -> 2 would
    # drop the last slab); restore it or the output tail is garbage
    while nx % sx:
        sx -= 1

    c = jnp.full((1,), center, dtype=dtype)
    o = jnp.full((1,), off, dtype=dtype)

    y = pl.pallas_call(
        _make_kernel(sx, nx),
        grid=(nx // sx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # u stays in HBM, unpadded
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((sx, ny, nz), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), dtype),
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((2, sx + 2, ny, nz), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * nx * ny * nz,
            bytes_accessed=2 * nx * ny * nz * u.dtype.itemsize,
            transcendentals=0,
        ),
    )(u, c, o)
    return y
