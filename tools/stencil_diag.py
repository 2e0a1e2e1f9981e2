#!/usr/bin/env python
"""Diagnose where the Pallas stencil kernel's time goes: same DMA schedule,
three compute variants — copy-only, x-adds-only, full 7-point.  The deltas
attribute time to (a) the halo-window streaming, (b) the slab adds,
(c) the y/z roll+mask shuffles.  One JSON line."""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from conjugategradient_tpu.ops.pallas.stencil import _make_kernel  # noqa: E402


def _variant_kernel(sx: int, nx: int, mode: str):
    ng = nx // sx

    def _start(u_hbm, u_vmem, sems, g, slot):
        pltpu.make_async_copy(
            u_hbm.at[pl.ds(g * sx, sx)], u_vmem.at[slot, pl.ds(1, sx)],
            sems.at[slot, 0],
        ).start()

        @pl.when(g > 0)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(g * sx - 1, 1)], u_vmem.at[slot, pl.ds(0, 1)],
                sems.at[slot, 1],
            ).start()

        @pl.when(g < ng - 1)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(g * sx + sx, 1)],
                u_vmem.at[slot, pl.ds(sx + 1, 1)], sems.at[slot, 2],
            ).start()

    def _wait(u_hbm, u_vmem, sems, g, slot):
        pltpu.make_async_copy(
            u_hbm.at[pl.ds(g * sx, sx)], u_vmem.at[slot, pl.ds(1, sx)],
            sems.at[slot, 0],
        ).wait()

        @pl.when(g > 0)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(g * sx - 1, 1)], u_vmem.at[slot, pl.ds(0, 1)],
                sems.at[slot, 1],
            ).wait()

        @pl.when(g < ng - 1)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(g * sx + sx, 1)],
                u_vmem.at[slot, pl.ds(sx + 1, 1)], sems.at[slot, 2],
            ).wait()

    def _kernel(u_hbm, c_ref, off_ref, y_ref, u_vmem, sems):
        g = pl.program_id(0)
        two = jnp.asarray(2, g.dtype)
        slot = jax.lax.rem(g, two)
        nslot = jax.lax.rem(g + 1, two)

        @pl.when(g == 0)
        def _():
            _start(u_hbm, u_vmem, sems, 0, 0)

        @pl.when(g + 1 < ng)
        def _():
            _start(u_hbm, u_vmem, sems, g + 1, nslot)

        _wait(u_hbm, u_vmem, sems, g, slot)

        c = c_ref[0]
        w = off_ref[0]
        blk = u_vmem[slot]
        cur = blk[1:-1]
        if mode == "copy":
            y_ref[...] = c * cur
            return
        xm = blk[:-2]
        xp = blk[2:]
        if mode == "xadds":
            y_ref[...] = c * cur + w * (xm + xp)
            return
        ny, nz = cur.shape[1], cur.shape[2]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        ym = jnp.where(rows == 0, 0.0, pltpu.roll(cur, 1, axis=1))
        yp = jnp.where(rows == ny - 1, 0.0, pltpu.roll(cur, ny - 1, axis=1))
        zm = jnp.where(cols == 0, 0.0, pltpu.roll(cur, 1, axis=2))
        zp = jnp.where(cols == nz - 1, 0.0, pltpu.roll(cur, nz - 1, axis=2))
        y_ref[...] = c * cur + w * ((xm + xp) + (ym + yp) + (zm + zp))

    return _kernel


@functools.partial(jax.jit, static_argnames=("sx", "mode"))
def _run(u, sx: int, mode: str):
    nx, ny, nz = u.shape
    return pl.pallas_call(
        _variant_kernel(sx, nx, mode),
        grid=(nx // sx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((sx, ny, nz), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, sx + 2, ny, nz), u.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(u, jnp.full((1,), 6.0, u.dtype), jnp.full((1,), -1.0, u.dtype))


def main() -> int:
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s, time_loop_s

    nx = 256
    u = jnp.ones((nx, nx, nx), jnp.float32)
    ovh = rpc_overhead_s()
    ideal = 2 * nx**3 * 4
    out = {}
    for sx in (8, 16):
        for mode in ("copy", "xadds", "full"):
            t = time_loop_s(
                lambda v, s=sx, m=mode: _run(v, s, m) * 1e-2,
                u, K=128, iters=3, overhead_s=ovh,
            )
            out[f"sx{sx}_{mode}"] = {
                "time_ms": round(t * 1e3, 4),
                "gbps_ideal": round(ideal / t / 1e9, 1),
            }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
