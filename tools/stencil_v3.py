#!/usr/bin/env python
"""Stencil v3 experiment: let Pallas' automatic pipeline stream everything.

v2's manual halo-window DMA runs at ~340 GB/s-ideal even with compute
removed (tools/stencil_diag.py) — the hand schedule can't keep the bus
busy.  v3 goes back to BlockSpec pipelining with THREE views of x:

  * body block  (sx, ny, nz) at block index g           — read once
  * left halo   (1, ny, nz) at plane index g*sx - 1     — clamped at 0
  * right halo  (1, ny, nz) at plane index g*sx + sx    — clamped at nx-1

Index maps may compute with g (they trace to scalar jaxprs), so the edge
clamp is jnp.clip; the clamped duplicate plane is zeroed in-kernel (the
Dirichlet boundary).  Everything double-buffers through the standard
pipeline — no manual semaphores.  Also times a copy-only variant to see
the pipeline's own ceiling.  One JSON line.
"""

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


def _kernel(mode: str, ng: int):
    def kernel(body_ref, left_ref, right_ref, c_ref, off_ref, y_ref):
        g = pl.program_id(0)
        cur = body_ref[...]  # (sx, ny, nz)
        if mode == "copy":
            y_ref[...] = c_ref[0] * cur
            return
        c = c_ref[0]
        w = off_ref[0]
        sx, ny, nz = cur.shape
        left = jnp.where(g == 0, 0.0, left_ref[0])  # clamped dup -> Dirichlet 0
        right = jnp.where(g == ng - 1, 0.0, right_ref[0])
        xm = jnp.concatenate([left[None], cur[:-1]], axis=0)
        xp = jnp.concatenate([cur[1:], right[None]], axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        ym = jnp.where(rows == 0, 0.0, pltpu.roll(cur, 1, axis=1))
        yp = jnp.where(rows == ny - 1, 0.0, pltpu.roll(cur, ny - 1, axis=1))
        zm = jnp.where(cols == 0, 0.0, pltpu.roll(cur, 1, axis=2))
        zp = jnp.where(cols == nz - 1, 0.0, pltpu.roll(cur, nz - 1, axis=2))
        y_ref[...] = c * cur + w * ((xm + xp) + (ym + yp) + (zm + zp))

    return kernel


@functools.partial(jax.jit, static_argnames=("sx", "mode"))
def stencil_v3(u, sx: int, mode: str = "full"):
    nx, ny, nz = u.shape
    ng = nx // sx
    return pl.pallas_call(
        _kernel(mode, ng),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((sx, ny, nz), lambda g: (g, 0, 0)),
            pl.BlockSpec(
                (1, ny, nz),
                lambda g: (jnp.clip(g * sx - 1, 0, nx - 1), 0, 0),
            ),
            pl.BlockSpec(
                (1, ny, nz),
                lambda g: (jnp.clip(g * sx + sx, 0, nx - 1), 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((sx, ny, nz), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(u, u, u, jnp.full((1,), 6.0, u.dtype), jnp.full((1,), -1.0, u.dtype))


def main() -> int:
    import numpy as np

    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s, time_loop_s
    from conjugategradient_tpu.types import StencilOperator

    nx = 256
    u = jnp.ones((nx, nx, nx), jnp.float32)
    ovh = rpc_overhead_s()
    ideal = 2 * nx**3 * 4

    # correctness vs the XLA path first (tiny grid, on-chip)
    small = jnp.asarray(
        np.random.default_rng(0).standard_normal((32, 32, 128)).astype(np.float32)
    )
    op = StencilOperator.poisson((32, 32, 128), dtype=jnp.float32)
    ref = op.matvec(small.reshape(-1)).reshape(32, 32, 128)
    got = stencil_v3(small, 8, "full")
    err = float(jnp.max(jnp.abs(got - ref)))

    out = {"max_err_vs_xla": err}
    for sx in (8, 16, 32):
        for mode in ("copy", "full"):
            t = time_loop_s(
                lambda v, s=sx, m=mode: stencil_v3(v, s, m) * 1e-2,
                u, K=128, iters=3, overhead_s=ovh,
            )
            out[f"sx{sx}_{mode}"] = {
                "time_ms": round(t * 1e3, 4),
                "gbps_ideal": round(ideal / t / 1e9, 1),
            }

    # FAIR variant: fold the chain-bounding scale INTO the stencil
    # coefficients.  The "* 1e-2" above fuses into the XLA path but is a
    # SEPARATE 134 MB read+write pass after a pallas_call — it taxes only
    # the kernel.  Scaled coefficients keep the fori chain bounded with
    # zero extra passes for both variants.
    from conjugategradient_tpu.ops.stencil import stencil7_matvec

    sop = StencilOperator(
        jnp.asarray(0.06, jnp.float32), jnp.asarray(-0.01, jnp.float32),
        (nx, nx, nx),
    )
    uflat = jnp.ones((nx**3,), jnp.float32)
    t = time_loop_s(
        lambda v: stencil7_matvec(sop, v, use_pallas="never"),
        uflat, K=128, iters=3, overhead_s=ovh,
    )
    out["fair_xla"] = {"time_ms": round(t * 1e3, 4),
                       "gbps_ideal": round(ideal / t / 1e9, 1)}

    @functools.partial(jax.jit, static_argnames=("sx",))
    def v3_scaled(v, sx):
        nxl, nyl, nzl = v.shape
        ng = nxl // sx
        return pl.pallas_call(
            _kernel("full", ng),
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((sx, nyl, nzl), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, nyl, nzl),
                             lambda g: (jnp.clip(g * sx - 1, 0, nxl - 1), 0, 0)),
                pl.BlockSpec((1, nyl, nzl),
                             lambda g: (jnp.clip(g * sx + sx, 0, nxl - 1), 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((sx, nyl, nzl), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(v, v, v, jnp.full((1,), 0.06, v.dtype), jnp.full((1,), -0.01, v.dtype))

    for sx in (8, 16, 32):
        t = time_loop_s(
            lambda v, s=sx: v3_scaled(v, s), u, K=128, iters=3, overhead_s=ovh,
        )
        out[f"fair_pallas_sx{sx}"] = {"time_ms": round(t * 1e3, 4),
                                      "gbps_ideal": round(ideal / t / 1e9, 1)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
