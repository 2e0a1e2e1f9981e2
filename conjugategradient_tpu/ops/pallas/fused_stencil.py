"""Fused stencil-CG kernel: direction update + 7-point apply + p·q dot.

The matrix-free analogue of ops/pallas/fused_cg.fused_dir_spmv_dot for
StencilOperator (north-star config 4).  The unfused CG iteration at 256³
moves ~1.07 GB of DMA bytes (matvec 268 MB + ~10 separate XLA fusions for
dots/axpys, each a VMEM round-trip over 67 MB vectors — engine-model
accounting in docs/performance.md); this kernel plus
ops/pallas/fused_cg.fused_update_dot cut that to ~0.69 GB:

    p = r + beta * p_old      (computed in-register, including the halo
                               planes of adjacent slabs — recomputed
                               redundantly rather than exchanged)
    q = center*p + off*(6-neighbor sum of p)
    pap = p . q               (SMEM accumulation across the grid)

x-slab pipeline identical to the v3 stencil kernel: body blocks plus two
clamped single-plane halos per operand stream through the automatic
pipeline; y/z neighbor shifts are lane/sublane rolls with iota masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(ng: int):
    def kernel(beta_ref, co_ref, rb_ref, rl_ref, rr_ref, pb_ref, pl_ref,
               pr_ref, pnew_ref, q_ref, pap_ref):
        g = pl.program_id(0)
        beta = beta_ref[0, 0]
        c = co_ref[0]
        w = co_ref[1]

        pv = rb_ref[...] + beta * pb_ref[...]  # (sx, ny, nz)
        # halo planes: recompute the neighbor slab's edge of p; outside the
        # domain they are the Dirichlet zero (the clamped index map loads a
        # duplicate plane there, masked off here)
        left = jnp.where(g == 0, 0.0, rl_ref[0] + beta * pl_ref[0])
        right = jnp.where(g == ng - 1, 0.0, rr_ref[0] + beta * pr_ref[0])
        pnew_ref[...] = pv

        sx, ny, nz = pv.shape
        xm = jnp.concatenate([left[None], pv[:-1]], axis=0)
        xp = jnp.concatenate([pv[1:], right[None]], axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        ym = jnp.where(rows == 0, 0.0, pltpu.roll(pv, 1, axis=1))
        yp = jnp.where(rows == ny - 1, 0.0, pltpu.roll(pv, ny - 1, axis=1))
        zm = jnp.where(cols == 0, 0.0, pltpu.roll(pv, 1, axis=2))
        zp = jnp.where(cols == nz - 1, 0.0, pltpu.roll(pv, nz - 1, axis=2))
        q = c * pv + w * ((xm + xp) + (ym + yp) + (zm + zp))
        q_ref[...] = q

        @pl.when(g == 0)
        def _():
            pap_ref[0, 0] = 0.0

        pap_ref[0, 0] += jnp.sum(q * pv)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "slab_group"))
def fused_stencil_dir_dot(
    r3d: jax.Array,
    pold3d: jax.Array,
    beta: jax.Array,
    center: jax.Array,
    off: jax.Array,
    interpret: bool = False,
    slab_group: int = 8,
):
    """(p_new, q, pap) for the matrix-free 7-point operator.

    ``r3d``/``pold3d``: (nx, ny, nz) f32 with nz % 128 == 0, ny % 8 == 0,
    nx divisible by the slab group.  ``beta`` is (1, 1) f32.
    """
    nx, ny, nz = r3d.shape
    if nz % 128 or ny % 8:
        raise ValueError(f"need nz%128==0 and ny%8==0, got ({ny},{nz})")
    sx = slab_group
    while nx % sx:
        sx //= 2
    sx = max(sx, 2)  # slicing pv[:-1] needs at least 2 planes
    if nx % sx:
        # sx collapsed to a non-divisor (odd nx): the grid would cover only
        # nx//sx*sx planes and silently leave the rest uninitialized
        raise ValueError(f"need nx divisible by 2, got nx={nx}")
    ng = nx // sx
    co = jnp.stack([center.astype(jnp.float32), off.astype(jnp.float32)])

    halo = lambda base: pl.BlockSpec(
        (1, ny, nz), lambda g, b=base: (jnp.clip(g * sx + b, 0, nx - 1), 0, 0)
    )
    body = pl.BlockSpec((sx, ny, nz), lambda g: (g, 0, 0))

    p_new, q, pap = pl.pallas_call(
        _make_kernel(ng),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (center, off)
            body, halo(-1), halo(sx),  # r
            body, halo(-1), halo(sx),  # p_old
        ],
        out_specs=[
            body,  # p_new
            body,  # q
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32),
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * nx * ny * nz,
            bytes_accessed=4 * nx * ny * nz * 4,
            transcendentals=0,
        ),
    )(beta, co, r3d, r3d, r3d, pold3d, pold3d, pold3d)
    return p_new, q, pap


def _update_kernel_3d(alpha_ref, x_ref, p_ref, r_ref, q_ref,
                      xout_ref, rout_ref, rnorm_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        rnorm_ref[0, 0] = 0.0

    a = alpha_ref[0, 0]
    xout_ref[...] = x_ref[...] + a * p_ref[...]
    rnew = r_ref[...] - a * q_ref[...]
    rout_ref[...] = rnew
    rnorm_ref[0, 0] += jnp.sum(rnew * rnew)


@functools.partial(jax.jit, static_argnames=("interpret", "slab_group"))
def fused_update_dot_3d(
    x3d: jax.Array,
    p3d: jax.Array,
    r3d: jax.Array,
    q3d: jax.Array,
    alpha: jax.Array,
    interpret: bool = False,
    slab_group: int = 4,
):
    """3-D twin of ops/pallas/fused_cg.fused_update_dot: operating directly
    on (nx, ny, nz) volumes keeps the whole fused stencil iteration in ONE
    layout — reshaping 67 MB state between differently-shaped custom calls
    costs XLA a full copy each (measured: it doubled the iteration time).

    VMEM: 6 slab-blocks double-buffered; keep slab_group modest (12 blocks
    live at once)."""
    nx, ny, nz = x3d.shape
    sx = slab_group
    while nx % sx:
        sx //= 2
    sx = max(sx, 1)
    # 12 live blocks (6 streams x 2 buffers) must fit the scoped budget
    while sx > 1 and 12 * sx * ny * nz * 4 > 48 * 1024 * 1024:
        sx //= 2
    blk = pl.BlockSpec((sx, ny, nz), lambda g: (g, 0, 0))
    return pl.pallas_call(
        _update_kernel_3d,
        grid=(nx // sx,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
            blk, blk, blk, blk,
        ],
        out_specs=[
            blk,
            blk,
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32),
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * nx * ny * nz,
            bytes_accessed=6 * nx * ny * nz * 4,
            transcendentals=0,
        ),
    )(alpha, x3d, p3d, r3d, q3d)
