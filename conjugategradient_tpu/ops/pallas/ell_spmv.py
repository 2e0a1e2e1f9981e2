"""Pallas blocked-ELL SpMV — hand-scheduled rebuild of the reference's CSR
kernel (VectorOperations.hpp:438-466).

Layout (types.BlockedEllMatrix): ``blocks (nrb, kmax, bm, bn)`` dense tiles,
``block_cols (nrb, kmax)`` column-block index per tile.

Design (v2): the grid iterates over *groups* of R row-blocks so each grid
step streams ``R * kmax * bm * bn`` tile bytes — megabyte-scale DMAs that
saturate HBM (v1 fetched one (bm, bn) tile per step: 64 KB DMAs ran at ~20%
of peak).  The operand ``x`` lives wholly in VMEM (it is (ncols_padded,)
floats — ≤ a few MB for every target problem), so the per-tile column gather
is a VMEM dynamic-row read, free of HBM traffic.  ``block_cols`` is a
scalar-prefetch operand read from SMEM.

The tile product runs on the VPU (multiply + lane-sum) in full f32: the
MXU's default-precision f32 matmul rounds operands through bf16, which
costs CG iterations, and the kernel is bandwidth-bound anyway.

Note: the XLA einsum path (ops/spmv._bell_spmv_jnp) measures ~91% of HBM
peak on v5e and is the default; this kernel is kept at parity as the basis
for fused SpMV+dot variants where XLA cannot fuse across the collective.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(R: int, kmax: int):
    def _kernel(cols_ref, block_ref, x_ref, y_ref):
        g = pl.program_id(0)
        # block_ref: (R, kmax, bm, bn) tiles for row-blocks [g*R, (g+1)*R)
        # x_ref:     (ncb, bn) — the whole operand, resident in VMEM
        # y_ref:     (R, bm)
        for r in range(R):
            acc = None
            for k in range(kmax):
                # cols_ref is FLAT (nrb*kmax,): a 2-D (nrb, kmax) SMEM array
                # pads the minor dim to 128 lanes (nrb*512 bytes — at
                # nrb=2048 that is the ENTIRE 1 MB SMEM); flat is nrb*kmax*4
                c = cols_ref[(g * R + r) * kmax + k]
                xb = x_ref[c, :].astype(jnp.float32)  # (bn,) VMEM row
                blk = block_ref[r, k].astype(jnp.float32)  # (bm, bn)
                part = jnp.sum(blk * xb[None, :], axis=1)  # (bm,) VPU
                acc = part if acc is None else acc + part
            y_ref[r, :] = acc.astype(y_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_group"))
def bell_spmv_pallas(
    blocks: jax.Array,
    block_cols: jax.Array,
    x2d: jax.Array,
    interpret: bool = False,
    row_group: int = 8,
) -> jax.Array:
    """y (nrb*bm,) = blocked-ELL(blocks, block_cols) @ x2d.reshape(-1).

    ``x2d`` is the padded operand reshaped to (ncb, bn); it must fit VMEM
    (≲ 2M float32 elements).  Output is float32 (accumulator precision).
    """
    if blocks.dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        # the kernel accumulates in float32; silently running f64 operands
        # through it would lose precision (the "auto" gate in ops/spmv
        # already excludes f64 — this guards the opt-in "always" path)
        raise TypeError(
            f"bell_spmv_pallas supports float32/bfloat16 tiles, got "
            f"{blocks.dtype}; use the einsum path for other dtypes"
        )
    nrb, kmax, bm, bn = blocks.shape
    ncb = x2d.shape[0]
    # y streams as (R, bm) blocks: Mosaic needs R % 8 == 0, R == nrb, or
    # R == 1 (caught live on poisson2d_34's nrb=10 — see fused_cg).  This
    # path has no fused_supported-style size gate, so an odd-nrb giant must
    # NOT take the one-step R=nrb fallback (the whole tile array in one
    # grid step blows VMEM); R=1 is always legal, just smaller DMAs.
    from .fused_cg import _row_group_for_blocked_q

    R = _row_group_for_blocked_q(nrb, row_group)
    if R == nrb and nrb % 8 != 0 and blocks.nbytes > 16 * 1024 * 1024:
        R = 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=[
            pl.BlockSpec(
                (R, kmax, bm, bn),
                lambda g, cols: (g, 0, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole x
        ],
        out_specs=pl.BlockSpec((R, bm), lambda g, cols: (g, 0)),
    )

    y = pl.pallas_call(
        _make_kernel(R, kmax),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * kmax * bm * bn,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + x2d.size * x2d.dtype.itemsize
            + nrb * bm * 4,
            transcendentals=0,
        ),
    )(block_cols.reshape(-1), blocks, x2d)
    return y.reshape(-1).astype(jnp.promote_types(blocks.dtype, x2d.dtype))
