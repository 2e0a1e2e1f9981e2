"""Pallas blocked-ELL SpMV — the speed-of-light rebuild of the reference's
CSR kernel (VectorOperations.hpp:438-466).

Layout (types.BlockedEllMatrix): ``blocks (nrb, kmax, bm, bn)`` dense tiles,
``block_cols (nrb, kmax)`` column-block index per tile.  The kernel grid is
``(nrb, kmax)``; ``block_cols`` is a scalar-prefetch operand so the x-block
each tile needs is DMA'd HBM→VMEM by the pipeline itself (the index map reads
the prefetched indices) — no gathered copy of x is ever materialized.

SpMV is bandwidth-bound: the tile stream ``blocks`` is read exactly once at
HBM speed and multiplied on the fly (MXU for the (bm,bn)·(bn,1) products),
so the roofline target is ~HBM bandwidth × 1/padding_ratio.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cols_ref, block_ref, x_ref, y_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    blk = block_ref[0, 0]  # (bm, bn)
    xb = x_ref[...].reshape(-1, 1)  # (bn, 1)
    prod = jnp.dot(blk, xb, preferred_element_type=jnp.float32)  # (bm, 1)
    y_ref[...] += prod.reshape(1, -1).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bell_spmv_pallas(
    blocks: jax.Array, block_cols: jax.Array, x2d: jax.Array, interpret: bool = False
) -> jax.Array:
    """y (nrb*bm,) = blocked-ELL(blocks, block_cols) @ x2d.reshape(-1).

    ``x2d`` is the padded operand reshaped to (ncb, bn).  Output is float32
    (accumulator precision) regardless of tile dtype.
    """
    nrb, kmax, bm, bn = blocks.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb, kmax),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bm, bn),
                lambda i, k, cols: (i, k, 0, 0),
            ),
            pl.BlockSpec(
                (1, bn),
                lambda i, k, cols: (cols[i, k], 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, bm), lambda i, k, cols: (i, 0)),
    )

    y = pl.pallas_call(
        _kernel,
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
    )(block_cols, blocks, x2d)
    return y.reshape(-1).astype(blocks.dtype)
