"""Roofline accounting (SURVEY §5: per-kernel GB/s vs HBM bandwidth).

The reference has no profiling beyond the harness stopwatch; the rebuild's
perf contract (BASELINE.md) is "SpMV ≥ 90% of HBM roofline", so we need an
empirical HBM bandwidth probe and byte-counting helpers.
"""

from __future__ import annotations

import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hbm_bandwidth_gbps(nbytes: int = 1 << 28, iters: int = 10) -> float:
    """Measured device memory copy bandwidth in GB/s (read+write counted).

    A jitted y = x + 0 copy of ``nbytes`` of f32: reads + writes nbytes each,
    so effective traffic is 2·nbytes per run.
    """
    n = nbytes // 4
    x = jnp.zeros((n,), dtype=jnp.float32)

    @jax.jit
    def copy(v):
        return v + 1.0

    copy(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = copy(y)
    y.block_until_ready()
    dt = time.perf_counter() - t0
    return 2 * nbytes * iters / dt / 1e9


def spmv_bytes(nnz: int, n: int, val_bytes: int = 4, idx_bytes: int = 4) -> int:
    """Minimum HBM traffic of one CSR SpMV: values + column indices once,
    x and y once (the compulsory traffic; x gathers may re-read)."""
    return nnz * (val_bytes + idx_bytes) + 2 * n * val_bytes


def bell_spmv_bytes(blocks_size: int, n: int, val_bytes: int = 4) -> int:
    """Blocked-ELL SpMV traffic: the tile stream dominates."""
    return blocks_size * val_bytes + 2 * n * val_bytes


def roofline_fraction(achieved_gbps: float, peak_gbps: float) -> float:
    return achieved_gbps / peak_gbps if peak_gbps > 0 else 0.0
