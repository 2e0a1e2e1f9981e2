"""Roofline accounting (SURVEY §5: per-kernel GB/s vs HBM bandwidth).

The reference has no profiling beyond the harness stopwatch; the rebuild's
perf contract (BASELINE.md) is "SpMV ≥ 90% of HBM roofline", so we need an
empirical HBM bandwidth probe and byte-counting helpers.
"""

from __future__ import annotations


def hbm_bandwidth_gbps(nbytes: int = 1 << 28, iters: int = 64) -> float:
    """Measured streaming bandwidth in GB/s (read+write counted).

    Delegates to :func:`..utils.benchmarking.stream_roofline_gbps`, which is
    honest on remote-dispatch backends (in-jit iteration chain + scalar
    readback + RPC-overhead subtraction); a naive python-loop timer here
    reported physically impossible numbers through the axon relay.
    """
    from .benchmarking import stream_roofline_gbps

    return stream_roofline_gbps(nbytes=nbytes, K=iters)


def spmv_bytes(nnz: int, n: int, val_bytes: int = 4, idx_bytes: int = 4) -> int:
    """Minimum HBM traffic of one CSR SpMV: values + column indices once,
    x and y once (the compulsory traffic; x gathers may re-read)."""
    return nnz * (val_bytes + idx_bytes) + 2 * n * val_bytes


def bell_spmv_bytes(blocks_size: int, n: int, val_bytes: int = 4) -> int:
    """Blocked-ELL SpMV traffic: the tile stream dominates."""
    return blocks_size * val_bytes + 2 * n * val_bytes


def roofline_fraction(achieved_gbps: float, peak_gbps: float) -> float:
    return achieved_gbps / peak_gbps if peak_gbps > 0 else 0.0
