#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Metric (from BASELINE.md): effective bandwidth in GB/s of the blocked-ELL
SpMV — the hot kernel of the CG solve (reference: VectorOperations.hpp:438-466)
— measured inside a jitted loop on the device, against the measured HBM
streaming roofline of the same device.  ``vs_baseline`` is achieved/roofline;
the north-star target is ≥ 0.9.

The reference publishes no numbers (BASELINE.md); its harness measures only
wall-clock per solve (test/Tester.cpp:43-47).  This bench reports the
quantity that determines solve time for a memory-bound Krylov method.

Default config: ``cg`` — time per CG iteration of the fused two-Pallas-
kernel loop on a block-tridiagonal SPD operator with dense 128x128 tiles,
n=262144, f32, SYMMETRIC blocked-ELL storage (each off-diagonal tile stored
once, applied as B and Bᵀ — the SPD domain's redundant mirrored half never
leaves HBM).  Effective bandwidth follows the symmetric-SpMV convention:
useful bytes = the full layout's 403 MB stream for the same math; the
physically streamed bytes and their machine-honest rate are recorded in
detail (bytes_streamed / stored_gbps).  Measured v5e: ~900 GB/s effective
(vs_baseline ≈ 1.10 of the 819 GB/s HBM roofline) at 455-464 us/iter, vs
527-548 us/iter for full storage.  Other configs:
  --config cg-full   the round-1/2 full-storage config (min(structural,
                     XLA cost analysis) byte model; ~0.92-0.95 of roofline)
  --config cg-bf16   bf16 operator tiles, f32 vectors, FULL storage (the
                     mixed-precision inner-solve rate; effective bytes
                     stay the full-f32 stream).  Measured v5e: 301 us/iter
                     / 1372 GB/s effective, 1.67x roofline — the fastest
                     per-iteration config; symmetric+bf16 measured SLOWER
                     (417 us) because the mirror compute, not bytes,
                     bounds the sym kernel once tiles halve
  --config spmv      blocked-ELL SpMV alone
  --config stencil   matrix-free 7-point 256^3 Poisson matvec (config 4)
  --config pcg       fused Jacobi-PCG iteration (config 3)
  --config batched   multi-RHS per-RHS amortization (R = 1/8/32)
  --config large     the cg config at 1.5M rows (G3_circuit scale)
  --config irregular SELL vs CSR SpMV on the 1.5M-row power-law pattern
  --config symdia    full vs SYMMETRIC DIA CG iteration, both as jit
                     constants (half the constant footprint; headline
                     byte convention)
  --config symdia-big  the same A/B PAST the 320 MB constant-closure
                     gate: both operators as pre-blocked jit ARGUMENTS
                     (full windowed vs round-4 halo'd symmetric Pallas
                     kernel).  ~1 GB of uploads — last chip work only.
  --config minres    fused MINRES iteration (solver/fused_minres.py) on
                     the headline operator + the portable-loop A/B — the
                     symmetric-indefinite family's chip lane
  --config bicgstab  BiCGStab per-iteration cost, 1M-row nonsymmetric
                     convection-diffusion (DIA layout — relay-safe upload)
  --config bicgstab-bell  FUSED BiCGStab (3 Pallas kernels/iter,
                     solver/fused_bicgstab.py) vs portable A/B on a
                     nonsymmetric dense-tile blocked-ELL operator
  --config gmres     GMRES(32) per-inner-step cost on the same operator
                     (CGS2 basis traffic dominates; byte model in detail)
  --config eigs      LOBPCG (k=8, Jacobi M) per-iteration cost +
                     time-to-tol on the n=256K symmetric operator
  --config mgpcg     full-solve time-to-tolerance A/B on 256^3 Poisson:
                     fused plain CG vs geometric-multigrid PCG
                     (solver/multigrid.py) — the algorithmic speedup on
                     top of the bandwidth work.
  --config amg       the grid-free counterpart: assembled 512^2 Poisson
                     CSR, plain vs Jacobi vs smoothed-aggregation AMG
                     time-to-tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _enable_persistent_compile_cache():
    """Cold XLA compiles through a remote-compile tunnel can take minutes;
    cache compiled executables on disk so repeat bench runs (and the perf
    driver's round-end run) start warm."""
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older JAX without these options


_enable_persistent_compile_cache()


#: Nominal HBM peak bandwidth by device kind (GB/s) — the stable roofline
#: denominator for vs_baseline; the measured stream probe varies run to run
#: (~565-680 GB/s on v5e) and is reported in detail for context.
_HBM_PEAK_GBPS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5e": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,  # v6e / Trillium
}


def _hbm_peak_gbps() -> float:
    import jax

    kind = jax.devices()[0].device_kind
    return _HBM_PEAK_GBPS.get(kind, 819.0)


def _block_tridiag_np(n: int, bm: int, bn: int):
    """Host-side tiles of the bench's block-tridiagonal SPD operator."""
    assert bm == bn, "square tiles for this generator"
    nrb = n // bm
    rng = np.random.default_rng(0)
    off = (0.1 * rng.standard_normal((bm, bn))).astype(np.float32)
    off = 0.5 * (off + off.T)
    diag = np.eye(bm, dtype=np.float32) * (2.0 + 2.0 * np.abs(off).sum())

    blocks = np.zeros((nrb, 3, bm, bn), dtype=np.float32)
    block_cols = np.zeros((nrb, 3), dtype=np.int32)
    for i in range(nrb):
        blocks[i, 0] = diag
        block_cols[i, 0] = i
        k = 1
        if i > 0:
            blocks[i, k] = off
            block_cols[i, k] = i - 1
            k += 1
        if i + 1 < nrb:
            blocks[i, k] = off
            block_cols[i, k] = i + 1
            k += 1
    return blocks, block_cols, nrb * 3 * bm * bn


def block_tridiag_bell(n: int, bm: int, bn: int, dtype):
    """Block-tridiagonal SPD operator directly in blocked-ELL form.

    Dense (bm, bn) tiles: SPD diagonally-dominant diagonal tiles, symmetric
    off-diagonal couplings.  kmax = 3 with zero padding waste — measures the
    kernel's streaming speed at its layout-best.
    """
    import jax.numpy as jnp

    from conjugategradient_tpu.types import BlockedEllMatrix

    blocks, block_cols, nnz = _block_tridiag_np(n, bm, bn)
    return BlockedEllMatrix(
        jnp.asarray(blocks, dtype=dtype),
        jnp.asarray(block_cols),
        (n, n),
        nnz,
    )


def block_tridiag_sym_bell(n: int, bm: int, bn: int, dtype):
    """The same operator in SYMMETRIC blocked-ELL storage, packed entirely
    host-side (np.asarray of a multi-GB device tile stream runs at
    ~26 MB/s — never round-trip through the device at bench scale)."""
    from conjugategradient_tpu.types import SymBellMatrix

    blocks, block_cols, nnz = _block_tridiag_np(n, bm, bn)
    # cast explicitly: relying on jnp.asarray's x64-disabled downcast would
    # hand an f64 operator to fused_supported under jax_enable_x64 (and the
    # bench would silently fall back to the unfused path)
    blocks = blocks.astype(np.dtype(dtype))
    return SymBellMatrix._pack_np(
        blocks, block_cols.astype(np.int64), (n, n), (n, n), nnz,
        check=False,
    )


def bench_spmv_bell(n: int = 131072, bm: int = 128, bn: int = 128):
    import jax.numpy as jnp

    from conjugategradient_tpu.utils.benchmarking import (
        rpc_overhead_s,
        stream_roofline_gbps,
        time_loop_s,
    )

    a = block_tridiag_bell(n, bm, bn, jnp.float32)
    x2d = jnp.ones((n // bn, bn), jnp.float32)

    from conjugategradient_tpu.ops.spmv import bell_spmv

    ovh = rpc_overhead_s()
    # the *1e-3 keeps the iterate bounded so the chained loop can't overflow
    t = time_loop_s(
        lambda v: bell_spmv(a, v.reshape(-1))[: v.size].reshape(v.shape) * 1e-3,
        x2d,
        K=512,  # work must dominate the ~26 ms RPC overhead
        iters=2,
        overhead_s=ovh,
    )
    tile_bytes = a.blocks.size * a.blocks.dtype.itemsize
    vec_bytes = 2 * n * 4  # x read + y write (compulsory)
    gbps = (tile_bytes + vec_bytes) / t / 1e9
    peak = _hbm_peak_gbps()
    roofline = stream_roofline_gbps(nbytes=1 << 27, K=256)
    return {
        "metric": "bell_spmv_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {
            "n": n,
            "tile_MB": round(tile_bytes / 1e6, 1),
            "time_ms": round(t * 1e3, 4),
            "stream_roofline_gbps": round(roofline, 1),
        },
    }


def bench_stencil(nx: int = 256):
    import jax.numpy as jnp

    from conjugategradient_tpu.types import StencilOperator
    from conjugategradient_tpu.utils.benchmarking import (
        rpc_overhead_s,
        stream_roofline_gbps,
        time_loop_s,
    )

    op = StencilOperator.poisson((nx, nx, nx), dtype=jnp.float32)
    n = nx**3
    x = jnp.ones((n,), jnp.float32)
    ovh = rpc_overhead_s()
    t = time_loop_s(lambda v: op.matvec(v) * 1e-2, x, K=256, iters=2, overhead_s=ovh)
    bytes_moved = 2 * n * 4  # read x once + write y once (ideal)
    gbps = bytes_moved / t / 1e9
    peak = _hbm_peak_gbps()
    roofline = stream_roofline_gbps(nbytes=1 << 27, K=256)
    return {
        "metric": "stencil7_256_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {"grid": nx, "time_ms": round(t * 1e3, 4),
                   "stream_roofline_gbps": round(roofline, 1)},
    }


def _iteration_bytes_xla(step_jit, s0, analytic: int):
    """Per-iteration HBM traffic for the GB/s numerator.

    Round 1 hand-assumed '7 vector streams'; now the number is the MIN of
    (a) XLA's cost analysis of the compiled step executable and (b) the
    structural model of the step's buffer touches.  XLA's total counts a
    buffer once per consuming instruction (no dedup across fusions), so it
    can only overcount real HBM traffic; the min keeps the reported GB/s
    conservative.  Both are recorded in the detail block."""
    xla = None
    try:
        c = step_jit.lower(*s0).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        val = float(c["bytes accessed"])
        if val > 0:
            xla = int(val)
    except Exception:
        pass
    if xla is None:
        return int(analytic), "analytic", {"analytic": int(analytic)}
    pick = min(xla, int(analytic))
    src = "xla_cost_analysis" if pick == xla else "min(analytic, xla)"
    return pick, src, {"analytic": int(analytic), "xla_cost_analysis": xla}


def bench_cg(n: int = 262144, iters: int = 256, fused: str = "auto",
             storage: str = "sym", dtype: str = "float32"):
    """Per-iteration time of the jitted CG loop body.

    Uses the fused two-Pallas-kernel iteration (solver/fused.py) when the
    operator qualifies, else the portable cg_step.  n defaults to 262144
    (403 MB full-layout operator stream): large enough that fixed
    per-dispatch overheads are amortized the way they are at the production
    sizes BASELINE.md targets (1.5M+ rows), small enough for the fused
    path's VMEM-resident operand.

    ``dtype="bfloat16"`` stores the operator tiles in
    bf16 — the TPU-native half-rate dtype — while every vector and scalar
    recurrence stays f32 (the fused kernels promote tile products to f32
    in VMEM).  Storage dtype is a LEGITIMATE solver config here:
    ``refined_cg_solve`` recovers full f32/f64 accuracy on a bf16 operator
    (docs/performance.md "Mixed precision"), so the per-iteration rate of
    the bf16 operator is what a production mixed-precision solve pays per
    inner iteration.  Effective bytes stay the FULL f32 layout's stream
    for the same math, making `value` the end-to-end representation win
    (symmetric x bf16 ~ 4x fewer operator bytes than full f32); the
    physically streamed bytes/rate are in detail as always.

    ``storage="sym"`` (default) runs the SYMMETRIC blocked-ELL operator
    (types.SymBellMatrix): each off-diagonal tile stored once, applied as B
    and Bᵀ in one pass — the problem is SPD by definition, so the mirrored
    half of a full layout is redundant HBM traffic.  Effective bandwidth
    follows the symmetric-SpMV convention: useful bytes = what the FULL
    layout streams for the same mathematical work, over the measured time;
    the physically streamed byte count and its machine-honest GB/s are both
    recorded in detail (``bytes_streamed`` / ``stored_gbps``) so the two
    views can never be confused.  ``storage="full"`` (--config cg-full) is
    the round-1/2 configuration, byte model = min(structural, XLA cost
    analysis).
    """
    import time

    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.cg import cg_init, cg_step
    from conjugategradient_tpu.solver.fused import (
        fused_cg_init,
        fused_cg_step,
        fused_supported,
    )
    from conjugategradient_tpu.utils.benchmarking import (
        rpc_overhead_s,
        stream_roofline_gbps,
    )

    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    tol_arr = jnp.asarray(0.0, jnp.float32)

    # The operator arrays are threaded through jit as ARGUMENTS, never
    # captured in closures: a closed-over device array becomes an HLO
    # constant, and the remote-compile tunnel rejects programs carrying
    # hundreds of MB of literals (HTTP 413).
    from conjugategradient_tpu.types import BlockedEllMatrix, SymBellMatrix

    op_dtype = jnp.dtype(dtype)
    if storage == "sym":
        a = block_tridiag_sym_bell(n, 128, 128, op_dtype)
        shape_static, nnz_static = a.shape, a.nnz
        fk_static, banded_static = a.full_kmax, a.banded

        def make_a(diag, off, cols):
            return SymBellMatrix(diag, off, cols, shape_static, nnz_static,
                                 fk_static, banded_static)

        op_args = (a.diag_blocks, a.off_blocks, a.off_cols)
    else:
        a = block_tridiag_bell(n, 128, 128, op_dtype)
        shape_static, nnz_static = a.shape, a.nnz

        def make_a(blocks, cols):
            return BlockedEllMatrix(blocks, cols, shape_static, nnz_static)

        op_args = (a.blocks, a.block_cols)
    use_fused = fused != "never" and fused_supported(a, dtype=jnp.float32)

    # Time a fixed-count step chain (fori_loop): the production while_loop
    # exits once the easy bench problem converges, which leaves the
    # measurement dominated by dispatch noise.  The step body is identical;
    # only the exit test differs.
    if use_fused:
        init = lambda a_, b_, K: fused_cg_init(a_, b_, maxiter=K)
        step = lambda a_, s: fused_cg_step(a_, s, tol_arr)
        out = lambda s: s.rho.reshape(1)
    else:
        init = lambda a_, b_, K: cg_init(a_, b_, maxiter=K)
        step = lambda a_, s: cg_step(a_, s, tol_arr)
        out = lambda s: s.rnorm_sq.reshape(1)

    def run(K, reps=5):
        """Median of ``reps`` full K-iteration chains.  Chip throughput
        varies ~20% run-to-run (CLAUDE.md); round 2 archived a single sample
        that undershot the documented band — the median of several chains is
        the honest stable statistic, with the spread kept in detail."""
        def chain(*xs):
            a_ = make_a(*xs[:-1])
            s = jax.lax.fori_loop(
                0, K, lambda i, s: step(a_, s), init(a_, xs[-1], K)
            )
            return out(s)

        f = jax.jit(chain)
        args = op_args + (b,)
        float(f(*args)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args)[0])
            ts.append(time.perf_counter() - t0)
        return ts

    ovh = rpc_overhead_s()
    ts = sorted(run(iters))
    t_med = ts[len(ts) // 2] if len(ts) % 2 else 0.5 * (
        ts[len(ts) // 2 - 1] + ts[len(ts) // 2]
    )
    t = (t_med - ovh) / iters
    rep_times = [(x - ovh) / iters for x in ts]
    # analytic vector traffic: the fused iteration's 10 n-vector streams
    # (K1: r,p in / p,q out; K2: x,p,r,q in / x,r out), 7 streams unfused
    streams = 10 if use_fused else 7
    step_arg = jax.jit(lambda *xs: step(make_a(*xs[:-1]), xs[-1]))
    s0 = init(a, b, iters)
    if storage == "sym":
        stored_tile_bytes = (
            a.diag_blocks.size + a.off_blocks.size
        ) * a.diag_blocks.dtype.itemsize
        # useful bytes = the FULL layout's stream for the same math (the
        # symmetric-SpMV effective-bandwidth convention); streamed bytes
        # (min(structural, XLA)) and their machine rate go to detail
        # f32-equivalent full-layout stream regardless of storage dtype:
        # `value` answers "what full-f32-layout rate does this match"
        eff_bytes = (a.full_tile_bytes() // a.dtype.itemsize) * 4 \
            + streams * n * 4
        streamed, bytes_src, bytes_all = _iteration_bytes_xla(
            step_arg, op_args + (s0,), stored_tile_bytes + streams * n * 4
        )
    else:
        tile_bytes = a.blocks.size * a.blocks.dtype.itemsize
        streamed, bytes_src, bytes_all = _iteration_bytes_xla(
            step_arg, op_args + (s0,), tile_bytes + streams * n * 4
        )
        eff_bytes = streamed if op_dtype == jnp.dtype(jnp.float32) else (
            a.blocks.size * 4 + streams * n * 4
        )
    gbps = eff_bytes / t / 1e9
    peak = _hbm_peak_gbps()
    roofline = stream_roofline_gbps(nbytes=1 << 27, K=256)
    detail = {"n": n, "time_per_iter_us": round(t * 1e6, 2),
              "iterations_run": iters,
              "fused": use_fused,
              "storage": storage,
              "dtype": str(op_dtype),
              "bytes_per_iter": eff_bytes,
              "bytes_model": bytes_src,
              "bytes_models_all": bytes_all,
              "reps": len(rep_times),
              "reps_gbps": [round(eff_bytes / x / 1e9, 2)
                            for x in rep_times],
              "reps_spread_gbps": round(
                  eff_bytes / min(rep_times) / 1e9
                  - eff_bytes / max(rep_times) / 1e9, 2),
              "stream_roofline_gbps": round(roofline, 1)}
    if storage == "sym":
        detail["bytes_streamed"] = streamed
        detail["stored_gbps"] = round(streamed / t / 1e9, 2)
    metric = "cg_iteration_effective_bandwidth"
    if op_dtype != jnp.dtype(jnp.float32):
        metric += "_" + str(op_dtype)
    return {
        "metric": metric,
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": detail,
    }


def bench_pcg(n: int = 262144, iters: int = 256):
    """Per-iteration time of the fused Jacobi-PCG loop body (BASELINE
    config 3).  The M⁻¹ apply is folded into the two fused kernels; the
    interesting number is how little it costs over plain CG (one extra
    VMEM-resident read of inv_diag per kernel)."""
    import time

    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.fused import (
        _fused_pcg_core,
        fused_supported,
    )
    from conjugategradient_tpu.types import BlockedEllMatrix
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    a = block_tridiag_bell(n, 128, 128, jnp.float32)
    if not fused_supported(a, dtype=jnp.float32):
        return {"metric": "pcg_iteration_time", "value": -1.0, "unit": "us",
                "vs_baseline": 0.0,
                "detail": {"error": "fused path unsupported on this backend"}}
    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    inv_diag = 1.0 / a.diagonal()
    shape_static, nnz_static = a.shape, a.nnz

    def solve(blocks, cols, b_, d_):
        a_ = BlockedEllMatrix(blocks, cols, shape_static, nnz_static)
        # fixed-iteration run: tol=0 with a hard cap == a K-step chain
        x, info = _fused_pcg_core(
            a_, b_, d_, None, jnp.asarray(0.0, jnp.float32), iters, False
        )
        return info.rnorm_sq.reshape(1)

    f = jax.jit(solve)
    args = (a.blocks, a.block_cols, b, inv_diag)
    float(f(*args)[0])
    ovh = rpc_overhead_s()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args)[0])
        ts.append(time.perf_counter() - t0)
    t = (min(ts) - ovh) / iters
    tile_bytes = a.blocks.size * 4
    bytes_it = tile_bytes + 12 * n * 4  # +2 inv_diag reads over plain CG's 10
    gbps = bytes_it / t / 1e9
    peak = _hbm_peak_gbps()
    return {
        "metric": "pcg_iteration_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {"n": n, "time_per_iter_us": round(t * 1e6, 2),
                   "iterations_run": iters},
    }


def bench_batched(n: int = 131072, reps=(1, 8, 32)):
    """Multi-RHS amortization: per-RHS SpMV time at R right-hand sides vs
    R=1 (solver/batched.py's claim, measured).  The operator tiles stream
    once for all R columns (ops/spmv.bell_spmv_multi)."""
    import jax.numpy as jnp

    from conjugategradient_tpu.ops.spmv import bell_spmv_multi
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s, time_loop_s

    a = block_tridiag_bell(n, 128, 128, jnp.float32)
    ovh = rpc_overhead_s()
    per_rhs_us = {}
    for R in reps:
        X = jnp.ones((n // 128, 128, R), jnp.float32)  # carried 3-D

        def body(v, R=R):
            y = bell_spmv_multi(a, v.reshape(-1, R))
            return (y[: v.size // R] * 1e-3).reshape(v.shape)

        t = time_loop_s(body, X, K=256 // max(R // 8, 1), iters=2, overhead_s=ovh)
        per_rhs_us[R] = t / R * 1e6
    speedup8 = per_rhs_us[reps[0]] / per_rhs_us[8] if 8 in per_rhs_us else 1.0
    speedup32 = per_rhs_us[reps[0]] / per_rhs_us[32] if 32 in per_rhs_us else 1.0
    return {
        "metric": "batched_rhs_amortization_x32",
        "value": round(speedup32, 2),
        "unit": "x per-RHS speedup",
        "vs_baseline": round(speedup32 / 1.0, 4),  # >1 proves amortization
        "detail": {"n": n,
                   "per_rhs_us": {str(k): round(v, 2) for k, v in per_rhs_us.items()},
                   "speedup_x8": round(speedup8, 2),
                   "speedup_x32": round(speedup32, 2)},
    }


def bench_irregular(n: int = 786432):
    # n defaults to half the north-star scale: same gather-bound regime
    # (x far exceeds any cache), but generation + upload + the chip-grant
    # wait fit one bench invocation; docs/performance.md records the
    # full-scale numbers.
    """Scattered-matrix SpMV: SELL (degree-bucketed gather) vs CSR
    (gather + scalar segment-sum) on the power-law north-star pattern.
    Both are random-access bound, so the honest unit is ns per nonzero
    against the measured ~7 ns scalar-access floor — GB/s is meaningless
    for a gather-bound kernel.  value = the degree-sorted SELL pack's
    speedup over CSR; vs_baseline = floor_ns / sell_sorted_ns (1.0 ==
    paying the irreducible random-access cost exactly once per nonzero;
    >1 is legitimate — the diagonal split keeps ~20% of the nonzeros out
    of the gather entirely, and identity pos skips the order restore)."""
    import jax.numpy as jnp

    from conjugategradient_tpu.problems import powerlaw_spd_coo
    from conjugategradient_tpu.types import CSRMatrix, SellMatrix
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s, time_loop_s

    rows, cols, vals, shape = powerlaw_spd_coo(n, avg_degree=4.8, seed=0)
    # build CSR on the HOST once and feed both layouts from it — pulling
    # device arrays back through the dispatch tunnel costs ~a minute at
    # this size, uploading twice costs nothing
    order = np.lexsort((cols, rows))
    r, c, v = rows[order], cols[order], vals[order].astype(np.float32)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, r + 1, 1)
    indptr = np.cumsum(indptr)
    csr = CSRMatrix.from_arrays(v, c, indptr, shape)
    sell = SellMatrix.from_csr_host(v, c, indptr, shape)
    # degree-sorted variant: pos == identity, restore gather skipped
    from conjugategradient_tpu.reorder import degree_sort_permutation, permute_csr

    dperm = degree_sort_permutation(c, indptr, n)
    vs_, cs_, ps_ = permute_csr(v, c, indptr, shape, dperm)
    sell_sorted = SellMatrix.from_csr_host(vs_, cs_, ps_, shape)
    x0 = jnp.ones((n,), jnp.float32)
    ovh = rpc_overhead_s()
    times = {}
    for name, op, K in (("csr", csr, 8), ("sell", sell, 16),
                        ("sell_sorted", sell_sorted, 16)):
        t = time_loop_s(
            lambda v, op=op: op.matvec(v) * 1e-6 + x0, x0, K=K, iters=2,
            overhead_s=ovh,
        )
        times[name] = t
    nnz = csr.nnz
    sell_ns = times["sell"] / nnz * 1e9
    sell_sorted_ns = times["sell_sorted"] / nnz * 1e9
    csr_ns = times["csr"] / nnz * 1e9
    # Multi-RHS: one flat gather fetches R CONTIGUOUS lane values per stored
    # index, amortizing the scalar-access floor across right-hand sides
    # (solver/batched.py's lockstep loop rides this kernel for SELL).
    from conjugategradient_tpu.ops.spmv import sell_spmv_multi

    R = 8
    X0 = jnp.ones((n, R), jnp.float32)
    t_multi = time_loop_s(
        lambda V: sell_spmv_multi(sell, V) * 1e-6 + X0, X0, K=8, iters=2,
        overhead_s=ovh,
    )
    sell_multi_ns = t_multi / R / nnz * 1e9
    floor_ns = 6.9  # measured bare-gather rate (docs/performance.md)
    return {
        "metric": "irregular_spmv_sell_vs_csr",
        "value": round(csr_ns / sell_sorted_ns, 2),
        "unit": "x speedup",
        "vs_baseline": round(floor_ns / sell_sorted_ns, 4),
        "detail": {"n": n, "nnz": nnz,
                   "sell_ms": round(times["sell"] * 1e3, 1),
                   "sell_sorted_ms": round(times["sell_sorted"] * 1e3, 1),
                   "csr_ms": round(times["csr"] * 1e3, 1),
                   "sell_ns_per_nnz": round(sell_ns, 2),
                   "sell_sorted_ns_per_nnz": round(sell_sorted_ns, 2),
                   "csr_ns_per_nnz": round(csr_ns, 2),
                   "sell_multi8_per_rhs_ns_per_nnz": round(sell_multi_ns, 2),
                   "sell_multi8_amortization_x": round(sell_ns / sell_multi_ns, 2),
                   "gather_floor_ns": floor_ns,
                   "sell_padding": round(sell.padding_ratio(), 3)},
    }


def bench_symdia(n: int = 1 << 21, half_band: int = 6, iters: int = 128):
    """Per-iteration CG time, full DIA vs SYMMETRIC DIA, both as jit
    CONSTANTS (the DIA production pattern — solver/cg._dia_const_solve).

    The symmetric layout halves the constant footprint (here 13 → 7
    diagonals), so where the full operator's solve is HBM-bound the sym
    solve streams half the bytes, and where XLA pins the constants in
    VMEM the sym copy leaves twice the headroom.  value = the symmetric
    solve's effective bandwidth with FULL-layout useful bytes (the same
    convention as the headline); detail carries both raw times and the
    speedup."""
    import time

    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.cg import cg_init, cg_step
    from conjugategradient_tpu.types import DIAMatrix, SymDIAMatrix
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    rng = np.random.default_rng(0)
    w = half_band
    offs_pos = list(range(0, w + 1))
    diags_pos = np.zeros((w + 1, n), np.float32)
    for k in offs_pos[1:]:
        d = (0.1 * rng.standard_normal(n)).astype(np.float32)
        d[n - k:] = 0.0  # out-of-range slots are zero by convention
        diags_pos[k] = d
    diags_pos[0] = 1.0 + 2.0 * np.abs(diags_pos[1:]).sum(axis=0).max()
    # expand the mirror half for the full layout: dneg[i] = dpos[i-k]
    offs_full = list(range(-w, w + 1))
    diags_full = np.zeros((2 * w + 1, n), np.float32)
    for j, off in enumerate(offs_full):
        if off >= 0:
            diags_full[j] = diags_pos[off]
        else:
            k = -off
            diags_full[j, k:] = diags_pos[k][: n - k]
    nnz = int((np.abs(diags_full) > 0).sum())
    full = DIAMatrix(jnp.asarray(diags_full), tuple(offs_full), (n, n), nnz)
    sym = SymDIAMatrix(jnp.asarray(diags_pos), tuple(offs_pos), (n, n), nnz)

    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    tol_arr = jnp.asarray(0.0, jnp.float32)
    ovh = rpc_overhead_s()

    def time_solve(op):
        def chain(b_):
            s = jax.lax.fori_loop(
                0, iters, lambda i, s: cg_step(op, s, tol_arr),
                cg_init(op, b_, maxiter=iters),
            )
            return s.rnorm_sq.reshape(1)

        f = jax.jit(chain)  # op CLOSED OVER: the DIA constant pattern
        float(f(b)[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(b)[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return (ts[1] - ovh) / iters  # median of 3

    t_full = time_solve(full)
    t_sym = time_solve(sym)
    # useful bytes = the FULL layout's stream for the same math (headline
    # convention) + 7 unfused vector streams
    full_bytes = diags_full.size * 4 + 7 * n * 4
    gbps = full_bytes / t_sym / 1e9
    peak = _hbm_peak_gbps()
    return {
        "metric": "symdia_cg_iteration_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {"n": n, "half_band": w,
                   "time_per_iter_us_sym": round(t_sym * 1e6, 2),
                   "time_per_iter_us_full": round(t_full * 1e6, 2),
                   "speedup_vs_full": round(t_full / t_sym, 3),
                   "bytes_effective": full_bytes,
                   "bytes_streamed": diags_pos.size * 4 + 7 * n * 4},
    }


def bench_mgpcg(nx: int = 256, rel: float = 1e-5, plain_maxiter: int = 4000,
                reps: int = 3):
    """Full-solve wall-time A/B on the 256^3 matrix-free Poisson operator
    (BASELINE config 4): the fused plain-CG stencil path vs MG-PCG
    (solver/multigrid.py geometric V-cycle as ``M=``).

    This is the ALGORITHMIC lever on top of the bandwidth work: plain CG
    needs O(nx) iterations on Poisson, the V-cycle makes the count
    mesh-independent (~O(10)), and every MG component is a dense regular
    streaming pass, so the win survives on TPU.  value = time-to-tolerance
    speedup (x); detail carries both times, both iteration counts, and the
    achieved true relative residuals."""
    import time

    import jax.numpy as jnp

    from conjugategradient_tpu import cg_solve, multigrid_preconditioner
    from conjugategradient_tpu.types import StencilOperator
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    op = StencilOperator.poisson((nx, nx, nx), dtype=jnp.float32)
    n = nx**3
    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    bnorm = float(np.linalg.norm(np.asarray(b), ord=2))
    tol = rel * bnorm
    mg = multigrid_preconditioner(op)
    ovh = rpc_overhead_s()

    def run(label, **kw):
        # warmup populates the jit caches; then reps timed solves
        x, info = cg_solve(op, b, tol=tol, **kw)
        float(info.rnorm_sq)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            x, info = cg_solve(op, b, tol=tol, **kw)
            float(info.rnorm_sq)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        t = max(ts[len(ts) // 2] - ovh, 1e-9)
        r = np.asarray(b - op.matvec(x), dtype=np.float64)
        true_rel = float(np.linalg.norm(r)) / bnorm
        return {
            "time_s": round(t, 4),
            "iterations": int(info.iterations),
            "converged": bool(info.converged),
            "true_rel_residual": float(f"{true_rel:.3e}"),
        }

    plain = run("plain", maxiter=plain_maxiter)
    mgp = run("mgpcg", M=mg)
    mg_cheb = multigrid_preconditioner(op, smoother="chebyshev")
    mgc = run("mgpcg-cheb", M=mg_cheb)
    best = mgc if mgc["time_s"] < mgp["time_s"] else mgp
    speedup = plain["time_s"] / best["time_s"]
    return {
        "metric": "mgpcg_solve_speedup",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 2),
        "detail": {"grid": nx, "rel_tol": rel, "plain": plain,
                   "mgpcg": mgp, "mgpcg_chebyshev": mgc,
                   "smoother": "chebyshev" if best is mgc else "jacobi",
                   "iter_ratio": round(plain["iterations"]
                                       / max(best["iterations"], 1), 1)},
    }


def bench_amg(nx: int = 512, rel: float = 1e-6, plain_maxiter: int = 6000,
              reps: int = 3):
    """Full-solve wall-time A/B on an ASSEMBLED 2-D Poisson CSR system
    (n = nx^2): plain CG vs Jacobi-PCG vs smoothed-aggregation AMG
    (solver/amg.py) — the grid-free counterpart of --config mgpcg, on the
    reference's own input class (CSR from an .mtx-style assembly).
    value = AMG's time-to-tolerance speedup over plain CG."""
    import time

    import jax.numpy as jnp

    from conjugategradient_tpu import (
        CSRMatrix,
        cg_solve,
        jacobi_preconditioner,
        smoothed_aggregation_preconditioner,
    )
    from conjugategradient_tpu.problems import poisson2d_coo
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    rows, cols, vals, shape = poisson2d_coo(nx)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    n = shape[0]
    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    bnorm = float(np.linalg.norm(np.asarray(b)))
    tol = rel * bnorm
    t0 = time.perf_counter()
    amg = smoothed_aggregation_preconditioner(A, dtype=jnp.float32)
    setup_s = time.perf_counter() - t0
    ovh = rpc_overhead_s()

    def run(**kw):
        x, info = cg_solve(A, b, tol=tol, **kw)
        float(info.rnorm_sq)
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            x, info = cg_solve(A, b, tol=tol, **kw)
            float(info.rnorm_sq)
            ts.append(time.perf_counter() - t1)
        ts.sort()
        t = max(ts[len(ts) // 2] - ovh, 1e-9)
        r = np.asarray(b - A.matvec(x), dtype=np.float64)
        return {
            "time_s": round(t, 4),
            "iterations": int(info.iterations),
            "converged": bool(info.converged),
            "true_rel_residual": float(f"{np.linalg.norm(r) / bnorm:.3e}"),
        }

    plain = run(maxiter=plain_maxiter)
    jac = run(maxiter=plain_maxiter, M=jacobi_preconditioner(A))
    mg = run(M=amg)
    amg_cheb = smoothed_aggregation_preconditioner(
        A, dtype=jnp.float32, smoother="chebyshev")
    mgc = run(M=amg_cheb)
    best = mgc if mgc["time_s"] < mg["time_s"] else mg
    speedup = plain["time_s"] / best["time_s"]
    return {
        "metric": "amg_solve_speedup",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 2),
        "detail": {"nx": nx, "n": n, "rel_tol": rel,
                   "plain": plain, "jacobi": jac, "amg": mg,
                   "amg_chebyshev": mgc,
                   "smoother": "chebyshev" if best is mgc else "jacobi",
                   "amg_setup_s": round(setup_s, 2),
                   "amg_levels": list(amg.level_sizes),
                   "iter_ratio": round(plain["iterations"]
                                       / max(best["iterations"], 1), 1)},
    }


def bench_large(n: int = 1572864, iters: int = 64):
    """North-star-scale CG iteration: ~1.5M rows (G3_circuit-class), 2.4 GB
    operator stream — BASELINE.md configs 2/5 scale on one chip."""
    return {**bench_cg(n=n, iters=iters), "metric":
            "cg_iteration_effective_bandwidth_1p5M"}


def bench_symdia_big(n: int = 1 << 21, half_band: int = 20,
                     stride: int = 1024, iters: int = 256):
    """Full vs SYMMETRIC DIA CG iteration PAST the 320 MB constant-closure
    gate — both operators as jit ARGUMENTS in their pre-blocked Pallas
    layouts (full: DIAMatrix.with_blocked; sym: the round-4 halo'd
    SymDIAMatrix.with_blocked), which is exactly what cg_solve's dispatch
    does automatically there (solver/cg.py).  Offsets are stencil-scale
    (k·stride, stride ≥ 1024: the Pallas-kernel regime — XLA's shift
    formulation collapses at these offsets).

    Default sizes: sym stores 21 diagonals × 8 MB = 168 MB half-band
    (plus the blocked layout's left halo), full stores 41 × 8 MB = 344 MB
    (> the 320 MB gate).  ~0.7 GB of uploads total — run this as late
    chip work of a session (CLAUDE.md relay rules).

    value = the symmetric solve's effective bandwidth with FULL-layout
    useful bytes (headline convention); detail carries both per-iteration
    times and the speedup.
    """
    import time

    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.cg import cg_init, cg_step
    from conjugategradient_tpu.types import DIAMatrix, SymDIAMatrix
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    rng = np.random.default_rng(0)
    w = half_band
    offs_pos = tuple(k * stride for k in range(w + 1))
    diags_pos = np.zeros((w + 1, n), np.float32)
    for j, k in enumerate(offs_pos[1:], start=1):
        d = (0.05 * rng.standard_normal(n)).astype(np.float32)
        d[n - k:] = 0.0
        diags_pos[j] = d
    diags_pos[0] = 1.0 + 2.0 * np.abs(diags_pos[1:]).sum(axis=0).max()
    offs_full = tuple(k * stride for k in range(-w, w + 1))
    diags_full = np.zeros((2 * w + 1, n), np.float32)
    for j, off in enumerate(offs_full):
        if off >= 0:
            diags_full[j] = diags_pos[off // stride]
        else:
            k = -off
            diags_full[j, k:] = diags_pos[k // stride][: n - k]
    nnz = int((np.abs(diags_full) > 0).sum())

    full = DIAMatrix(
        jnp.asarray(diags_full), offs_full, (n, n), nnz
    ).with_blocked()
    sym = SymDIAMatrix(
        jnp.asarray(diags_pos), offs_pos, (n, n), nnz
    ).with_blocked()

    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    tol_arr = jnp.asarray(0.0, jnp.float32)
    ovh = rpc_overhead_s()

    def time_solve(op):
        # operator as ARGUMENT (the >320 MB pattern): thread the pytree
        # through jit so the pre-blocked arrays stream, not relayout.
        # iters=256 keeps the chained solve (~100 ms) far above the ~30 ms
        # RPC overhead being subtracted — at the original iters=48 the
        # subtraction noise was ±~100 µs/iter, the size of the effect.
        def chain(op_, b_):
            s = jax.lax.fori_loop(
                0, iters, lambda i, s: cg_step(op_, s, tol_arr),
                cg_init(op_, b_, maxiter=iters),
            )
            return s.rnorm_sq.reshape(1)

        f = jax.jit(chain)
        float(f(op, b)[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(op, b)[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return (ts[1] - ovh) / iters, [
            round((x - ovh) / iters * 1e6, 2) for x in ts
        ]

    t_sym, reps_sym = time_solve(sym)
    t_full, reps_full = time_solve(full)
    full_bytes = diags_full.size * 4 + 7 * n * 4
    gbps = full_bytes / t_sym / 1e9
    peak = _hbm_peak_gbps()
    return {
        "metric": "symdia_blocked_cg_iteration_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {"n": n, "half_band": w, "stride": stride,
                   "sym_stored_MB": round(diags_pos.size * 4 / 1e6, 1),
                   "full_stored_MB": round(diags_full.size * 4 / 1e6, 1),
                   "time_per_iter_us_sym": round(t_sym * 1e6, 2),
                   "time_per_iter_us_full": round(t_full * 1e6, 2),
                   "reps_us_sym": reps_sym,
                   "reps_us_full": reps_full,
                   "iterations_run": iters,
                   "speedup_vs_full": round(t_full / t_sym, 3),
                   "bytes_effective": full_bytes,
                   "bytes_streamed": diags_pos.size * 4 + 7 * n * 4,
                   # what the DMA engine REALLY moves per iteration: the
                   # blocked layout re-reads hw halo values per block
                   "bytes_streamed_halo":
                       int(sym.diags_blocked.size) * 4 + 7 * n * 4,
                   "halo_overhead":
                       round(sym.diags_blocked.size / diags_pos.size, 3)},
    }


def bench_minres(n: int = 262144, iters: int = 256, storage: str = "sym"):
    """Per-iteration time of the FUSED MINRES loop body (solver/fused_minres)
    on the headline block-tridiagonal operator — the round-5 lane for the
    symmetric-indefinite family.  MINRES has the same kernel shape as CG
    (1 SpMV + 2 reductions, CG.hpp:374-407), so the target is the fused CG
    number on the same operator within ~10%.

    value = effective bandwidth with FULL-layout useful bytes over the
    fused iteration time (the headline symmetric-SpMV convention); detail
    carries the PORTABLE (~10-dispatch) per-iteration time measured in the
    same process — the gap the fusion closes — and the streamed-byte rate.
    """
    import time

    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.fused_minres import (
        fused_minres_init,
        fused_minres_step,
        fused_minres_supported,
    )
    from conjugategradient_tpu.solver.minres import minres_init, minres_step
    from conjugategradient_tpu.types import BlockedEllMatrix, SymBellMatrix
    from conjugategradient_tpu.utils.benchmarking import (
        rpc_overhead_s,
        stream_roofline_gbps,
    )

    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    tol_arr = jnp.asarray(0.0, jnp.float32)
    shift2 = jnp.zeros((1, 1), jnp.float32)
    shift0 = jnp.asarray(0.0, jnp.float32)

    if storage == "sym":
        a = block_tridiag_sym_bell(n, 128, 128, jnp.float32)
        shape_static, nnz_static = a.shape, a.nnz
        fk_static, banded_static = a.full_kmax, a.banded

        def make_a(diag, off, cols):
            return SymBellMatrix(diag, off, cols, shape_static, nnz_static,
                                 fk_static, banded_static)

        op_args = (a.diag_blocks, a.off_blocks, a.off_cols)
    else:
        a = block_tridiag_bell(n, 128, 128, jnp.float32)
        shape_static, nnz_static = a.shape, a.nnz

        def make_a(blocks, cols):
            return BlockedEllMatrix(blocks, cols, shape_static, nnz_static)

        op_args = (a.blocks, a.block_cols)
    if not fused_minres_supported(a, dtype=jnp.float32):
        return {"metric": "minres_iteration_time", "value": -1.0,
                "unit": "us", "vs_baseline": 0.0,
                "detail": {"error": "fused path unsupported on this backend"}}

    ovh = rpc_overhead_s()

    def run_fused(K, reps=5):
        def chain(*xs):
            a_ = make_a(*xs[:-1])
            s0 = fused_minres_init(a_, xs[-1], None, K, None, shift2)
            s = jax.lax.fori_loop(
                0, K, lambda i, s: fused_minres_step(a_, s, tol_arr, shift2),
                s0)
            return s.phibar.reshape(1)

        f = jax.jit(chain)
        args = op_args + (b,)
        float(f(*args)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args)[0])
            ts.append(time.perf_counter() - t0)
        return sorted((x - ovh) / K for x in ts)

    def run_portable(K, reps=3):
        def chain(*xs):
            a_ = make_a(*xs[:-1])
            s0 = minres_init(a_, xs[-1], None, tol_arr, shift0, K)
            s = jax.lax.fori_loop(
                0, K, lambda i, s: minres_step(a_, s, tol_arr, shift0), s0)
            return s.phibar.reshape(1)

        f = jax.jit(chain)
        args = op_args + (b,)
        float(f(*args)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args)[0])
            ts.append(time.perf_counter() - t0)
        return sorted((x - ovh) / K for x in ts)

    tf = run_fused(iters)
    t = tf[len(tf) // 2]
    tp = run_portable(max(iters // 4, 32))
    t_port = tp[len(tp) // 2]

    # K1 streams 6 vectors in + v/q/w/x out, K2 3 in + 1 out: 14 n-streams
    streams = 14
    if storage == "sym":
        stored_tile_bytes = (
            a.diag_blocks.size + a.off_blocks.size) * 4
        full_tile_bytes = (a.full_tile_bytes() // a.dtype.itemsize) * 4
    else:
        stored_tile_bytes = full_tile_bytes = a.blocks.size * 4
    eff_bytes = full_tile_bytes + streams * n * 4
    streamed = stored_tile_bytes + streams * n * 4
    gbps = eff_bytes / t / 1e9
    peak = _hbm_peak_gbps()
    roofline = stream_roofline_gbps(nbytes=1 << 27, K=256)
    return {
        "metric": "minres_iteration_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {"n": n, "storage": storage,
                   "time_per_iter_us": round(t * 1e6, 2),
                   "time_per_iter_us_portable": round(t_port * 1e6, 2),
                   "fused_speedup_vs_portable": round(t_port / t, 3),
                   "iterations_run": iters,
                   "bytes_per_iter": eff_bytes,
                   "bytes_streamed": streamed,
                   "stored_gbps": round(streamed / t / 1e9, 2),
                   "reps_us": [round(x * 1e6, 2) for x in tf],
                   "stream_roofline_gbps": round(roofline, 1)},
    }


def _convdiff_dia(n_target: int):
    """Nonsymmetric convection-diffusion operator in DIA layout.

    DIA is the right layout for this 5-diagonal stencil pattern (21 MB of
    operator at n=1M vs ~2.7 GB as dense-tile blocked-ELL), and — critical
    for this environment — keeps the bench upload relay-safe (CLAUDE.md
    forbids multi-GB uploads mid-round).  The nonsymmetric lanes measure
    iteration cost where it lives at this scale: the VECTOR/basis streams
    (GMRES's CGS2 traffic, BiCGStab's ~25 unfused streams), which are
    layout-independent.
    """
    import jax.numpy as jnp

    from conjugategradient_tpu.problems import convection_diffusion_2d_coo
    from conjugategradient_tpu.types import CSRMatrix, DIAMatrix

    nx = int(np.sqrt(n_target))
    rows, cols, vals, shape = convection_diffusion_2d_coo(nx, peclet=10.0)
    order = np.lexsort((cols, rows))
    r, c, v = rows[order], cols[order], vals[order].astype(np.float32)
    n = shape[0]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, r + 1, 1)
    indptr = np.cumsum(indptr)
    dia = DIAMatrix.from_csr_host(v, c, indptr, shape, dtype=np.float32)
    return dia, n


def bench_bicgstab(n: int = 1 << 22, iters: int = 512):
    """Per-iteration cost of the BiCGStab loop (solver/bicgstab.py) on the
    ~1M-row nonsymmetric convection-diffusion operator — the round-5 chip
    lane for the nonsymmetric family.

    One BiCGStab iteration = 2 SpMVs + 6 reductions + ~8 vector updates
    (~25 n-streams if nothing fused).  ``value`` is the measured speedup
    over the naive-stream HBM model (analytic bytes / HBM peak) — > 1
    means XLA's fusion plus VMEM residency beat a perfectly-streamed
    unfused iteration.  Measured v5e: 4.2x at n=1M (the WHOLE Krylov
    state fits VMEM: 43 us/iter), 1.32x at the default n=4.2M (vectors
    exceed VMEM; 543 us/iter — the production-scale number).  A raw
    GB/s-vs-roofline convention is dishonest here: both byte models
    overcount post-fusion traffic, so the "effective bandwidth" exceeds
    the roofline even when HBM-bound (docs/round5.md chip sessions).
    iters must keep the chain far above the ~27 ms RPC overhead.
    """
    import time

    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.bicgstab import (
        bicgstab_init,
        bicgstab_step,
    )
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    dia, n = _convdiff_dia(n)
    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    tol_arr = jnp.asarray(0.0, jnp.float32)
    shape_static, nnz_static, offs_static = dia.shape, dia.nnz, dia.offsets

    from conjugategradient_tpu.types import DIAMatrix

    def make_a(diags):
        return DIAMatrix(diags, offs_static, shape_static, nnz_static)

    def chain(diags, b_):
        a_ = make_a(diags)
        s0 = bicgstab_init(a_, b_, None, tol_arr, iters)
        s = jax.lax.fori_loop(
            0, iters, lambda i, s: bicgstab_step(a_, s, tol_arr), s0)
        return s.rnorm.reshape(1)

    f = jax.jit(chain)
    args = (dia.diags, b)
    float(f(*args)[0])
    ovh = rpc_overhead_s()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(*args)[0])
        ts.append(time.perf_counter() - t0)
    ts = sorted((x - ovh) / iters for x in ts)
    t = ts[len(ts) // 2]

    step_arg = jax.jit(
        lambda diags, s: bicgstab_step(make_a(diags), s, tol_arr))
    s0 = bicgstab_init(dia, b, None, tol_arr, iters)
    analytic = 2 * dia.diags.size * 4 + 25 * n * 4
    bytes_it, bytes_src, bytes_all = _iteration_bytes_xla(
        step_arg, (dia.diags, s0), analytic)
    peak = _hbm_peak_gbps()
    t_model = bytes_it / (peak * 1e9)
    speedup = t_model / t
    return {
        "metric": "bicgstab_iteration_vs_hbm_stream_model",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 4),
        "detail": {"n": n, "layout": "dia",
                   "time_per_iter_us": round(t * 1e6, 2),
                   "model_time_us": round(t_model * 1e6, 2),
                   "spmvs_per_iter": 2,
                   "iterations_run": iters,
                   "bytes_per_iter_model": bytes_it,
                   "bytes_model": bytes_src,
                   "bytes_models_all": bytes_all,
                   "reps_us": [round(x * 1e6, 2) for x in ts]},
    }


def bench_gmres(n: int = 1 << 20, inner: int = 128, restart: int = 32):
    """Per-inner-step cost of GMRES(m) (solver/gmres.py) on the ~1M-row
    nonsymmetric convection-diffusion operator.

    The dominant per-step traffic at this scale is the CGS2
    orthogonalization: four (m+1, n) matmuls at Precision.HIGHEST read the
    basis 4x per step — the byte/flop trade GMRES makes for BiCGStab-free
    robustness.  value = measured effective bandwidth against the analytic
    per-step byte model  op_stream + 2n (matvec io) + 4*(m+1)*n*4 (CGS2,
    full-cycle average ~ 4*(m/2+1)) + 5n (basis write + rotations io);
    detail carries measured-vs-model and the per-step time.
    """
    import time

    import jax.numpy as jnp

    from conjugategradient_tpu import gmres_solve
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    dia, n = _convdiff_dia(n)
    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n

    # tol=0 runs exactly `inner` Arnoldi steps (inner/restart full cycles)
    x, info = gmres_solve(dia, b, tol=0.0, maxiter=inner, restart=restart)
    float(info.rnorm)
    ovh = rpc_overhead_s()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        x, info = gmres_solve(dia, b, tol=0.0, maxiter=inner,
                              restart=restart)
        float(info.rnorm)
        ts.append(time.perf_counter() - t0)
    k = int(info.iterations)
    cycles = int(info.cycles)
    ts = sorted((x - ovh) / max(k, 1) for x in ts)
    t = ts[len(ts) // 2]

    m = restart
    dia_bytes = dia.diags.size * 4
    # full-cycle-average CGS2 traffic with the round-5 UNROLLED Arnoldi
    # (gmres_solve unroll="auto" on TPU at m <= 48): step j reads only the
    # j+2 live basis rows, 4 passes each -> cycle average 4*(m+3)/2 rows;
    # + matvec io + basis write + rotation io.  (The fori form streams
    # all m+1 rows every step: 4*(m+1).)
    model = dia_bytes + 2 * n * 4 + 4 * ((m + 3) // 2) * n * 4 + 5 * n * 4
    gbps = model / t / 1e9
    peak = _hbm_peak_gbps()
    return {
        "metric": "gmres_inner_step_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {"n": n, "layout": "dia", "restart_m": m,
                   "inner_steps": k, "cycles": cycles,
                   "time_per_step_us": round(t * 1e6, 2),
                   "bytes_per_step_model": model,
                   "cgs2_share": round(4 * ((m + 3) // 2) * n * 4 / model, 3),
                   "reps_us": [round(x * 1e6, 2) for x in ts]},
    }


def bench_eigs(n: int = 262144, k: int = 8, iters: int = 96, reps: int = 3):
    """Bench-scale eigensolver lane (round-5 VERDICT item 7): LOBPCG
    (k=8) per-iteration cost on the n=256K symmetric blocked-ELL headline
    operator, with Jacobi preconditioning.

    Each LOBPCG iteration = 3k A-matvecs (multi-RHS: ONE tile stream for
    all 3k columns via sym_bell_spmv_multi) + k Jacobi applies + one
    (n, 3k) QR + one (3k)^2 eigh.  value = effective bandwidth of the
    per-iteration operator work under the symmetric-SpMV convention
    (full-layout useful bytes x 1 stream per iteration / time); detail
    carries the raw per-iteration time and a small time-to-tolerance run.
    """
    import time

    import jax.numpy as jnp

    from conjugategradient_tpu import jacobi_preconditioner
    from conjugategradient_tpu.solver.lobpcg import lobpcg_eigs
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    a = block_tridiag_sym_bell(n, 128, 128, jnp.float32)
    M = jacobi_preconditioner(a)
    ovh = rpc_overhead_s()

    def timed(maxiter, tol, tol_absolute=False):
        res = lobpcg_eigs(a, k=k, M=M, tol=tol, maxiter=maxiter,
                          which="smallest", tol_absolute=tol_absolute)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = lobpcg_eigs(a, k=k, M=M, tol=tol, maxiter=maxiter,
                              which="smallest", tol_absolute=tol_absolute)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return res, max(ts[len(ts) // 2] - ovh, 1e-9)

    # per-iteration cost from a TWO-POINT difference of fixed-count runs:
    # each lobpcg_eigs call carries a large fixed cost (host RNG for
    # X0/P0, (n,k) eigenvector readback through the relay — measured
    # ~0.4 s at n=256K), so a single run badly overstates the marginal
    # iteration.  (tol=0, tol_absolute runs exactly to the cap.)
    res_half, t_half = timed(iters // 2, 0.0, tol_absolute=True)
    res_fix, t_fix = timed(iters, 0.0, tol_absolute=True)
    per_iter = max(t_fix - t_half, 1e-9) / max(
        int(res_fix.iters) - int(res_half.iters), 1)
    # time-to-tolerance run (relative 1e-5: the bench operator is well-
    # conditioned, so looser tolerances converge at iteration 0)
    res_tol, t_tol = timed(200, 1e-5)

    # operator bytes per iteration: ONE symmetric tile stream serves all
    # 3k matvec columns (sym_bell_spmv_multi); useful bytes follow the
    # headline full-layout convention
    full_tile_bytes = (a.full_tile_bytes() // a.dtype.itemsize) * 4
    # the (n, 3k) block vectors: X/W/P read + A-products written etc. —
    # dominated at k=8 by the QR's O(n (3k)^2) flops, not bytes; report
    # the operator-stream rate as the headline and the raw time in detail
    eff_bytes = full_tile_bytes + 8 * n * 4
    gbps = eff_bytes / per_iter / 1e9
    peak = _hbm_peak_gbps()
    return {
        "metric": "lobpcg_iteration_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {"n": n, "k": k,
                   "time_per_iter_ms": round(per_iter * 1e3, 3),
                   "iterations_run": int(res_fix.iters),
                   "fixed_call_overhead_s": round(
                       t_fix - per_iter * int(res_fix.iters), 3),
                   "tol_run": {
                       "rtol": 1e-5,
                       "iterations": int(res_tol.iters),
                       "time_s": round(t_tol, 3),
                       "max_rnorm": float(np.max(np.asarray(
                           res_tol.residuals))),
                       "lam_min": float(np.min(np.asarray(
                           res_tol.values))),
                   }},
    }


def bench_bicgstab_bell(n: int = 262144, iters: int = 128):
    """Fused BiCGStab iteration A/B vs the portable loop on a NONSYMMETRIC
    block-tridiagonal blocked-ELL operator (dense 128x128 tiles, kmax=3 —
    the headline operator shape with asymmetric couplings).

    The fused path is three Pallas kernels per iteration (two tile passes
    + one elementwise pass, solver/fused_bicgstab.py) vs the portable
    loop's ~25 XLA ops.  value = effective bandwidth (2 tile streams + 17
    vector streams over the fused time); detail carries the portable A/B.
    """
    import time

    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.bicgstab import (
        bicgstab_init,
        bicgstab_step,
    )
    from conjugategradient_tpu.solver.fused_bicgstab import (
        fused_bicgstab_init,
        fused_bicgstab_step,
        fused_bicgstab_supported,
    )
    from conjugategradient_tpu.types import BlockedEllMatrix
    from conjugategradient_tpu.utils.benchmarking import (
        rpc_overhead_s,
        stream_roofline_gbps,
    )

    # asymmetric couplings: upper != lower off-diagonal tiles
    bm = bn = 128
    nrb = n // bm
    rng = np.random.default_rng(0)
    up = (0.08 * rng.standard_normal((bm, bn))).astype(np.float32)
    lo = (0.08 * rng.standard_normal((bm, bn))).astype(np.float32)
    diag = np.eye(bm, dtype=np.float32) * (
        2.0 + np.abs(up).sum() + np.abs(lo).sum())
    blocks = np.zeros((nrb, 3, bm, bn), dtype=np.float32)
    bcols = np.zeros((nrb, 3), dtype=np.int32)
    for i in range(nrb):
        blocks[i, 0] = diag
        bcols[i, 0] = i
        k = 1
        if i > 0:
            blocks[i, k] = lo
            bcols[i, k] = i - 1
            k += 1
        if i + 1 < nrb:
            blocks[i, k] = up
            bcols[i, k] = i + 1
            k += 1
    a = BlockedEllMatrix(jnp.asarray(blocks), jnp.asarray(bcols), (n, n),
                         nrb * 3 * bm * bn)
    if not fused_bicgstab_supported(a, dtype=jnp.float32):
        return {"metric": "bicgstab_bell_iteration_time", "value": -1.0,
                "unit": "us", "vs_baseline": 0.0,
                "detail": {"error": "fused path unsupported on this backend"}}
    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    tol_arr = jnp.asarray(0.0, jnp.float32)
    shape_static, nnz_static = a.shape, a.nnz

    def make_a(blk, cols):
        return BlockedEllMatrix(blk, cols, shape_static, nnz_static)

    ovh = rpc_overhead_s()

    def run_fused(K, reps=5):
        def chain(blk, cols, b_):
            a_ = make_a(blk, cols)
            s0 = fused_bicgstab_init(a_, b_, None, K, None)
            s = jax.lax.fori_loop(
                0, K, lambda i, s: fused_bicgstab_step(a_, s, tol_arr), s0)
            return s.rnorm.reshape(1)

        f = jax.jit(chain)
        args = (a.blocks, a.block_cols, b)
        float(f(*args)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args)[0])
            ts.append(time.perf_counter() - t0)
        return sorted((x - ovh) / K for x in ts)

    def run_portable(K, reps=3):
        def chain(blk, cols, b_):
            a_ = make_a(blk, cols)
            s0 = bicgstab_init(a_, b_, None, tol_arr, K)
            s = jax.lax.fori_loop(
                0, K, lambda i, s: bicgstab_step(a_, s, tol_arr), s0)
            return s.rnorm.reshape(1)

        f = jax.jit(chain)
        args = (a.blocks, a.block_cols, b)
        float(f(*args)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args)[0])
            ts.append(time.perf_counter() - t0)
        return sorted((x - ovh) / K for x in ts)

    tf = run_fused(iters)
    t = tf[len(tf) // 2]
    tp = run_portable(max(iters // 2, 32))
    t_port = tp[len(tp) // 2]

    tile_bytes = a.blocks.size * 4
    # K1: 4 in + 2 whole out + v; K2: 4 in + 3 out + t; K3: 5 in + 2 out
    streams = 17
    eff_bytes = 2 * tile_bytes + streams * n * 4
    gbps = eff_bytes / t / 1e9
    peak = _hbm_peak_gbps()
    roofline = stream_roofline_gbps(nbytes=1 << 27, K=256)
    return {
        "metric": "bicgstab_bell_iteration_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / peak, 4),
        "detail": {"n": n,
                   "time_per_iter_us": round(t * 1e6, 2),
                   "time_per_iter_us_portable": round(t_port * 1e6, 2),
                   "fused_speedup_vs_portable": round(t_port / t, 3),
                   "iterations_run": iters,
                   "bytes_per_iter": eff_bytes,
                   "spmvs_per_iter": 2,
                   "reps_us": [round(x * 1e6, 2) for x in tf],
                   "stream_roofline_gbps": round(roofline, 1)},
    }


def bench_cg_headline(n: int = 262144, iters: int = 256):
    """The driver's default record: symmetric-storage CG iteration PLUS the
    round-1/2 full-storage configuration in one run, so the longitudinal
    series r1→rN stays one metric.

    Top level carries all three numbers (VERDICT r3 weak #2):
      value              symmetric effective GB/s (full-layout useful bytes
                         over the symmetric solve's time — the symmetric-SpMV
                         convention); vs_baseline = value/roofline
      stored_gbps        the machine-honest physically-streamed rate of the
                         same symmetric solve
      full_storage_gbps  the full-storage config measured in the same
                         process — directly comparable to BENCH_r01/r02
                         (full_vs_baseline = that /roofline)
    """
    sym = bench_cg(n=n, iters=iters, storage="sym")
    full = bench_cg(n=n, iters=iters, storage="full")
    out = dict(sym)
    out["stored_gbps"] = sym["detail"]["stored_gbps"]
    out["full_storage_gbps"] = full["value"]
    out["full_vs_baseline"] = full["vs_baseline"]
    out["detail"] = {**sym["detail"], "full": full["detail"]}
    return out


def _probe_device(retries: int = 1, wait_s: float = 20.0):
    """Trivial-op probe: materialize the backend and run one reduction
    before any real config.  The FIRST device use in a process can block
    minutes on the previous process's chip grant (CLAUDE.md), so this is
    where a wedged relay or missing backend surfaces — as a catchable
    exception inside the bench's failure-JSON envelope rather than a
    traceback after minutes of real work.  One bounded retry by default."""
    import time as _time

    last = None
    for attempt in range(retries + 1):
        try:
            import jax
            import jax.numpy as jnp

            dev = jax.devices()[0]
            val = float(jnp.ones((8,), jnp.float32).sum())
            assert val == 8.0, f"probe computed {val} != 8.0"
            return {"device": str(dev), "device_kind": dev.device_kind,
                    "attempt": attempt}
        except Exception as e:  # backend init / relay failures land here
            last = e
            if attempt < retries:
                _time.sleep(wait_s)
    raise RuntimeError(f"device probe failed after {retries + 1} attempts: "
                       f"{last!r}") from last


_CONFIGS = {
    "spmv": bench_spmv_bell,
    "stencil": bench_stencil,
    "cg": bench_cg_headline,
    "cg-full": lambda: bench_cg(storage="full"),
    "cg-bf16": lambda: bench_cg(storage="full", dtype="bfloat16"),
    "pcg": bench_pcg,
    "batched": bench_batched,
    "large": bench_large,
    "irregular": bench_irregular,
    "symdia": bench_symdia,
    "symdia-big": bench_symdia_big,
    "minres": bench_minres,
    "bicgstab": bench_bicgstab,
    "bicgstab-bell": bench_bicgstab_bell,
    "gmres": bench_gmres,
    "eigs": bench_eigs,
    "mgpcg": bench_mgpcg,
    "amg": bench_amg,
}


def _failure_record(config: str, stage: str, err: Exception) -> dict:
    """A parseable one-line JSON for ANY failure (VERDICT r3 weak #1: an
    init failure used to produce rc=1 + traceback, i.e. an unparseable
    round artifact).  Keeps the metric/value/unit/vs_baseline keys so
    schema-expecting consumers still parse it; ``error`` marks it failed."""
    return {
        "metric": f"bench_{config}_failed",
        "value": -1.0,
        "unit": "error",
        "vs_baseline": 0.0,
        "error": f"{type(err).__name__}: {err}",
        "config": config,
        "stage": stage,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    # default: the whole jitted CG iteration (SpMV + 2 dots + 3 axpys) —
    # measured at ~95% of the stream roofline on v5e, it subsumes the SpMV
    # metric and is the quantity that determines solve wall-time.
    ap.add_argument("--config", default="cg", choices=tuple(_CONFIGS))
    ap.add_argument("--watchdog", type=float, default=0.0,
                    help="optional wall-clock bound in seconds; on expiry "
                         "print the failure JSON and exit (a hung relay RPC "
                         "is not interruptible from Python, so the watchdog "
                         "hard-exits the process)")
    args = ap.parse_args(argv)

    if args.watchdog > 0:
        import threading

        def _expire():
            print(json.dumps(_failure_record(
                args.config, "watchdog",
                TimeoutError(f"exceeded --watchdog {args.watchdog}s"))),
                flush=True)
            os._exit(0)  # rc=0: the JSON line IS the artifact

        timer = threading.Timer(args.watchdog, _expire)
        timer.daemon = True
        timer.start()

    try:
        probe = _probe_device()
    except Exception as e:
        print(json.dumps(_failure_record(args.config, "probe", e)))
        return 0
    try:
        out = _CONFIGS[args.config]()
    except Exception as e:
        print(json.dumps(_failure_record(args.config, "bench", e)))
        return 0
    out.setdefault("detail", {})["probe"] = probe
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
