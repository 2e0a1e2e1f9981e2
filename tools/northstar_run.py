#!/usr/bin/env python
"""North-star-scale end-to-end solves on the chip (BASELINE.md configs 2/4/5
scale) — prints one JSON line per run for docs/performance.md.

One config per invocation (one process per TPU task — grant discipline):

  python tools/northstar_run.py poisson3d   # 117^3 = 1,601,613 rows, DIA
  python tools/northstar_run.py powerlaw    # 1,572,864 rows irregular, CSR
  python tools/northstar_run.py stencil     # 256^3 = 16.8M matrix-free

Methodology: the whole solve is one jitted while_loop dispatch; wall time is
measured around that single dispatch with a 1-element readback sync and the
measured RPC overhead subtracted (utils/benchmarking.rpc_overhead_s).  The
manufactured solution x*=1 gives b=A·1, so the true residual/error are
reported independently of the recurrence (SURVEY §4: the reference declared
a manufactured-solutions test and never wrote it, test/utils.hpp:66-67).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the persistent compile cache)


def _solve_and_time(op, b, tol, maxiter, **kw):
    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu import cg_solve
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    ovh = rpc_overhead_s()
    # warm-up: compile + run once
    x, info = cg_solve(op, b, tol=tol, maxiter=maxiter, **kw)
    float(info.rnorm_sq)
    t0 = time.perf_counter()
    x, info = cg_solve(op, b, tol=tol, maxiter=maxiter, **kw)
    float(info.rnorm_sq)  # readback sync
    wall = time.perf_counter() - t0 - ovh
    r_true = b - op.matvec(x)
    import jax.numpy as jnp

    rel = float(jnp.linalg.norm(r_true) / jnp.linalg.norm(b))
    return x, info, wall, rel


def run_poisson3d(nx=117, tol_rel=1e-7):
    import jax.numpy as jnp

    from conjugategradient_tpu.problems import poisson3d_coo
    from conjugategradient_tpu.types import CSRMatrix, DIAMatrix

    rows, cols, vals, shape = poisson3d_coo(nx)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    op = DIAMatrix.from_csr(csr)  # 7 diagonals — the auto-layout choice
    n = shape[0]
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)  # manufactured solution x* = 1
    tol = tol_rel * float(jnp.linalg.norm(b))
    x, info, wall, rel = _solve_and_time(op, b, tol, maxiter=2000)
    iters = int(info.iterations)
    bytes_it = op.diags.size * 4 + 7 * n * 4
    return {
        "metric": "poisson3d_117_solve_wall",
        "value": round(wall * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "nnz": csr.nnz, "layout": "dia(7)",
            "iterations": iters, "true_rel_residual": rel,
            "per_iter_ms": round(wall * 1e3 / max(iters, 1), 3),
            "gbps_effective": round(bytes_it * iters / wall / 1e9, 1),
            "err_vs_ones": float(jnp.max(jnp.abs(x - 1.0))),
        },
    }


def run_powerlaw(n=1572864, avg_degree=4.8, tol_rel=1e-6, layout="sell"):
    import jax.numpy as jnp

    from conjugategradient_tpu.problems import powerlaw_spd_coo
    from conjugategradient_tpu.types import CSRMatrix, SellMatrix

    rows, cols, vals, shape = powerlaw_spd_coo(n, avg_degree=avg_degree, seed=0)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    # sell is the auto-layout choice for scattered patterns: one gather per
    # stored slot instead of CSR's gather + scalar segment-sum (2x measured)
    op = SellMatrix.from_csr(csr) if layout == "sell" else csr
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)
    tol = tol_rel * float(jnp.linalg.norm(b))
    x, info, wall, rel = _solve_and_time(op, b, tol, maxiter=600)
    iters = int(info.iterations)
    op_bytes = op.memory_footprint()
    return {
        "metric": "powerlaw_1p5M_solve_wall",
        "value": round(wall * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "nnz": op.nnz,
            "layout": "sell (bucketed gather)" if layout == "sell" else "csr (gather fallback)",
            "iterations": iters, "true_rel_residual": rel,
            "per_iter_ms": round(wall * 1e3 / max(iters, 1), 3),
            "gbps_effective": round((op_bytes + 7 * n * 4) * iters / wall / 1e9, 1),
            "err_vs_ones": float(jnp.max(jnp.abs(x - 1.0))),
        },
    }


def run_stencil(nx=256, tol_rel=2.4e-4):
    import jax.numpy as jnp

    from conjugategradient_tpu.types import StencilOperator

    op = StencilOperator.poisson((nx, nx, nx), dtype=jnp.float32)
    n = nx ** 3
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)
    tol = tol_rel * float(jnp.linalg.norm(b))
    x, info, wall, rel = _solve_and_time(op, b, tol, maxiter=2000)
    iters = int(info.iterations)
    return {
        "metric": "stencil256_solve_wall",
        "value": round(wall * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "layout": "matrix-free 7-point",
            "iterations": iters, "true_rel_residual": rel,
            "per_iter_ms": round(wall * 1e3 / max(iters, 1), 3),
            "gbps_ideal": round(2 * n * 4 * iters / wall / 1e9, 1),
            "err_vs_ones": float(jnp.max(jnp.abs(x - 1.0))),
        },
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=("poisson3d", "powerlaw", "stencil"))
    args = ap.parse_args(argv)
    out = {"poisson3d": run_poisson3d, "powerlaw": run_powerlaw,
           "stencil": run_stencil}[args.config]()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
