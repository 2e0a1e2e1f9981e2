#!/usr/bin/env python
"""Chip A/B: AMG-preconditioned vs plain GMRES on nonsymmetric
convection-diffusion (round-5 VERDICT item 6 — the flagship demo).

Runs on whatever backend is default (the real TPU chip under axon).
Relay-safe: the operator uploads as DIA (5 diagonals, ~5 MB at nx=512)
for the Krylov matvecs while the AMG setup reads the host CSR graph.

Usage:
    python tools/gmres_amg_ab.py [--nx 512] [--peclet 10] [--rel 1e-8]

Prints one JSON line:
    {"nx":..., "n":..., "plain": {...}, "amg": {...}, "speedup": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_persistent_compile_cache  # noqa: E402

_enable_persistent_compile_cache()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=512)
    ap.add_argument("--peclet", type=float, default=10.0)
    ap.add_argument("--rel", type=float, default=1e-6)  # f32 floor: rel ~1e-7 is unattainable
    ap.add_argument("--restart", type=int, default=30)
    ap.add_argument("--maxiter", type=int, default=6000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from conjugategradient_tpu import gmres_solve
    from conjugategradient_tpu.problems import convection_diffusion_2d_coo
    from conjugategradient_tpu.solver.amg import (
        smoothed_aggregation_preconditioner,
    )
    from conjugategradient_tpu.types import CSRMatrix, DIAMatrix
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    rows, cols, vals, shape = convection_diffusion_2d_coo(
        args.nx, peclet=args.peclet)
    n = shape[0]
    order = np.lexsort((cols, rows))
    r_, c_, v_ = rows[order], cols[order], vals[order].astype(np.float32)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, r_ + 1, 1)
    indptr = np.cumsum(indptr)
    dia = DIAMatrix.from_csr_host(v_, c_, indptr, shape, dtype=np.float32)
    csr = CSRMatrix.from_arrays(v_, c_, indptr, shape)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    tol = args.rel * float(np.linalg.norm(np.asarray(b)))

    t0 = time.time()
    M = smoothed_aggregation_preconditioner(csr, dtype=jnp.float32)
    setup_s = time.time() - t0
    ovh = rpc_overhead_s()

    def run(Mx):
        x, info = gmres_solve(dia, b, tol=tol, maxiter=args.maxiter,
                              restart=args.restart, M=Mx)
        float(info.rnorm)  # warm compile + execute
        ts = []
        for _ in range(args.reps):
            t1 = time.perf_counter()
            x, info = gmres_solve(dia, b, tol=tol, maxiter=args.maxiter,
                                  restart=args.restart, M=Mx)
            float(info.rnorm)
            ts.append(time.perf_counter() - t1)
        ts.sort()
        t = max(ts[len(ts) // 2] - ovh, 1e-9)
        rres = np.asarray(b, dtype=np.float64) - np.asarray(
            csr.matvec(x), dtype=np.float64)
        return {
            "time_s": round(t, 4),
            "iterations": int(info.iterations),
            "cycles": int(info.cycles),
            "converged": bool(info.converged),
            "true_rel_residual": float(
                f"{np.linalg.norm(rres) / np.linalg.norm(np.asarray(b)):.3e}"
            ),
        }

    plain = run(None)
    amg = run(M)
    print(json.dumps({
        "nx": args.nx, "n": n, "peclet": args.peclet, "rel_tol": args.rel,
        "restart": args.restart,
        "plain": plain, "amg": amg,
        "amg_setup_s": round(setup_s, 2),
        "speedup": round(plain["time_s"] / amg["time_s"], 2),
        "iter_ratio": round(plain["iterations"]
                            / max(amg["iterations"], 1), 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
