#!/usr/bin/env python
"""Chip A/B: AMG-preconditioned nonsymmetric solves vs plain GMRES on
convection-diffusion (round-5 VERDICT item 6 — the flagship demo).

Three arms: plain GMRES(30), AMG-preconditioned BiCGStab (the robust
TPU pairing — M applies at the while-loop top level), and
AMG-preconditioned GMRES (csr-layout levels; crashes the TPU worker at
nx >= ~512 — an XLA:TPU runtime fault, docs/round5.md — so it runs LAST
and only at --nx <= the guard).

Runs on whatever backend is default (the real TPU chip under axon).
Relay-safe: the operator uploads as DIA (5 diagonals, ~5 MB at nx=512)
for the Krylov matvecs while the AMG setup reads the host CSR graph.

Usage:
    python tools/gmres_amg_ab.py [--nx 512] [--peclet 10] [--rel 1e-6]

Prints one JSON line:
    {"nx":..., "plain_gmres": {...}, "amg_bicgstab": {...}, ...}
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
    ap.add_argument("--gmres-amg-max-nx", type=int, default=256,
                    help="run the gmres+AMG arm only at --nx <= this "
                         "(larger faults the TPU worker — docs/round5.md)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from conjugategradient_tpu import bicgstab_solve, gmres_solve
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
    # BiCGStab applies M at the while-loop top level, where the default
    # auto (DIA where banded) level layout is safe AND faster; GMRES's
    # inner Arnoldi fori_loop needs csr levels on TPU and still faults
    # past nx~256 (XLA:TPU runtime fault — docs/round5.md chip sessions)
    M = smoothed_aggregation_preconditioner(csr, dtype=jnp.float32)
    M_csr = smoothed_aggregation_preconditioner(csr, dtype=jnp.float32,
                                                level_layout="csr")
    setup_s = time.time() - t0
    ovh = rpc_overhead_s()

    def run(solver, Mx, **kw):
        x, info = solver(dia, b, tol=tol, maxiter=args.maxiter, M=Mx, **kw)
        float(info.rnorm)  # warm compile + execute
        ts = []
        for _ in range(args.reps):
            t1 = time.perf_counter()
            x, info = solver(dia, b, tol=tol, maxiter=args.maxiter, M=Mx,
                             **kw)
            float(info.rnorm)
            ts.append(time.perf_counter() - t1)
        ts.sort()
        t = max(ts[len(ts) // 2] - ovh, 1e-9)
        rres = np.asarray(b, dtype=np.float64) - np.asarray(
            csr.matvec(x), dtype=np.float64)
        return {
            "time_s": round(t, 4),
            "iterations": int(info.iterations),
            "converged": bool(info.converged),
            "true_rel_residual": float(
                f"{np.linalg.norm(rres) / np.linalg.norm(np.asarray(b)):.3e}"
            ),
        }

    out = {
        "nx": args.nx, "n": n, "peclet": args.peclet, "rel_tol": args.rel,
        "restart": args.restart, "amg_setup_s": round(setup_s, 2),
    }
    out["plain_gmres"] = run(gmres_solve, None, restart=args.restart)
    out["amg_bicgstab"] = run(bicgstab_solve, M)
    out["speedup"] = round(
        out["plain_gmres"]["time_s"] / out["amg_bicgstab"]["time_s"], 2)
    out["iter_ratio"] = round(
        out["plain_gmres"]["iterations"]
        / max(out["amg_bicgstab"]["iterations"], 1), 1)
    # the risky arm LAST: a worker crash here still leaves the line above
    if args.nx <= args.gmres_amg_max_nx:
        print(json.dumps(out), flush=True)  # partial line first, crash-safe
        out["amg_gmres"] = run(gmres_solve, M_csr, restart=args.restart)
    else:
        out["amg_gmres"] = {
            "skipped": f"nx={args.nx} > gmres-amg guard "
                       f"{args.gmres_amg_max_nx} (TPU worker fault, "
                       "docs/round5.md)"}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
