#!/usr/bin/env python
"""Run all five BASELINE.json configs end-to-end through tester.py's
4-column protocol (dim NNZ time_ms rel_error — test/Tester.cpp:54) in ONE
process, so the chip grant is paid once.

The five configs (BASELINE.json "configs") run on their sandbox stand-ins
(no network egress — tools/fetch_suitesparse.py documents the fallback):

1. unpreconditioned dense CG .......... problems/dense_256.mtx
2. CSR SpMV CG on SuiteSparse SPD ..... powerlaw_1138.mtx (1138_bus-class),
                                        elasticity3d_16.mtx (bcsstk17-class),
                                        bcsstk17_profile.mtx (published
                                        n=10974 / nnz~428650 exactly)
3. Jacobi-PCG, fused apply ............ poisson3d_48.mtx --precond jacobi
4. matrix-free 256^3 Poisson stencil .. stencil:256
5. G3_circuit-scale (row-sharded in
   dryrun_multichip; one real chip
   here) ............................. circuit_g3.mtx --layout auto

Tolerances are rel-1e-6 expressed as the absolute ||r||2 threshold tester.py
takes (the reference's `improvement`, CG.hpp:255): tol = 1e-6 * ||b|| with
b[i] = i+1.  Everything runs f32 (TPU float64 is emulated; parity is the
CPU test suite's job — this table is the performance protocol).

Usage: timeout 3600 python tools/run_five_configs.py [--only NAME ...]
                                                     [--reps N]
Prints one `### name` header + tester.py's stdout per config.  With
--reps N each config's solve is repeated N times in-process (jit caches
warm after rep 1) and a `### name summary` JSON line quotes the median
and min-max range of time_ms — chip run-to-run variance is ~20%
(CLAUDE.md), so single-run rows are not comparable across rounds.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))


def rel_tol(n: int, rel: float = 1e-6) -> float:
    # ||b||2 for b[i]=i+1 in closed form
    return rel * math.sqrt(n * (n + 1) * (2 * n + 1) / 6.0)


CONFIGS = [
    # (name, n, extra argv)  — argv gets --tol and --dtype appended
    ("config1_dense", 256,
     ["problems/dense_256.mtx", "--layout", "csr"]),
    ("config2_powerlaw_1138", 1138,
     ["problems/powerlaw_1138.mtx", "--layout", "auto"]),
    ("config2_elasticity3d_16", 3 * 16 ** 3,
     ["problems/elasticity3d_16.mtx", "--layout", "auto"]),
    ("config2_bcsstk17_profile", 10974,
     ["problems/bcsstk17_profile.mtx", "--layout", "auto"]),
    ("config3_jacobi_poisson3d", 48 ** 3,
     ["problems/poisson3d_48.mtx", "--layout", "auto",
      "--precond", "jacobi"]),
    ("config4_stencil256", 256 ** 3, ["stencil:256"]),
    ("config5_circuit_g3", 1585478,
     ["problems/circuit_g3.mtx", "--layout", "auto",
      "--maxiter", "20000"]),
    # symmetric-storage A/B rows (round 3 layouts; not part of the five
    # BASELINE configs — run with --only to record the symmetric table):
    # the same systems on half/two-thirds the operator bytes.
    ("sym_poisson3d_symdia", 48 ** 3,
     ["problems/poisson3d_48.mtx", "--layout", "symdia"]),
    ("sym_elasticity3d_symdia", 3 * 16 ** 3,
     ["problems/elasticity3d_16.mtx", "--layout", "symdia"]),
    ("sym_poisson2d_symbell", 110 ** 2,
     ["problems/poisson2d_110.mtx", "--layout", "symbell"]),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only these config names")
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat each config's solve N times and quote "
                         "median + range of time_ms (chip variance ~20%%)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # probe: a trivial op first, so a wedged tunnel fails fast and loudly
    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    print(f"probe: {float(jnp.ones((8,)).sum())} "
          f"({time.time() - t0:.1f}s)", flush=True)

    import tester

    rc = 0
    for name, n, argv in CONFIGS:
        if args.only and name not in args.only:
            continue
        full = argv + ["--tol", repr(rel_tol(n)), "--dtype", "float32",
                       "--summary"]
        print(f"\n### {name}: tester.py {' '.join(full)}", flush=True)
        t0 = time.time()
        times_ms = []
        code = 0
        for rep in range(max(1, args.reps)):
            buf = io.StringIO()
            try:
                with contextlib.redirect_stdout(buf):
                    code = tester.main(full)
            except Exception as e:  # keep going — later configs still run
                sys.stdout.write(buf.getvalue())
                print(f"### {name} FAILED (rep {rep}): "
                      f"{type(e).__name__}: {e}", flush=True)
                rc = 1
                code = None
                break
            out = buf.getvalue()
            sys.stdout.write(out)
            sys.stdout.flush()
            # the 4-column protocol line: dim NNZ time_ms rel_error
            for line in out.splitlines():
                parts = line.split()
                if len(parts) == 4 and not line.lstrip().startswith("{"):
                    try:
                        times_ms.append(float(parts[2]))
                    except ValueError:
                        pass
                    break
        if code is None:
            continue
        if args.reps > 1 and times_ms:
            print(f"### {name} summary " + json.dumps({
                "reps": len(times_ms),
                "time_ms_median": statistics.median(times_ms),
                "time_ms_min": min(times_ms),
                "time_ms_max": max(times_ms),
                "time_ms_all": times_ms,
            }), flush=True)
        print(f"### {name} rc={code} wall={time.time() - t0:.1f}s",
              flush=True)
        rc = rc or code
    return rc


if __name__ == "__main__":
    sys.exit(main())
