#!/usr/bin/env python
"""Chip A/B of the symmetric fused-CG mirror schemes (one bounded process).

The round-3 scatter kernel leaves ~100 us/iteration of headroom over the
279 MB engine bound at the headline config (455-474 us measured vs ~372 us
bound — docs/performance.md "Negative results").  This tool times the full
fused two-kernel iteration (K=`--iters` fori_loop chains, median of
`--reps`) for each mirror scheme on the headline operator, interleaved so
chip drift hits all variants equally:

  scatter   per-tile dynamic read-modify-write into the VMEM-resident q
  split     products into (R,.) scratch, dedicated dynamic-RMW phase
  banded    per-STEP carry; q becomes a pure aligned write (block-tridiag)

plus the full-storage kernel as the yardstick.  Prints one JSON line per
round and a summary; run under `timeout` with default env (real chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    import bench  # noqa: E402  (enables the persistent compile cache)

    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.fused import fused_cg_init, fused_cg_step
    from conjugategradient_tpu.types import BlockedEllMatrix, SymBellMatrix
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    n = args.n
    K = args.iters
    print(json.dumps({"probe": str(jax.devices()[0])}), flush=True)

    sym = bench.block_tridiag_sym_bell(n, 128, 128, jnp.float32)
    full = bench.block_tridiag_bell(n, 128, 128, jnp.float32)
    assert sym.banded, "headline operator must pack banded"
    b = jnp.arange(1, n + 1, dtype=jnp.float32) / n
    tol_arr = jnp.asarray(0.0, jnp.float32)

    sym_static = (sym.shape, sym.nnz, sym.full_kmax, sym.banded)
    full_static = (full.shape, full.nnz)

    def make_chain(mirror):
        if mirror == "full":
            def chain(blocks, cols, b_):
                a_ = BlockedEllMatrix(blocks, cols, *full_static)
                s = jax.lax.fori_loop(
                    0, K, lambda i, s: fused_cg_step(a_, s, tol_arr),
                    fused_cg_init(a_, b_, maxiter=K),
                )
                return s.rho.reshape(1)

            return jax.jit(chain), (full.blocks, full.block_cols, b)

        def chain(diag, off, cols, b_):
            a_ = SymBellMatrix(diag, off, cols, *sym_static)
            s = jax.lax.fori_loop(
                0, K, lambda i, s: fused_cg_step(a_, s, tol_arr, mirror=mirror),
                fused_cg_init(a_, b_, maxiter=K),
            )
            return s.rho.reshape(1)

        return jax.jit(chain), (sym.diag_blocks, sym.off_blocks, sym.off_cols, b)

    variants = ["scatter", "split", "banded", "full"]
    chains = {v: make_chain(v) for v in variants}

    # warm-up compiles + sanity cross-check.  f32 storage variants only
    # agree to association-order rounding (tests/test_symbell.
    # _assert_storage_parity), and after K=128 iterations rho may have
    # underflowed to exactly 0 for all of them — so this is a coarse
    # same-math guard (finite, same order of magnitude), not a parity
    # test; the real numerical parity lives in the interpret-mode tests.
    vals = {}
    for v in variants:
        f, xs = chains[v]
        vals[v] = float(f(*xs)[0])
        print(json.dumps({"compiled": v, "rho_K": vals[v]}), flush=True)
    ref = vals["scatter"]
    for v in variants:
        assert np.isfinite(vals[v]), (v, vals[v])
        assert abs(vals[v] - ref) <= 5e-2 * abs(ref) + 1e-12, (v, vals[v], ref)

    ovh = rpc_overhead_s()
    times = {v: [] for v in variants}
    for r in range(args.rounds):
        for v in variants:  # interleave variants within each round
            f, xs = chains[v]
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(f(*xs)[0])
                times[v].append((time.perf_counter() - t0 - ovh) / K)
        # median of THIS round's reps only, so drift between rounds shows
        print(json.dumps({
            "round": r,
            **{v: round(sorted(times[v][-args.reps:])
                        [args.reps // 2] * 1e6, 2)
               for v in variants},
        }), flush=True)

    full_bytes = full.blocks.size * 4 + 10 * n * 4  # headline useful bytes
    out = {"metric": "symbell_mirror_ab_us_per_iter", "n": n, "K": K,
           "rpc_overhead_ms": round(ovh * 1e3, 2)}
    for v in variants:
        ts = sorted(times[v])
        med = ts[len(ts) // 2]
        out[v] = {"us_med": round(med * 1e6, 2),
                  "us_min": round(ts[0] * 1e6, 2),
                  "us_max": round(ts[-1] * 1e6, 2),
                  "eff_gbps": round(full_bytes / med / 1e9, 1)}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
