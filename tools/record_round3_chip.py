#!/usr/bin/env python
"""One-command chip-measurement session for the round-3 symmetric layouts.

Runs, in one process (one chip grant), with a tunnel probe first:

1. the headline bench (symmetric blocked-ELL fused CG, the driver's
   default config) — sanity that the recorded artifact reproduces;
2. ``--config symdia`` — full vs symmetric DIA constant-closure A/B;
3. ``--config large`` — the 1.5M-row symmetric solve (skippable: its
   1.6 GB operator upload is what wedged the relay for hours in round 3;
   pass --large to opt in);
4. the symmetric rows of tools/run_five_configs.py (symdia on
   poisson3d/elasticity3d, symbell on poisson2d-110).

Each section is wall-bounded; output is docs-ready.  Usage:

    timeout 3000 python tools/record_round3_chip.py [--large]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--large", action="store_true",
                    help="include the 1.5M-row sym bench (1.6 GB upload — "
                         "keep the whole run well under its timeout; a "
                         "timeout mid-transfer wedges the relay for hours)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    print(f"probe: {float(jnp.ones((8,)).sum())} ({time.time()-t0:.1f}s)",
          flush=True)

    import bench

    for name, fn in [
        ("headline (cg, symmetric blocked-ELL)", bench.bench_cg),
        ("symdia A/B", bench.bench_symdia),
    ] + ([("large (1.5M sym)", bench.bench_large)] if args.large else []):
        print(f"\n### {name}", flush=True)
        t0 = time.time()
        out = fn()
        print(json.dumps(out), flush=True)
        print(f"### wall={time.time()-t0:.1f}s", flush=True)

    print("\n### symmetric five-config rows", flush=True)
    import tools.run_five_configs as rfc

    sys.argv = ["x", "--only", "sym_poisson3d_symdia",
                "sym_elasticity3d_symdia", "sym_poisson2d_symbell"]
    return rfc.main()


if __name__ == "__main__":
    sys.exit(main())
