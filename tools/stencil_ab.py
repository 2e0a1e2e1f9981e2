#!/usr/bin/env python
"""A/B the 7-point stencil matvec: XLA-fused shifts vs the Pallas v2 kernel
(in-place halo DMAs + roll shifts).  Prints one JSON line with both rates.

Settle rule (CLAUDE.md): chip perf varies ~20% run-to-run — K=128 in-jit
chains, 3 reps, same process for both variants.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (persistent compile cache)


def main() -> int:
    import jax.numpy as jnp

    from conjugategradient_tpu.types import StencilOperator
    from conjugategradient_tpu.ops.stencil import stencil7_matvec
    from conjugategradient_tpu.utils.benchmarking import (
        rpc_overhead_s,
        stream_roofline_gbps,
        time_loop_s,
    )

    nx = 256
    op = StencilOperator.poisson((nx, nx, nx), dtype=jnp.float32)
    n = nx ** 3
    x = jnp.ones((n,), jnp.float32)
    ovh = rpc_overhead_s()
    ideal = 2 * n * 4

    out = {}
    for name, mode in (("xla", "never"), ("pallas_v2", "always")):
        t = time_loop_s(
            lambda v, m=mode: stencil7_matvec(op, v, use_pallas=m) * 1e-2,
            x, K=128, iters=3, overhead_s=ovh,
        )
        out[name] = {
            "time_ms": round(t * 1e3, 4),
            "gbps_ideal": round(ideal / t / 1e9, 1),
        }
    out["stream_roofline_gbps"] = round(stream_roofline_gbps(nbytes=1 << 27, K=256), 1)
    print(json.dumps({"metric": "stencil7_256_ab", "detail": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
