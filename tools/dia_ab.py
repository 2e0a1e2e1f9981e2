#!/usr/bin/env python
"""A/B the DIA SpMV paths on the chip: XLA unrolled shifts vs the 1-D
flat-window Pallas kernel vs the 2-D lane-tiled Pallas kernel (VERDICT r1
item 5).  n=2M, 13 diagonals (the docs/performance.md configuration).
One JSON line."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    import jax.numpy as jnp

    from conjugategradient_tpu.ops.spmv import dia_spmv
    from conjugategradient_tpu.ops.pallas.dia_spmv import (
        dia_spmv_pallas,
        dia_spmv_pallas_2d,
    )
    from conjugategradient_tpu.types import DIAMatrix
    from conjugategradient_tpu.utils.benchmarking import (
        rpc_overhead_s,
        stream_roofline_gbps,
        time_loop_s,
    )

    n = 1 << 21
    offsets = tuple(range(-6, 7))  # 13 diagonals, bandwidth 6
    rng = np.random.default_rng(0)
    # scale the OPERATOR so the timed chain stays bounded with no epilogue:
    # a trailing "* 1e-2" fuses into the XLA variant but costs the Pallas
    # variants a separate full read+write pass (measured on the stencil —
    # tools/stencil_v3.py); folding the scale into the diagonals is fair
    diags = (0.05 * rng.standard_normal((len(offsets), n))).astype(np.float32)
    a = DIAMatrix(jnp.asarray(diags), offsets, (n, n), len(offsets) * n)
    x = jnp.ones((n,), jnp.float32)
    ovh = rpc_overhead_s()
    nbytes = (len(offsets) + 2) * n * 4  # diags + x read + y write

    variants = {
        "xla": lambda v: dia_spmv(a, v),
        "pallas_1d": lambda v: dia_spmv_pallas(a.diags, offsets, v),
        "pallas_2d": lambda v: dia_spmv_pallas_2d(a.diags, offsets, v),
    }
    out = {}
    for name, body in variants.items():
        t = time_loop_s(body, x, K=128, iters=3, overhead_s=ovh)
        out[name] = {"time_ms": round(t * 1e3, 4),
                     "gbps": round(nbytes / t / 1e9, 1)}
    out["stream_roofline_gbps"] = round(stream_roofline_gbps(nbytes=1 << 27, K=256), 1)
    print(json.dumps({"metric": "dia_spmv_2M_ab", "detail": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
