#!/usr/bin/env python
"""Kernel-level A/B: fused MINRES K1/K2 vs fused CG K1/K2 on the headline
symmetric block-tridiagonal operator — pinpoints where the fused MINRES
iteration's time goes (round-5 chip diagnostic).

Times each kernel with K-chains inside one jitted fori_loop (house
timing rules).  Run on the chip; ~200 MB upload.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _enable_persistent_compile_cache, block_tridiag_sym_bell

_enable_persistent_compile_cache()


def main() -> int:
    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.ops.pallas.fused_cg import (
        fused_update_dot,
        sym_fused_dir_spmv_dot,
    )
    from conjugategradient_tpu.ops.pallas.fused_minres import (
        minres_update_dot,
        sym_minres_dir_spmv_dot,
    )
    from conjugategradient_tpu.types import SymBellMatrix
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    n = 262144
    K = 256
    a = block_tridiag_sym_bell(n, 128, 128, jnp.float32)
    shape_s, nnz_s, fk_s, bd_s = a.shape, a.nnz, a.full_kmax, a.banded
    mp = a.padded_shape[1]
    rng = np.random.default_rng(0)
    v2d = jnp.asarray(rng.standard_normal((mp // 128, 128)), jnp.float32)
    su = jnp.asarray([[0.5, 0.0, 0.1, 0.2, 0.3, 0.4, 0, 0]], jnp.float32)
    sc = jnp.asarray([[0.3, 0.7, 0, 0, 0, 0, 0, 0]], jnp.float32)
    beta = jnp.full((1, 1), 0.3, jnp.float32)
    alpha = jnp.full((1, 1), 0.2, jnp.float32)
    ovh = rpc_overhead_s()

    def make_a(d, o, c):
        return SymBellMatrix(d, o, c, shape_s, nnz_s, fk_s, bd_s)

    def timed(label, chain_fn, *args, reps=3):
        f = jax.jit(chain_fn)
        float(f(*args).reshape(-1)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args).reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        us = (ts[len(ts) // 2] - ovh) / K * 1e6
        return label, round(us, 2)

    out = {}

    def cg_k1(d, o, c, v):
        a_ = make_a(d, o, c)

        def body(i, s):
            p_new, q, pap = sym_fused_dir_spmv_dot(
                a_.diag_blocks, a_.off_blocks, a_.off_cols,
                s, s, beta, mirror="banded")
            return p_new * (1.0 / (1.0 + pap[0, 0] * 0))  # keep deps

        return jax.lax.fori_loop(0, K, body, v)

    def mr_k1(d, o, c, v):
        a_ = make_a(d, o, c)

        def body(i, s):
            vv, q, w, xo, vq, vr1 = sym_minres_dir_spmv_dot(
                a_.diag_blocks, a_.off_blocks, a_.off_cols,
                s, s, s, s, s, s, su, mirror="banded")
            return vv

        return jax.lax.fori_loop(0, K, body, v)

    def mr_k1_scatter(d, o, c, v):
        a_ = make_a(d, o, c)

        def body(i, s):
            vv, q, w, xo, vq, vr1 = sym_minres_dir_spmv_dot(
                a_.diag_blocks, a_.off_blocks, a_.off_cols,
                s, s, s, s, s, s, su, mirror="scatter")
            return vv

        return jax.lax.fori_loop(0, K, body, v)

    def cg_k2(v):
        def body(i, s):
            x, r, rnorm = fused_update_dot(s, s, s, s, alpha)
            return r

        return jax.lax.fori_loop(0, K, body, v)

    def mr_k2(v):
        def body(i, s):
            r2n, bsq = minres_update_dot(s, s, s, sc)
            return r2n

        return jax.lax.fori_loop(0, K, body, v)

    args_op = (a.diag_blocks, a.off_blocks, a.off_cols, v2d)
    for label, fn, args in (
        ("cg_k1_banded", cg_k1, args_op),
        ("minres_k1_banded", mr_k1, args_op),
        ("minres_k1_scatter", mr_k1_scatter, args_op),
        ("cg_k2", cg_k2, (v2d,)),
        ("minres_k2", mr_k2, (v2d,)),
    ):
        k, us = timed(label, fn, *args)
        out[k] = us
        print(f"{k:20s} {us:10.2f} us", flush=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
