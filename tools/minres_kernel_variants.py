#!/usr/bin/env python
"""Incremental kernel variants: start from the CG banded K1 body and add
the MINRES features one at a time — scale prepass, shift epilogue, vr1
window dot, w/x pending update — to locate the 217 us regression
(tools/minres_kernel_ab.py).  Also K2 variants for the 11 -> 33 us gap.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _enable_persistent_compile_cache, block_tridiag_sym_bell

_enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_k1(R, ku, bm, bn, ncb, *, scale_pre, shift_ep, vr1_dot, wx_update,
            n_whole_in):
    """Banded sym K1 with MINRES features toggled."""

    def kernel(cols_ref, su_ref, dblk_ref, oblk_ref, *rest):
        ins = rest[:n_whole_in]
        rest = rest[n_whole_in:]
        outs = []
        k = 0
        v_ref = rest[k]; k += 1
        q_ref = rest[k]; k += 1
        if wx_update:
            w_ref = rest[k]; k += 1
            x_ref = rest[k]; k += 1
        vq_ref = rest[k]; k += 1
        if vr1_dot:
            vr1_ref = rest[k]; k += 1
        pv = rest[k]; k += 1
        carry = rest[k]
        r2_ref = ins[0]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            if wx_update:
                wnew = (
                    ins[2][:] - su_ref[0, 2] * ins[4][:]
                    - su_ref[0, 3] * ins[3][:]
                ) * su_ref[0, 4]
                w_ref[:] = wnew
                x_ref[:] = ins[5][:] + su_ref[0, 5] * wnew
            if scale_pre:
                pv[:] = r2_ref[:] * su_ref[0, 0]
            else:
                pv[:] = r2_ref[:] + su_ref[0, 0] * ins[1][:]
            v_ref[:] = pv[:]
            carry[0, :] = jnp.zeros_like(carry[0, :])
            vq_ref[0, 0] = 0.0
            if vr1_dot:
                vr1_ref[0, 0] = 0.0

        base = pl.multiple_of(g * R, R)
        carry_in = carry[0, :]
        accs, tps = [], []
        for rr in range(R):
            row = base + rr
            xr = pv[row, :]
            acc = jnp.sum(dblk_ref[rr].astype(jnp.float32) * xr[None, :],
                          axis=1)
            if shift_ep:
                acc = acc - su_ref[0, 1] * xr
            c = cols_ref[row]
            blk = oblk_ref[rr, 0].astype(jnp.float32)
            acc = acc + jnp.sum(blk * pv[c, :][None, :], axis=1)
            accs.append(acc)
            tps.append(jnp.sum(blk * xr[:, None], axis=0))
        carry[0, :] = tps[R - 1]
        mirrors = [carry_in] + tps[: R - 1]
        qwin = jnp.stack(accs, axis=0) + jnp.stack(mirrors, axis=0)
        q_ref[pl.ds(base, R), :] = qwin
        vrows = pv[pl.ds(base, R), :]
        vq_ref[0, 0] += jnp.sum(qwin * vrows.reshape(R, bm))
        if vr1_dot:
            vr1_ref[0, 0] += jnp.sum(vrows * ins[1][pl.ds(base, R), :])

    return kernel


def run_variant(a, v2d, su, *, scale_pre, shift_ep, vr1_dot, wx_update,
                K=256, reps=3, ovh=0.0):
    nrb, bm, bn = a.diag_blocks.shape
    ku = a.off_blocks.shape[1]
    ncb = v2d.shape[0]
    R = 8
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                          memory_space=pltpu.SMEM)
    n_whole_in = 6 if wx_update else 2
    in_specs = [
        pl.BlockSpec((1, 8), lambda g, cols: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((R, bm, bn), lambda g, cols: (g, 0, 0)),
        pl.BlockSpec((R, ku, bm, bn), lambda g, cols: (g, 0, 0, 0)),
    ] + [whole] * n_whole_in
    out_specs = [whole, whole]
    out_shape = [jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
                 jax.ShapeDtypeStruct((ncb, bn), jnp.float32)]
    if wx_update:
        out_specs += [whole, whole]
        out_shape += [jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
                      jax.ShapeDtypeStruct((ncb, bn), jnp.float32)]
    out_specs.append(scalar)
    out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
    if vr1_dot:
        out_specs.append(scalar)
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((ncb, bn), jnp.float32),
                        pltpu.VMEM((1, bn), jnp.float32)],
    )
    vec_bytes = ncb * bn * 4
    resid = (4 + n_whole_in + (2 if wx_update else 0)) * vec_bytes
    blk = 2 * R * (1 + ku) * bm * bn * 4
    vml = max(16 << 20, min(110 << 20, resid + blk + (12 << 20)))

    call = pl.pallas_call(
        make_k1(R, ku, bm, bn, ncb, scale_pre=scale_pre, shift_ep=shift_ep,
                vr1_dot=vr1_dot, wx_update=wx_update,
                n_whole_in=n_whole_in),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vml),
    )

    def chain(d, o, c, v):
        ops = [v] * n_whole_in

        def body(i, s):
            outs = call(c.reshape(-1), su, d, o,
                        *([s] + [v] * (n_whole_in - 1)))
            return outs[0]

        return jax.lax.fori_loop(0, K, body, v)

    f = jax.jit(chain)
    args = (a.diag_blocks, a.off_blocks, a.off_cols, v2d)
    float(f(*args).reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round((ts[len(ts) // 2] - ovh) / K * 1e6, 2)


def main():
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    n = 262144
    a = block_tridiag_sym_bell(n, 128, 128, jnp.float32)
    mp = a.padded_shape[1]
    rng = np.random.default_rng(0)
    v2d = jnp.asarray(rng.standard_normal((mp // 128, 128)), jnp.float32)
    su = jnp.asarray([[0.5, 0.1, 0.1, 0.2, 0.3, 0.4, 0, 0]], jnp.float32)
    ovh = rpc_overhead_s()
    out = {}
    for label, kw in (
        ("cg_like (dir prepass)", dict(scale_pre=False, shift_ep=False,
                                       vr1_dot=False, wx_update=False)),
        ("+scale_pre", dict(scale_pre=True, shift_ep=False,
                            vr1_dot=False, wx_update=False)),
        ("+shift", dict(scale_pre=True, shift_ep=True,
                        vr1_dot=False, wx_update=False)),
        ("+vr1", dict(scale_pre=True, shift_ep=True,
                      vr1_dot=True, wx_update=False)),
        ("+wx (full minres)", dict(scale_pre=True, shift_ep=True,
                                   vr1_dot=True, wx_update=True)),
    ):
        us = run_variant(a, v2d, su, ovh=ovh, **kw)
        out[label] = us
        print(f"{label:24s} {us:10.2f} us", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
