"""Fused BiCGStab-iteration Pallas kernels (blocked-ELL fast path).

BiCGStab (solver/bicgstab.py) costs 2 SpMVs + 6 global reductions + ~8
vector updates per iteration — the portable loop dispatches ~25 XLA ops.
These kernels collapse it to THREE passes (the nonsymmetric sibling of
ops/pallas/fused_cg.py and fused_minres.py):

* :func:`bicgstab_dir_spmv_dot` (K1) — one pass over the operator tiles:
    p'  = r + β·(p − ω·v)            (the direction update)
    p̂  = M⁻¹ p'                      (Jacobi fold, or p̂ = p')
    v'  = A·p̂                        (SpMV #1)
    rv  = r̂₀ · v'                    (the α reduction)
* :func:`bicgstab_s_spmv_dot` (K2) — the second tile pass:
    s   = r − α·v';  ŝ = M⁻¹ s;  x_h = x + α·p̂
    t   = A·ŝ                        (SpMV #2)
    ss  = s·s,  ts = t·s,  tt = t·t  (the ω and half-exit reductions)
* :func:`bicgstab_update_dot` (K3) — one elementwise pass:
    x'  = x_h + ω·ŝ;   r' = s − ω·t
    rn  = r'·r',  ρ'  = r̂₀·r'        (NEXT iteration's ρ, prefetched here)

Breakdown semantics (differs subtly from the portable loop, documented in
solver/fused_bicgstab.py): non-finite α/ω are CLAMPED to 0 before their
kernels, which makes the poisoned updates exact no-ops — the returned
iterate is the last finite one for every division breakdown (ρ→0, r̂ᵀv→0,
tᵀt→0), without any masked whole-vector selects in the hot body.

All accumulation f32; scalars as (1, 1) SMEM refs (the packed-row form
measured 3× slower — docs/round5.md).  Full blocked-ELL storage only: the
domain is NONSYMMETRIC, so the Sym* layouts don't apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_cg import _largest_divisor_leq, _row_group_for_blocked_q


def _dir_spmv_kernel(R: int, kmax: int, bm: int, bn: int, precond: bool):
    rows_per_g = (R * bm) // bn

    def kernel(cols_ref, beta_ref, omega_ref, block_ref, r_ref, p_ref,
               v_ref, rhat_ref, *rest):
        if precond:
            d_ref = rest[0]
            rest = rest[1:]
        pnew_ref, phat_ref, vout_ref, rv_ref, pv = rest
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            pn = r_ref[:] + beta_ref[0, 0] * (
                p_ref[:] - omega_ref[0, 0] * v_ref[:])
            pnew_ref[:] = pn
            ph = d_ref[:] * pn if precond else pn
            pv[:] = ph
            phat_ref[:] = ph
            rv_ref[0, 0] = 0.0

        for rr in range(R):
            row = g * R + rr
            acc = None
            for k in range(kmax):
                c = cols_ref[row * kmax + k]
                xb = pv[c, :]
                blk = block_ref[rr, k].astype(jnp.float32)
                part = jnp.sum(blk * xb[None, :], axis=1)
                acc = part if acc is None else acc + part
            vout_ref[rr, :] = acc

        base = g * rows_per_g
        rhrows = rhat_ref[pl.ds(base, rows_per_g), :]
        rv_ref[0, 0] += jnp.sum(vout_ref[:] * rhrows.reshape(R, bm))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_group"))
def bicgstab_dir_spmv_dot(
    blocks: jax.Array,
    block_cols: jax.Array,
    r2d: jax.Array,
    p2d: jax.Array,
    v2d: jax.Array,
    rhat2d: jax.Array,
    beta: jax.Array,
    omega: jax.Array,
    inv_diag2d: jax.Array = None,
    interpret: bool = False,
    row_group: int = 8,
):
    """K1: ``(p', p̂, v', r̂·v')``.  ``beta``/``omega``: (1, 1) f32."""
    nrb, kmax, bm, bn = blocks.shape
    ncb = r2d.shape[0]
    if bm != bn:
        raise ValueError(f"fused kernel needs square tiles, got {bm}x{bn}")
    R = _row_group_for_blocked_q(nrb, row_group)
    precond = inv_diag2d is not None

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                          memory_space=pltpu.SMEM)
    in_specs = [
        scalar, scalar,
        pl.BlockSpec((R, kmax, bm, bn), lambda g, cols: (g, 0, 0, 0)),
        whole, whole, whole, whole,  # r p v rhat
    ]
    operands = [block_cols.reshape(-1), beta, omega, blocks,
                r2d, p2d, v2d, rhat2d]
    if precond:
        in_specs.append(whole)
        operands.append(inv_diag2d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=in_specs,
        out_specs=[
            whole,  # p'
            whole,  # p̂
            pl.BlockSpec((R, bm), lambda g, cols: (g, 0)),  # v'
            scalar,  # r̂·v'
        ],
        scratch_shapes=[pltpu.VMEM((ncb, bn), jnp.float32)],
    )
    vec_bytes = ncb * bn * 4
    resid = (8 if precond else 7) * vec_bytes
    blk_bytes = 2 * R * kmax * bm * bn * blocks.dtype.itemsize
    vmem_limit = max(16 << 20, min(110 << 20, resid + blk_bytes + (12 << 20)))
    return pl.pallas_call(
        _dir_spmv_kernel(R, kmax, bm, bn, precond),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        out_shape=(
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * kmax * bm * bn + 8 * ncb * bn,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + ((5 if precond else 4) + 2) * vec_bytes + nrb * bm * 4,
            transcendentals=0,
        ),
    )(*operands)


def _s_spmv_kernel(R: int, kmax: int, bm: int, bn: int, precond: bool):
    rows_per_g = (R * bm) // bn

    def kernel(cols_ref, alpha_ref, block_ref, r_ref, vnew_ref, x_ref,
               phat_ref, *rest):
        if precond:
            d_ref = rest[0]
            rest = rest[1:]
        s_ref, shat_ref, xh_ref, t_ref, ss_ref, ts_ref, tt_ref, sh = rest
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            a = alpha_ref[0, 0]
            s = r_ref[:] - a * vnew_ref[:]
            s_ref[:] = s
            z = d_ref[:] * s if precond else s
            sh[:] = z
            shat_ref[:] = z
            xh_ref[:] = x_ref[:] + a * phat_ref[:]
            ss_ref[0, 0] = jnp.sum(s * s)
            ts_ref[0, 0] = 0.0
            tt_ref[0, 0] = 0.0

        for rr in range(R):
            row = g * R + rr
            acc = None
            for k in range(kmax):
                c = cols_ref[row * kmax + k]
                xb = sh[c, :]
                blk = block_ref[rr, k].astype(jnp.float32)
                part = jnp.sum(blk * xb[None, :], axis=1)
                acc = part if acc is None else acc + part
            t_ref[rr, :] = acc

        base = g * rows_per_g
        srows = s_ref[pl.ds(base, rows_per_g), :]
        trows = t_ref[:]
        ts_ref[0, 0] += jnp.sum(trows * srows.reshape(R, bm))
        tt_ref[0, 0] += jnp.sum(trows * trows)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_group"))
def bicgstab_s_spmv_dot(
    blocks: jax.Array,
    block_cols: jax.Array,
    r2d: jax.Array,
    vnew2d: jax.Array,
    x2d: jax.Array,
    phat2d: jax.Array,
    alpha: jax.Array,
    inv_diag2d: jax.Array = None,
    interpret: bool = False,
    row_group: int = 8,
):
    """K2: ``(s, ŝ, x_h, t, s·s, t·s, t·t)``.  ``alpha``: (1, 1) f32."""
    nrb, kmax, bm, bn = blocks.shape
    ncb = r2d.shape[0]
    if bm != bn:
        raise ValueError(f"fused kernel needs square tiles, got {bm}x{bn}")
    R = _row_group_for_blocked_q(nrb, row_group)
    precond = inv_diag2d is not None

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                          memory_space=pltpu.SMEM)
    in_specs = [
        scalar,
        pl.BlockSpec((R, kmax, bm, bn), lambda g, cols: (g, 0, 0, 0)),
        whole, whole, whole, whole,  # r vnew x phat
    ]
    operands = [block_cols.reshape(-1), alpha, blocks,
                r2d, vnew2d, x2d, phat2d]
    if precond:
        in_specs.append(whole)
        operands.append(inv_diag2d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=in_specs,
        out_specs=[
            whole,  # s
            whole,  # ŝ
            whole,  # x_h
            pl.BlockSpec((R, bm), lambda g, cols: (g, 0)),  # t
            scalar, scalar, scalar,  # s·s, t·s, t·t
        ],
        scratch_shapes=[pltpu.VMEM((ncb, bn), jnp.float32)],
    )
    vec_bytes = ncb * bn * 4
    resid = (9 if precond else 8) * vec_bytes
    blk_bytes = 2 * R * kmax * bm * bn * blocks.dtype.itemsize
    vmem_limit = max(16 << 20, min(110 << 20, resid + blk_bytes + (12 << 20)))
    return pl.pallas_call(
        _s_spmv_kernel(R, kmax, bm, bn, precond),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        out_shape=(
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * kmax * bm * bn + 12 * ncb * bn,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + ((5 if precond else 4) + 3) * vec_bytes + nrb * bm * 4,
            transcendentals=0,
        ),
    )(*operands)


def _update_kernel(omega_ref, xh_ref, shat_ref, s_ref, t_ref, rhat_ref,
                   xout_ref, rout_ref, rn_ref, rho_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        rn_ref[0, 0] = 0.0
        rho_ref[0, 0] = 0.0

    w = omega_ref[0, 0]
    xout_ref[:] = xh_ref[:] + w * shat_ref[:]
    rnew = s_ref[:] - w * t_ref[:]
    rout_ref[:] = rnew
    rn_ref[0, 0] += jnp.sum(rnew * rnew)
    # NEXT iteration's rho = r̂₀·r', prefetched into this pass
    rho_ref[0, 0] += jnp.sum(rhat_ref[:] * rnew)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bicgstab_update_dot(
    xh2d: jax.Array,
    shat2d: jax.Array,
    s2d: jax.Array,
    t2d: jax.Array,
    rhat2d: jax.Array,
    omega: jax.Array,
    interpret: bool = False,
):
    """K3: ``(x', r', r'·r', r̂₀·r')``.  ``omega``: (1, 1) f32."""
    rows, lanes = xh2d.shape
    C = _largest_divisor_leq(rows, 1024)
    blk = pl.BlockSpec((C, lanes), lambda g: (g, 0))
    scalar_in = pl.BlockSpec((1, 1), lambda g: (0, 0),
                             memory_space=pltpu.SMEM)
    scalar_out = pl.BlockSpec((1, 1), lambda g: (0, 0),
                              memory_space=pltpu.SMEM)
    grid_spec = pl.GridSpec(
        grid=(rows // C,),
        in_specs=[scalar_in, blk, blk, blk, blk, blk],
        out_specs=[blk, blk, scalar_out, scalar_out],
    )
    nbytes = rows * lanes * 4
    return pl.pallas_call(
        _update_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * lanes,
            bytes_accessed=7 * nbytes,
            transcendentals=0,
        ),
    )(omega, xh2d, shat2d, s2d, t2d, rhat2d)
