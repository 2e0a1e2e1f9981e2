"""Fused-kernel CG driver for the matrix-free stencil operator (config 4).

Same two-kernel iteration shape as solver/fused.py, with the blocked-ELL
SpMV pass replaced by ops/pallas/fused_stencil.fused_stencil_dir_dot:

    S1  p = r + β·p;  q = stencil(p);  pap = p·q
    K2  x += α·p;  r -= α·q;  rnorm = r·r   (fused_update_dot_3d)

Semantics identical to solver/cg.py (pre-update termination, ρ==0 guard,
N+1 cap, NaN exit).  State vectors live as (nx, ny, nz) volumes end to
end — one layout for both kernels (reshaping 67 MB between differently-
shaped custom calls made XLA copy it).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import StencilOperator
from .cg import CGInfo
from .fused import FusedCGState
from .restart import while_with_periodic_restart


def fused_stencil_supported(op, dtype=None, interpret: bool = False) -> bool:
    if not isinstance(op, StencilOperator):
        return False
    nx, ny, nz = op.grid_shape
    ok = (
        nz % 128 == 0
        and ny % 8 == 0
        and nx % 2 == 0
        and (dtype is None or jnp.dtype(dtype) == jnp.dtype(jnp.float32))
        and jnp.dtype(op.dtype) == jnp.dtype(jnp.float32)
    )
    if not ok:
        return False
    if interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _init(op: StencilOperator, b: jax.Array, x0, maxiter: int) -> FusedCGState:
    # state vectors live as (nx, ny, nz) volumes end to end: a single layout
    # shared by both kernels (reshaping 67 MB between differently-shaped
    # custom calls made XLA copy it — it doubled the iteration time)
    grid = op.grid_shape
    b3 = b.astype(jnp.float32).reshape(grid)
    if x0 is None:
        x3 = jnp.zeros_like(b3)
        r3 = b3
    else:
        r = b.astype(jnp.float32) - op.matvec(x0).astype(jnp.float32)
        x3 = x0.astype(jnp.float32).reshape(grid)
        r3 = r.reshape(grid)
    rho0 = jnp.sum(r3 * r3).reshape(1, 1)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)
    hist = hist.at[0].set(rho0[0, 0])
    return FusedCGState(
        k=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        x=x3,
        r=r3,
        p=jnp.zeros_like(r3),
        beta=jnp.zeros((1, 1), jnp.float32),
        rho=rho0,
        hist=hist,
    )


def _step(op: StencilOperator, state: FusedCGState, tol_arr, interpret: bool):
    from ..ops.pallas.fused_stencil import (
        fused_stencil_dir_dot,
        fused_update_dot_3d,
    )

    p3, q3, pap = fused_stencil_dir_dot(
        state.r, state.p, state.beta, op.center, op.off, interpret=interpret,
    )
    rho = state.rho[0, 0]
    exact = rho == 0
    alpha = jnp.where(exact, 0.0, rho / jnp.where(exact, 1.0, pap[0, 0]))
    x, r, rnorm = fused_update_dot_3d(
        state.x, p3, state.r, q3, alpha.reshape(1, 1), interpret=interpret,
    )
    done = jnp.isnan(rho) | (jnp.sqrt(rho) <= tol_arr)
    beta = jnp.where(exact, 0.0, rnorm[0, 0] / jnp.where(exact, 1.0, rho))
    k = state.k + 1
    hist = state.hist.at[k].set(rnorm[0, 0])
    return FusedCGState(
        k=k, done=done, x=x, r=r, p=p3,
        beta=beta.reshape(1, 1), rho=rnorm, hist=hist,
    )


def fused_stencil_cg_solve(
    op: StencilOperator,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    interpret: bool = False,
    recompute_r_every: int = 0,
) -> Tuple[jax.Array, CGInfo]:
    n = op.shape[0]
    if maxiter is None:
        maxiter = n + 1
    maxiter = int(maxiter)
    tol_arr = jnp.asarray(tol, jnp.float32)
    return _solve_core(op, b, x0, tol_arr, maxiter, interpret,
                       int(recompute_r_every))


@functools.partial(
    jax.jit, static_argnames=("maxiter", "interpret", "recompute_r_every")
)
def _solve_core(op, b, x0, tol_arr, maxiter, interpret, recompute_r_every=0):
    n = op.shape[0]
    state0 = _init(op, b, x0, maxiter)

    def cond(s):
        return (s.k < maxiter) & (~s.done)

    def body(s):
        return _step(op, s, tol_arr, interpret)

    def replace(s):
        # full restart at the chunk boundary (solver/fused.py replace):
        # r ← b − A x, β ← 0 — the next S1's p = r + β·p emits p = r_true
        mask = (~s.done) & (s.k % recompute_r_every == 0)
        b3 = b.astype(jnp.float32).reshape(s.r.shape)
        r_true = b3 - op.matvec(s.x.reshape(-1)).astype(
            jnp.float32).reshape(s.r.shape)
        rnorm = jnp.sum(r_true * r_true).reshape(1, 1)
        hist = s.hist.at[s.k].set(
            jnp.where(mask, rnorm[0, 0], s.hist[s.k]))
        sel = lambda a_, b_: jnp.where(mask, a_, b_)
        return FusedCGState(
            k=s.k, done=s.done, x=s.x,
            r=sel(r_true, s.r), p=s.p,
            beta=sel(jnp.zeros((1, 1), jnp.float32), s.beta),
            rho=sel(rnorm, s.rho), hist=hist,
        )

    s = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda s: s.k, state0
    )
    rnorm = s.rho[0, 0]
    info = CGInfo(
        iterations=s.k,
        converged=s.done & ~jnp.isnan(rnorm),
        rho=rnorm.astype(b.dtype),
        rnorm_sq=rnorm.astype(b.dtype),
        rho_history=s.hist,
    )
    return s.x.reshape(-1)[:n].astype(b.dtype), info
