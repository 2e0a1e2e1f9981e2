"""Batched multi-RHS CG: solve ``A X = B`` for many right-hand sides at once.

The reference solves one RHS per ``solve()`` call (CG.hpp:255); on TPU,
batching RHS turns the SpMV's (bm, bn)x(bn,) tile products into
(bm, bn)x(bn, R) tile matmuls that feed the MXU properly, and amortizes the
operator stream over R solves — R-fold better arithmetic intensity for the
same HBM traffic (measured: bench.py --config batched).

Two implementations, same per-lane semantics:

* blocked-ELL, SELL, and DIA operators get a dedicated lockstep loop whose
  matvec is :func:`~conjugategradient_tpu.ops.spmv.bell_spmv_multi` /
  :func:`~conjugategradient_tpu.ops.spmv.sell_spmv_multi` /
  :func:`~conjugategradient_tpu.ops.spmv.dia_spmv_multi` — ONE pass over
  the operator (tile stream, flat gather fetching R lane values per stored
  index, or diagonal stream) per iteration for all R lanes; per-lane
  α/β/termination
  are masked so each lane's iterations/converged/history are exactly what a
  solo solve reports.  Any traceable per-vector preconditioner rides the
  same loop (vmapped over the R columns — for Jacobi/block-Jacobi the
  apply fuses into one (N, R) pass), so the amortization survives PCG;
* everything else falls back to ``jax.vmap`` over the plain solver, whose
  vmapped ``lax.while_loop`` masks finished lanes the same way.
"""

from __future__ import annotations

import functools

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import BlockedEllMatrix, DIAMatrix, SellMatrix, as_linear_operator
from .cg import CGInfo, cg_solve

def _dot_cols(U: jax.Array, V: jax.Array) -> jax.Array:
    """Per-lane dot over (N, R) columns.

    A plain axis-0 reduce: measured on v5e at N=1.5M, XLA's multi-stage
    lowering keeps the f32 error at ~8e-8 relative — the same as the 1-D
    dot the solo solver uses — so no widened/chunked accumulation is
    needed (verified against a float64 host reference).
    """
    return jnp.sum(U * V, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("op_static", "maxiter", "M", "recompute_r_every"),
)
def _cg_solve_batched_lockstep(
    op_arrays,
    op_static,
    B: jax.Array,
    X0: jax.Array,
    tol_arr: jax.Array,
    maxiter: int,
    M=None,
    inv_diag=None,
    recompute_r_every: int = 0,
):
    """Lockstep multi-RHS (P)CG over (N, R) column blocks with a
    multi-vector SpMV, the WHOLE solve one jitted dispatch (eager setup ops
    cost ~26 ms each over the remote relay — same lesson as cg_solve's
    single-dispatch round-2 fix).  Per-lane semantics identical to cg_step:
    recurrence residual, pre-update termination on ‖r_k‖², ρ==0 guard, NaN
    exit; finished lanes' carries are frozen (the same masking vmap applies
    to a while_loop).  ``tol_arr`` is a scalar or (R,) — broadcasts vs the
    lane residuals.  Preconditioning keeps the OPERATOR amortization (a
    vmap over whole solves would stream the operator once PER lane):
    Jacobi-style diagonals pass DYNAMICALLY via ``inv_diag`` (fresh
    preconditioner objects for same-shaped operators hit the jit cache),
    any other traceable per-vector apply passes as the static ``M``
    (like the solo core's) and is vmapped over the R columns."""
    from ..ops.spmv import bell_spmv_multi, dia_spmv_multi, sell_spmv_multi

    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    if isinstance(op, BlockedEllMatrix):
        matvec_multi = lambda X: bell_spmv_multi(op, X)
    elif isinstance(op, SellMatrix):
        matvec_multi = lambda X: sell_spmv_multi(op, X)
    else:
        matvec_multi = lambda X: dia_spmv_multi(op, X)
    Bt = B.T  # caller passes (R, N); the loop runs on (N, R) columns
    X0t = X0.T
    N, R = Bt.shape

    if inv_diag is not None:
        precond = lambda Rv: inv_diag[:, None] * Rv
    elif M is not None:
        precond = jax.vmap(M, in_axes=1, out_axes=1)
    else:
        precond = lambda Rv: Rv
    with_m = M is not None or inv_diag is not None

    r0 = Bt - matvec_multi(X0t)
    z0 = precond(r0)
    rnorm0 = _dot_cols(r0, r0)  # (R,)
    rho0 = _dot_cols(r0, z0) if with_m else rnorm0
    hist = jnp.full((maxiter + 1, R), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    carry = (
        jnp.zeros((R,), jnp.int32),  # per-lane k
        jnp.zeros((R,), bool),  # per-lane done
        X0t,
        r0,
        z0,  # p
        rho0,
        rnorm0,
        hist,
    )

    def body(c):
        k, done, X, Rv, P, rho, rnorm, hist = c
        active = (~done) & (k < maxiter)
        Q = matvec_multi(P)
        pap = _dot_cols(P, Q)
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        am = jnp.where(active, alpha, 0)  # frozen lanes: no-op updates
        X = X + am * P
        Rv = Rv - am * Q
        done_new = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        Z = precond(Rv)
        rnorm_next = _dot_cols(Rv, Rv)
        rho_next = _dot_cols(Rv, Z) if with_m else rnorm_next
        beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, rho))
        P = jnp.where(active, Z + beta * P, P)
        k = jnp.where(active, k + 1, k)
        rho = jnp.where(active, rho_next, rho)
        rnorm = jnp.where(active, rnorm_next, rnorm)
        hist_col = jnp.where(
            active, rnorm_next, jnp.take_along_axis(hist, k[None, :], 0)[0]
        )
        hist = hist.at[k, jnp.arange(R)].set(hist_col)
        done = jnp.where(active, done_new, done)
        c = (k, done, X, Rv, P, rho, rnorm, hist)
        if recompute_r_every > 0:
            # per-lane residual-replacement FULL restart (same semantics as
            # solver/cg.py's single-lane restart): only lanes that executed
            # this body restart — frozen lanes keep their converged state.
            # Active lanes advance k together, so the mask is all-or-none
            # over still-active lanes and the any() gate matches solo timing.
            restart = active & (k % recompute_r_every == 0)

            def replace(c):
                k, done, X, Rv, P, rho, rnorm, hist = c
                Rt = Bt - matvec_multi(X)
                rnorm_t = _dot_cols(Rt, Rt)
                Zt = precond(Rt)
                rho_t = _dot_cols(Rt, Zt) if with_m else rnorm_t
                Rv = jnp.where(restart, Rt, Rv)
                P = jnp.where(restart, Zt, P)
                rho = jnp.where(restart, rho_t, rho)
                rnorm = jnp.where(restart, rnorm_t, rnorm)
                hist_col = jnp.where(
                    restart, rnorm_t,
                    jnp.take_along_axis(hist, k[None, :], 0)[0],
                )
                hist = hist.at[k, jnp.arange(R)].set(hist_col)
                return (k, done, X, Rv, P, rho, rnorm, hist)

            c = jax.lax.cond(jnp.any(restart), replace, lambda c: c, c)
        return c

    def cond(c):
        k, done = c[0], c[1]
        return jnp.any((~done) & (k < maxiter))

    k, done, X, Rv, P, rho, rnorm, hist = jax.lax.while_loop(cond, body, carry)
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist.T,  # (R, maxiter+1), matching the vmap layout
    )
    return X.T, info


def cg_solve_batched(
    A: Any,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
    recompute_r_every: int = 0,
) -> Tuple[jax.Array, CGInfo]:
    """Solve ``A X[i] = B[i]`` for every row of ``B``.

    Args:
      A: shared operator (LinearOperator / dense array / callable).
      B: (nrhs, N) right-hand sides.
      X0: optional (nrhs, N) initial guesses.
      tol: ABSOLUTE tolerance on ‖r‖₂ — a scalar shared by all lanes, or an
        (nrhs,) array of per-lane tolerances.  Per-lane values matter near
        the f32 floor: a tolerance even a few percent tighter in relative
        terms can double a lane's iterations there (measured on the 1.5M
        power-law: lanes sharing lane 0's absolute tol at 1.01-1.07× its
        ‖b‖ took 129-139 iterations vs 63), so callers solving scaled
        systems should pass ``tol_rel * ||B_j||`` per lane.
      recompute_r_every: if > 0, per-lane residual-replacement full restart
        every that many iterations (solver/cg.py's semantics, lane-masked so
        frozen lanes stay frozen).
      Remaining arguments as :func:`~conjugategradient_tpu.cg_solve`.

    Returns (X (nrhs, N), CGInfo with leading nrhs axis on every field).
    """
    op = as_linear_operator(A, n=n, dtype=getattr(B, "dtype", None))
    if B.ndim != 2:
        raise ValueError(f"B must be (nrhs, N), got shape {B.shape}")
    tol = jnp.asarray(tol, dtype=B.dtype)
    if tol.ndim == 1 and tol.shape[0] != B.shape[0]:
        raise ValueError(
            f"per-lane tol has length {tol.shape[0]}, expected {B.shape[0]}"
        )
    if tol.ndim > 1:
        raise ValueError(f"tol must be scalar or (nrhs,), got shape {tol.shape}")
    if X0 is None:
        X0 = jnp.zeros_like(B)

    # any traceable per-vector M rides the lockstep loop, so the operator
    # amortization survives preconditioning; Jacobi-style Ms (carrying
    # .inv_diag) pass their diagonal DYNAMICALLY so fresh preconditioner
    # objects for same-shaped operators hit the jit cache (no retrace)
    inv_diag = getattr(M, "inv_diag", None)
    use_lockstep = isinstance(op, (BlockedEllMatrix, SellMatrix, DIAMatrix))
    if use_lockstep and isinstance(op, DIAMatrix) and op.offsets:
        # dia_spmv_multi is the XLA padded-slice formulation; at stencil-
        # scale offsets (≥1024) that formulation collapses on TPU and the
        # single-RHS auto policy flees to the Pallas windowed kernel (6.7×,
        # docs/performance.md) — keep those operators on the vmap fallback
        # so every lane rides the fast kernel
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            backend = "cpu"
        if backend == "tpu" and max(abs(o) for o in op.offsets) >= 1024:
            use_lockstep = False
    if use_lockstep:
        mi = int(op.shape[0] + 1 if maxiter is None else maxiter)
        op_arrays, op_static = jax.tree_util.tree_flatten(op)
        return _cg_solve_batched_lockstep(
            tuple(op_arrays), op_static, B, X0, tol, mi,
            None if inv_diag is not None else M, inv_diag,
            recompute_r_every=int(recompute_r_every),
        )

    def solve_one(b, x0, t):
        return cg_solve(op, b, x0, tol=t, maxiter=maxiter, M=M, fused="never",
                        recompute_r_every=int(recompute_r_every))

    tol_lanes = jnp.broadcast_to(tol, (B.shape[0],))
    return jax.vmap(solve_one)(B, X0, tol_lanes)
