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

import dataclasses
import functools

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import (
    BlockedEllMatrix,
    DIAMatrix,
    SellMatrix,
    SymBellMatrix,
    SymDIAMatrix,
    as_linear_operator,
)
from .cg import CGInfo, cg_solve
from .restart import while_with_periodic_restart

def _dot_cols(U: jax.Array, V: jax.Array) -> jax.Array:
    """Per-lane dot over (N, R) columns.

    A plain axis-0 reduce: measured on v5e at N=1.5M, XLA's multi-stage
    lowering keeps the f32 error at ~8e-8 relative — the same as the 1-D
    dot the solo solver uses — so no widened/chunked accumulation is
    needed (verified against a float64 host reference).
    """
    return jnp.sum(U * V, axis=0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BatchedCGState:
    """Explicit lockstep multi-RHS carry — checkpointable pytree (SURVEY §5
    extended to the batched loop, round-3 VERDICT item 5).  Vectors live in
    (N, R) column layout; per-lane scalars are (R,); ``hist`` is
    (maxiter+1, R)."""

    k: jax.Array  # (R,) int32 per-lane iteration counts
    done: jax.Array  # (R,) bool
    X: jax.Array  # (N, R)
    r: jax.Array  # (N, R)
    p: jax.Array  # (N, R)
    rho: jax.Array  # (R,)
    rnorm: jax.Array  # (R,)
    hist: jax.Array  # (maxiter+1, R)

    def tree_flatten(self):
        return (
            self.k, self.done, self.X, self.r, self.p,
            self.rho, self.rnorm, self.hist,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _dia_multi_collapses(op) -> bool:
    """True when dia_spmv_multi's XLA padded-slice formulation would
    collapse: TPU backend and any |offset| >= 1024 — the single-RHS auto
    policy flees to the Pallas windowed kernel there (6.7x,
    docs/performance.md).  One shared gate for every multi-RHS consumer
    (cg_solve_batched, batched_cg_init, block_cg_solve).

    SymDIAMatrix's escape is the round-4 blocked symmetric windowed
    kernel — available only once the operator carries the halo'd layout
    (`.with_blocked()`); without it the gate buys a loud warning at the
    call sites and the multi path keeps the shift formulation."""
    if not (isinstance(op, (DIAMatrix, SymDIAMatrix)) and op.offsets):
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        backend = "cpu"
    return backend == "tpu" and max(abs(o) for o in op.offsets) >= 1024


def _columns_mapped(matvec):
    """Apply a single-RHS matvec to every column of X (n, R), unrolled.

    NOT jax.vmap: the Pallas windowed DIA kernels take x in ANY memory
    space with a manual double-buffered DMA, and Mosaic's lowering only
    accepts ANY-space operands whose block is the whole array with a
    trivial index_map — vmap's batching rule violates that (caught live:
    "Block spec for args[1] ... memory space any").  R is a trace-time
    constant, so an unrolled stack of R pallas_calls is the reliable
    escape; each lane still streams the band at the windowed kernel's
    rate."""
    def mv(X):
        return jnp.stack(
            [matvec(X[:, j]) for j in range(X.shape[1])], axis=1
        )

    return mv


def _lockstep_ops(op, M, inv_diag):
    """(matvec_multi, precond, with_m) for the lockstep loop.

    Jacobi-style diagonals pass DYNAMICALLY via ``inv_diag`` (fresh
    preconditioner objects for same-shaped operators hit the jit cache);
    any other traceable per-vector apply passes as the static ``M`` and is
    vmapped over the R columns."""
    from ..ops.spmv import (
        bell_spmv_multi,
        dia_spmv_multi,
        sell_spmv_multi,
        sym_bell_spmv_multi,
        sym_dia_spmv_multi,
    )

    if isinstance(op, BlockedEllMatrix):
        matvec_multi = lambda X: bell_spmv_multi(op, X)
    elif isinstance(op, SymBellMatrix):
        matvec_multi = lambda X: sym_bell_spmv_multi(op, X)
    elif isinstance(op, SellMatrix):
        matvec_multi = lambda X: sell_spmv_multi(op, X)
    elif isinstance(op, SymDIAMatrix):
        if _dia_multi_collapses(op):
            if getattr(op, "diags_blocked", None) is not None:
                # column-mapped single-RHS matvec: each lane rides the
                # blocked symmetric Pallas kernel (round 4) instead of
                # the collapsed multi shift formulation.  The band
                # streams once per lane (the lockstep amortization is
                # lost), but the windowed kernel's per-lane rate is ~6.7×
                # the collapsed form's, so it wins at every R.
                matvec_multi = _columns_mapped(op.matvec)
            else:
                from ..utils.logging import get_logger

                get_logger().warning(
                    "symmetric DIA at offsets >= 1024 on TPU: the shift "
                    "formulation may collapse — call .with_blocked() so "
                    "multi-RHS lanes ride the blocked symmetric Pallas "
                    "kernel, or prefer the full DIAMatrix layout here"
                )
                matvec_multi = lambda X: sym_dia_spmv_multi(op, X)
        else:
            matvec_multi = lambda X: sym_dia_spmv_multi(op, X)
    elif _dia_multi_collapses(op):
        # column-mapped single-RHS matvec: each lane rides the Pallas
        # windowed DIA kernel instead of the collapsed multi formulation
        # (unrolled, not vmapped — see _columns_mapped)
        matvec_multi = _columns_mapped(op.matvec)
    else:
        matvec_multi = lambda X: dia_spmv_multi(op, X)
    if inv_diag is not None:
        precond = lambda Rv: inv_diag[:, None] * Rv
    elif M is not None:
        precond = jax.vmap(M, in_axes=1, out_axes=1)
    else:
        precond = lambda Rv: Rv
    with_m = M is not None or inv_diag is not None
    return matvec_multi, precond, with_m


def _lockstep_init(matvec_multi, precond, with_m, Bt, X0t, maxiter):
    r0 = Bt - matvec_multi(X0t)
    z0 = precond(r0)
    rnorm0 = _dot_cols(r0, r0)  # (R,)
    rho0 = _dot_cols(r0, z0) if with_m else rnorm0
    R = Bt.shape[1]
    hist = jnp.full((maxiter + 1, R), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    return BatchedCGState(
        k=jnp.zeros((R,), jnp.int32),
        done=jnp.zeros((R,), bool),
        X=X0t,
        r=r0,
        p=z0,
        rho=rho0,
        rnorm=rnorm0,
        hist=hist,
    )


def _lockstep_body(matvec_multi, precond, with_m, Bt, tol_arr, maxiter):
    """One lockstep iteration (per-lane semantics identical to cg_step:
    recurrence residual, pre-update termination on ‖r_k‖², ρ==0 guard, NaN
    exit; finished lanes' carries are frozen).  No restart logic here — the
    periodic residual replacement lives in _lockstep_replace, applied at
    while-loop boundaries by solver/restart.py (a lax.cond in this body cost
    ~40% of the iteration on TPU even when never taken)."""
    R = Bt.shape[1]

    def body(s: BatchedCGState) -> BatchedCGState:
        k, done, X, Rv, P = s.k, s.done, s.X, s.r, s.p
        rho, rnorm, hist = s.rho, s.rnorm, s.hist
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
        return BatchedCGState(k=k, done=done, X=X, r=Rv, p=P,
                              rho=rho, rnorm=rnorm, hist=hist)

    return body


def _lockstep_replace(matvec_multi, precond, with_m, Bt, maxiter,
                      recompute_r_every):
    """Per-lane residual-replacement FULL restart (same semantics as
    solver/cg.py's single-lane restart): only lanes that executed the last
    body restart — frozen lanes keep their converged state.  Active lanes
    advance k together, so the mask is all-or-none over still-active lanes.
    Called UNCONDITIONALLY at while-loop boundaries (solver/restart.py);
    fully masked, so a chunk boundary off the restart cadence is a
    bit-identical no-op."""
    R = Bt.shape[1]

    def replace(s: BatchedCGState) -> BatchedCGState:
        # no `k < maxiter` term — capping on a boundary still replaces
        # the reported residual with the true one (solver/cg.py)
        active = ~s.done
        restart = active & (s.k % recompute_r_every == 0)
        Rt = Bt - matvec_multi(s.X)
        rnorm_t = _dot_cols(Rt, Rt)
        Zt = precond(Rt)
        rho_t = _dot_cols(Rt, Zt) if with_m else rnorm_t
        hist_col = jnp.where(
            restart, rnorm_t,
            jnp.take_along_axis(s.hist, s.k[None, :], 0)[0],
        )
        return BatchedCGState(
            k=s.k,
            done=s.done,
            X=s.X,
            r=jnp.where(restart, Rt, s.r),
            p=jnp.where(restart, Zt, s.p),
            rho=jnp.where(restart, rho_t, s.rho),
            rnorm=jnp.where(restart, rnorm_t, s.rnorm),
            hist=s.hist.at[s.k, jnp.arange(R)].set(hist_col),
        )

    return replace


def _lockstep_info(s: BatchedCGState) -> CGInfo:
    return CGInfo(
        iterations=s.k,
        converged=s.done & ~jnp.isnan(s.rnorm),
        rho=s.rho,
        rnorm_sq=s.rnorm,
        rho_history=s.hist.T,  # (R, maxiter+1), matching the vmap layout
    )


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
    single-dispatch round-2 fix).  ``tol_arr`` is a scalar or (R,) —
    broadcasts vs the lane residuals.  Init/body live in _lockstep_init /
    _lockstep_body, shared with the checkpointable chunked driver
    (batched_cg_init / run_batched_cg) so resumed solves are bit-identical."""
    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    matvec_multi, precond, with_m = _lockstep_ops(op, M, inv_diag)
    Bt = B.T  # caller passes (R, N); the loop runs on (N, R) columns
    state0 = _lockstep_init(matvec_multi, precond, with_m, Bt, X0.T, maxiter)
    body = _lockstep_body(matvec_multi, precond, with_m, Bt, tol_arr, maxiter)
    replace = _lockstep_replace(matvec_multi, precond, with_m, Bt, maxiter,
                                recompute_r_every)

    def cond(s):
        return jnp.any((~s.done) & (s.k < maxiter))

    s = while_with_periodic_restart(
        cond, body, replace, recompute_r_every,
        lambda s: jnp.max(s.k), state0,
    )
    return s.X.T, _lockstep_info(s)


def batched_cg_init(
    A: Any,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    maxiter: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
) -> BatchedCGState:
    """Build the lockstep multi-RHS carry (checkpoint/resume entry point).

    ``A`` must be a lockstep-capable operator
    (BlockedEll/SymBell/SELL/DIA/SymDIA); ``B``
    is (nrhs, N).  Drive with :func:`run_batched_cg`; serialize with
    ``solver.checkpoint.save_state``.
    """
    op = as_linear_operator(A, n=n, dtype=getattr(B, "dtype", None))
    if not isinstance(
        op,
        (BlockedEllMatrix, SymBellMatrix, SellMatrix, DIAMatrix,
         SymDIAMatrix),
    ):
        raise TypeError(
            "batched_cg_init needs a lockstep-capable operator "
            "(BlockedEll/SymBell/SELL/DIA/SymDIA), got "
            f"{type(op).__name__}"
        )
    if B.ndim != 2:
        raise ValueError(f"B must be (nrhs, N), got shape {B.shape}")
    mi = int(op.shape[0] + 1 if maxiter is None else maxiter)
    X0 = jnp.zeros_like(B) if X0 is None else X0
    inv_diag = getattr(M, "inv_diag", None)
    op_arrays, op_static = jax.tree_util.tree_flatten(op)
    return _batched_init_core(
        tuple(op_arrays), op_static, B, X0, mi,
        None if inv_diag is not None else M, inv_diag,
    )


@functools.partial(jax.jit, static_argnames=("op_static", "maxiter", "M"))
def _batched_init_core(op_arrays, op_static, B, X0, maxiter, M, inv_diag):
    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    matvec_multi, precond, with_m = _lockstep_ops(op, M, inv_diag)
    return _lockstep_init(matvec_multi, precond, with_m, B.T, X0.T, maxiter)


def run_batched_cg(
    A: Any,
    state: BatchedCGState,
    tol,
    steps: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    B: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
    n: Optional[int] = None,
) -> BatchedCGState:
    """Advance the lockstep solve by up to ``steps`` iterations (or to
    all-lanes convergence / the history capacity) in one jitted dispatch.

    ``M`` must match the preconditioner the state was initialized with.
    ``B`` (the (nrhs, N) right-hand sides) is only needed when
    ``recompute_r_every > 0`` — restarts recompute the true residual.
    Chunks compose bit-identically with the uninterrupted solve: the body
    is literally the same function.
    """
    op = as_linear_operator(A, n=n, dtype=state.X.dtype)
    maxiter = int(state.hist.shape[0]) - 1
    limit = (
        maxiter
        if steps is None
        else min(maxiter, int(jnp.max(state.k)) + int(steps))
    )
    recompute_r_every = int(recompute_r_every)
    if recompute_r_every > 0 and B is None:
        raise ValueError("recompute_r_every > 0 needs B (the RHS block)")
    inv_diag = getattr(M, "inv_diag", None)
    tol_arr = jnp.asarray(tol, dtype=state.X.dtype)
    op_arrays, op_static = jax.tree_util.tree_flatten(op)
    if B is None:  # body closes over Bt only for restarts
        B = jnp.zeros_like(state.X.T)
    return _batched_run_core(
        tuple(op_arrays), op_static, state, B, tol_arr, maxiter,
        jnp.asarray(limit, jnp.int32),
        None if inv_diag is not None else M, inv_diag, recompute_r_every,
    )


@functools.partial(
    jax.jit,
    static_argnames=("op_static", "maxiter", "M", "recompute_r_every"),
)
def _batched_run_core(op_arrays, op_static, state, B, tol_arr, maxiter,
                      limit, M, inv_diag, recompute_r_every):
    # ``limit`` is a DYNAMIC operand: a static limit would recompile the
    # whole loop every chunk of a chunked drive (limit = k + steps moves)
    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    matvec_multi, precond, with_m = _lockstep_ops(op, M, inv_diag)
    body = _lockstep_body(matvec_multi, precond, with_m, B.T, tol_arr,
                          maxiter)
    replace = _lockstep_replace(matvec_multi, precond, with_m, B.T, maxiter,
                                recompute_r_every)

    def cond(s):
        return jnp.any((~s.done) & (s.k < limit))

    # the chunk limit rides the loop predicate; restart boundaries are
    # structural (solver/restart.py), and the masked replace makes a chunk
    # stop that is off the restart cadence a bit-identical no-op
    return while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda s: jnp.max(s.k), state
    )


def batched_state_result(state: BatchedCGState):
    """(X (nrhs, N), CGInfo) from a carry — what the one-shot solve returns."""
    return state.X.T, _lockstep_info(state)


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
    use_lockstep = isinstance(
        op, (BlockedEllMatrix, SymBellMatrix, SellMatrix, DIAMatrix,
             SymDIAMatrix)
    )
    if use_lockstep and _dia_multi_collapses(op):
        # With a Pallas escape — the windowed DIA kernel (any DIAMatrix)
        # or the blocked symmetric kernel (SymDIAMatrix.with_blocked) —
        # the lockstep loop STAYS and rides _columns_mapped Pallas lanes.
        # Only a SymDIAMatrix without the blocked layout defects to the
        # whole-batch vmap fallback: its lockstep matvec would be the
        # same collapsed shift form, and vmapping the whole solve keeps
        # the XLA path (no Pallas kernel to trip Mosaic's ANY-space
        # batching rule — see _columns_mapped).
        if isinstance(op, SymDIAMatrix) and op.diags_blocked is None:
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
