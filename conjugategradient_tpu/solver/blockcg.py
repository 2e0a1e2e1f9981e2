"""Block CG: one Krylov space shared across right-hand sides.

The reference solves one RHS per ``solve()`` (CG.hpp:255); the lockstep loop
(solver/batched.py) amortizes the operator stream over R independent solves.
Block CG (O'Leary 1980) goes further: the R lanes share a single block-Krylov
space, so each lane converges in FEWER iterations than its solo solve — the
search space each iteration grows by R directions instead of 1, and every
lane minimizes its A-norm error over all of them.  On gather-bound layouts
(SELL at circuit/power-law scale, where the solve sits on the ~8 ns/index
random-access floor — docs/performance.md) this stacks the lockstep loop's
R-fold byte amortization with an iteration-count reduction the lockstep loop
cannot give.

Recurrences (preconditioned, M SPD; unpreconditioned is Z = R):

    Q      = A P                                (one multi-RHS SpMV)
    alpha  = (P^T Q)^+ rho          (R x R)     X  += P alpha
                                                R  -= Q alpha
    Z      = M^-1 R
    rho'   = R^T Z                  (R x R)
    beta   = rho^+ rho'             (R x R)     P   = Z + P beta

The R x R solves use a symmetric-eigendecomposition pseudo-inverse with a
relative cutoff (``rcond``): when a lane converges (or two RHS are linearly
dependent) the block Gram matrices become singular — the cutoff zeroes the
dead directions instead of dividing by them, the standard breakdown-free
treatment.  All (N,R)x(R,R) and (N,R)^T(N,R) products run at
``Precision.HIGHEST`` — TPU default-precision f32 matmuls round through bf16
(CLAUDE.md), which visibly stalls CG convergence.

Termination mirrors the per-lane semantics of the lockstep loop (itself
matching cg_step / SURVEY §2.3: pre-update test on ‖r_k‖, NaN exit), so
iteration counts are directly comparable: a lane's ``iterations`` is the
number of block iterations it was still unconverged for.  Unlike lockstep,
converged lanes keep riding the shared space (their updates are free — the
SpMV is one pass either way); only their counters freeze.
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
from .batched import _lockstep_ops
from .cg import CGInfo
from .restart import while_with_periodic_restart

_HI = jax.lax.Precision.HIGHEST


def default_gram_rcond(dtype) -> float:
    """Dtype-adaptive Gram-pseudoinverse cutoff — THE one copy of the
    measured ladder (1e-10 in f64; 1e-4 in f32/bf16, where tighter
    cutoffs stall or diverge on rounding noise — see block_cg_solve's
    rcond docstring).  sstep and the sharded front-ends import this."""
    dt = jnp.promote_types(dtype, jnp.float32)
    return 1e-10 if dt == jnp.dtype(jnp.float64) else 1e-4


def _spd_pinv_apply(W: jax.Array, Y: jax.Array, rcond: float) -> jax.Array:
    """W^+ Y for a (near-)SPD R x R Gram matrix via eigh with a relative
    eigenvalue cutoff — zero (not infinite) response along dead directions."""
    dt = jnp.promote_types(W.dtype, jnp.float32)  # eigh needs >= f32
    Wp = 0.5 * (W + W.T).astype(dt)  # Gram matrices symmetric up to rounding
    w, V = jnp.linalg.eigh(Wp)
    wmax = jnp.max(jnp.abs(w))
    keep = w > rcond * jnp.maximum(wmax, jnp.finfo(dt).tiny)
    inv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    out = jnp.einsum("ij,j,kj,kl->il", V, inv, V, Y.astype(dt), precision=_HI)
    return out.astype(Y.dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BlockCGState:
    """Carry of the block loop — (N, R) column blocks, (R, R) Gram rho."""

    k: jax.Array  # (R,) per-lane iteration counters (freeze at convergence)
    done: jax.Array  # (R,) bool
    X: jax.Array  # (N, R)
    r: jax.Array  # (N, R)
    p: jax.Array  # (N, R)
    rho: jax.Array  # (R, R) — R^T Z Gram block
    rnorm: jax.Array  # (R,) — per-lane ‖r‖²
    hist: jax.Array  # (maxiter+1, R)

    def tree_flatten(self):
        return (self.k, self.done, self.X, self.r, self.p,
                self.rho, self.rnorm, self.hist), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _block_ops(op, M):
    """(matvec_multi, precond, with_m) — the lockstep fast paths for
    BlockedEll/SELL/DIA, a column-vmapped matvec for everything else."""
    if isinstance(
        op,
        (BlockedEllMatrix, SymBellMatrix, SellMatrix, DIAMatrix,
         SymDIAMatrix),
    ):
        return _lockstep_ops(op, M, None)
    mv = jax.vmap(op.matvec, in_axes=1, out_axes=1)
    if M is not None:
        precond = jax.vmap(M, in_axes=1, out_axes=1)
    else:
        precond = lambda Rv: Rv
    return mv, precond, M is not None


def _block_init(matvec_multi, precond, with_m, Bt, X0t, maxiter):
    r0 = Bt - matvec_multi(X0t)
    z0 = precond(r0)
    rnorm0 = jnp.sum(r0 * r0, axis=0)
    rho0 = jnp.einsum("ni,nj->ij", r0, z0 if with_m else r0, precision=_HI)
    R = Bt.shape[1]
    hist = jnp.full((maxiter + 1, R), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    return BlockCGState(
        k=jnp.zeros((R,), jnp.int32),
        done=jnp.zeros((R,), bool),
        X=X0t,
        r=r0,
        p=z0,
        rho=rho0,
        rnorm=rnorm0,
        hist=hist,
    )


def _block_body(matvec_multi, precond, with_m, tol_arr, maxiter, rcond):
    def body(s: BlockCGState) -> BlockCGState:
        R = s.X.shape[1]
        active = (~s.done) & (s.k < maxiter)
        Q = matvec_multi(s.p)
        W = jnp.einsum("ni,nj->ij", s.p, Q, precision=_HI)
        alpha = _spd_pinv_apply(W, s.rho, rcond)  # (R, R)
        X = s.X + jnp.einsum("ni,ij->nj", s.p, alpha, precision=_HI)
        Rv = s.r - jnp.einsum("ni,ij->nj", Q, alpha, precision=_HI)
        # pre-update termination per lane (cg_step/SURVEY §2.3 semantics)
        done_new = jnp.isnan(s.rnorm) | (jnp.sqrt(s.rnorm) <= tol_arr)
        Z = precond(Rv)
        rnorm_next = jnp.sum(Rv * Rv, axis=0)
        rho_next = jnp.einsum(
            "ni,nj->ij", Rv, Z if with_m else Rv, precision=_HI
        )
        beta = _spd_pinv_apply(s.rho, rho_next, rcond)  # (R, R)
        P = Z + jnp.einsum("ni,ij->nj", s.p, beta, precision=_HI)
        k = jnp.where(active, s.k + 1, s.k)
        hist_col = jnp.where(
            active, rnorm_next, jnp.take_along_axis(s.hist, k[None, :], 0)[0]
        )
        hist = s.hist.at[k, jnp.arange(R)].set(hist_col)
        return BlockCGState(
            k=k,
            done=jnp.where(active, done_new, s.done),
            X=X,
            r=Rv,
            p=P,
            rho=rho_next,
            rnorm=rnorm_next,
            hist=hist,
        )

    return body


def _block_replace(matvec_multi, precond, with_m, maxiter, Bt,
                   recompute_r_every):
    """Residual-replacement FULL restart (solver/cg.py semantics: replace
    r AND p).  The block recurrences inject R×R-solve rounding into r each
    iteration, so f32 drifts faster here than in scalar CG — periodic
    replacement pins the recurrence residual back to b − A·x.  All-lane
    restart: the shared space restarts as a block (lanes are never frozen
    mid-space).  Applied at while-loop boundaries (solver/restart.py: a
    lax.cond in the hot body can cost ~40% of the iteration on TPU even
    when never taken), masked by the scalar ``fire`` so off-cadence
    boundaries are bit-identical no-ops."""

    def replace(s: BlockCGState) -> BlockCGState:
        R = s.X.shape[1]
        # no `k < maxiter` term — capping on a boundary still replaces
        # the reported residual with the true one (solver/cg.py)
        active = ~s.done
        fire = jnp.any(active) & (
            jnp.max(jnp.where(active, s.k, 0)) % recompute_r_every == 0
        )
        Rt = Bt - matvec_multi(s.X)
        Zt = precond(Rt)
        rnorm_t = jnp.sum(Rt * Rt, axis=0)
        rho_t = jnp.einsum(
            "ni,nj->ij", Rt, Zt if with_m else Rt, precision=_HI
        )
        hist_col = jnp.where(
            fire & active, rnorm_t,
            jnp.take_along_axis(s.hist, s.k[None, :], 0)[0],
        )
        return BlockCGState(
            k=s.k, done=s.done, X=s.X,
            r=jnp.where(fire, Rt, s.r),
            p=jnp.where(fire, Zt, s.p),
            rho=jnp.where(fire, rho_t, s.rho),
            rnorm=jnp.where(fire, rnorm_t, s.rnorm),
            hist=s.hist.at[s.k, jnp.arange(R)].set(hist_col),
        )

    return replace


@functools.partial(
    jax.jit,
    static_argnames=("op_static", "maxiter", "M", "rcond",
                     "recompute_r_every"),
)
def _block_cg_core(op_arrays, op_static, B, X0, tol_arr, maxiter, M, rcond,
                   recompute_r_every=0):
    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    matvec_multi, precond, with_m = _block_ops(op, M)
    state0 = _block_init(matvec_multi, precond, with_m, B.T, X0.T, maxiter)
    body = _block_body(matvec_multi, precond, with_m, tol_arr, maxiter, rcond)
    replace = _block_replace(matvec_multi, precond, with_m, maxiter, B.T,
                             recompute_r_every)

    def cond(s):
        return jnp.any((~s.done) & (s.k < maxiter))

    s = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda s: jnp.max(s.k), state0
    )
    info = CGInfo(
        iterations=s.k,
        converged=s.done & ~jnp.isnan(s.rnorm),
        rho=jnp.diagonal(s.rho),
        rnorm_sq=s.rnorm,
        rho_history=s.hist.T,  # (R, maxiter+1), lockstep/vmap layout
    )
    return s.X.T, info


def block_cg_solve(
    A: Any,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
    rcond: Optional[float] = None,
    recompute_r_every: int = 0,
) -> Tuple[jax.Array, CGInfo]:
    """Solve ``A X[i] = B[i]`` for every row of ``B`` in ONE shared
    block-Krylov space.

    Args:
      A: shared SPD operator (LinearOperator / dense array / callable).
      B: (nrhs, N) right-hand sides.  The lanes should be reasonably
        independent — dependent lanes are harmless (the ``rcond`` cutoff
        retires their directions) but contribute nothing.
      X0: optional (nrhs, N) initial guesses.
      tol: ABSOLUTE tolerance on per-lane ‖r‖₂ — scalar or (nrhs,).
      M: optional SPD preconditioner apply, per vector (same contract as
        :func:`~conjugategradient_tpu.cg_solve`).
      rcond: relative eigenvalue cutoff for the R×R block solves.  Default
        (None) adapts to dtype: 1e-10 in f64, 1e-4 in f32/bf16 — measured on
        the poisson2d_34 harness problem, f32 cutoffs at or below the Gram
        rounding noise (1e-6..1e-10) stall or diverge while 1e-4 converges
        in the fewest iterations.
      recompute_r_every: if > 0, residual-replacement full restart (replace
        r AND p, solver/cg.py semantics) every that many block iterations.
        STRONGLY recommended in f32 (e.g. 25-50): the R×R solves feed
        rounding into the residual recurrence every iteration, so the
        recurrence/true-residual gap grows faster than in scalar CG —
        measured on poisson2d_34 f32, restarts recover the true-residual
        accuracy the tolerance asked for.

    Returns (X (nrhs, N), CGInfo with leading nrhs axis); a lane's
    ``iterations`` counts the block iterations it was unconverged for —
    directly comparable to the lockstep loop's per-lane counts, typically
    strictly smaller (each block iteration spans R search directions).

    The whole solve is one jitted dispatch (one kernel chain; the multi-RHS
    SpMV is the same one pass per iteration the lockstep loop uses).
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
        raise ValueError(f"tol must be scalar or (nrhs,), got {tol.shape}")
    if X0 is None:
        X0 = jnp.zeros_like(B)
    if rcond is None:
        rcond = default_gram_rcond(B.dtype)
    mi = int(op.shape[0] + 1 if maxiter is None else maxiter)
    op_arrays, op_static = jax.tree_util.tree_flatten(op)
    return _block_cg_core(
        tuple(op_arrays), op_static, B, X0, tol, mi, M, float(rcond),
        recompute_r_every=int(recompute_r_every),
    )
