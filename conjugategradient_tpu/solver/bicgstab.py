"""BiCGStab — stabilized bi-conjugate gradients for NONSYMMETRIC systems.

Extension beyond the reference: the reference solves SPD systems only (its
CG iteration silently mis-solves a nonsymmetric A — the Krylov recurrences
assume ``pᵀAq`` symmetry, CG.hpp:374-418).  Together with MINRES
(solver/minres.py, symmetric indefinite) this completes the solver-family
matrix a reference user eventually needs: SPD → CG, symmetric indefinite →
MINRES, nonsymmetric → BiCGStab (van der Vorst 1992) — convection-diffusion
transport operators, non-self-adjoint discretizations, unsymmetric circuit
matrices.

TPU shape: identical to the CG/MINRES drivers — ONE jitted
``lax.while_loop`` (zero host round-trips, every recurrence scalar
device-resident, matching the reference's device-``Scalar`` contract,
LinearAlgebraTypes.hpp:210-250), static shapes, NaN-safe breakdown exits in
the predicate.  Cost per iteration: 2 SpMVs + 2 preconditioner applies +
6 global reductions (vs CG's 1 SpMV + 2 reductions) — the price of
nonsymmetry without storing a Krylov basis (GMRES's trade).  Works with
every operator layout (``as_linear_operator`` ingest, like ``cg_solve``);
nonsymmetric matrices ride CSR/blocked-ELL/DIA/SELL exactly as symmetric
ones do (only the Sym* layouts assume symmetry).

Breakdowns (ρ → 0: the shadow residual de-correlates; ω → 0: stagnation)
surface as ``converged=False`` with finite ``x`` — the last stable iterate
is returned, never a NaN-poisoned one (the update is masked the moment a
non-finite scalar appears, unlike the reference's NaN exit which keeps the
poisoned x, CG.hpp:401).
"""

from __future__ import annotations

import dataclasses
import functools

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from ..ops.blas import dot


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BicgstabInfo:
    """Solve metadata, mirroring ``CGInfo``/``MinresInfo``."""

    iterations: jax.Array  # int32 — loop bodies executed (full BiCGStab steps)
    converged: jax.Array  # bool — tolerance met (not the cap / not breakdown)
    breakdown: jax.Array  # bool — ρ/ω/NaN breakdown ended the solve
    rnorm: jax.Array  # final recurrence residual norm ‖r_k‖₂ (or ‖s_k‖₂ at a half-step exit)
    rnorm_history: jax.Array  # (maxiter+1,) ‖r‖₂ per iteration; NaN-padded
    # true ‖b − A x‖₂ recomputed ONCE at exit (one extra SpMV): BiCGStab's
    # recurrence residual drifts from the true one in finite precision
    # (same honesty contract as MinresInfo.rnorm_true)
    rnorm_true: jax.Array

    def tree_flatten(self):
        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def residual_norms(self):
        """Norms (NOT squared — like MinresInfo, unlike CGInfo.rho_history)."""
        return self.rnorm_history


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class _BicgstabState:
    """BiCGStab carry.  All scalars are 0-d device arrays."""

    k: jax.Array
    done: jax.Array
    broke: jax.Array  # breakdown flag
    x: jax.Array
    r: jax.Array
    rhat: jax.Array  # fixed shadow residual r̂₀
    p: jax.Array
    v: jax.Array
    rho: jax.Array
    alpha: jax.Array
    omega: jax.Array
    rnorm: jax.Array
    hist: jax.Array

    def tree_flatten(self):
        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def bicgstab_init(op, b, x0, tol_arr, maxiter, M=None) -> _BicgstabState:
    """Build the initial BiCGStab carry (checkpointable pytree, mirroring
    ``cg_init``/``minres_init``)."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    sdt = dot(b[:1], b[:1]).dtype  # widened scalar dtype (>= f32)

    r0 = (b - op.matvec(x0)).astype(b.dtype)
    rnorm0 = jnp.sqrt(dot(r0, r0))
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=sdt)
    hist = hist.at[0].set(rnorm0)
    one = jnp.ones((), sdt)
    return _BicgstabState(
        k=jnp.asarray(0, jnp.int32),
        done=jnp.isnan(rnorm0) | (rnorm0 <= tol_arr),
        broke=jnp.isnan(rnorm0),
        x=x0,
        r=r0,
        rhat=r0,  # van der Vorst's standard choice r̂₀ = r₀
        p=jnp.zeros_like(b),
        v=jnp.zeros_like(b),
        rho=one,
        alpha=one,
        omega=one,
        rnorm=rnorm0.astype(sdt),
        hist=hist,
    )


def bicgstab_step(op, s: _BicgstabState, tol_arr, M=None) -> _BicgstabState:
    """One full BiCGStab iteration (both half-steps; mirrors ``cg_step``).

    The classic mid-iteration early exit (‖s‖ ≤ tol after the first
    half-step) is folded in with a select: the second half-step's update is
    masked off and the iterate returned is ``x + α·p̂`` — one loop body,
    no data-dependent control flow (the while_loop predicate stays the only
    branch, per the house rule on lax.cond in hot loops).
    """
    apply_m = (lambda v: v) if M is None else M
    sdt = s.rnorm.dtype

    rho = dot(s.rhat, s.r)
    beta = (rho / s.rho) * (s.alpha / s.omega)
    p = (s.r + beta * (s.p - s.omega * s.v)).astype(s.r.dtype)
    phat = apply_m(p).astype(s.r.dtype)
    v = op.matvec(phat).astype(s.r.dtype)
    rhat_v = dot(s.rhat, v)
    alpha = rho / rhat_v
    sv = (s.r - alpha * v).astype(s.r.dtype)  # the half-step residual "s"
    snorm = jnp.sqrt(dot(sv, sv))
    x_half = (s.x + alpha * phat).astype(s.x.dtype)
    half_done = snorm <= tol_arr

    shat = apply_m(sv).astype(s.r.dtype)
    t = op.matvec(shat).astype(s.r.dtype)
    t_s = dot(t, sv)
    t_t = dot(t, t)
    omega = t_s / t_t
    x_full = (x_half + omega * shat).astype(s.x.dtype)
    r_full = (sv - omega * t).astype(s.r.dtype)
    rnorm_full = jnp.sqrt(dot(r_full, r_full))

    # breakdown taxonomy — every division above yields inf/NaN exactly when
    # its textbook breakdown condition holds (ρ→0, r̂ᵀv→0, tᵀt→0), so one
    # finiteness test catches them all
    finite = (
        jnp.isfinite(beta) & jnp.isfinite(alpha) & jnp.isfinite(omega)
        & jnp.isfinite(rnorm_full)
    )
    broke = ~finite & ~half_done
    rnorm_new = jnp.where(half_done, snorm, rnorm_full)
    converged_now = half_done | (finite & (rnorm_full <= tol_arr))
    # ρ == 0 with r ≠ 0 is the hard Lanczos breakdown (β/α degenerate to 0,
    # no further progress possible); ω == 0 cannot advance the next
    # iteration (β divides by it) — both flag as breakdown unless this
    # step already converged
    broke = broke | (
        finite & ((omega == 0) | (rho == 0)) & ~converged_now)

    # masked update: on breakdown keep the previous (last finite) iterate;
    # on a half-step exit keep x_half/s
    x = jnp.where(broke, s.x, jnp.where(half_done, x_half, x_full))
    r = jnp.where(broke, s.r, jnp.where(half_done, sv, r_full))
    p = jnp.where(broke | half_done, s.p, p)
    v = jnp.where(broke | half_done, s.v, v)
    rnorm = jnp.where(broke, s.rnorm, rnorm_new).astype(sdt)

    k = s.k + 1
    hist = s.hist.at[k].set(rnorm)
    return _BicgstabState(
        k=k,
        done=converged_now | broke,
        broke=broke,
        x=x, r=r, rhat=s.rhat, p=p, v=v,
        rho=jnp.where(broke, s.rho, rho),
        alpha=jnp.where(broke, s.alpha, alpha),
        omega=jnp.where(broke, s.omega, omega),
        rnorm=rnorm,
        hist=hist,
    )


def _bicgstab_impl(op, b, x0, tol_arr, maxiter, M):
    state0 = bicgstab_init(op, b, x0, tol_arr, maxiter, M)

    def cond(s: _BicgstabState):
        return (s.k < maxiter) & (~s.done)

    def body(s: _BicgstabState):
        return bicgstab_step(op, s, tol_arr, M)

    s = jax.lax.while_loop(cond, body, state0)
    r_true = b - op.matvec(s.x)
    info = BicgstabInfo(
        iterations=s.k,
        converged=s.done & ~s.broke,
        breakdown=s.broke,
        rnorm=s.rnorm,
        rnorm_history=s.hist,
        rnorm_true=jnp.sqrt(dot(r_true, r_true)),
    )
    return s.x, info


_bicgstab_jit = functools.partial(
    jax.jit, static_argnames=("maxiter", "M")
)(_bicgstab_impl)


def bicgstab_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
    fused: str = "auto",
) -> Tuple[jax.Array, BicgstabInfo]:
    """Solve the (possibly NONSYMMETRIC) system ``A x = b`` with BiCGStab.

    Same functional surface as ``cg_solve``/``minres_solve``: one call in,
    ``(x, info)`` out, the whole solve one compiled program.

    Args:
      A: LinearOperator / dense array / scipy / BCOO / torch / callable
        (with ``n=``).  No symmetry or definiteness assumption.
      b: right-hand side.
      x0: initial guess; defaults to zeros.
      tol: ABSOLUTE tolerance on the recurrence ‖r_k‖₂, matching the house
        absolute-‖r‖ convention (CG.hpp:255,401-402).  Tested after each
        half-step (van der Vorst's early exit) and each full step.  0 runs
        to the cap.
      maxiter: cap on FULL BiCGStab iterations (each costs 2 SpMVs);
        defaults to N.  Unlike CG/MINRES there is no N-step exact-arithmetic
        termination guarantee — raise it for hard problems (scipy's
        default is 10·N for the same reason).
      M: preconditioner apply ``r -> M⁻¹ r`` (the same objects ``cg_solve``
        takes: Jacobi/block-Jacobi/FSAI/AMG/…).  Applied in the standard
        preconditioned-BiCGStab form (two applies per iteration); SPD-ness
        is NOT required of M here.
      n: dimension hint for callable operators.

    Returns:
      ``(x, BicgstabInfo)``.  ``info.breakdown`` distinguishes a Lanczos
      breakdown (shadow-residual de-correlation / stagnation — restart from
      the current ``x`` to continue) from the iteration cap; ``rnorm_true``
      is the recomputed ‖b − Ax‖₂ honesty check.

    ``fused``: "auto" (default) runs the PORTABLE loop — the measured
    call (v5e, docs/performance.md round-5 table): BiCGStab is
    2-SpMV-dominated, so at HBM-bound operator sizes the fused
    three-kernel iteration (solver/fused_bicgstab.py) only ties the
    portable loop (1.01x at n=256K, both at 0.92 of roofline), and at
    VMEM-fitting sizes XLA keeps the operator resident ACROSS loop
    iterations — something per-call Pallas staging cannot — and wins
    4.8x (66 vs 317 us/iter at n=64K).  "always" opts into the fused
    path anyway (full blocked-ELL, unpreconditioned or Jacobi);
    "never" == "auto" today.
    """
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    N = op.shape[0]
    maxiter = N if maxiter is None else int(maxiter)

    inv_diag = getattr(M, "inv_diag", None)
    if fused == "always" and (M is None or inv_diag is not None):
        from .fused_bicgstab import (
            fused_bicgstab_solve,
            fused_bicgstab_supported,
        )

        if fused_bicgstab_supported(op, dtype=getattr(b, "dtype", None)):
            return fused_bicgstab_solve(
                op, b, x0, tol=tol, maxiter=maxiter, inv_diag=inv_diag)
        if fused == "always":
            raise ValueError(
                "fused='always' needs a fused-capable full blocked-ELL "
                "operator on a TPU backend (solver/fused_bicgstab.py)"
            )
    if fused == "always":
        raise ValueError(
            "fused='always' supports only unpreconditioned or Jacobi "
            "(jacobi_preconditioner) BiCGStab solves"
        )

    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    return _bicgstab_jit(op, b, x0, tol_arr, maxiter, M)
