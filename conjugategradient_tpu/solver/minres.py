"""MINRES — minimal-residual solver for symmetric (possibly INDEFINITE)
systems.

Extension beyond the reference: the reference solves SPD systems only
(CG.hpp:53-601 assumes positive definiteness — a zero/negative curvature
``pᵀAp`` NaN-poisons its iteration and triggers the NaN exit, CG.hpp:401).
MINRES (Paige & Saunders 1975) handles the symmetric indefinite case the
same users hit in practice (saddle-point KKT systems, shifted operators
``A − σI`` near an eigenvalue, singular-consistent Neumann problems): it
minimizes ‖b − A x_k‖₂ over the Krylov space, so the residual-norm history
is monotonically non-increasing and breakdown-free for any symmetric A.

TPU shape: identical to the CG driver (solver/cg.py) — the whole solve is
ONE jitted ``lax.while_loop`` (zero host round-trips; every scalar of the
Lanczos/Givens recurrence stays device-resident, matching the reference's
device-``Scalar`` contract, LinearAlgebraTypes.hpp:210-250), one SpMV and
two global reductions per iteration (the same collective count as CG), and
static shapes throughout.  Works with every operator layout
(``as_linear_operator`` ingest, like ``cg_solve``).

Preconditioning uses a symmetric-positive-definite ``M ≈ A⁻¹`` apply (the
same objects ``cg_solve`` takes: ``jacobi_preconditioner`` with positive
diagonal, AMG/multigrid on SPD A, …).  With ``M`` the algorithm implicitly
runs on ``M^{1/2} A M^{1/2}`` and the tracked residual estimate is
``‖r_k‖_M = sqrt(r_kᵀ M r_k)`` — the termination tolerance is tested
against that quantity (for ``M=None`` it is exactly ‖r_k‖₂ in exact
arithmetic).
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
class MinresInfo:
    """Solve metadata, mirroring ``CGInfo`` (solver/cg.py)."""

    iterations: jax.Array  # int32 — loop bodies executed
    converged: jax.Array  # bool — tolerance met (not the cap / not NaN)
    rnorm: jax.Array  # final residual-norm estimate φ̄ (‖r‖_M; ‖r‖₂ if M=None)
    rnorm_history: jax.Array  # (maxiter+1,) φ̄ per iteration; NaN-padded
    # true ‖b − (A−σI)x‖₂ recomputed ONCE at exit (one extra SpMV per
    # solve).  On (near-)singular systems with b ∉ range(A) the recurrence
    # estimate φ̄ keeps shrinking while x diverges along the nullspace —
    # the classic MINRES least-squares failure mode; rnorm_true ≫ rnorm
    # is the detector (measured live: φ̄ 8e-4 vs true 2e4 on a Poisson
    # shift that landed exactly on an eigenvalue).
    rnorm_true: jax.Array

    def tree_flatten(self):
        return (
            self.iterations,
            self.converged,
            self.rnorm,
            self.rnorm_history,
            self.rnorm_true,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def residual_norms(self):
        """Norm estimates (NOT squared — unlike CGInfo.rho_history, the
        natural MINRES observable φ̄ is already a norm)."""
        return self.rnorm_history


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class _MinresState:
    """Lanczos + Givens carry (Paige–Saunders recurrence).  All scalars are
    0-d device arrays — nothing leaves the device inside the loop."""

    k: jax.Array
    done: jax.Array
    nan: jax.Array  # breakdown flag (M not SPD / non-symmetric A overflow)
    x: jax.Array
    r1: jax.Array  # Lanczos v_{k-1} scaled by its β (un-normalized)
    r2: jax.Array  # Lanczos v_k scaled (un-normalized residual-like vector)
    y: jax.Array  # M @ r2
    oldb: jax.Array  # β_{k-1}
    beta: jax.Array  # β_k
    dbar: jax.Array
    epsln: jax.Array
    phibar: jax.Array  # residual-norm estimate ‖r_k‖_M
    cs: jax.Array
    sn: jax.Array
    w: jax.Array
    w2: jax.Array
    hist: jax.Array

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def minres_init(op, b, x0, tol_arr, shift_arr, maxiter, M=None) -> _MinresState:
    """Build the initial Lanczos/Givens carry (checkpointable pytree,
    mirroring ``cg_init``)."""
    apply_m = (lambda v: v) if M is None else M
    x0 = jnp.zeros_like(b) if x0 is None else x0
    # scalar recurrences run in the widened dtype dot() promotes to (>= f32)
    sdt = dot(b[:1], b[:1]).dtype

    r1 = (b - op.matvec(x0) + shift_arr * x0).astype(b.dtype)
    y0 = apply_m(r1)
    beta1_sq = dot(r1, y0)
    # beta1_sq < 0 <=> M is not SPD on this vector: sqrt -> NaN -> clean
    # breakdown exit on the first predicate evaluation (like cg_step's
    # NaN path, CG.hpp:401)
    beta1 = jnp.sqrt(beta1_sq)

    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=sdt)
    hist = hist.at[0].set(beta1)
    zero = jnp.zeros((), sdt)
    return _MinresState(
        k=jnp.asarray(0, jnp.int32),
        done=jnp.isnan(beta1) | (beta1 <= tol_arr),
        nan=jnp.isnan(beta1),
        x=x0,
        r1=r1,
        r2=r1,
        y=y0.astype(b.dtype),
        oldb=zero,
        beta=beta1.astype(sdt),
        dbar=zero,
        epsln=zero,
        phibar=beta1.astype(sdt),
        cs=-jnp.ones((), sdt),
        sn=zero,
        w=jnp.zeros_like(b),
        w2=jnp.zeros_like(b),
        hist=hist,
    )


def minres_step(op, s: _MinresState, tol_arr, shift_arr, M=None) -> _MinresState:
    """One MINRES iteration (mirrors ``cg_step``).  Caller must not step a
    ``done`` state: β may be 0/NaN there and the Lanczos normalization
    divides by it."""
    apply_m = (lambda v: v) if M is None else M
    sdt = s.phibar.dtype
    # --- Lanczos step: v_{k+1} from (r1, r2, y) -------------------------
    # beta > 0 on entry (a zero/NaN beta set done, so the loop fenced it)
    v = (s.y / s.beta).astype(s.y.dtype)
    y = (op.matvec(v) - shift_arr * v).astype(v.dtype)
    # the k==0 first step has no v_{k-1} term (oldb == 0)
    c1 = jnp.where(s.oldb == 0, 0.0, s.beta / jnp.where(s.oldb == 0, 1.0, s.oldb))
    y = y - (c1 * s.r1).astype(v.dtype)
    alfa = dot(v, y)
    y = (y - (alfa / s.beta) * s.r2).astype(v.dtype)
    r1, r2 = s.r2, y
    y_next = apply_m(r2).astype(v.dtype)
    oldb = s.beta
    beta_sq = dot(r2, y_next)
    beta = jnp.sqrt(beta_sq)  # NaN iff M not SPD

    # --- Givens QR of the tridiagonal -----------------------------------
    oldeps = s.epsln
    delta = s.cs * s.dbar + s.sn * alfa
    gbar = s.sn * s.dbar - s.cs * alfa
    epsln = s.sn * beta
    dbar = -s.cs * beta
    gamma = jnp.sqrt(gbar * gbar + beta * beta)
    tiny = jnp.asarray(jnp.finfo(sdt).tiny, sdt)
    gamma = jnp.maximum(gamma, tiny)
    cs = gbar / gamma
    sn = beta / gamma
    phi = cs * s.phibar
    phibar = sn * s.phibar

    # --- solution update -------------------------------------------------
    w1, w2 = s.w2, s.w
    w = ((v - oldeps * w1 - delta * w2) / gamma).astype(s.w.dtype)
    x = (s.x + phi * w).astype(s.x.dtype)

    k = s.k + 1
    hist = s.hist.at[k].set(phibar)
    is_nan = jnp.isnan(phibar) | jnp.isnan(beta)
    # beta == 0: Krylov space exhausted — x is the exact minimizer
    done = is_nan | (phibar <= tol_arr) | (beta == 0)
    return _MinresState(
        k=k, done=done, nan=is_nan, x=x,
        r1=r1, r2=r2, y=y_next,
        oldb=oldb, beta=beta, dbar=dbar, epsln=epsln,
        phibar=phibar, cs=cs, sn=sn, w=w, w2=w2, hist=hist,
    )


def _minres_impl(op, b, x0, tol_arr, shift_arr, maxiter, M):
    state0 = minres_init(op, b, x0, tol_arr, shift_arr, maxiter, M)

    def cond(s: _MinresState):
        return (s.k < maxiter) & (~s.done)

    def body(s: _MinresState):
        return minres_step(op, s, tol_arr, shift_arr, M)

    s = jax.lax.while_loop(cond, body, state0)
    r_true = b - op.matvec(s.x) + shift_arr * s.x
    info = MinresInfo(
        iterations=s.k,
        converged=s.done & ~s.nan,
        rnorm=s.phibar,
        rnorm_history=s.hist,
        rnorm_true=jnp.sqrt(dot(r_true, r_true)),
    )
    return s.x, info


_minres_jit = functools.partial(
    jax.jit, static_argnames=("maxiter", "M")
)(_minres_impl)


def minres_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    shift: float = 0.0,
    n: Optional[int] = None,
    fused: str = "auto",
) -> Tuple[jax.Array, MinresInfo]:
    """Solve the symmetric (indefinite-OK) system ``(A − shift·I) x = b``.

    Same functional surface as ``cg_solve`` (solver/cg.py): one call in,
    ``(x, info)`` out, whole solve in one compiled program.

    Args:
      A: LinearOperator / dense array / callable (with ``n=``) — must be
        symmetric; definiteness is NOT required (that is the point).
      b: right-hand side.
      x0: initial guess; defaults to zeros.
      tol: ABSOLUTE tolerance on the residual-norm estimate φ̄ (‖r_k‖₂
        when ``M is None``, else ``sqrt(r_kᵀ M r_k)``), matching the
        house absolute-‖r‖ convention (CG.hpp:255,401-402).  0 runs to
        the cap.
      maxiter: iteration cap; defaults to N (the Krylov space exhausts in
        at most N steps, signalled in-loop by β = 0).
      M: SPD preconditioner apply ``r -> M⁻¹ r``.  An indefinite M breaks
        the Lanczos inner product — detected at run time via NaN and
        reported as ``converged=False``.
      shift: solve ``(A − shift·I) x = b`` (Paige–Saunders shift; useful
        near-singular for inverse iteration).
      n: dimension hint for callable operators.
      fused: "auto" (default) dispatches f32 solves on TPU to the
        two-fused-Pallas-kernel iteration (solver/fused_minres.py) for
        blocked-ELL and SYMMETRIC blocked-ELL operators, unpreconditioned
        or Jacobi (``jacobi_preconditioner``); "never" forces the portable
        loop (the float64/parity path); "always" requires a fused-capable
        operator.

    Returns:
      ``(x, MinresInfo)``; ``info.rnorm_history`` is the per-iteration
      residual-norm ESTIMATE (monotone non-increasing in exact
      arithmetic — a property test pins it).
    """
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    N = op.shape[0]
    maxiter = N if maxiter is None else int(maxiter)

    # TPU fast path: same dispatch contract as cg_solve's fused= (the
    # iteration shape is identical — 1 SpMV + 2 reductions, CG.hpp:374-407)
    inv_diag = getattr(M, "inv_diag", None)
    if fused in ("auto", "always") and (M is None or inv_diag is not None):
        from .fused_minres import fused_minres_solve, fused_minres_supported

        if fused_minres_supported(op, dtype=getattr(b, "dtype", None)):
            return fused_minres_solve(
                op, b, x0, tol=tol, maxiter=maxiter, shift=shift,
                inv_diag=inv_diag,
            )
        if fused == "always":
            raise ValueError(
                "fused='always' needs a fused-capable blocked-ELL "
                "operator on a TPU backend (solver/fused_minres.py)"
            )
    if fused == "always":
        raise ValueError(
            "fused='always' supports only unpreconditioned or Jacobi "
            "(jacobi_preconditioner) MINRES solves"
        )

    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    shift_arr = jnp.asarray(shift, dtype=b.dtype)
    return _minres_jit(op, b, x0, tol_arr, shift_arr, maxiter, M)
