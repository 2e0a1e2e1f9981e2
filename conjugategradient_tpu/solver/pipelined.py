"""Single-synchronization ("pipelined") CG — Chronopoulos–Gear recurrences.

Standard CG has TWO sequential global reductions per iteration (pᵀAp, then
‖r‖² — the reference's value2/value3 scalars, CG.hpp:378,406): on a chip
mesh that is two psum latency rounds with a data dependency between them.
The Chronopoulos–Gear variant restructures the recurrences so both scalars
are dots of the SAME vector pair, computed in one pass and reduced in ONE
collective:

    s   = A·r                         (the matvec is applied to r, not p)
    γ   = r·r,  δ = r·s               (one fused reduction / one psum)
    β   = γ/γ₋  (0 at k=0)
    α   = γ / (δ − β·γ/α₋)            (γ/δ at k=0)
    p   = r + β·p;   q = s + β·q      (q ≡ A·p maintained by recurrence)
    x  += α·p;       r −= α·q

Mathematically identical to CG; in floating point the extra q-recurrence
accumulates slightly more rounding than Hestenes–Stiefel, which is the
classic trade for one synchronization per iteration (Chronopoulos & Gear
1989).

With a preconditioner (``M=``) the recurrences are Ghysels–Vanroose
(SIAM J. Sci. Comput. 36(4), 2014) — the production distributed-PCG
algorithm.  Three auxiliary vectors keep u = M·r and w = A·u consistent
so the THREE scalars the iteration needs (γ = r·u, δ = w·u, and the
termination observable ‖r‖²) are dots over the same vector trio, fused
into one reduction pass — on a device mesh, ONE psum per iteration where
standard PCG takes two sequential rounds:

    γ   = r·u,  δ = w·u,  rr = r·r   (one fused reduction)
    m   = M·w;  ν = A·m               (the iteration's apply pair)
    β   = γ/γ₋  (0 at k=0)
    α   = γ / (δ − β·γ/α₋)            (γ/δ at k=0)
    z   = ν + β·z;  q = m + β·q;  s = w + β·s;  p = u + β·p
    x  += α·p;  r −= α·s;  u −= α·q;  w −= α·z

(z ≡ A·M·s, q ≡ M·s, s ≡ A·p by induction.)  Two extra vector
recurrences beyond Chronopoulos–Gear is the price; the rounding drift
grows accordingly — refresh with a true residual for many-thousand-
iteration f32 runs.

Termination matches the framework contract (SURVEY §2.3): the pre-update
‖r_k‖² tests against the absolute tolerance; NaN exits; maxiter caps.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from .cg import CGInfo
from .restart import while_with_periodic_restart


def pipelined_cg_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    n: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    recompute_r_every: int = 0,
) -> Tuple[jax.Array, CGInfo]:
    """Solve SPD ``A x = b`` with single-sync CG.  Same call shape and
    CGInfo contract as :func:`~conjugategradient_tpu.cg_solve`; with
    ``M`` the loop runs the Ghysels–Vanroose preconditioned recurrences
    (module docstring) — still one fused reduction per iteration.

    ``recompute_r_every`` is residual replacement, and it matters MORE
    here than in the standard loop: the pipelined recurrences amplify
    local rounding like O(eps·κ) (Cools et al., SIAM J. Matrix Anal.
    2018) vs standard CG's milder drift, so an f32 GV solve stalls at
    ‖r‖ ≈ eps·κ·‖b‖ without it (measured: κ≈750 Poisson, f32, stall at
    ~2e-5·‖b‖; every=50 restores the standard attainable floor).  At
    each boundary the true residual is recomputed (2 SpMVs + an M apply
    for GV) and the direction state reset — a FULL restart, same
    semantics as cg_solve's."""
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    N = op.shape[0]
    maxiter = int(N + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    every = int(recompute_r_every)
    if M is not None:
        return _prec_core(op, b, x0, tol_arr, maxiter, M, every)
    if x0 is None:
        return _solve_core(op, b, None, tol_arr, maxiter, every)
    return _solve_core(op, b, x0, tol_arr, maxiter, every)


@functools.partial(jax.jit, static_argnames=("maxiter", "every"))
def _solve_core(op, b, x0, tol_arr, maxiter, every=0):
    x = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - op.matvec(x)
    gamma0 = jnp.sum(r0 * r0)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=gamma0.dtype)
    hist = hist.at[0].set(gamma0)
    zerov = jnp.zeros_like(r0)
    one = jnp.ones_like(gamma0)
    carry = (
        jnp.asarray(0, jnp.int32),  # k
        jnp.asarray(False),  # done
        jnp.asarray(True),  # fresh: next iteration uses the k==0 formulas
        x,
        r0,
        zerov,  # p
        zerov,  # q = A p
        gamma0,  # γ_{k-1} placeholder (unused while fresh via β=0)
        one,  # α_{k-1} placeholder
        gamma0,  # current ‖r‖² for the termination test
        hist,
    )

    def body(c):
        k, done, fresh, x, r, p, q, gamma_old, alpha_old, rnorm, hist = c
        s = op.matvec(r)
        gamma = jnp.sum(r * r)
        delta = jnp.sum(r * s)  # ONE pass / ONE reduction round with gamma
        exact = gamma == 0  # converged exactly: freeze (cg.py's ρ==0 guard)
        beta = jnp.where(fresh | exact, 0.0, gamma / gamma_old)
        denom = jnp.where(
            fresh, delta, delta - beta * gamma / alpha_old
        )
        safe = jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(exact, 0.0, gamma / safe)
        alpha = jnp.where(denom == 0, jnp.nan * one, alpha)  # breakdown -> NaN exit
        alpha = jnp.where(exact, 0.0, alpha)
        p = r + beta * p
        q = s + beta * q
        x = x + alpha * p
        r = r - alpha * q
        done = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        rnorm_next = jnp.sum(r * r)
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        return (k, done, jnp.asarray(False), x, r, p, q, gamma, alpha,
                rnorm_next, hist)

    def replace(c):
        # residual replacement: true residual + FULL direction reset; the
        # masked no-op convention of solver/restart.py (no `k < maxiter`
        # term — capping on a boundary still reports the true residual)
        k, done, fresh, x, r, p, q, gamma_old, alpha_old, rnorm, hist = c
        restart = (~done) & (k % every == 0)
        r_t = b - op.matvec(x)
        rnorm_t = jnp.sum(r_t * r_t)
        r = jnp.where(restart, r_t, r)
        p = jnp.where(restart, 0.0, p).astype(p.dtype)
        q = jnp.where(restart, 0.0, q).astype(q.dtype)
        rnorm = jnp.where(restart, rnorm_t, rnorm)
        hist = hist.at[k].set(jnp.where(restart, rnorm_t, hist[k]))
        # γ doubles as CGInfo.rho at exit — replace it too (= r·r here);
        # β ignores it after a restart (fresh), so this only fixes the
        # capped-on-boundary report, matching cg.py's replace
        gamma_old = jnp.where(restart, rnorm_t, gamma_old)
        return (k, done, fresh | restart, x, r, p, q, gamma_old,
                alpha_old, rnorm, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    out = while_with_periodic_restart(
        cond, body, replace, every, lambda c: c[0], carry
    )
    k, done, x = out[0], out[1], out[3]
    gamma, rnorm, hist = out[7], out[9], out[10]
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=gamma,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info


@functools.partial(jax.jit, static_argnames=("maxiter", "M", "every"))
def _prec_core(op, b, x0, tol_arr, maxiter, M, every=0):
    """Ghysels–Vanroose pipelined PCG (module docstring).  ``M`` is a
    static closure like cg_solve's — each distinct preconditioner object
    compiles its own loop."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - op.matvec(x)
    u0 = M(r0)
    w0 = op.matvec(u0)
    rnorm0 = jnp.sum(r0 * r0)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    zerov = jnp.zeros_like(r0)
    one = jnp.ones_like(rnorm0)
    carry = (
        jnp.asarray(0, jnp.int32),  # k
        jnp.asarray(False),  # done
        jnp.asarray(True),  # fresh: next iteration uses the k==0 formulas
        x, r0, u0, w0,
        zerov, zerov, zerov, zerov,  # z, q, s, p
        one,  # γ_{k-1} placeholder (unused while fresh via β=0)
        one,  # α_{k-1} placeholder
        rnorm0,  # current ‖r‖² for the termination test
        one,  # ρ = γ for CGInfo
        hist,
    )

    def body(c):
        (k, done, fresh, x, r, u, w, z, q, s, p,
         gamma_old, alpha_old, rnorm, _rho, hist) = c
        gamma = jnp.sum(r * u)
        delta = jnp.sum(w * u)  # fused with gamma: one reduction pass
        m = M(w)
        nu = op.matvec(m)
        exact = gamma == 0  # converged exactly: freeze (cg.py's ρ==0 guard)
        beta = jnp.where(fresh | exact, 0.0, gamma / gamma_old)
        denom = jnp.where(fresh, delta, delta - beta * gamma / alpha_old)
        safe = jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(denom == 0, jnp.nan * one, gamma / safe)
        alpha = jnp.where(exact, 0.0, alpha)
        z = nu + beta * z
        q = m + beta * q
        s = w + beta * s
        p = u + beta * p
        x = x + alpha * p
        r = r - alpha * s
        u = u - alpha * q
        w = w - alpha * z
        # pre-update termination on the carried ‖r_k‖² (SURVEY §2.3(5))
        done = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        rnorm_next = jnp.sum(r * r)
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        return (k, done, jnp.asarray(False), x, r, u, w, z, q, s, p,
                gamma, alpha, rnorm_next, gamma, hist)

    def replace(c):
        # residual replacement: recompute the TRUE r/u/w from x and reset
        # the four direction recurrences (full restart — solver/restart.py
        # masked-no-op convention, no `k < maxiter` term)
        (k, done, fresh, x, r, u, w, z, q, s, p,
         gamma_old, alpha_old, rnorm, rho, hist) = c
        restart = (~done) & (k % every == 0)
        r_t = b - op.matvec(x)
        u_t = M(r_t)
        w_t = op.matvec(u_t)
        rnorm_t = jnp.sum(r_t * r_t)
        r = jnp.where(restart, r_t, r)
        u = jnp.where(restart, u_t, u)
        w = jnp.where(restart, w_t, w)
        z = jnp.where(restart, 0.0, z).astype(z.dtype)
        q = jnp.where(restart, 0.0, q).astype(q.dtype)
        s = jnp.where(restart, 0.0, s).astype(s.dtype)
        p = jnp.where(restart, 0.0, p).astype(p.dtype)
        rnorm = jnp.where(restart, rnorm_t, rnorm)
        hist = hist.at[k].set(jnp.where(restart, rnorm_t, hist[k]))
        # ρ = γ = r·u doubles as CGInfo.rho at exit — replace it too
        # (matching cg.py's replace); β ignores γ_old after a restart
        rho = jnp.where(restart, jnp.sum(r_t * u_t), rho)
        return (k, done, fresh | restart, x, r, u, w, z, q, s, p,
                gamma_old, alpha_old, rnorm, rho, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    out = while_with_periodic_restart(
        cond, body, replace, every, lambda c: c[0], carry
    )
    k, done, x = out[0], out[1], out[3]
    rnorm, rho, hist = out[13], out[14], out[15]
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info
