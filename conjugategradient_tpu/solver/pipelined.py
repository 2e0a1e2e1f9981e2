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
1989).  Use ``recompute`` to refresh q = A·p periodically if running many
thousands of f32 iterations.

Termination matches the framework contract (SURVEY §2.3): the pre-update
‖r_k‖² tests against the absolute tolerance; NaN exits; maxiter caps.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from .cg import CGInfo


def pipelined_cg_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    n: Optional[int] = None,
) -> Tuple[jax.Array, CGInfo]:
    """Solve SPD ``A x = b`` with single-sync CG.  Same call shape and
    CGInfo contract as :func:`~conjugategradient_tpu.cg_solve`."""
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    N = op.shape[0]
    maxiter = int(N + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    if x0 is None:
        return _solve_core(op, b, None, tol_arr, maxiter)
    return _solve_core(op, b, x0, tol_arr, maxiter)


@functools.partial(jax.jit, static_argnames=("maxiter",))
def _solve_core(op, b, x0, tol_arr, maxiter):
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
        x,
        r0,
        zerov,  # p
        zerov,  # q = A p
        gamma0,  # γ_{k-1} placeholder (unused at k=0 via β=0)
        one,  # α_{k-1} placeholder
        gamma0,  # current ‖r‖² for the termination test
        hist,
    )

    def body(c):
        k, done, x, r, p, q, gamma_old, alpha_old, rnorm, hist = c
        s = op.matvec(r)
        gamma = jnp.sum(r * r)
        delta = jnp.sum(r * s)  # ONE pass / ONE reduction round with gamma
        first = k == 0
        exact = gamma == 0  # converged exactly: freeze (cg.py's ρ==0 guard)
        beta = jnp.where(first | exact, 0.0, gamma / gamma_old)
        denom = jnp.where(
            first, delta, delta - beta * gamma / alpha_old
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
        return (k, done, x, r, p, q, gamma, alpha, rnorm_next, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    k, done, x, r, p, q, gamma, alpha, rnorm, hist = jax.lax.while_loop(
        cond, body, carry
    )
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=gamma,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info
