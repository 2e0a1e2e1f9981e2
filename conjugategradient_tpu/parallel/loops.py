"""The sharded CG loop cores — the one place iteration semantics live.

Every per-shard loop here is parameterized by a ``local_matvec`` closure
(layout-specific, built by the front-ends in ``sharded_cg.py`` from the
local matvecs in ``local_ops.py``) and the mesh ``axis`` its dots psum
over.  Numerical semantics match solver/cg.py (and therefore the float64
oracle): recurrence residual, Hestenes–Stiefel α/β, pre-update
termination test on ‖r‖², N+1-style cap, optional Jacobi preconditioning.

Single-RHS loops return ``(x, k, done, rho, rnorm, hist)``; multi-RHS
loops the same with a trailing lane axis.
"""

from __future__ import annotations

import functools

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..solver.restart import while_with_periodic_restart
from ..solver.sstep import _default_rcond as _sstep_default_rcond
from ..solver.sstep import make_sstep_loop


def _precond_apply(inv_diag_s, r):
    """Apply the per-shard preconditioner: None = identity, an (m,) array =
    Jacobi scaling, a CALLABLE = a general local apply (may issue its own
    collectives — e.g. the sharded multigrid V-cycle's ring halos and
    coarse-grid all_gather, parallel/sharded_multigrid.py)."""
    if inv_diag_s is None:
        return r
    if callable(inv_diag_s):
        return inv_diag_s(r)
    return inv_diag_s * r


def _sharded_lockstep_pcg(
    local_matvec_multi: Callable[[jax.Array], jax.Array],
    B_s: jax.Array,  # (R, m) — this shard's slice of every lane
    X0_s: jax.Array,
    inv_diag_s: Optional[jax.Array],  # (m,) or None
    tol_arr: jax.Array,  # scalar or (R,)
    maxiter: int,
    axis: str,
    recompute_r_every: int = 0,
):
    """Multi-RHS lockstep (P)CG per shard: the sharded composition of
    solver/batched.py's lane-masked loop — per-lane α/β/termination, psum'd
    (R,) lane dots, finished lanes frozen.  Per-lane semantics identical to
    the single-device lockstep loop (including per-lane residual-replacement
    restarts: only lanes that executed this body restart, so frozen lanes
    keep their converged state exactly)."""

    def pdot(U, V):
        acc = jnp.promote_types(U.dtype, jnp.float32)
        return jax.lax.psum(
            jnp.sum(U.astype(acc) * V.astype(acc), axis=0), axis
        )  # (R,)

    def precond(Rv):
        return Rv if inv_diag_s is None else inv_diag_s[:, None] * Rv

    Bt = B_s.T  # (m, R)
    X = X0_s.T
    R = Bt.shape[1]

    r0 = Bt - local_matvec_multi(X)
    z0 = precond(r0)
    rnorm0 = pdot(r0, r0)
    rho0 = rnorm0 if inv_diag_s is None else pdot(r0, z0)
    hist = jnp.full((maxiter + 1, R), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    carry = (
        jnp.zeros((R,), jnp.int32),
        jnp.zeros((R,), bool),
        X,
        r0,
        z0,  # p
        rho0,
        rnorm0,
        hist,
    )

    def body(c):
        k, done, X, Rv, P, rho, rnorm, hist = c
        active = (~done) & (k < maxiter)
        Q = local_matvec_multi(P)
        pap = pdot(P, Q)
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        am = jnp.where(active, alpha, 0)
        X = X + am * P
        Rv = Rv - am * Q
        done_new = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        Z = precond(Rv)
        rnorm_next = pdot(Rv, Rv)
        rho_next = rnorm_next if inv_diag_s is None else pdot(Rv, Z)
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
        return (k, done, X, Rv, P, rho, rnorm, hist)

    def replace(c):
        # per-lane residual-replacement full restart; applied at while-loop
        # boundaries (solver/restart.py: a lax.cond in the hot body cost
        # ~40% of the iteration on TPU even when never taken).  Active
        # lanes advance k together, so the mask covers every still-active
        # lane at a restart boundary and nothing otherwise.  No `k < maxiter`
        # term (matches _pcg_replace_fn / cg.py / batched.py): a lane capping
        # exactly on a boundary still replaces, so the reported rnorm is the
        # true residual, not the drifted recurrence.
        k, done, X, Rv, P, rho, rnorm, hist = c
        restart = (~done) & (k % recompute_r_every == 0)
        Rt = Bt - local_matvec_multi(X)
        rnorm_t = pdot(Rt, Rt)
        Zt = precond(Rt)
        rho_t = rnorm_t if inv_diag_s is None else pdot(Rt, Zt)
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

    def cond(c):
        k, done = c[0], c[1]
        return jnp.any((~done) & (k < maxiter))

    k, done, X, Rv, P, rho, rnorm, hist = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda c: jnp.max(c[0]), carry
    )
    return X.T, k, done, rho, rnorm, hist.T


def _sharded_block_cg(
    local_matvec_multi: Callable[[jax.Array], jax.Array],
    B_s: jax.Array,  # (R, m) — this shard's slice of every lane
    X0_s: jax.Array,
    inv_diag_s: Optional[jax.Array],  # (m,) or None
    tol_arr: jax.Array,  # scalar or (R,)
    maxiter: int,
    axis: str,
    recompute_r_every: int = 0,
    rcond: float = 1e-10,
):
    """Block CG per shard (solver/blockcg.py's O'Leary recurrences under
    shard_map): the R×R Gram blocks psum over the mesh, every device runs
    the identical replicated eigh pseudo-solve, and the (m,R)×(R,R) update
    matmuls stay local.  Same collective count per iteration as the
    lockstep loop — two psums, (R,R) payload instead of (R,)."""
    from ..solver.blockcg import _spd_pinv_apply

    def pgram(U, V):  # psum'd (R, R) Gram block
        acc = jnp.promote_types(U.dtype, jnp.float32)
        return jax.lax.psum(
            jnp.einsum("mi,mj->ij", U.astype(acc), V.astype(acc),
                       precision=jax.lax.Precision.HIGHEST), axis
        )

    def pdot_diag(U):  # psum'd per-lane ‖·‖²
        acc = jnp.promote_types(U.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(U.astype(acc) ** 2, axis=0), axis)

    def precond(Rv):
        return Rv if inv_diag_s is None else inv_diag_s[:, None] * Rv

    hi = jax.lax.Precision.HIGHEST
    Bt = B_s.T  # (m, R)
    X = X0_s.T
    R = Bt.shape[1]

    r0 = Bt - local_matvec_multi(X)
    z0 = precond(r0)
    rnorm0 = pdot_diag(r0)
    rho0 = pgram(r0, z0 if inv_diag_s is not None else r0)
    hist = jnp.full((maxiter + 1, R), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    carry = (
        jnp.zeros((R,), jnp.int32),
        jnp.zeros((R,), bool),
        X,
        r0,
        z0,  # p
        rho0,
        rnorm0,
        hist,
    )

    def body(c):
        k, done, X, Rv, Pv, rho, rnorm, hist = c
        active = (~done) & (k < maxiter)
        Q = local_matvec_multi(Pv)
        W = pgram(Pv, Q)
        alpha = _spd_pinv_apply(W, rho, rcond)  # (R, R), replicated
        X = X + jnp.einsum("mi,ij->mj", Pv, alpha, precision=hi)
        Rv = Rv - jnp.einsum("mi,ij->mj", Q, alpha, precision=hi)
        done_new = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        Z = precond(Rv)
        rnorm_next = pdot_diag(Rv)
        rho_next = pgram(Rv, Z if inv_diag_s is not None else Rv)
        beta = _spd_pinv_apply(rho, rho_next, rcond)
        Pv = Z + jnp.einsum("mi,ij->mj", Pv, beta, precision=hi)
        k = jnp.where(active, k + 1, k)
        hist_col = jnp.where(
            active, rnorm_next, jnp.take_along_axis(hist, k[None, :], 0)[0]
        )
        hist = hist.at[k, jnp.arange(R)].set(hist_col)
        done = jnp.where(active, done_new, done)
        return (k, done, X, Rv, Pv, rho_next, rnorm_next, hist)

    def replace(c):
        # all-lane full restart (solver/blockcg.py semantics: the shared
        # space restarts as a block; only counters are per-lane).  Applied
        # at while-loop boundaries (solver/restart.py), masked by the
        # scalar `fire` so off-cadence boundaries are bit-identical no-ops.
        # No `k < maxiter` term here (matches _pcg_replace_fn): lanes capping
        # exactly on a boundary still replace and report the true residual.
        k, done, X, Rv, Pv, rho, rnorm, hist = c
        active = ~done
        fire = jnp.any(active) & (
            jnp.max(jnp.where(active, k, 0)) % recompute_r_every == 0
        )
        Rt = Bt - local_matvec_multi(X)
        Zt = precond(Rt)
        rnorm_t = pdot_diag(Rt)
        rho_t = pgram(Rt, Zt if inv_diag_s is not None else Rt)
        hist_col = jnp.where(
            fire & active, rnorm_t,
            jnp.take_along_axis(hist, k[None, :], 0)[0],
        )
        hist = hist.at[k, jnp.arange(R)].set(hist_col)
        return (
            k, done, X,
            jnp.where(fire, Rt, Rv),
            jnp.where(fire, Zt, Pv),
            jnp.where(fire, rho_t, rho),
            jnp.where(fire, rnorm_t, rnorm),
            hist,
        )

    def cond(c):
        k, done = c[0], c[1]
        return jnp.any((~done) & (k < maxiter))

    k, done, X, Rv, Pv, rho, rnorm, hist = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda c: jnp.max(c[0]), carry
    )
    return X.T, k, done, jnp.diagonal(rho), rnorm, hist.T


# Gram cutoff ladder: the one copy lives in solver/blockcg.py
_default_rcond = _sstep_default_rcond


def _batched_loop(method: str, recompute_r_every: int, rcond: float):
    """Select the inner multi-RHS loop for the sharded batched front-ends."""
    if method == "block":
        return functools.partial(
            _sharded_block_cg,
            recompute_r_every=recompute_r_every, rcond=rcond,
        )
    if method != "lockstep":
        raise ValueError(f"method must be 'lockstep' or 'block', got {method!r}")
    return functools.partial(
        _sharded_lockstep_pcg, recompute_r_every=recompute_r_every
    )


def _pcg_init_carry(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    inv_diag_s: Optional[jax.Array],
    maxiter: int,
    axis: str,
):
    """Initial per-shard PCG carry (k, done, x, r, p, rho, rnorm, hist)."""

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    r0 = b_s - local_matvec(x0_s)
    z0 = _precond_apply(inv_diag_s, r0)
    rnorm0 = pdot(r0, r0)
    rho0 = rnorm0 if inv_diag_s is None else pdot(r0, z0)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    return (
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        x0_s,
        r0,
        z0,
        rho0,
        rnorm0,
        hist,
    )


def _pcg_body_fn(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    inv_diag_s: Optional[jax.Array],
    tol_arr: jax.Array,
    axis: str,
):
    """One per-shard PCG iteration; shared by the one-shot solve and the
    checkpointable chunked driver so resumed solves are bit-identical.
    Restart logic lives in _pcg_replace_fn (solver/restart.py structure)."""

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def precond(r):
        return _precond_apply(inv_diag_s, r)

    def body(c):
        k, done, x, r, p, rho, rnorm, hist = c
        q = local_matvec(p)
        pap = pdot(p, q)
        # exact-convergence guard (see solver/cg.cg_step): rho == 0 would
        # otherwise poison x with 0/0 in the body that observes convergence
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        x = x + alpha * p
        r = r - alpha * q
        # termination tests the PRE-update residual (CG.hpp:401-402, SURVEY §2.3(5))
        done = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        z = precond(r)
        rnorm_next = pdot(r, r)
        rho_next = rnorm_next if inv_diag_s is None else pdot(r, z)
        beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, rho))
        p = z + beta * p
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        return (k, done, x, r, p, rho_next, rnorm_next, hist)

    return body


def _pcg_replace_fn(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    inv_diag_s: Optional[jax.Array],
    maxiter: int,
    axis: str,
    recompute_r_every: int,
):
    """Residual-replacement full restart for the per-shard loop: true
    residual AND direction reset — same semantics as solver/cg.py's
    single-device restart (a replaced r with the drifted p diverges; see
    cg.py).  The extra SpMV's all_gather/ring halo and the psum dot ride
    the same collectives as a normal iteration.  Applied at while-loop
    boundaries by solver/restart.py (a lax.cond in the hot body cost ~40%
    of the iteration on TPU even when never taken) and masked so chunk
    boundaries off the restart cadence are bit-identical no-ops."""

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def precond(r):
        return _precond_apply(inv_diag_s, r)

    def replace(c):
        k, done, x, r, p, rho, rnorm, hist = c
        # no `k < maxiter` term — capping on a boundary still replaces
        # the reported residual with the true one (solver/cg.py)
        mask = (~done) & (k % recompute_r_every == 0)
        r_true = b_s - local_matvec(x)
        rnorm_t = pdot(r_true, r_true)
        z_t = precond(r_true)
        rho_t = rnorm_t if inv_diag_s is None else pdot(r_true, z_t)
        hist = hist.at[k].set(jnp.where(mask, rnorm_t, hist[k]))
        return (
            k, done, x,
            jnp.where(mask, r_true, r),
            jnp.where(mask, z_t, p),
            jnp.where(mask, rho_t, rho),
            jnp.where(mask, rnorm_t, rnorm),
            hist,
        )

    return replace


def _sharded_deflated_pcg(
    local_matvec, b_s, x0_s, inv_diag_s, W_s, AW_s, E_chol,
    tol_arr, maxiter: int, axis: str,
):
    """Deflated (P)CG per shard — solver/deflated._deflated_core with the
    dots and the tall-skinny projector products psum'd over the mesh.

    Per iteration the deflation adds ONE extra (k,)-payload psum (the
    (AW)ᵀz product) on top of standard CG's two scalar rounds; the k×k
    triangular solve replicates.  Carries the same divergence guard and
    best-iterate return as the single-device loop (the projector's E⁻¹
    amplifies post-stagnation rounding noise exponentially).
    """
    from jax.scipy.linalg import cho_solve

    hi = jax.lax.Precision.HIGHEST

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def psum_vec(v):
        return jax.lax.psum(v, axis)

    def precond(r):
        return r if inv_diag_s is None else inv_diag_s * r

    def solve_E(y):
        return cho_solve((E_chol, True), y)

    def project(z):
        mu = solve_E(psum_vec(jnp.matmul(AW_s.T, z, precision=hi)))
        return z - jnp.matmul(W_s, mu, precision=hi)

    # Galerkin initial correction (Wᵀ r₀ = 0)
    r = b_s - local_matvec(x0_s)
    mu = solve_E(psum_vec(jnp.matmul(W_s.T, r, precision=hi)))
    x = x0_s + jnp.matmul(W_s, mu, precision=hi)
    r = r - jnp.matmul(AW_s, mu, precision=hi)

    z = precond(r)
    p = project(z)
    rnorm0 = pdot(r, r)
    rho0 = rnorm0 if inv_diag_s is None else pdot(r, z)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    carry = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
             x, r, p, rho0, rnorm0, hist, x, rnorm0, jnp.asarray(False))

    def cond(c):
        return (c[0] < maxiter) & (~c[1]) & (~c[10])

    def body(c):
        k, done, x, r, p, rho, rnorm, hist, x_best, rnorm_min, divg = c
        q = local_matvec(p)
        pap = pdot(p, q)
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        x = x + alpha * p
        r = r - alpha * q
        tol_met = jnp.sqrt(rnorm) <= tol_arr
        diverged = (rnorm > 1e6 * rnorm_min) & ~tol_met
        done = jnp.isnan(rnorm) | tol_met
        z = precond(r)
        rnorm_next = pdot(r, r)
        rho_next = rnorm_next if inv_diag_s is None else pdot(r, z)
        beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, rho))
        p = project(z) + beta * p
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        better = rnorm_next < rnorm_min
        x_best = jnp.where(better, x, x_best)
        rnorm_min = jnp.where(better, rnorm_next, rnorm_min)
        return (k, done, x, r, p, rho_next, rnorm_next, hist,
                x_best, rnorm_min, divg | diverged)

    (k, done, x, r, p, rho, rnorm, hist, x_best, rnorm_min,
     divg) = jax.lax.while_loop(cond, body, carry)
    use_best = rnorm_min < rnorm
    x = jnp.where(use_best, x_best, x)
    rnorm_out = jnp.where(use_best, rnorm_min, rnorm)
    # diverged exits report done=False downstream (converged=False)
    return x, k, done & ~divg, rho, rnorm_out, hist


def _sharded_pcg(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    inv_diag_s: Optional[jax.Array],
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    recompute_r_every: int = 0,
):
    """PCG body executed per shard; semantics mirror solver/cg.py exactly
    (including the optional residual-replacement full restart — the f32
    recurrence-drift fix matters MOST at the mesh scales this loop targets)."""
    carry = _pcg_init_carry(local_matvec, b_s, x0_s, inv_diag_s, maxiter, axis)
    body = _pcg_body_fn(local_matvec, b_s, inv_diag_s, tol_arr, axis)
    replace = _pcg_replace_fn(local_matvec, b_s, inv_diag_s, maxiter, axis,
                              recompute_r_every)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    k, done, x, r, p, rho, rnorm, hist = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda c: c[0], carry
    )
    return x, k, done, rho, rnorm, hist


def _sharded_minres(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    inv_diag_s,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
):
    """Per-shard MINRES (Paige–Saunders) — the mesh composition of
    solver/minres.py: symmetric-INDEFINITE systems on the row mesh.

    Exactly CG's collective pattern per iteration — the layout family's
    halo inside ``local_matvec`` plus two psum'd dots (v·y and the Lanczos
    β norm); all Givens bookkeeping is scalar and shard-replicated.
    ``inv_diag_s`` follows _precond_apply's contract (None / Jacobi array /
    callable) and must be SPD — an indefinite M NaNs the Lanczos inner
    product and reports ``converged=False``.

    Returns the core's ``(x, k, done, rho, rnorm, hist)`` tuple with
    rho = rnorm = φ̄² and hist = φ̄² — SQUARED norm estimates, so the
    CGInfo plumbing (rho_history, residual_norms) reads identically to
    the CG loops.  Note φ̄ estimates ‖r‖_M when preconditioned (‖r‖₂
    exactly, in exact arithmetic, when not).
    """

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def precond(r):
        return _precond_apply(inv_diag_s, r)

    r1 = b_s - local_matvec(x0_s)
    y0 = precond(r1)
    beta1 = jnp.sqrt(pdot(r1, y0))
    sdt = beta1.dtype
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=sdt)
    hist = hist.at[0].set(beta1 * beta1)
    zero = jnp.zeros((), sdt)
    carry = (
        jnp.asarray(0, jnp.int32),
        jnp.isnan(beta1) | (beta1 <= tol_arr),  # done
        jnp.isnan(beta1),  # nan (breakdown)
        x0_s,
        r1,  # r1 (Lanczos v_{k-1}, un-normalized)
        r1,  # r2 (Lanczos v_k, un-normalized)
        y0.astype(b_s.dtype),
        zero,  # oldb
        beta1.astype(sdt),  # beta
        zero,  # dbar
        zero,  # epsln
        beta1.astype(sdt),  # phibar
        -jnp.ones((), sdt),  # cs
        zero,  # sn
        jnp.zeros_like(b_s),  # w
        jnp.zeros_like(b_s),  # w2
        hist,
    )

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    def body(c):
        (k, done, nan, x, r1, r2, y, oldb, beta, dbar, epsln, phibar,
         cs, sn, w, w2, hist) = c
        # Lanczos step (beta > 0 on entry: done fenced zero/NaN)
        v = (y / beta).astype(y.dtype)
        yn = local_matvec(v)
        c1 = jnp.where(oldb == 0, 0.0, beta / jnp.where(oldb == 0, 1.0, oldb))
        yn = yn - (c1 * r1).astype(v.dtype)
        alfa = pdot(v, yn)
        yn = (yn - (alfa / beta) * r2).astype(v.dtype)
        r1n, r2n = r2, yn
        y_next = precond(r2n).astype(v.dtype)
        oldb_n = beta
        beta_n = jnp.sqrt(pdot(r2n, y_next))  # NaN iff M not SPD
        # Givens QR of the tridiagonal
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * beta_n
        dbar_n = -cs * beta_n
        gamma = jnp.maximum(
            jnp.sqrt(gbar * gbar + beta_n * beta_n),
            jnp.asarray(jnp.finfo(sdt).tiny, sdt),
        )
        cs_n = gbar / gamma
        sn_n = beta_n / gamma
        phi = cs_n * phibar
        phibar_n = sn_n * phibar
        # solution update
        w1, w2n = w2, w
        wn = ((v - oldeps * w1 - delta * w2n) / gamma).astype(w.dtype)
        xn = (x + phi * wn).astype(x.dtype)
        kn = k + 1
        hist = hist.at[kn].set(phibar_n * phibar_n)
        is_nan = jnp.isnan(phibar_n) | jnp.isnan(beta_n)
        done_n = is_nan | (phibar_n <= tol_arr) | (beta_n == 0)
        return (kn, done_n, is_nan, xn, r1n, r2n, y_next, oldb_n, beta_n,
                dbar_n, epsln_n, phibar_n, cs_n, sn_n, wn, w2n, hist)

    c = jax.lax.while_loop(cond, body, carry)
    k, done, nan, x, phibar, hist = c[0], c[1], c[2], c[3], c[11], c[16]
    rho = phibar * phibar
    # a NaN φ̄² flows to _solve_info's converged = done & ~isnan(rnorm),
    # matching solver/minres.py's converged = done & ~nan
    rho = jnp.where(nan, jnp.asarray(jnp.nan, sdt), rho)
    return x, k, done, rho, rho, hist


def _sharded_bicgstab(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    inv_diag_s,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
):
    """Per-shard BiCGStab — the mesh composition of solver/bicgstab.py:
    NONSYMMETRIC systems on the row mesh.

    Collective pattern per iteration: TWO halo'd local matvecs (BiCGStab's
    price for nonsymmetry) + THREE psum rounds — ρ = r̂·r, then r̂·v after
    the first matvec, then ONE stacked psum of (t·s, t·t, s·s) after the
    second.  The full-step residual norm needs no fourth round: with
    ω = t·s/t·t, ‖r‖² = s·s − (t·s)²/t·t exactly, so the termination
    observable falls out of the same stacked reduction (the single-device
    version just dots r; on the mesh the identity saves a latency round).

    ``inv_diag_s`` follows _precond_apply's contract (None / Jacobi array /
    callable); SPD-ness is NOT required of M.  Breakdowns (ρ→0, r̂ᵀv→0,
    ω→0, NaN) exit with the last FINITE iterate and flow to
    ``converged=False`` via a NaN'd rnorm, like _sharded_minres's nan
    channel.  Returns the core's ``(x, k, done, rho, rnorm, hist)`` tuple
    with SQUARED norms so the CGInfo plumbing reads identically to the CG
    loops.
    """

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def pdot3(t, sv):
        # one psum of the stacked (t·s, t·t, s·s) triple
        acc = jnp.promote_types(t.dtype, jnp.float32)
        ta, sa = t.astype(acc), sv.astype(acc)
        trip = jnp.stack(
            [jnp.sum(ta * sa), jnp.sum(ta * ta), jnp.sum(sa * sa)])
        return jax.lax.psum(trip, axis)

    def precond(r):
        return _precond_apply(inv_diag_s, r)

    r0 = b_s - local_matvec(x0_s)
    rnorm0_sq = pdot(r0, r0)
    sdt = rnorm0_sq.dtype
    tol_sq = (tol_arr * tol_arr).astype(sdt)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=sdt)
    hist = hist.at[0].set(rnorm0_sq)
    one = jnp.ones((), sdt)
    carry = (
        jnp.asarray(0, jnp.int32),
        jnp.isnan(rnorm0_sq) | (rnorm0_sq <= tol_sq),  # done
        jnp.isnan(rnorm0_sq),  # broke
        x0_s,
        r0,
        jnp.zeros_like(b_s),  # p
        jnp.zeros_like(b_s),  # v
        one,  # rho
        one,  # alpha
        one,  # omega
        rnorm0_sq.astype(sdt),
        hist,
    )

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    def body(c):
        (k, done, broke, x, r, p, v, rho_p, alpha_p, omega_p,
         rnorm_sq, hist) = c
        rho = pdot(r0, r)  # r̂₀ = r₀ (van der Vorst's standard choice)
        beta = (rho / rho_p) * (alpha_p / omega_p)
        pn = (r + beta * (p - omega_p * v)).astype(r.dtype)
        phat = precond(pn).astype(r.dtype)
        vn = local_matvec(phat)
        rhat_v = pdot(r0, vn)
        alpha = rho / rhat_v
        sv = (r - alpha * vn).astype(r.dtype)
        x_half = (x + alpha * phat).astype(x.dtype)

        shat = precond(sv).astype(r.dtype)
        t = local_matvec(shat)
        t_s, t_t, s_s = pdot3(t, sv)
        half_done = s_s <= tol_sq
        omega = t_s / t_t
        x_full = (x_half + omega * shat).astype(x.dtype)
        r_full = (sv - omega * t).astype(r.dtype)
        # ‖r_full‖² from the same stacked reduction (see docstring); the
        # clamp absorbs the tiny negative roundoff the subtraction can leave
        rfull_sq = jnp.maximum(s_s - t_s * t_s / t_t, 0.0)

        finite = (
            jnp.isfinite(beta) & jnp.isfinite(alpha) & jnp.isfinite(omega)
            & jnp.isfinite(rfull_sq)
        )
        broke_n = ~finite & ~half_done
        rnorm_new = jnp.where(half_done, s_s, rfull_sq)
        converged_now = half_done | (finite & (rfull_sq <= tol_sq))
        broke_n = broke_n | (
            finite & ((omega == 0) | (rho == 0)) & ~converged_now)

        xn = jnp.where(broke_n, x, jnp.where(half_done, x_half, x_full))
        rn = jnp.where(broke_n, r, jnp.where(half_done, sv, r_full))
        pn = jnp.where(broke_n | half_done, p, pn)
        vn = jnp.where(broke_n | half_done, v, vn)
        rnorm_n = jnp.where(broke_n, rnorm_sq, rnorm_new).astype(sdt)
        kn = k + 1
        hist = hist.at[kn].set(rnorm_n)
        return (
            kn, converged_now | broke_n, broke_n, xn, rn, pn, vn,
            jnp.where(broke_n, rho_p, rho),
            jnp.where(broke_n, alpha_p, alpha),
            jnp.where(broke_n, omega_p, omega),
            rnorm_n, hist,
        )

    c = jax.lax.while_loop(cond, body, carry)
    k, done, broke, x, rnorm_sq, hist = c[0], c[1], c[2], c[3], c[10], c[11]
    # breakdown flows to _solve_info's converged = done & ~isnan(rnorm)
    rho_out = jnp.where(broke, jnp.asarray(jnp.nan, sdt), rnorm_sq)
    return x, k, done, rho_out, rho_out, hist


#: test hook: force the sharded GMRES Arnoldi form (None = backend auto)
_GMRES_UNROLL_OVERRIDE = None


def _sharded_gmres(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    inv_diag_s,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    m: int,
    flexible: bool = False,
):
    """Per-shard GMRES(m) — the mesh composition of solver/gmres.py:
    restarted minimal-residual for NONSYMMETRIC systems on the row mesh.

    The Krylov basis is row-sharded like every other vector: ``V_s`` is the
    shard's ``(m+1, n_local)`` slice, so orthogonalization's CGS2 matmuls
    run shard-local and reduce with small ``(m+1,)``-payload psums.
    Collective pattern per inner Arnoldi step: ONE halo'd local matvec +
    THREE psums (the two CGS2 projection vectors + the new basis vector's
    norm); per restart cycle one more matvec + psum for the TRUE-residual
    recompute.  The Givens scalars, the (m×m) triangular solve, and all
    termination logic are replicated bit-identically on every shard (their
    inputs are psum outputs).

    ``inv_diag_s`` follows _precond_apply's contract (None / Jacobi array /
    callable — the callable may issue its own collectives, e.g. the
    sharded-AMG V-cycle) and is applied as a RIGHT preconditioner, matching
    solver/gmres.py: the residual the loop observes and tests is the TRUE
    ``b − A x``.  ``flexible=True`` is Saad's FGMRES on the mesh: the
    preconditioned vectors ``z_j`` are kept as a second row-sharded
    ``(m, n_local)`` basis and the update is ``x += Zᵀ y`` directly —
    REQUIRED when the local preconditioner is nonlinear / iteration-
    varying (an inner Krylov solve); with a fixed linear M_local the two
    variants coincide in exact arithmetic.  Restart boundaries recompute the true residual, so the
    recurrence-drift pathology ``recompute_r_every`` exists for cannot
    occur.  Returns the core's ``(x, k, done, rho, rnorm, hist)`` tuple
    with SQUARED norms so the CGInfo plumbing reads identically to the CG
    loops (hist carries in-cycle Givens estimates², overwritten with the
    recomputed true norm² at each cycle boundary).
    """
    hi = jax.lax.Precision.HIGHEST
    # mirror solver/gmres.py's unroll="auto": static-j Arnoldi on TPU at
    # m <= 48 (reads only the live basis rows; roundoff-identical) — kept
    # backend-matched so CPU parity tests compare fori vs fori
    if _GMRES_UNROLL_OVERRIDE is not None:  # tests force either form
        unroll_static = bool(_GMRES_UNROLL_OVERRIDE)
    else:
        try:
            _backend = jax.default_backend()
        except Exception:  # pragma: no cover
            _backend = "cpu"
        unroll_static = _backend == "tpu" and m <= 48

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jax.lax.psum(jnp.sum(u.astype(acc) * v.astype(acc)), axis)

    def precond(r):
        return _precond_apply(inv_diag_s, r)

    vdt = b_s.dtype
    nloc = b_s.shape[0]
    r0 = b_s - local_matvec(x0_s)
    rnorm0_sq = pdot(r0, r0)
    sdt = rnorm0_sq.dtype
    tol_sq = (tol_arr * tol_arr).astype(sdt)
    # scratch slot maxiter+1 absorbs masked history writes; trimmed on return
    hist = jnp.full((maxiter + 2,), jnp.nan, dtype=sdt)
    hist = hist.at[0].set(rnorm0_sq)

    carry0 = (
        jnp.zeros((), jnp.int32),
        jnp.isnan(rnorm0_sq) | (rnorm0_sq <= tol_sq),  # done
        jnp.isnan(rnorm0_sq),  # broke
        x0_s,
        rnorm0_sq,
        hist,
    )

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    def body(c):
        k, _, broke, x, rnorm_sq, hist = c
        r = b_s - local_matvec(x)
        beta_sq = pdot(r, r)
        beta = jnp.sqrt(beta_sq)
        v0 = jnp.where(
            beta > 0, (r.astype(sdt) / beta).astype(vdt), jnp.zeros_like(r))
        V = jnp.zeros((m + 1, nloc), vdt).at[0].set(v0)
        Z = jnp.zeros((m if flexible else 1, nloc), vdt)  # FGMRES z-basis
        R = jnp.zeros((m + 1, m), sdt)
        g = jnp.zeros((m + 1,), sdt).at[0].set(beta)
        cs = jnp.ones((m,), sdt)
        sn = jnp.zeros((m,), sdt)

        def arnoldi(j, ic, static_j=None):
            V, Z, R, g, cs, sn, idone, ibroke, jused, hist = ic
            active = (~idone) & (k + j < maxiter)
            z = precond(V[j]).astype(vdt)
            if flexible:
                Z = Z.at[j].set(jnp.where(active, z, Z[j]))
            w = local_matvec(z).astype(vdt)
            # CGS2 with psum'd projections (rows > j of V are zero).  With
            # a STATIC j (the unrolled TPU form, mirroring solver/gmres.py
            # unroll=), only the j+2 live rows stream — the values agree
            # to reduction-tree roundoff, and the psum payload shrinks too.
            Va = (V if static_j is None else V[: static_j + 2]).astype(sdt)
            wa = w.astype(sdt)
            h1s = jax.lax.psum(jnp.matmul(Va, wa, precision=hi), axis)
            w1 = wa - jnp.matmul(Va.T, h1s, precision=hi)
            h2s = jax.lax.psum(jnp.matmul(Va, w1, precision=hi), axis)
            w2 = w1 - jnp.matmul(Va.T, h2s, precision=hi)
            if static_j is None:
                h1, h2 = h1s, h2s
            else:
                pad = ((0, m + 1 - (static_j + 2)),)
                h1, h2 = jnp.pad(h1s, pad), jnp.pad(h2s, pad)
            h = h1 + h2
            hsub = jnp.sqrt(jax.lax.psum(jnp.sum(w2 * w2), axis))
            vnext = jnp.where(hsub > 0, w2 / hsub, jnp.zeros_like(w2))
            V = V.at[j + 1].set(
                jnp.where(active, vnext.astype(vdt), V[j + 1]))

            col = h.at[j + 1].set(hsub)

            def rot(i, cv):
                a0, a1 = cv[i], cv[i + 1]
                apply = i < j
                n0 = jnp.where(apply, cs[i] * a0 + sn[i] * a1, a0)
                n1 = jnp.where(apply, -sn[i] * a0 + cs[i] * a1, a1)
                return cv.at[i].set(n0).at[i + 1].set(n1)

            col = jax.lax.fori_loop(0, m, rot, col)
            a0, a1 = col[j], col[j + 1]
            denom = jnp.sqrt(a0 * a0 + a1 * a1)
            csj = jnp.where(denom > 0, a0 / denom, jnp.ones((), sdt))
            snj = jnp.where(denom > 0, a1 / denom, jnp.zeros((), sdt))
            col = col.at[j].set(denom).at[j + 1].set(jnp.zeros((), sdt))
            gj = g[j]
            g_new = g.at[j].set(csj * gj).at[j + 1].set(-snj * gj)
            est_sq = g_new[j + 1] * g_new[j + 1]

            R = R.at[:, j].set(jnp.where(active, col, R[:, j]))
            cs = cs.at[j].set(jnp.where(active, csj, cs[j]))
            sn = sn.at[j].set(jnp.where(active, snj, sn[j]))
            g = jnp.where(active, g_new, g)

            nonfinite = ~jnp.isfinite(est_sq)
            step_done = active & (nonfinite | (est_sq <= tol_sq))
            jused = jused + active.astype(jnp.int32)
            idx = jnp.where(active, k + jused, maxiter + 1)
            hist = hist.at[idx].set(est_sq)
            return (V, Z, R, g, cs, sn,
                    idone | step_done, ibroke | (active & nonfinite),
                    jused, hist)

        f = jnp.zeros((), bool)
        ic0 = (V, Z, R, g, cs, sn, f, f, jnp.zeros((), jnp.int32), hist)
        if unroll_static:
            ic = ic0
            for j in range(m):
                ic = arnoldi(j, ic, static_j=j)
            V, Z, R, g, cs, sn, _, ibroke, jused, hist = ic
        else:
            V, Z, R, g, cs, sn, _, ibroke, jused, hist = jax.lax.fori_loop(
                0, m, arnoldi, ic0)

        valid = jnp.arange(m) < jused
        Rm = jnp.where(valid[None, :], R[:m, :m], jnp.eye(m, dtype=sdt))
        gm = jnp.where(valid, g[:m], jnp.zeros((m,), sdt))
        y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        if flexible:
            # FGMRES update: x += Zᵀ y (each z_j kept as M_local saw it)
            dx = jnp.matmul(Z.astype(sdt).T, y, precision=hi).astype(vdt)
        else:
            zc = jnp.matmul(V[:m].astype(sdt).T, y, precision=hi).astype(vdt)
            dx = precond(zc).astype(vdt)
        x_new = (x + dx).astype(x.dtype)

        r_new = b_s - local_matvec(x_new)
        rnew_sq = pdot(r_new, r_new)
        finite = jnp.isfinite(rnew_sq) & ~ibroke
        x_out = jnp.where(finite, x_new, x)
        rs_out = jnp.where(finite, rnew_sq, rnorm_sq)
        k_new = k + jused
        hist = hist.at[jnp.where(finite, k_new, maxiter + 1)].set(rnew_sq)
        broke_n = broke | ~finite
        done_n = broke_n | (rs_out <= tol_sq) | (jused == 0)
        return (k_new, done_n, broke_n, x_out, rs_out, hist)

    c = jax.lax.while_loop(cond, body, carry0)
    k, done, broke, x, rnorm_sq, hist = c
    # breakdown flows to _solve_info's converged = done & ~isnan(rnorm)
    rho_out = jnp.where(broke, jnp.asarray(jnp.nan, rnorm_sq.dtype),
                        rnorm_sq)
    return x, k, done, rho_out, rho_out, hist[: maxiter + 1]


def _sharded_fused_cg(
    blocks_s: jax.Array,
    cols_s: jax.Array,
    b_s: jax.Array,
    x0_s: jax.Array,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    bn: int,
    interpret: bool,
    inv_diag_s: Optional[jax.Array] = None,
):
    """Per-shard (P)CG loop built from the fused Pallas kernels: the local
    SpMV and the p·q partial run as one kernel
    (ops/pallas/fused_cg.bell_spmv_dot on the all-gathered operand), the x/r
    updates and the ‖r‖² (+ρ = r·M⁻¹r with Jacobi) partials as another
    (fused_update_dot / fused_update_dot_pcg); the partials psum over ICI.
    Same semantics as _sharded_pcg, f32.

    The direction update stays a fused XLA elementwise op: it must complete
    BEFORE the all_gather, so it cannot be folded into the SpMV kernel the
    way the single-chip path does (solver/fused.py)."""
    from ..ops.pallas.fused_cg import (
        bell_spmv_dot,
        fused_update_dot,
        fused_update_dot_pcg,
    )

    m = b_s.shape[0]
    offset = (jax.lax.axis_index(axis) * m).astype(jnp.int32).reshape(1)
    precond = inv_diag_s is not None
    d2 = (
        inv_diag_s.astype(jnp.float32).reshape(m // 128, 128)
        if precond
        else None
    )

    def matvec_dot(v_local2):
        v_full = jax.lax.all_gather(v_local2.reshape(-1), axis, tiled=True)
        q, pap_l = bell_spmv_dot(
            blocks_s, cols_s, v_full.reshape(-1, bn), offset,
            interpret=interpret,
        )
        return q.reshape(v_local2.shape), jax.lax.psum(pap_l[0, 0], axis)

    b2 = b_s.astype(jnp.float32).reshape(m // 128, 128)
    x2 = x0_s.astype(jnp.float32).reshape(m // 128, 128)
    ax0, _ = matvec_dot(x2)
    r2 = b2 - ax0
    rnorm0 = jax.lax.psum(jnp.sum(r2 * r2), axis)
    if precond:
        p0 = d2 * r2
        rho0 = jax.lax.psum(jnp.sum(r2 * p0), axis)
    else:
        p0, rho0 = r2, rnorm0
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)
    hist = hist.at[0].set(rnorm0)
    carry = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
             x2, r2, p0, rho0, rnorm0, hist)

    def body(c):
        k, done, x, r, p, rho, rnorm, hist = c
        q, pap = matvec_dot(p)
        exact = rho == 0
        alpha = jnp.where(exact, 0.0, rho / jnp.where(exact, 1.0, pap))
        a11 = alpha.reshape(1, 1).astype(jnp.float32)
        if precond:
            x, r, rnorm_l, rho_l = fused_update_dot_pcg(
                x, p, r, q, d2, a11, interpret=interpret,
            )
            rnorm_next = jax.lax.psum(rnorm_l[0, 0], axis)
            rho_next = jax.lax.psum(rho_l[0, 0], axis)
        else:
            x, r, rnorm_l = fused_update_dot(x, p, r, q, a11,
                                             interpret=interpret)
            rnorm_next = jax.lax.psum(rnorm_l[0, 0], axis)
            rho_next = rnorm_next
        # pre-update termination on ‖r_k‖² (CG.hpp:401-402)
        done = jnp.isnan(rnorm) | (jnp.sqrt(rnorm) <= tol_arr)
        beta = jnp.where(exact, 0.0, rho_next / jnp.where(exact, 1.0, rho))
        z = d2 * r if precond else r
        p = z + beta * p
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        return (k, done, x, r, p, rho_next, rnorm_next, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    k, done, x, r, p, rho, rnorm, hist = jax.lax.while_loop(cond, body, carry)
    return x.reshape(-1), k, done, rho, rnorm, hist


def _sharded_fused_minres(
    blocks_s: jax.Array,
    cols_s: jax.Array,
    b_s: jax.Array,
    x0_s: jax.Array,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    bn: int,
    interpret: bool,
    inv_diag_s: Optional[jax.Array] = None,
):
    """Per-shard MINRES loop built from the fused Pallas kernels (round 5,
    the mesh sibling of solver/fused_minres.py): the local Lanczos SpMV,
    BOTH reduction partials (v·q, v·r1), and the PREVIOUS iteration's
    hoisted w/x solution update run as ONE kernel on the all-gathered
    operand (ops/pallas/fused_minres.minres_shard_spmv_dot); the Lanczos
    projections + the β² partial as another (minres_update_dot).
    Collectives per iteration: one all_gather + one stacked (2,) psum +
    one psum — the same count as the fused CG path.  Same semantics as
    _sharded_minres (hist = φ̄², Jacobi-array preconditioning), f32."""
    from ..ops.pallas.fused_minres import (
        minres_shard_spmv_dot,
        minres_update_dot,
    )

    m = b_s.shape[0]
    offset = (jax.lax.axis_index(axis) * m).astype(jnp.int32).reshape(1)
    precond = inv_diag_s is not None
    d2 = (
        inv_diag_s.astype(jnp.float32).reshape(m // 128, 128)
        if precond
        else None
    )
    tol = tol_arr.astype(jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    b2 = b_s.astype(jnp.float32).reshape(m // 128, 128)
    x2 = x0_s.astype(jnp.float32).reshape(m // 128, 128)
    zl = jnp.zeros_like(b2)
    su0 = jnp.zeros((1, 8), jnp.float32)

    def gather(v2):
        return jax.lax.all_gather(
            v2.reshape(-1), axis, tiled=True).reshape(-1, bn)

    # r0 = b − A x0 (su = 0 makes the kernel's pending update a no-op)
    q0, _, _, _, _ = minres_shard_spmv_dot(
        blocks_s, cols_s, gather(x2), zl, zl, zl, zl, zl, su0, offset,
        interpret=interpret)
    r0 = b2 - q0.reshape(b2.shape)
    y0 = d2 * r0 if precond else r0
    beta1 = jnp.sqrt(jax.lax.psum(jnp.sum(r0 * y0), axis))
    hist = jnp.full((maxiter + 1,), jnp.nan, jnp.float32)
    hist = hist.at[0].set(beta1 * beta1)
    carry = (
        jnp.asarray(0, jnp.int32),                # k
        jnp.isnan(beta1) | (beta1 <= tol),        # done
        jnp.isnan(beta1),                         # nan
        x2, r0, r0, y0,                           # x (lags), r1, r2, y
        zl, zl, zl,                               # vprev, wm1, wm2
        zero, beta1,                              # oldb, beta
        zero, zero, beta1,                        # dbar, epsln, phibar
        -jnp.ones((), jnp.float32), zero,         # cs, sn
        zero, zero, zero, zero,                   # pending oldeps/delta/igamma/phi
        hist,
    )

    def body(c):
        (k, done, nan, x, r1, r2, y, vprev, wm1, wm2, oldb, beta, dbar,
         epsln, phibar, cs, sn, p_oldeps, p_delta, p_igamma, p_phi,
         hist) = c
        v_l = (y * (1.0 / beta)).astype(jnp.float32)
        r11 = lambda a_: a_.reshape(1, 1).astype(jnp.float32)
        su = jnp.concatenate(
            [jnp.zeros((1, 2), jnp.float32),  # inv_beta slot unused; shift=0
             r11(p_oldeps), r11(p_delta), r11(p_igamma), r11(p_phi),
             jnp.zeros((1, 2), jnp.float32)], axis=1)
        q_l, w_l, x_l, vq_p, vr1_p = minres_shard_spmv_dot(
            blocks_s, cols_s, gather(v_l), r1, vprev, wm1, wm2, x, su,
            offset, interpret=interpret)
        sums = jax.lax.psum(
            jnp.stack([vq_p[0, 0], vr1_p[0, 0]]), axis)
        vq, vr1 = sums[0], sums[1]
        noprev = oldb == 0
        c1 = jnp.where(noprev, 0.0, beta / jnp.where(noprev, 1.0, oldb))
        alfa = vq - c1 * vr1
        ia = alfa / beta
        r2n, bsq_l = minres_update_dot(
            q_l.reshape(r2.shape), r1, r2, r11(c1), r11(ia),
            inv_diag2d=d2, interpret=interpret)
        beta_n = jnp.sqrt(jax.lax.psum(bsq_l[0, 0], axis))

        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * beta_n
        dbar_n = -cs * beta_n
        tiny = jnp.asarray(jnp.finfo(jnp.float32).tiny, jnp.float32)
        gamma = jnp.maximum(
            jnp.sqrt(gbar * gbar + beta_n * beta_n), tiny)
        cs_n = gbar / gamma
        sn_n = beta_n / gamma
        phi = cs_n * phibar
        phibar_n = sn_n * phibar

        y_next = d2 * r2n if precond else r2n
        kn = k + 1
        hist = hist.at[kn].set(phibar_n * phibar_n)
        is_nan = jnp.isnan(phibar_n) | jnp.isnan(beta_n)
        done_n = is_nan | (phibar_n <= tol) | (beta_n == 0)
        return (kn, done_n, nan | is_nan, x_l, r2, r2n, y_next,
                v_l, w_l, wm1, beta, beta_n, dbar_n, epsln_n, phibar_n,
                cs_n, sn_n, oldeps, delta, 1.0 / gamma, phi, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    c = jax.lax.while_loop(cond, body, carry)
    (k, done, nan, x, r1, r2, y, vprev, wm1, wm2, oldb, beta, dbar,
     epsln, phibar, cs, sn, p_oldeps, p_delta, p_igamma, p_phi,
     hist) = c
    # flush the pending final solution update (local; no-op at k=0)
    w_fin = (vprev - p_oldeps * wm2 - p_delta * wm1) * p_igamma
    x = x + p_phi * w_fin
    rho = phibar * phibar
    rho = jnp.where(nan, jnp.asarray(jnp.nan, jnp.float32), rho)
    return x.reshape(-1), k, done, rho, rho, hist


def _sharded_pipelined_cg(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    recompute_r_every: int = 0,
):
    """Chronopoulos–Gear single-sync CG per shard: ONE psum (of the stacked
    [γ, δ] pair) per iteration instead of standard CG's two sequential
    reduction rounds — halves the collective latency on real meshes
    (solver/pipelined.py documents the recurrences and the rounding trade).
    ``recompute_r_every`` is the residual-replacement full restart — the
    pipelined recurrences drift like O(eps·κ), so it matters more here
    than in the standard loop (solver/pipelined.py)."""
    acc = jnp.promote_types(b_s.dtype, jnp.float32)

    def local_pair(r, s):
        part = jnp.stack([
            jnp.sum(r.astype(acc) * r.astype(acc)),
            jnp.sum(r.astype(acc) * s.astype(acc)),
        ])
        return jax.lax.psum(part, axis)  # the iteration's ONLY collective sum

    r0 = b_s - local_matvec(x0_s)
    gamma0 = jax.lax.psum(jnp.sum(r0.astype(acc) * r0.astype(acc)), axis)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=gamma0.dtype)
    hist = hist.at[0].set(gamma0)
    zerov = jnp.zeros_like(r0)
    one = jnp.ones_like(gamma0)
    carry = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
             jnp.asarray(True),  # fresh: next iteration = k==0 formulas
             x0_s, r0, zerov, zerov, gamma0, one, gamma0, hist)

    def body(c):
        k, done, fresh, x, r, p, q, gamma_old, alpha_old, rnorm, hist = c
        s = local_matvec(r)
        pair = local_pair(r, s)
        gamma, delta = pair[0], pair[1]
        # γ IS the pre-update ‖r_k‖² — the same quantity the standard path
        # tests (SURVEY §2.3(5)); it falls out of the single reduction, so
        # termination and history need NO extra collective.
        hist = hist.at[k].set(gamma)
        done = jnp.isnan(gamma) | (jnp.sqrt(gamma) <= tol_arr)
        exact = gamma == 0
        beta = jnp.where(fresh | exact, 0.0, gamma / gamma_old)
        denom = jnp.where(fresh, delta, delta - beta * gamma / alpha_old)
        safe = jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(exact, 0.0, gamma / safe)
        alpha = jnp.where(denom == 0, jnp.nan * one, alpha)
        alpha = jnp.where(exact, 0.0, alpha)
        p = r + (beta * p).astype(r.dtype)
        q = s + (beta * q).astype(s.dtype)
        x = (x + alpha * p).astype(x.dtype)
        r = (r - alpha * q).astype(r.dtype)
        return (k + 1, done, jnp.asarray(False), x, r, p, q, gamma, alpha,
                gamma, hist)

    def replace(c):
        # masked no-op convention (solver/restart.py; no `k < maxiter`)
        k, done, fresh, x, r, p, q, gamma_old, alpha_old, rnorm, hist = c
        restart = (~done) & (k % recompute_r_every == 0)
        r_t = b_s - local_matvec(x)
        rnorm_t = jax.lax.psum(
            jnp.sum(r_t.astype(acc) * r_t.astype(acc)), axis)
        r = jnp.where(restart, r_t, r)
        p = jnp.where(restart, 0.0, p).astype(p.dtype)
        q = jnp.where(restart, 0.0, q).astype(q.dtype)
        rnorm = jnp.where(restart, rnorm_t, rnorm)
        hist = hist.at[k].set(jnp.where(restart, rnorm_t, hist[k]))
        return (k, done, fresh | restart, x, r, p, q, gamma_old,
                alpha_old, rnorm, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    out = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda c: c[0], carry
    )
    k, done, x, r, hist = out[0], out[1], out[3], out[4], out[10]
    # one post-loop reduction records the final residual
    rnorm_final = jax.lax.psum(jnp.sum(r.astype(acc) * r.astype(acc)), axis)
    hist = hist.at[k].set(rnorm_final)
    return x, k, done, rnorm_final, rnorm_final, hist


def _sharded_pipelined_pcg(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    inv_diag_s,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    recompute_r_every: int = 0,
):
    """Ghysels–Vanroose pipelined PCG per shard: the preconditioned
    counterpart of :func:`_sharded_pipelined_cg`, still ONE psum per
    iteration — the THREE scalars the preconditioned recurrences need
    (γ = r·u, δ = w·u, and the termination observable ‖r‖²) stack into one
    reduction where standard PCG pays two sequential rounds.  Recurrences
    and rounding trade documented in solver/pipelined.py; ``inv_diag_s``
    follows _precond_apply's contract (Jacobi array or general callable —
    a callable may issue its own collectives, e.g. the sharded AMG
    V-cycle).  ``recompute_r_every`` is the residual-replacement full
    restart — essential for long f32 GV runs, whose recurrences drift
    like O(eps·κ) (solver/pipelined.py)."""
    acc = jnp.promote_types(b_s.dtype, jnp.float32)

    def triple(r, u, w):
        ra, ua, wa = r.astype(acc), u.astype(acc), w.astype(acc)
        part = jnp.stack([
            jnp.sum(ra * ua),
            jnp.sum(wa * ua),
            jnp.sum(ra * ra),
        ])
        return jax.lax.psum(part, axis)  # the iteration's ONLY reduction

    r0 = b_s - local_matvec(x0_s)
    u0 = _precond_apply(inv_diag_s, r0)
    w0 = local_matvec(u0)
    rnorm0 = jax.lax.psum(jnp.sum(r0.astype(acc) * r0.astype(acc)), axis)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    zerov = jnp.zeros_like(r0)
    one = jnp.ones_like(rnorm0)
    carry = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
             jnp.asarray(True),  # fresh: next iteration = k==0 formulas
             x0_s, r0, u0, w0, zerov, zerov, zerov, zerov,
             one, one, rnorm0, one, hist)

    def body(c):
        (k, done, fresh, x, r, u, w, z, q, s, p,
         gamma_old, alpha_old, rnorm, _rho, hist) = c
        gamma, delta, rr = [t for t in triple(r, u, w)]
        # rr IS the pre-update ‖r_k‖² — record + test it with NO extra
        # collective (matches the standard path's SURVEY §2.3(5) contract)
        hist = hist.at[k].set(rr)
        done = jnp.isnan(rr) | (jnp.sqrt(rr) <= tol_arr)
        m = _precond_apply(inv_diag_s, w)
        nu = local_matvec(m)
        exact = gamma == 0
        beta = jnp.where(fresh | exact, 0.0, gamma / gamma_old)
        denom = jnp.where(fresh, delta, delta - beta * gamma / alpha_old)
        safe = jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(denom == 0, jnp.nan * one, gamma / safe)
        alpha = jnp.where(exact, 0.0, alpha)
        z = nu + (beta * z).astype(nu.dtype)
        q = m + (beta * q).astype(m.dtype)
        s = w + (beta * s).astype(w.dtype)
        p = u + (beta * p).astype(u.dtype)
        x = (x + alpha * p).astype(x.dtype)
        r = (r - alpha * s).astype(r.dtype)
        u = (u - alpha * q).astype(u.dtype)
        w = (w - alpha * z).astype(w.dtype)
        return (k + 1, done, jnp.asarray(False), x, r, u, w, z, q, s, p,
                gamma, alpha, rr, gamma, hist)

    def replace(c):
        # masked no-op convention (solver/restart.py; no `k < maxiter`):
        # recompute the TRUE r/u/w from x, reset all four direction
        # recurrences
        (k, done, fresh, x, r, u, w, z, q, s, p,
         gamma_old, alpha_old, rnorm, rho, hist) = c
        restart = (~done) & (k % recompute_r_every == 0)
        r_t = b_s - local_matvec(x)
        u_t = _precond_apply(inv_diag_s, r_t)
        w_t = local_matvec(u_t)
        # one psum of the stacked [‖r‖², γ] pair (ρ = γ = r·u doubles as
        # the returned rho — replace it too, matching cg.py's replace)
        pair_t = jax.lax.psum(jnp.stack([
            jnp.sum(r_t.astype(acc) * r_t.astype(acc)),
            jnp.sum(r_t.astype(acc) * u_t.astype(acc)),
        ]), axis)
        rnorm_t, rho_t = pair_t[0], pair_t[1]
        r = jnp.where(restart, r_t, r)
        u = jnp.where(restart, u_t, u)
        w = jnp.where(restart, w_t, w)
        z = jnp.where(restart, 0.0, z).astype(z.dtype)
        q = jnp.where(restart, 0.0, q).astype(q.dtype)
        s = jnp.where(restart, 0.0, s).astype(s.dtype)
        p = jnp.where(restart, 0.0, p).astype(p.dtype)
        rnorm = jnp.where(restart, rnorm_t, rnorm)
        hist = hist.at[k].set(jnp.where(restart, rnorm_t, hist[k]))
        rho = jnp.where(restart, rho_t, rho)
        return (k, done, fresh | restart, x, r, u, w, z, q, s, p,
                gamma_old, alpha_old, rnorm, rho, hist)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    out = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda c: c[0], carry
    )
    k, done, x, r = out[0], out[1], out[3], out[4]
    rho, hist = out[14], out[15]
    # one post-loop reduction records the final residual
    rnorm_final = jax.lax.psum(jnp.sum(r.astype(acc) * r.astype(acc)), axis)
    hist = hist.at[k].set(rnorm_final)
    return x, k, done, rho, rnorm_final, hist


def _sharded_sstep_cg(
    local_matvec: Callable[[jax.Array], jax.Array],
    b_s: jax.Array,
    x0_s: jax.Array,
    tol_arr: jax.Array,
    maxiter: int,
    axis: str,
    s: int,
    rcond: float,
    basis_fn=None,
):
    """s-step (communication-avoiding) CG per shard: ONE psum — of the
    (3s+1)² stacked Gram — per s iterations, versus standard CG's 2s
    sequential reduction rounds.  The SpMV/halo count per iteration is
    unchanged (s matvecs per block) unless ``basis_fn`` fuses it (the DIA
    matrix-powers kernel drops the halos to 2 ppermutes per block too);
    what drops is collective LATENCY, the binding constraint for
    small-per-shard solves on large meshes.  Algebra and rounding trade
    documented in solver/sstep.py."""
    x, k, done, rnorm, hist = make_sstep_loop(
        local_matvec,
        lambda G: jax.lax.psum(G, axis),
        b_s,
        x0_s,
        s=s,
        tol_arr=tol_arr,
        maxiter=maxiter,
        rcond=rcond,
        basis_fn=basis_fn,
    )
    return x, k, done, rnorm, rnorm, hist


def _fused_shards_supported(blocks, b, with_m: bool, interpret: bool) -> bool:
    # with_m no longer disqualifies: Jacobi-PCG rides fused_update_dot_pcg
    # (round-3; the kernels existed since round 2 but were never wired)
    del with_m
    n_shards, nrb, kmax, bm, bn = blocks.shape
    m = b.shape[0] // n_shards  # rows per shard
    ok = (
        bm == bn
        and bn % 128 == 0
        and m % 128 == 0
        and jnp.dtype(b.dtype) == jnp.dtype(jnp.float32)
        and kmax <= 64
        # the all-gathered operand must sit in VMEM next to the tile pipeline
        and b.shape[0] * 4 + 2 * 8 * kmax * bm * bn * 4 <= 64 * 1024 * 1024
    )
    if not ok:
        return False
    if interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
