"""Fused-kernel BiCGStab driver for blocked-ELL operators (the TPU fast
path for NONSYMMETRIC systems).

Same algorithm, same semantics as solver/bicgstab.py (van der Vorst, both
half-steps per body, half-step early exit, ρ/ω/NaN breakdown exits
returning the last finite iterate) — but the iteration body is THREE
Pallas kernels instead of the ~25-op portable loop
(ops/pallas/fused_bicgstab.py):

    K1  p' = r + β(p − ω v);  p̂ = M⁻¹p';  v' = A p̂;  rv = r̂₀·v'
    K2  s = r − α v';  ŝ = M⁻¹s;  x_h = x + α p̂;  t = A ŝ;  ss/ts/tt
    K3  x' = x_h + ω ŝ;  r' = s − ω t;  rn = r'·r';  ρ' = r̂₀·r'

ρ for the NEXT iteration (r̂₀·r') is prefetched inside K3's pass — the
portable loop's leading dot disappears entirely.

Breakdown handling without hot-body vector selects: non-finite α/ω clamp
to 0 before their kernels (their updates become exact no-ops), the carry
keeps pass-through ``x_prev``/``rnorm_prev`` references (no copies — the
old buffers just stay alive one iteration), and ONE masked select after
the loop restores the portable loop's exact last-finite-iterate contract
for every breakdown class.  Half-step exits need no masking at all:
ω ← 0 makes K3 return (x_h, s) and rn = ‖s‖² by construction.

Float32-only, like the other fused paths; fused-vs-portable parity is
tested in interpret mode (tests/test_fused_bicgstab.py).

MEASURED OUTCOME (v5e, round 5 — why this is OPT-IN, not the default):
BiCGStab is 2-SpMV-dominated, so the vector-work fusion has little to
win — at n=256K (403 MB tiles, HBM-bound) fused and portable tie at
~1.1 ms/iter (0.92 of roofline, the engine bound); at n=64K (100 MB
tiles) XLA's while_loop keeps the operator VMEM-RESIDENT ACROSS
iterations and runs 66 us/iter where the fused path re-stages tiles
through the grid pipeline every call (317 us).  Contrast fused CG /
MINRES, whose single tile pass + in-pass reductions beat the portable
loop 1.2x.  ``bicgstab_solve(fused="always")`` reaches this path;
"auto" stays portable.  docs/performance.md has the full table.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import BlockedEllMatrix
from .bicgstab import BicgstabInfo
from .fused import fused_supported


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FusedBicgstabState:
    """Carry of the fused BiCGStab loop.  Vectors (rows, 128) f32;
    scalars (1, 1) f32.  ``xprev``/``rnorm_prev`` are pass-through
    references to the previous iterate (for the post-loop breakdown
    restore), not copies."""

    k: jax.Array
    done: jax.Array
    broke: jax.Array
    x: jax.Array
    xprev: jax.Array
    r: jax.Array
    rhat: jax.Array
    p: jax.Array
    v: jax.Array
    rho: jax.Array       # ρ_{k-1}
    rho_next: jax.Array  # ρ_k = r̂₀·r (prefetched by K3)
    alpha: jax.Array
    omega: jax.Array
    rnorm: jax.Array       # ‖r‖ (norm, matching BicgstabInfo)
    rnorm_prev: jax.Array
    hist: jax.Array

    def tree_flatten(self):
        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def fused_bicgstab_supported(a: Any, dtype=None,
                             interpret: bool = False) -> bool:
    """Fused-CG gate (square lane-aligned f32 tiles, square padding, TPU)
    on FULL blocked-ELL storage plus the K2 VMEM bound (9 whole-vector
    residents).  Sym* layouts don't apply — the domain is nonsymmetric."""
    if not isinstance(a, BlockedEllMatrix):
        return False
    if not fused_supported(a, dtype=dtype, interpret=interpret):
        return False
    _, tiles_per_row, bm, bn = a.blocks.shape
    _, mp = a.padded_shape
    return (
        10 * mp * 4 + 2 * 8 * tiles_per_row * bm * bn * 4
        <= 96 * 1024 * 1024
    )


def fused_bicgstab_init(a, b, x0, maxiter, d2d):
    np_, mp = a.padded_shape
    bn = a.bn
    n = b.shape[0]
    bp = jnp.zeros((mp,), jnp.float32).at[:n].set(b.astype(jnp.float32))
    if x0 is None:
        x2d = jnp.zeros((mp // bn, bn), jnp.float32)
        r2d = bp.reshape(mp // bn, bn)
    else:
        x0p = jnp.zeros((mp,), jnp.float32).at[:n].set(
            x0.astype(jnp.float32))
        ax = a.matvec(x0p).astype(jnp.float32)
        r2d = (bp - jnp.pad(ax, (0, mp - n))).reshape(mp // bn, bn)
        x2d = x0p.reshape(mp // bn, bn)
    rnsq = jnp.sum(r2d * r2d)
    rnorm0 = jnp.sqrt(rnsq)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)
    hist = hist.at[0].set(rnorm0)
    one = jnp.ones((1, 1), jnp.float32)
    return FusedBicgstabState(
        k=jnp.asarray(0, jnp.int32),
        done=jnp.isnan(rnorm0),  # tol test joins in the driver
        broke=jnp.isnan(rnorm0),
        x=x2d, xprev=x2d, r=r2d, rhat=r2d,
        p=jnp.zeros_like(r2d), v=jnp.zeros_like(r2d),
        rho=one, rho_next=rnsq.reshape(1, 1),
        alpha=one, omega=one,
        rnorm=rnorm0.reshape(1, 1), rnorm_prev=rnorm0.reshape(1, 1),
        hist=hist,
    )


def fused_bicgstab_step(a, s: FusedBicgstabState, tol: jax.Array,
                        d2d=None, interpret: bool = False):
    """One full BiCGStab iteration in three fused kernels.  Semantics ==
    solver/bicgstab.bicgstab_step with the breakdown masking moved to the
    driver's post-loop select (see module docstring)."""
    from ..ops.pallas.fused_bicgstab import (
        bicgstab_dir_spmv_dot,
        bicgstab_s_spmv_dot,
        bicgstab_update_dot,
    )

    r11 = lambda a_: a_.reshape(1, 1).astype(jnp.float32)
    rho_new = s.rho_next[0, 0]
    beta = (rho_new / s.rho[0, 0]) * (s.alpha[0, 0] / s.omega[0, 0])
    beta_c = jnp.where(jnp.isfinite(beta), beta, 0.0)
    p_new, phat, v_new, rv = bicgstab_dir_spmv_dot(
        a.blocks, a.block_cols, s.r, s.p, s.v, s.rhat,
        r11(beta_c), s.omega, inv_diag2d=d2d, interpret=interpret)

    alpha = rho_new / rv[0, 0]
    alpha_c = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
    sv, shat, xh, t, ss, ts, tt = bicgstab_s_spmv_dot(
        a.blocks, a.block_cols, s.r, v_new.reshape(s.r.shape), s.x, phat,
        r11(alpha_c), inv_diag2d=d2d, interpret=interpret)

    snorm = jnp.sqrt(ss[0, 0])
    half_done = snorm <= tol
    omega = ts[0, 0] / tt[0, 0]
    # ω ← 0 on the half-step exit: K3 then returns (x_h, s) and
    # rn = ‖s‖² — the portable loop's half-step state, no masking needed
    omega_c = jnp.where(jnp.isfinite(omega) & ~half_done, omega, 0.0)
    x_new, r_new, rn, rho_pref = bicgstab_update_dot(
        xh, shat, sv, t.reshape(s.r.shape), s.rhat,
        r11(omega_c), interpret=interpret)
    rnorm_full = jnp.sqrt(rn[0, 0])

    finite = (
        jnp.isfinite(beta) & jnp.isfinite(alpha) & jnp.isfinite(omega)
        & jnp.isfinite(rnorm_full)
    )
    broke = ~finite & ~half_done
    rnorm_new = rnorm_full  # == snorm on half_done by construction
    converged_now = half_done | (finite & (rnorm_full <= tol))
    broke = broke | (
        finite & ((omega == 0) | (rho_new == 0)) & ~converged_now)

    k = s.k + 1
    hist = s.hist.at[k].set(rnorm_new)
    return FusedBicgstabState(
        k=k,
        done=s.done | converged_now | broke,
        broke=s.broke | broke,
        x=x_new, xprev=s.x,  # pass-through reference, not a copy
        r=r_new, rhat=s.rhat, p=p_new, v=v_new.reshape(s.r.shape),
        rho=r11(rho_new), rho_next=rho_pref,
        alpha=r11(alpha), omega=r11(omega),
        rnorm=r11(rnorm_new), rnorm_prev=s.rnorm,
        hist=hist,
    )


@functools.partial(
    jax.jit, static_argnames=("maxiter", "interpret", "with_m")
)
def _fused_bicgstab_core(a, b, x0, tol_arr, inv_diag, maxiter, interpret,
                         with_m):
    n = a.shape[0]
    _, mp = a.padded_shape
    bn = a.bn
    d2d = None
    if with_m:
        d2d = (
            jnp.ones((mp,), jnp.float32)
            .at[:n].set(inv_diag.astype(jnp.float32))
            .reshape(mp // bn, bn)
        )
    s0 = fused_bicgstab_init(a, b, x0, maxiter, d2d)
    s0 = dataclasses.replace(
        s0, done=s0.done | (s0.rnorm[0, 0] <= tol_arr))

    def cond(s):
        return (s.k < maxiter) & (~s.done)

    def body(s):
        return fused_bicgstab_step(a, s, tol_arr, d2d=d2d,
                                   interpret=interpret)

    s = jax.lax.while_loop(cond, body, s0)
    # the ONE breakdown select, outside the loop: a broke final body keeps
    # the last finite iterate and reported residual (solver/bicgstab.py's
    # in-body masking, applied once instead of every iteration)
    final_broke = s.broke & (s.k > 0)
    x2d = jnp.where(final_broke, s.xprev, s.x)
    rnorm = jnp.where(final_broke, s.rnorm_prev[0, 0], s.rnorm[0, 0])
    hist = s.hist.at[s.k].set(
        jnp.where(final_broke, s.rnorm_prev[0, 0], s.hist[s.k]))
    x = x2d.reshape(-1)[:n]
    xp = jnp.zeros((mp,), jnp.float32).at[:n].set(x)
    ax = a.matvec(xp).astype(jnp.float32)
    r_true = b.astype(jnp.float32) - ax[:n]
    info = BicgstabInfo(
        iterations=s.k,
        converged=s.done & ~s.broke,
        breakdown=s.broke,
        rnorm=rnorm,
        rnorm_history=hist,
        rnorm_true=jnp.sqrt(jnp.sum(r_true * r_true)),
    )
    return x.astype(b.dtype), info


def fused_bicgstab_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, BicgstabInfo]:
    """Whole fused BiCGStab solve in one jitted ``lax.while_loop`` — the
    drop-in fast path :func:`~conjugategradient_tpu.bicgstab_solve`
    dispatches to on TPU for fused-capable blocked-ELL operators.

    ``inv_diag`` (optional) is a Jacobi diagonal folded into both tile
    passes; general ``M`` callables stay on the portable loop.
    """
    if not isinstance(A, BlockedEllMatrix):
        raise TypeError(
            "fused_bicgstab_solve needs a full blocked-ELL operator "
            f"(got {type(A).__name__}); bicgstab_solve dispatches here"
        )
    n = A.shape[0]
    maxiter = n if maxiter is None else int(maxiter)
    tol_arr = jnp.asarray(tol, jnp.float32)
    return _fused_bicgstab_core(
        A, b, x0, tol_arr, inv_diag, maxiter, interpret,
        inv_diag is not None,
    )
