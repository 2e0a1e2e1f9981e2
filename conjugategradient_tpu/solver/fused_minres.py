"""Fused-kernel MINRES driver for blocked-ELL operators (the TPU fast path).

Same algorithm, same semantics as solver/minres.py (Paige–Saunders Lanczos
+ Givens recurrence, absolute-φ̄ termination, NaN/β=0 exits) — but the
iteration body is TWO Pallas kernels instead of the ~10-dispatch portable
loop, mirroring what solver/fused.py does for CG (the reference's iteration
kernel shape is identical: 1 SpMV + 2 reductions, CG.hpp:374-407):

    K1  [apply the PREVIOUS iteration's solution update]
        v = (M⁻¹ r2)/β;  q = (A − σI)·v;  vq = v·q;  vr1 = v·r1
                                        (ops/pallas/fused_minres)
    K2  r2' = q − c1·r1 − (α/β)·r2;  β'² = r2'·(M⁻¹ r2')

The solution update (w_k, x_k) of iteration k needs the Givens scalars
that depend on β_{k+1}, so it is HOISTED into iteration k+1's tile pass —
identical algebra, no third pass over HBM; the tail update is flushed once
after the loop.  The ~15-flop Givens/scalar recurrence between the kernels
runs as plain XLA scalar ops on (1, 1) device arrays (fused to a few tiny
kernels; never leaves the device — LinearAlgebraTypes.hpp:210-250).

Float32-only, like the fused CG path; the float64 parity oracle runs the
portable solver on CPU.  Fused-vs-portable consistency is tested in
interpret mode (tests/test_fused_minres.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import BlockedEllMatrix, SymBellMatrix
from .fused import _auto_mirror, fused_supported
from .minres import MinresInfo


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FusedMinresState:
    """Carry of the fused MINRES loop.  Vectors live as (rows, 128) f32
    blocks; scalars as (1, 1) f32 so they pack into the kernels' SMEM rows
    without relayout.  ``vprev``/``wm1``/``wm2`` and the ``p_*`` scalars
    hold the PENDING solution update hoisted into the next K1."""

    k: jax.Array
    done: jax.Array
    nan: jax.Array
    x: jax.Array       # x_{k-1} (one update behind; flushed at exit)
    r1: jax.Array      # Lanczos v_{k-1} scaled (un-normalized)
    r2: jax.Array      # Lanczos v_k scaled
    vprev: jax.Array   # v_k (normalized) — operand of the pending update
    wm1: jax.Array     # w_{k-1}
    wm2: jax.Array     # w_{k-2}
    beta: jax.Array    # β_{k+1}
    oldb: jax.Array    # β_k
    dbar: jax.Array
    epsln: jax.Array
    phibar: jax.Array  # residual-norm estimate ‖r_k‖_M
    cs: jax.Array
    sn: jax.Array
    p_oldeps: jax.Array  # pending-update Givens scalars (iteration k's)
    p_delta: jax.Array
    p_igamma: jax.Array  # 1/γ; 0 ⇒ no pending update (first iteration)
    p_phi: jax.Array
    hist: jax.Array

    def tree_flatten(self):
        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def fused_minres_supported(a: Any, dtype=None, interpret: bool = False) -> bool:
    """Whether the fused MINRES path can run this operator: the fused-CG
    gate (square lane-aligned tiles, f32, square padded shape, TPU) PLUS a
    tighter VMEM bound — K1 keeps 10 whole vectors + scratch resident
    (r2, r1, vprev, wm1, wm2, x in; v, w, x' out; the operand scratch)
    where CG keeps 5."""
    if not fused_supported(a, dtype=dtype, interpret=interpret):
        return False
    if isinstance(a, SymBellMatrix):
        tiles_per_row = 1 + a.ku
        bm, bn = a.bm, a.bn
        _, mp = a.padded_shape
    else:
        _, tiles_per_row, bm, bn = a.blocks.shape
        _, mp = a.padded_shape
    vec_bytes = mp * 4
    return (
        11 * vec_bytes + 2 * 8 * tiles_per_row * bm * bn * 4
        <= 96 * 1024 * 1024
    )


def _pack_su(inv_beta, shift, p_oldeps, p_delta, p_igamma, p_phi):
    z = jnp.zeros((1, 1), jnp.float32)
    return jnp.concatenate(
        [inv_beta, shift, p_oldeps, p_delta, p_igamma, p_phi, z, z], axis=1
    )


def fused_minres_init(
    a, b: jax.Array, x0: Optional[jax.Array], maxiter: int,
    inv_diag2d: Optional[jax.Array], shift2: jax.Array,
    tol: jax.Array = 0.0,
) -> FusedMinresState:
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
        r = bp - jnp.pad(ax, (0, mp - n)) + shift2[0, 0] * x0p
        x2d = x0p.reshape(mp // bn, bn)
        r2d = r.reshape(mp // bn, bn)
    y0 = r2d if inv_diag2d is None else inv_diag2d * r2d
    beta1_sq = jnp.sum(r2d * y0)
    beta1 = jnp.sqrt(beta1_sq)  # NaN iff M not SPD on r0
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)
    hist = hist.at[0].set(beta1)
    zero = jnp.zeros((1, 1), jnp.float32)
    z2d = jnp.zeros_like(r2d)
    return FusedMinresState(
        k=jnp.asarray(0, jnp.int32),
        done=jnp.isnan(beta1) | (beta1 <= tol),
        nan=jnp.isnan(beta1),
        x=x2d, r1=r2d, r2=r2d,
        vprev=z2d, wm1=z2d, wm2=z2d,
        beta=beta1.reshape(1, 1),
        oldb=zero, dbar=zero, epsln=zero,
        phibar=beta1.reshape(1, 1),
        cs=-jnp.ones((1, 1), jnp.float32), sn=zero,
        p_oldeps=zero, p_delta=zero, p_igamma=zero, p_phi=zero,
        hist=hist,
    )


def fused_minres_step(
    a, s: FusedMinresState, tol: jax.Array, shift2: jax.Array,
    inv_diag2d: Optional[jax.Array] = None, interpret: bool = False,
) -> FusedMinresState:
    """One MINRES iteration in two fused kernels + the scalar Givens tail.
    Semantics == solver/minres.minres_step (same recurrence, same exits);
    the ONLY structural difference is the one-iteration lag on x (flushed
    by the driver)."""
    from ..ops.pallas.fused_minres import (
        minres_dir_spmv_dot,
        minres_update_dot,
        sym_minres_dir_spmv_dot,
    )

    inv_beta = (1.0 / s.beta).astype(jnp.float32)
    su = _pack_su(inv_beta, shift2, s.p_oldeps, s.p_delta,
                  s.p_igamma, s.p_phi)
    if isinstance(a, SymBellMatrix):
        v, q, wnew, xnew, vq, vr1 = sym_minres_dir_spmv_dot(
            a.diag_blocks, a.off_blocks, a.off_cols,
            s.r2, s.r1, s.vprev, s.wm1, s.wm2, s.x, su,
            inv_diag2d=inv_diag2d, interpret=interpret,
            mirror=_auto_mirror(a),
        )
    else:
        v, q, wnew, xnew, vq, vr1 = minres_dir_spmv_dot(
            a.blocks, a.block_cols,
            s.r2, s.r1, s.vprev, s.wm1, s.wm2, s.x, su,
            inv_diag2d=inv_diag2d, interpret=interpret,
        )

    beta0 = s.beta[0, 0]
    oldb0 = s.oldb[0, 0]
    noprev = oldb0 == 0  # first step: no v_{k-1} term
    c1 = jnp.where(noprev, 0.0, beta0 / jnp.where(noprev, 1.0, oldb0))
    alfa = vq[0, 0] - c1 * vr1[0, 0]
    ia = alfa / beta0
    r2new, bsq = minres_update_dot(
        q.reshape(s.r2.shape), s.r1, s.r2,
        c1.reshape(1, 1), ia.reshape(1, 1),
        inv_diag2d=inv_diag2d, interpret=interpret,
    )
    beta_new = jnp.sqrt(bsq[0, 0])  # NaN iff M not SPD

    # --- Givens tail (scalar XLA ops, device-resident) -------------------
    cs0, sn0, dbar0 = s.cs[0, 0], s.sn[0, 0], s.dbar[0, 0]
    oldeps = s.epsln[0, 0]
    delta = cs0 * dbar0 + sn0 * alfa
    gbar = sn0 * dbar0 - cs0 * alfa
    epsln_new = sn0 * beta_new
    dbar_new = -cs0 * beta_new
    tiny = jnp.asarray(jnp.finfo(jnp.float32).tiny, jnp.float32)
    gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta_new * beta_new), tiny)
    cs_new = gbar / gamma
    sn_new = beta_new / gamma
    phibar0 = s.phibar[0, 0]
    phi = cs_new * phibar0
    phibar_new = sn_new * phibar0

    k = s.k + 1
    hist = s.hist.at[k].set(phibar_new)
    is_nan = jnp.isnan(phibar_new) | jnp.isnan(beta_new)
    done = is_nan | (phibar_new <= tol) | (beta_new == 0)
    r11 = lambda a_: a_.reshape(1, 1)
    return FusedMinresState(
        k=k, done=done, nan=s.nan | is_nan,
        x=xnew, r1=s.r2, r2=r2new,
        vprev=v, wm1=wnew, wm2=s.wm1,
        beta=r11(beta_new), oldb=s.beta,
        dbar=r11(dbar_new), epsln=r11(epsln_new),
        phibar=r11(phibar_new), cs=r11(cs_new), sn=r11(sn_new),
        p_oldeps=r11(oldeps), p_delta=r11(delta),
        p_igamma=r11(1.0 / gamma), p_phi=r11(phi),
        hist=hist,
    )


@functools.partial(
    jax.jit, static_argnames=("maxiter", "interpret", "with_m")
)
def _fused_minres_core(a, b, x0, tol_arr, shift2, inv_diag, maxiter,
                       interpret, with_m):
    n = a.shape[0]
    _, mp = a.padded_shape
    bn = a.bn
    d2d = None
    if with_m:
        # padding slots get d=1 (inert: r is zero there)
        d2d = (
            jnp.ones((mp,), jnp.float32)
            .at[:n].set(inv_diag.astype(jnp.float32))
            .reshape(mp // bn, bn)
        )
    s0 = fused_minres_init(a, b, x0, maxiter, d2d, shift2, tol=tol_arr)

    def cond(s: FusedMinresState):
        return (s.k < maxiter) & (~s.done)

    def body(s: FusedMinresState):
        return fused_minres_step(a, s, tol_arr, shift2, inv_diag2d=d2d,
                                 interpret=interpret)

    s = jax.lax.while_loop(cond, body, s0)
    # flush the pending solution update of the final iteration (no-op when
    # zero iterations ran: p_igamma = p_phi = 0)
    w_fin = (s.vprev - s.p_oldeps[0, 0] * s.wm2
             - s.p_delta[0, 0] * s.wm1) * s.p_igamma[0, 0]
    x2d = s.x + s.p_phi[0, 0] * w_fin
    x = x2d.reshape(-1)[:n]
    # true ‖b − (A−σI)x‖₂ honesty check (one extra SpMV, like the portable)
    xp = jnp.zeros((mp,), jnp.float32).at[:n].set(x)
    ax = a.matvec(xp).astype(jnp.float32)
    r_true = (b.astype(jnp.float32) - ax[:n] + shift2[0, 0] * x)
    info = MinresInfo(
        iterations=s.k,
        converged=s.done & ~s.nan,
        rnorm=s.phibar[0, 0],
        rnorm_history=s.hist,
        rnorm_true=jnp.sqrt(jnp.sum(r_true * r_true)),
    )
    return x.astype(b.dtype), info


def fused_minres_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    shift: float = 0.0,
    inv_diag: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, MinresInfo]:
    """Whole fused MINRES solve in one jitted ``lax.while_loop`` — the
    drop-in fast path :func:`~conjugategradient_tpu.minres_solve`
    dispatches to on TPU for fused-capable blocked-ELL operators.

    ``inv_diag`` (optional) is a POSITIVE diagonal Jacobi preconditioner
    (the M⁻¹ apply folds into both kernels, like fused Jacobi-PCG);
    general ``M`` callables stay on the portable loop.
    """
    if not isinstance(A, (BlockedEllMatrix, SymBellMatrix)):
        raise TypeError(
            "fused_minres_solve needs a blocked-ELL operator "
            f"(got {type(A).__name__}); minres_solve dispatches here"
        )
    n = A.shape[0]
    maxiter = n if maxiter is None else int(maxiter)
    tol_arr = jnp.asarray(tol, jnp.float32)
    shift2 = jnp.full((1, 1), shift, jnp.float32)
    return _fused_minres_core(
        A, b, x0, tol_arr, shift2, inv_diag, maxiter, interpret,
        inv_diag is not None,
    )
