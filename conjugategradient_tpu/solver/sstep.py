"""s-step (communication-avoiding) CG — Chronopoulos–Gear block variant.

Standard CG needs TWO sequential global reductions per iteration (the
reference's ``value2``/``value3`` device scalars, CG.hpp:378,406); the
pipelined variant (solver/pipelined.py) gets that down to one.  On a chip
mesh, collective LATENCY — not bandwidth — bounds small-per-shard solves,
so the remaining lever is fewer reduction rounds per unit of progress.

The s-step reformulation (Chronopoulos & Gear 1989; the stable block form
follows Carson's framing) advances CG by ``s`` iterations per reduction:

    per block:  K = [r, Ar, …, Aˢr]              (s matvecs — SAME SpMV
                                                  traffic per iteration as
                                                  standard CG)
                G = UᵀU,  U = [K, P₋, W₋]        (ONE (3s+1)² Gram —
                                                  one psum per s steps)
                B = −(P₋ᵀW₋)⁺ (W₋ᵀR)             (A-conjugate the new block
                                                  against the previous one)
                P = R + P₋B,   W = AP = S + W₋B  (local skinny algebra;
                                                  R = K[:,:s], S = K[:,1:])
                a = (PᵀW)⁺ (Pᵀr)                 (A-norm-optimal s-dim step)
                x += Pa,   r −= Wa

In exact arithmetic the block update equals s consecutive CG iterations
(P spans the same Krylov space CG's next s directions span, and the block
solve minimizes the A-norm error over it), so x after block j equals CG's
x_{js}.  Every inner product above is an entry of the ONE stacked Gram G,
so a block costs exactly one collective; small (≤(3s+1)²) solves use the
eigh pseudo-inverse (rank-deficient blocks — Krylov grade < s, i.e. exact
convergence mid-block — get the exact least-squares step instead of a
breakdown).

Floating-point trade: the monomial basis K conditions like κ(A)ˢ, so
rounding grows with ``s`` — s ∈ {2..4} is the production range (default 4);
the Gram solves are diagonally equilibrated and the basis coordinates are
normalized via diag(G) to push the usable range.  Semantics vs the
framework contract (SURVEY §2.3): tolerance is tested on the pre-block
‖r‖² (the same pre-update quantity, at block granularity), the detecting
block still updates and counts (the framework's one-update-late semantics
— at s=1 the iteration count equals plain CG's exactly), NaN exits, the
cap may overshoot ``maxiter`` by at most s−1 — documented differences of
an extension solver, like pipelined's rounding trade.

Reference for the role this plays: the two per-iteration reduction scalars
the reference synchronizes on (``/root/reference/src/CG.hpp:378-417``)
become one (3s+1)² Gram per s iterations.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from .blockcg import _spd_pinv_apply, default_gram_rcond
from .cg import CGInfo

_HI = jax.lax.Precision.HIGHEST


# one measured ladder for every Gram cutoff in the framework
_default_rcond = default_gram_rcond


def _eq_pinv_apply(M: jax.Array, Y: jax.Array, rcond: float) -> jax.Array:
    """Diagonally equilibrated SPD pseudo-inverse apply: M⁺Y computed as
    D⁻¹ (D⁻¹MD⁻¹)⁺ D⁻¹Y with D = √diag(M) — the monomial-basis Gram's
    diagonal spans many orders of magnitude (‖Aᵏr‖² ~ λᵏ), and without
    equilibration the relative eigenvalue cutoff throws away the small-
    diagonal directions wholesale."""
    dt = jnp.promote_types(M.dtype, jnp.float32)
    diag = jnp.abs(jnp.diagonal(M)).astype(dt)
    d = jnp.sqrt(jnp.where(diag > 0, diag, 1.0))
    Ms = M.astype(dt) / d[:, None] / d[None, :]
    Ys = Y.astype(dt) / d[:, None] if Y.ndim == 2 else Y.astype(dt) / d
    out = _spd_pinv_apply(Ms, Ys if Ys.ndim == 2 else Ys[:, None], rcond)
    out = out / d[:, None] if Y.ndim == 2 else out[:, 0] / d
    return out.astype(Y.dtype)


def make_sstep_loop(
    matvec: Callable[[jax.Array], jax.Array],
    reduce_gram: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array,
    *,
    s: int,
    tol_arr: jax.Array,
    maxiter: int,
    rcond: float,
    basis_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
):
    """The s-step loop body shared by the single-device and sharded solvers.

    ``matvec`` maps a (possibly shard-local) vector to A·v; ``reduce_gram``
    maps the local (3s+1, 3s+1) Gram partial to the global Gram (identity on
    one device, a single ``psum`` under shard_map); ``basis_fn`` optionally
    replaces the matvec-at-a-time Krylov basis with a fused one (e.g. the
    banded matrix-powers kernel, parallel/sharded_cg._make_dia_mpk_basis —
    one halo exchange per block instead of s).  Returns
    ``(x, k, done, rnorm, hist)`` with the framework's carry conventions.
    """
    acc = jnp.promote_types(b.dtype, jnp.float32)
    n_local = b.shape[0]

    def gram(U):
        G_local = jnp.einsum(
            "in,jn->ij", U.astype(acc), U.astype(acc), precision=_HI
        )
        return reduce_gram(G_local)

    def basis(r, inv_nu):
        """Scaled monomial basis K'_j = (A/ν)ʲ r stacked as (s+1, n_local)
        rows.  The scale ν (carried across blocks, adapted from the Gram's
        own diagonal) keeps every basis row at comparable magnitude — the
        raw monomial basis grows like λmaxˢ per block, which overflows the
        usable f32 range on ill-conditioned operators long before the Gram
        algebra breaks down (measured: NaN at block 21 on the 1.5M
        power-law at s=4/f32; scaled, the same solve runs to tolerance).
        A·K'_j = ν·K'_{j+1}, so ν reappears only as scalar factors on the
        S-terms of PᵀW and dr below — the span, and therefore the exact-
        arithmetic equivalence to s CG steps, is unchanged.
        """
        if basis_fn is not None:
            return basis_fn(r, inv_nu)
        rows = [r]
        for _ in range(s):
            nxt = matvec(rows[-1]).astype(acc) * inv_nu
            rows.append(nxt.astype(r.dtype))
        return jnp.stack(rows, axis=0)

    r0 = b - matvec(x0)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=acc)
    zeros_block = jnp.zeros((s, n_local), dtype=b.dtype)
    eye_s = jnp.eye(s, dtype=acc)

    carry = (
        jnp.asarray(0, jnp.int32),  # k — inner iterations completed
        jnp.asarray(False),  # done
        x0,
        r0,
        zeros_block,  # P₋ rows (s, n) — previous block's directions
        zeros_block,  # W₋ = A·P₋ rows
        jnp.asarray(1.0, acc),  # ν — the monomial-basis scale
        jnp.asarray(jnp.nan, acc),  # last observed ‖r‖² (pre-block)
        hist,
    )

    def body(c):
        k, done, x, r, Pb, Wb, nu, _, hist = c
        K = basis(r, 1.0 / nu)  # (s+1, n)
        U = jnp.concatenate([K, Pb.astype(K.dtype), Wb.astype(K.dtype)], 0)
        G = gram(U)  # (3s+1, 3s+1) — the block's ONLY collective

        # index blocks of G: K → 0..s, P₋ → s+1..2s, W₋ → 2s+1..3s
        iR = slice(0, s)
        iS = slice(1, s + 1)
        iP = slice(s + 1, 2 * s + 1)
        iW = slice(2 * s + 1, 3 * s + 1)

        rho = G[0, 0]  # pre-block ‖r_k‖² — the §2.3 termination observable
        hist_new = hist.at[k].set(rho)
        done_now = jnp.isnan(rho) | (jnp.sqrt(rho) <= tol_arr)

        first = k == 0
        # conjugation against the previous block: B = −(P₋ᵀW₋)⁺(W₋ᵀR).
        # First block: P₋ = W₋ = 0 ⇒ W₋ᵀR = 0 ⇒ B = 0 (identity-guarded
        # Gram keeps the pinv well-posed).
        PbtWb = jnp.where(first, eye_s, G[iP, iW])
        B = -_eq_pinv_apply(PbtWb, G[iW, iR], rcond)  # (s, s)

        # ν enters exactly where A·R = ν·S does: the S-terms of PᵀW and dr
        RtS = G[iR, iS]
        # all small-matrix algebra pins precision=HIGHEST: the MXU's
        # default f32 matmul rounds through bf16, which feeds straight
        # into the step coefficients (CLAUDE.md precision rule)
        mm = lambda X, Y: jnp.matmul(X, Y, precision=_HI)
        PtW = (
            nu * (RtS + mm(B.T, G[iP, iS]))
            + mm(G[iR, iW] + mm(B.T, G[iP, iW]), B)
        )
        Ptr = G[iR, 0] + mm(B.T, G[iP, 0])
        a = _eq_pinv_apply(PtW, Ptr, rcond)  # (s,)

        # local skinny updates (row-stacked bases: P = R + BᵀP₋ rowwise)
        R_rows, S_rows = K[:s], K[1:]
        c_prev = mm(B, a)  # previous-block coefficient of the step
        dx = jnp.einsum("i,in->n", a, R_rows.astype(acc), precision=_HI)
        dx = dx + jnp.einsum("i,in->n", c_prev, Pb.astype(acc), precision=_HI)
        dr = nu * jnp.einsum("i,in->n", a, S_rows.astype(acc), precision=_HI)
        dr = dr + jnp.einsum("i,in->n", c_prev, Wb.astype(acc), precision=_HI)
        x_new = (x.astype(acc) + dx).astype(x.dtype)
        r_new = (r.astype(acc) - dr).astype(r.dtype)
        P_new = (
            R_rows.astype(acc) + mm(B.T.astype(acc), Pb.astype(acc))
        ).astype(b.dtype)
        W_new = (
            nu * S_rows.astype(acc) + mm(B.T.astype(acc), Wb.astype(acc))
        ).astype(b.dtype)

        # adapt ν so the NEXT block's scaled rows stay O(‖r‖): the observed
        # per-level growth of this block's scaled basis is
        # (G[s,s]/G[0,0])^(1/2s); fold it into ν (guarded — a converged or
        # broken block leaves ν alone)
        g = (G[s, s] / rho) ** (1.0 / (2 * s))
        nu_new = jnp.where(jnp.isfinite(g) & (g > 0), nu * g, nu)

        # The detecting block still applies its update and counts — the
        # framework's one-update-late convergence semantics (solver/cg.py
        # tests the PRE-update ρ_k; pipelined does the same), at block
        # granularity.  Exactly-converged blocks are a no-op: r = 0 ⇒
        # G = 0 ⇒ the equilibrated pinv returns a = B = 0.
        return (k + s, done_now, x_new, r_new, P_new, W_new, nu_new, rho,
                hist_new)

    def cond(c):
        return (c[0] < maxiter) & (~c[1])

    k, done, x, r, Pb, Wb, nu, rho, hist = jax.lax.while_loop(
        cond, body, carry
    )
    # one post-loop reduction records the final true recurrence residual
    # (k may overshoot maxiter by ≤ s−1; clamp the history slot)
    rnorm = gram(r[None, :].astype(acc))[0, 0]
    hist = hist.at[jnp.minimum(k, maxiter)].set(rnorm)
    return x, k, done, rnorm, hist


def sstep_cg_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    s: int = 4,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    n: Optional[int] = None,
    rcond: Optional[float] = None,
) -> Tuple[jax.Array, CGInfo]:
    """Solve SPD ``A x = b`` with s-step CG: one global reduction per ``s``
    iterations.  Same call shape and CGInfo contract as
    :func:`~conjugategradient_tpu.cg_solve`, with block-granular semantics:
    the tolerance is tested on the pre-block ‖r‖², ``iterations`` advances
    in multiples of ``s`` (overshooting ``maxiter`` by at most s−1), and
    ``rho_history`` holds ‖r‖² at block boundaries (NaN between).
    """
    if s < 1:
        raise ValueError(f"s must be >= 1, got {s}")
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    N = op.shape[0]
    maxiter = int(N + 1 if maxiter is None else maxiter)
    rcond = _default_rcond(b.dtype) if rcond is None else float(rcond)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    return _solve_core(op, b, x0, tol_arr, int(s), maxiter, rcond)


@functools.partial(jax.jit, static_argnames=("s", "maxiter", "rcond"))
def _solve_core(op, b, x0, tol_arr, s, maxiter, rcond):
    x, k, done, rnorm, hist = make_sstep_loop(
        op.matvec,
        lambda G: G,
        b,
        x0,
        s=s,
        tol_arr=tol_arr,
        maxiter=maxiter,
        rcond=rcond,
    )
    info = CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rnorm,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info
