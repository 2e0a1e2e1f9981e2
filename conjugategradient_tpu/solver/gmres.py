"""GMRES(m) — restarted minimal-residual solver for NONSYMMETRIC systems.

Extension beyond the reference: the reference solves SPD systems only
(CG.hpp:255-454).  BiCGStab (solver/bicgstab.py) covers nonsymmetric
systems cheaply but can stagnate or break down (its shadow-residual
de-correlation has no guarantee); GMRES is the robust general-purpose
workhorse — monotonically non-increasing residual norms within a cycle,
no breakdown short of Krylov-space exhaustion (which means the exact
solution was found).  Together CG / MINRES / BiCGStab / GMRES complete
the Krylov matrix a reference user eventually needs.

TPU shape (the part that differs from a textbook port):

* ONE jitted ``lax.while_loop`` over restart cycles with a masked
  ``lax.fori_loop`` over the m Arnoldi steps — zero host round-trips,
  static shapes (basis ``V`` is a fixed ``(m+1, n)`` array), every
  recurrence scalar device-resident (the reference's device-``Scalar``
  contract, LinearAlgebraTypes.hpp:210-250).
* Orthogonalization is **CGS2** (classical Gram-Schmidt, applied twice):
  each Arnoldi step is two dense ``(m+1, n) @ (n,)`` products + two
  rank-1-ish corrections — four MXU-friendly matmuls — instead of
  modified Gram-Schmidt's j sequential dot/axpy round-trips.  CGS2's
  orthogonality loss is O(eps) like MGS (Giraud et al. 2005), and on TPU
  the matmul form runs at memory speed where an MGS chain would serialize
  m reductions.  Matmuls carry ``Precision.HIGHEST`` — the TPU MXU's
  default f32 path rounds through bf16, which corrupts Krylov recurrences
  (house rule, docs/performance.md).
* The ``(m+1, m)`` Hessenberg never materializes: Givens rotations are
  applied on device as columns arrive, so the in-cycle residual norm
  ``|g_{j+1}|`` is a free scalar observable and the end-of-cycle solve is
  one small triangular solve.
* Preconditioning is RIGHT preconditioning (solve ``A M u = b``,
  ``x = x0 + M z``): the residual the solver observes and tests is the
  TRUE residual ``b - A x``, matching the house absolute-``‖r‖``
  termination convention (CG.hpp:255,401-402) — left preconditioning
  (scipy's default) would test ``‖M(b - Ax)‖`` instead.

Termination tests the in-cycle Givens estimate per step, but a cycle only
ends the solve when the RECOMPUTED true residual meets the tolerance —
every restart is a residual replacement, so the f32 drift pathology that
pipelined CG needed ``recompute_r_every`` for (docs/round4.md item 29)
cannot occur here.
"""

from __future__ import annotations

import dataclasses
import functools

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from ..ops.blas import dot

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GmresInfo:
    """Solve metadata, mirroring ``BicgstabInfo``/``MinresInfo``."""

    iterations: jax.Array  # int32 — total inner Arnoldi steps (= SpMVs in the loop)
    cycles: jax.Array  # int32 — restart cycles executed
    converged: jax.Array  # bool — TRUE residual met the tolerance
    breakdown: jax.Array  # bool — NaN/non-finite ended the solve
    rnorm: jax.Array  # final TRUE residual norm ‖b − A x‖₂
    # (maxiter+1,) per-inner-step Givens residual estimates; slots at cycle
    # boundaries are overwritten with the recomputed TRUE norm; NaN-padded
    rnorm_history: jax.Array
    # alias of rnorm (API symmetry with BicgstabInfo.rnorm_true): GMRES
    # recomputes the true residual at every restart, so the final rnorm IS
    # the honesty check — no extra SpMV needed
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


def _gmres_cycle(op, apply_m, b, x, rnorm, k, hist, tol_arr, maxiter, m, sdt,
                 flexible, unroll=False):
    """One GMRES(m) cycle: masked Arnoldi + Givens, triangular solve,
    solution update, TRUE-residual restart.  Returns the updated outer
    carry pieces.

    ``flexible=True`` is Saad's FGMRES: the preconditioned vectors
    ``z_j = M(v_j)`` are kept as a second (m, n) basis and the update is
    ``x += Z y`` directly — correct for NONLINEAR / iteration-varying M
    (an inner Krylov solve, an adaptive cycle), where standard
    right-preconditioned GMRES's ``x += M(V y)`` assumes M is one fixed
    linear operator.  Costs one extra basis of memory; with a fixed
    linear M the two coincide in exact arithmetic.
    """
    n = b.shape[0]
    vdt = b.dtype

    r = b - op.matvec(x).astype(vdt)
    beta = jnp.sqrt(dot(r, r)).astype(sdt)
    # beta == 0 cannot occur here: it equals the recomputed rnorm the outer
    # while condition already terminated on (done ⇐ rnorm <= tol with
    # tol >= 0).  The where() exists only to keep the 0/0 division out of
    # the trace, not as a reachable no-op path.
    v0 = jnp.where(beta > 0, (r / beta.astype(vdt)), jnp.zeros_like(r))
    V = jnp.zeros((m + 1, n), vdt).at[0].set(v0.astype(vdt))
    Z = jnp.zeros((m if flexible else 1, n), vdt)  # FGMRES's z-basis
    R = jnp.zeros((m + 1, m), sdt)
    g = jnp.zeros((m + 1,), sdt).at[0].set(beta)
    cs = jnp.ones((m,), sdt)
    sn = jnp.zeros((m,), sdt)

    def arnoldi(j, c):
        V, Z, R, g, cs, sn, idone, ibroke, jused, hist = c
        active = (~idone) & (k + j < maxiter)

        z = apply_m(V[j]).astype(vdt)
        if flexible:
            Z = Z.at[j].set(jnp.where(active, z, Z[j]))
        w = op.matvec(z).astype(vdt)
        # CGS2: rows > j of V are zero, so no row masking is needed
        Va = V.astype(sdt)
        wa = w.astype(sdt)
        h1 = jnp.matmul(Va, wa, precision=_HI)
        w1 = wa - jnp.matmul(Va.T, h1, precision=_HI)
        h2 = jnp.matmul(Va, w1, precision=_HI)
        w2 = w1 - jnp.matmul(Va.T, h2, precision=_HI)
        h = h1 + h2
        hsub = jnp.sqrt(jnp.sum(w2 * w2))
        vnext = jnp.where(hsub > 0, w2 / hsub, jnp.zeros_like(w2))
        V = V.at[j + 1].set(
            jnp.where(active, vnext.astype(vdt), V[j + 1]))

        # new Hessenberg column (subdiagonal = ‖w2‖), previous rotations
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
        resid_est = jnp.abs(g_new[j + 1])

        R = R.at[:, j].set(jnp.where(active, col, R[:, j]))
        cs = cs.at[j].set(jnp.where(active, csj, cs[j]))
        sn = sn.at[j].set(jnp.where(active, snj, sn[j]))
        g = jnp.where(active, g_new, g)

        nonfinite = ~jnp.isfinite(resid_est)
        # hsub == 0 is the HAPPY breakdown (Krylov space exhausted → the
        # cycle's solve is exact); the rotation then zeroes g[j+1] so
        # resid_est = 0 and the converged test below fires on its own
        step_done = active & (nonfinite | (resid_est <= tol_arr))
        jused = jused + active.astype(jnp.int32)
        # masked history writes land in the scratch slot maxiter+1
        idx = jnp.where(active, k + jused, maxiter + 1)
        hist = hist.at[idx].set(resid_est)
        return (V, Z, R, g, cs, sn,
                idone | step_done, ibroke | (active & nonfinite),
                jused, hist)

    def arnoldi_unrolled(j, c):
        """Static-j twin of ``arnoldi``: the CGS2 matmuls read only the
        ``j+2`` live basis rows instead of all m+1 (the dead rows are
        zero, so every value is bitwise identical — adding exact zeros
        changes nothing), and the Givens tail applies only the j built
        rotations.  Cuts the dominant per-step HBM traffic (the basis
        reads) roughly in half averaged over a cycle: measured 92% of
        the per-step byte model at m=32, n=1M on v5e
        (docs/performance.md round-5 table)."""
        V, Z, R, g, cs, sn, idone, ibroke, jused, hist = c
        active = (~idone) & (k + j < maxiter)

        z = apply_m(V[j]).astype(vdt)
        if flexible:
            Z = Z.at[j].set(jnp.where(active, z, Z[j]))
        w = op.matvec(z).astype(vdt)
        Va = V[: j + 2].astype(sdt)  # rows 0..j+1 (j+1 is still zero)
        wa = w.astype(sdt)
        h1 = jnp.matmul(Va, wa, precision=_HI)
        w1 = wa - jnp.matmul(Va.T, h1, precision=_HI)
        h2 = jnp.matmul(Va, w1, precision=_HI)
        w2 = w1 - jnp.matmul(Va.T, h2, precision=_HI)
        h = h1 + h2  # (j+2,)
        hsub = jnp.sqrt(jnp.sum(w2 * w2))
        vnext = jnp.where(hsub > 0, w2 / hsub, jnp.zeros_like(w2))
        V = V.at[j + 1].set(
            jnp.where(active, vnext.astype(vdt), V[j + 1]))

        col = jnp.zeros((m + 1,), sdt).at[: j + 2].set(h).at[j + 1].set(hsub)
        for i in range(j):  # previously built rotations, statically
            a0, a1 = col[i], col[i + 1]
            col = col.at[i].set(cs[i] * a0 + sn[i] * a1)
            col = col.at[i + 1].set(-sn[i] * a0 + cs[i] * a1)

        a0, a1 = col[j], col[j + 1]
        denom = jnp.sqrt(a0 * a0 + a1 * a1)
        csj = jnp.where(denom > 0, a0 / denom, jnp.ones((), sdt))
        snj = jnp.where(denom > 0, a1 / denom, jnp.zeros((), sdt))
        col = col.at[j].set(denom).at[j + 1].set(jnp.zeros((), sdt))
        gj = g[j]
        g_new = g.at[j].set(csj * gj).at[j + 1].set(-snj * gj)
        resid_est = jnp.abs(g_new[j + 1])

        R = R.at[:, j].set(jnp.where(active, col, R[:, j]))
        cs = cs.at[j].set(jnp.where(active, csj, cs[j]))
        sn = sn.at[j].set(jnp.where(active, snj, sn[j]))
        g = jnp.where(active, g_new, g)

        nonfinite = ~jnp.isfinite(resid_est)
        step_done = active & (nonfinite | (resid_est <= tol_arr))
        jused = jused + active.astype(jnp.int32)
        idx = jnp.where(active, k + jused, maxiter + 1)
        hist = hist.at[idx].set(resid_est)
        return (V, Z, R, g, cs, sn,
                idone | step_done, ibroke | (active & nonfinite),
                jused, hist)

    f = jnp.zeros((), bool)
    c = (V, Z, R, g, cs, sn, f, f, jnp.zeros((), jnp.int32), hist)
    if unroll:
        for j in range(m):
            c = arnoldi_unrolled(j, c)
        V, Z, R, g, cs, sn, _, ibroke, jused, hist = c
    else:
        V, Z, R, g, cs, sn, _, ibroke, jused, hist = jax.lax.fori_loop(
            0, m, arnoldi, c)

    # small replicated triangular solve on the leading jused×jused block;
    # unexecuted columns are replaced by identity columns (their g is 0)
    valid = jnp.arange(m) < jused
    Rm = jnp.where(valid[None, :], R[:m, :m], jnp.eye(m, dtype=sdt))
    gm = jnp.where(valid, g[:m], jnp.zeros((m,), sdt))
    y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
    if flexible:
        # FGMRES update: x += Z y (each z_j kept as M saw it)
        dx = jnp.matmul(Z.astype(sdt).T, y, precision=_HI).astype(vdt)
    else:
        z = jnp.matmul(V[:m].astype(sdt).T, y, precision=_HI).astype(vdt)
        dx = apply_m(z).astype(vdt)
    x_new = (x + dx).astype(x.dtype)

    # TRUE-residual restart: this recompute is the termination authority
    r_new = b - op.matvec(x_new).astype(vdt)
    rnorm_new = jnp.sqrt(dot(r_new, r_new)).astype(sdt)
    finite = jnp.isfinite(rnorm_new) & ~ibroke
    x_out = jnp.where(finite, x_new, x)
    rnorm_out = jnp.where(finite, rnorm_new, rnorm)
    k_new = k + jused
    hist = hist.at[jnp.where(finite, k_new, maxiter + 1)].set(rnorm_new)
    broke = ~finite
    done = broke | (rnorm_out <= tol_arr) | (jused == 0)
    return x_out, rnorm_out, k_new, hist, done, broke


def _gmres_impl(op, b, x0, tol_arr, maxiter, restart_m, M, flexible,
                unroll=False):
    apply_m = (lambda v: v) if M is None else M
    x0 = jnp.zeros_like(b) if x0 is None else x0
    sdt = dot(b[:1], b[:1]).dtype  # widened scalar dtype (>= f32)
    m = restart_m

    r0 = b - op.matvec(x0).astype(b.dtype)
    rnorm0 = jnp.sqrt(dot(r0, r0)).astype(sdt)
    # scratch slot maxiter+1 absorbs masked writes; trimmed on return
    hist = jnp.full((maxiter + 2,), jnp.nan, dtype=sdt)
    hist = hist.at[0].set(rnorm0)
    tol_s = tol_arr.astype(sdt)

    carry0 = (
        jnp.zeros((), jnp.int32),  # k — total inner steps
        jnp.zeros((), jnp.int32),  # cycles
        jnp.isnan(rnorm0) | (rnorm0 <= tol_s),  # done
        jnp.isnan(rnorm0),  # broke
        x0,
        rnorm0,
        hist,
    )

    def cond(c):
        k, _, done = c[0], c[1], c[2]
        return (k < maxiter) & (~done)

    def body(c):
        k, cyc, _, _, x, rnorm, hist = c
        x, rnorm, k, hist, done, broke = _gmres_cycle(
            op, apply_m, b, x, rnorm, k, hist, tol_s, maxiter, m, sdt,
            flexible, unroll)
        return (k, cyc + 1, done, broke, x, rnorm, hist)

    k, cyc, done, broke, x, rnorm, hist = jax.lax.while_loop(
        cond, body, carry0)
    info = GmresInfo(
        iterations=k,
        cycles=cyc,
        converged=(rnorm <= tol_s) & ~broke,
        breakdown=broke,
        rnorm=rnorm,
        rnorm_history=hist[: maxiter + 1],
        rnorm_true=rnorm,
    )
    return x, info


_gmres_jit = functools.partial(
    jax.jit,
    static_argnames=("maxiter", "restart_m", "M", "flexible", "unroll"),
)(_gmres_impl)


def gmres_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    restart: int = 30,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    flexible: bool = False,
    n: Optional[int] = None,
    unroll: str = "auto",
) -> Tuple[jax.Array, GmresInfo]:
    """Solve the (possibly NONSYMMETRIC) system ``A x = b`` with GMRES(m).

    Same functional surface as ``cg_solve``/``bicgstab_solve``: one call
    in, ``(x, info)`` out, the whole solve one compiled program.

    Args:
      A: LinearOperator / dense array / scipy / BCOO / torch / callable
        (with ``n=``).  No symmetry or definiteness assumption.
      b: right-hand side.
      x0: initial guess; defaults to zeros.
      tol: ABSOLUTE tolerance on the TRUE residual ``‖b − A x‖₂`` (house
        convention, CG.hpp:255,401-402).  The in-cycle Givens estimate
        gates early cycle exit, but only a recomputed true residual ends
        the solve.  0 runs to the cap.
      maxiter: cap on TOTAL inner Arnoldi steps (= Krylov matvecs; restart
        boundaries add one matvec each for the true-residual recompute);
        defaults to N.  NOTE scipy's ``gmres(maxiter=)`` counts restart
        CYCLES — ``scipy_compat.gmres`` does that mapping.
      restart: the cycle length m.  Memory holds the ``(m+1, n)`` basis;
        larger m converges in fewer matvecs but costs O(m·n) orthogonal-
        ization work per step.  Clamped to min(restart, maxiter, N).
      M: RIGHT preconditioner apply ``v -> M⁻¹ v`` (the same objects
        ``cg_solve`` takes: Jacobi/block-Jacobi/FSAI/AMG/…).  Right
        preconditioning keeps the observed residual the TRUE residual.
      flexible: Saad's FGMRES — keep each preconditioned vector
        ``z_j = M(v_j)`` as a second on-device basis and update
        ``x += Z y`` directly.  REQUIRED when M is not one fixed linear
        operator: an inner Krylov solve (``lambda v: cg_solve(As, v,
        tol=..., maxiter=...)[0]``), an adaptive multigrid cycle —
        standard right preconditioning silently mis-updates with such M.
        Costs one extra (m, n) basis of device memory; with a fixed
        linear M the two variants coincide in exact arithmetic.
      n: dimension hint for callable operators.
      unroll: "auto" (default) unrolls the m Arnoldi steps statically on
        TPU when ``m <= 48`` — step j's CGS2 matmuls then read only the
        j+2 live basis rows instead of all m+1 (bitwise-identical values;
        the dead rows are zero), roughly halving the dominant per-step
        HBM traffic.  Compile time grows with m (the cycle body is m
        copies of the step); "never"/"always" override.

    Returns:
      ``(x, GmresInfo)``.  ``info.iterations`` counts inner steps,
      ``info.cycles`` restarts; a Krylov-space exhaustion ("happy
      breakdown") surfaces as ``converged=True`` at the exact solution,
      never as a failure.
    """
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    N = op.shape[0]
    maxiter = N if maxiter is None else int(maxiter)
    restart_m = max(1, min(int(restart), maxiter, N))
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    if flexible and M is None:
        flexible = False  # FGMRES with identity M degenerates to GMRES
    if unroll not in ("auto", "never", "always"):
        raise ValueError(f"unroll must be auto/never/always, got {unroll!r}")
    if unroll == "auto":
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            backend = "cpu"
        do_unroll = backend == "tpu" and restart_m <= 48
    else:
        do_unroll = unroll == "always"
    return _gmres_jit(op, b, x0, tol_arr, maxiter, restart_m, M,
                      bool(flexible), do_unroll)
