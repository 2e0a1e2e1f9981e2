"""Deflated and recycling CG — spectral deflation for sequences of solves.

CG's iteration count is governed by the spread of A's spectrum; in
production the same (or a slowly-varying) operator is solved against many
right-hand sides — time stepping, load cases, outer Newton iterations.
Deflation removes the k lowest eigenmodes from the iteration: with a basis
``W`` spanning approximations of those modes, every search direction is
kept A-orthogonal to ``W`` through the projector

    Pᵀ z = z − W E⁻¹ (AW)ᵀ z,        E = Wᵀ A W  (k×k, Cholesky-factored)

so CG effectively runs on the operator restricted to the complement —
condition number λ_max/λ_{k+1} instead of λ_max/λ_1 (Saad, Yeung, Erhel &
Guyomarc'h, SIAM J. Sci. Comput. 21(5), 2000).  The per-iteration overhead
is one (n,k)ᵀ(n,) product, one k×k triangular solve, and one (n,k)(k,)
product — tall-skinny matmuls the MXU eats for free next to the SpMV.

The basis comes from wherever spectral information exists:

* :func:`make_deflation_basis` — a Lanczos pass on A (the same
  reorthogonalized device loop the Chebyshev bound estimator uses,
  precond.py) keeping the k LOWEST Ritz vectors.  This is the recycling
  workflow: pay one Lanczos once, amortize over every later solve.
* :func:`deflation_basis_from_vectors` — any user-supplied (n, k) block
  (coarse-grid modes, rigid-body modes, previous solutions).

The reference solves one system per ``solve()`` call with no state reuse
whatsoever (CG.hpp:255-454); this module is the capability that makes
solve #2 cheaper than solve #1.

Semantics: identical loop contract to :func:`~conjugategradient_tpu.cg_solve`
(recurrence residual, Hestenes–Stiefel α/β, pre-update termination on
‖r_k‖₂, N+1 cap, NaN exit, ρ==0 guard) with the projector applied to the
preconditioned residual in the direction update, and the initial guess
Galerkin-corrected so Wᵀr₀ = 0.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from .cg import CGInfo

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DeflationBasis:
    """Precomputed deflation data: the basis, its image, and chol(WᵀAW).

    Build once per operator (``make_deflation_basis`` /
    ``deflation_basis_from_vectors``), reuse across every
    :func:`deflated_cg_solve` against the same A.
    """

    W: jax.Array  # (n, k)
    AW: jax.Array  # (n, k)
    E_chol: jax.Array  # (k, k) lower Cholesky factor of WᵀAW

    def tree_flatten(self):
        return (self.W, self.AW, self.E_chol), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def k(self) -> int:
        return int(self.W.shape[1])


def _solve_E(basis: DeflationBasis, y: jax.Array) -> jax.Array:
    """E⁻¹ y via the precomputed Cholesky factor (k×k — negligible)."""
    from jax.scipy.linalg import cho_solve

    return cho_solve((basis.E_chol, True), y)


def _project(basis: DeflationBasis, z: jax.Array) -> jax.Array:
    """Pᵀ z = z − W E⁻¹ (AW)ᵀ z — the A-orthogonal-to-W projector."""
    mu = _solve_E(
        basis, jnp.matmul(basis.AW.T, z, precision=_HI)
    )
    return z - jnp.matmul(basis.W, mu, precision=_HI)


def deflation_basis_from_vectors(A: Any, W: jax.Array,
                                 n: Optional[int] = None) -> DeflationBasis:
    """Build a :class:`DeflationBasis` from any full-rank (n, k) block.

    Computes AW column-by-column through the operator's own matvec and
    Cholesky-factors E = WᵀAW; raises (through Cholesky NaNs at solve
    time) if W is A-degenerate — orthonormalize first if unsure.
    """
    op = as_linear_operator(A, n=n, dtype=W.dtype)
    AW = jax.vmap(lambda c: op.matvec(c), in_axes=1, out_axes=1)(W)
    E = jnp.matmul(W.T, AW, precision=_HI)
    E_chol = jnp.linalg.cholesky(0.5 * (E + E.T))
    return DeflationBasis(W=W, AW=AW, E_chol=E_chol)


def make_deflation_basis(
    A: Any,
    k: int = 8,
    lanczos_iters: Optional[int] = None,
    n: Optional[int] = None,
    seed: int = 0,
    v0: Optional[jax.Array] = None,
    method: str = "lanczos",
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    maxiter: Optional[int] = None,
) -> DeflationBasis:
    """Harvest the k LOWEST Ritz vectors of A into a deflation basis.

    ``method="lanczos"`` (default) runs ``lanczos_iters`` (default
    ``max(2k, k+10)``) reorthogonalized Lanczos steps through the public
    eigensolver (:func:`solver.eigs.lanczos_eigs`, one jitted device
    dispatch) and wraps the k smallest Ritz vectors.  Cost: one Lanczos
    pass (m SpMVs) amortized over every subsequent solve — the recycling
    pattern for solve sequences.

    ``method="lobpcg"`` harvests through :func:`solver.lobpcg.lobpcg_eigs`
    instead — pass any of the framework's preconditioners as ``M`` (AMG/
    MG/FSAI/Jacobi) and the basis converges at M⁻¹A's rate, which is the
    better trade exactly when the small end is clustered (where an
    unpreconditioned Krylov pass needs many iterations per converged
    pair); ``maxiter`` caps the LOBPCG iterations (default 50).
    """
    op = as_linear_operator(A, n=n)
    m_rows = op.shape[0]
    if method == "lobpcg":
        from .lobpcg import lobpcg_eigs

        if lanczos_iters is not None:
            raise ValueError(
                "lanczos_iters applies to method='lanczos'; cap the LOBPCG "
                "iterations with maxiter= instead"
            )
        X0 = None
        if v0 is not None:
            # seed the block with the caller's direction (a prior solve's
            # residual, typically) + the default random complement
            key = jax.random.PRNGKey(seed)
            X0 = jax.random.normal(key, (m_rows, k), dtype=v0.dtype)
            X0 = X0.at[:, 0].set(v0)
        res = lobpcg_eigs(
            op, k=k, M=M, which="smallest", X0=X0,
            maxiter=50 if maxiter is None else int(maxiter), seed=seed,
        )
        return deflation_basis_from_vectors(op, res.vectors)
    if method != "lanczos":
        raise ValueError(
            f"method must be 'lanczos' or 'lobpcg', got {method!r}")
    if M is not None:
        raise ValueError(
            "M (preconditioned harvesting) requires method='lobpcg' — "
            "the Lanczos pass is unpreconditioned"
        )
    from .eigs import lanczos_eigs

    m = int(min(
        lanczos_iters if lanczos_iters is not None else max(2 * k, k + 10),
        m_rows,
    ))
    if not 0 < k <= m:
        raise ValueError(f"need 0 < k <= lanczos_iters, got k={k}, m={m}")
    res = lanczos_eigs(
        op, k=k, which="smallest", iters=m, seed=seed, v0=v0,
        return_vectors=True,
    )
    return deflation_basis_from_vectors(op, res.vectors)


def basis_quality(A: Any, basis: DeflationBasis,
                  n: Optional[int] = None) -> jax.Array:
    """Relative Ritz residuals ‖A wᵢ − θᵢ wᵢ‖ / θᵢ per basis column.

    The deflation payoff tracks this number: columns ≲ 0.1 behave nearly
    like exact eigenvectors; columns near 1 contribute nothing (measured
    on Poisson-576: max residual 0.79 → deflation LOST 8 iterations,
    0.13 → won 6, exact vectors → won 27).  If the gain disappoints,
    raise ``lanczos_iters`` (or harvest from a longer solve) until this
    drops.
    """
    op = as_linear_operator(A, n=n, dtype=basis.W.dtype)
    AW = jax.vmap(lambda c: op.matvec(c), in_axes=1, out_axes=1)(basis.W)
    wnorm2 = jnp.sum(basis.W * basis.W, axis=0)
    theta = jnp.sum(basis.W * AW, axis=0) / wnorm2
    res = jnp.linalg.norm(AW - basis.W * theta[None, :], axis=0)
    return res / (theta * jnp.sqrt(wnorm2))


@functools.partial(jax.jit, static_argnames=("m", "op_static"))
def _cg_harvest_device(op_arrays, op_static, b, m: int):
    """m plain-CG iterations recording the Lanczos process they induce.

    CG and Lanczos build the same Krylov space: the normalized residuals
    are the Lanczos vectors (up to sign (−1)ʲ) and the CG coefficients
    give the tridiagonal —

        T[j,j]   = 1/αⱼ + βⱼ₋₁/αⱼ₋₁         (β₋₁ = 0)
        T[j,j+1] = √βⱼ / αⱼ

    (Saad, Iterative Methods, §6.7.3).  So a solve that was going to run
    anyway doubles as the eigensolver pass — recycling for free.
    Returns (V (m, n) scaled residuals, alphas, betas, x, k_done).
    """
    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    n = b.shape[0]
    dt = jnp.promote_types(b.dtype, jnp.float32)

    def body(j, c):
        V, al, be, x, r, p, rho = c
        sign = jnp.where(j % 2 == 0, 1.0, -1.0).astype(dt)
        V = V.at[j].set(sign * r / jnp.sqrt(rho))
        q = op.matvec(p)
        pap = jnp.sum(p * q)
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        x = x + alpha * p
        r = r - alpha * q
        rho_next = jnp.sum(r * r)
        beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, rho))
        p = r + beta * p
        return (V, al.at[j].set(alpha), be.at[j].set(beta), x, r, p,
                rho_next)

    r0 = b.astype(dt)
    carry = (
        jnp.zeros((m, n), dt), jnp.zeros((m,), dt), jnp.zeros((m,), dt),
        jnp.zeros((n,), dt), r0, r0, jnp.sum(r0 * r0),
    )
    V, al, be, x, r, p, rho = jax.lax.fori_loop(0, m, body, carry)
    return V, al, be, x


def harvest_deflation_basis(
    A: Any,
    b: jax.Array,
    k: int = 8,
    m: Optional[int] = None,
    n: Optional[int] = None,
    return_x: bool = False,
):
    """Run m CG iterations on ``A x = b`` (x0 = 0) and harvest the k
    lowest Ritz vectors from the iteration's own coefficients — the
    recycling workflow: the first solve of a sequence pays for every
    later solve's deflation with zero extra matvecs (beyond the k
    needed to form AW).

    ``m`` defaults to ``max(4k, 2k+20)``.  Quality improves with m like
    Lanczos convergence to the LOW end of the spectrum (slow for
    Poisson-like operators) — check :func:`basis_quality`.

    ``return_x=True`` additionally returns the harvest pass's own m-th
    iterate ``(basis, x_m)`` — warm-start the FIRST solve with it
    (``deflated_cg_solve(..., x0=x_m)``) and the harvest iterations are
    never paid twice.
    """
    import numpy as np

    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    m = int(min(max(4 * k, 2 * k + 20) if m is None else m, op.shape[0]))
    if not 0 < k <= m:
        raise ValueError(f"need 0 < k <= m, got k={k}, m={m}")
    op_arrays, op_static = jax.tree_util.tree_flatten(op)
    V, al, be, x_m = _cg_harvest_device(tuple(op_arrays), op_static, b, m)
    al = np.asarray(al, np.float64)
    be = np.asarray(be, np.float64)
    # truncate where CG hit exact convergence (alpha frozen at 0)
    alive = np.flatnonzero(al == 0)
    mm = int(alive[0]) if len(alive) else m
    mm = max(mm, 1)
    diag = 1.0 / al[:mm]
    diag[1:] += be[: mm - 1] / al[: mm - 1]
    off = np.sqrt(be[: mm - 1]) / al[: mm - 1]
    T = np.diag(diag)
    if mm > 1:
        T = T + np.diag(off, 1) + np.diag(off, -1)
    vals, Y = np.linalg.eigh(T)
    kk = min(k, mm)
    Yk = jnp.asarray(Y[:, :kk], dtype=V.dtype)
    W = jnp.matmul(V[:mm].T, Yk, precision=_HI).astype(op.dtype)
    basis = deflation_basis_from_vectors(op, W)
    if return_x:
        return basis, x_m.astype(getattr(b, "dtype", x_m.dtype))
    return basis


@functools.partial(
    jax.jit, static_argnames=("maxiter", "M", "op_static")
)
def _deflated_core(op_arrays, op_static, basis, b, x0, tol_arr, maxiter, M):
    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    precond = (lambda r: r) if M is None else M

    def pdot(u, v):
        acc = jnp.promote_types(u.dtype, jnp.float32)
        return jnp.sum(u.astype(acc) * v.astype(acc)).astype(u.dtype)

    # Galerkin initial correction: x0 += W E⁻¹ Wᵀ r0 ⇒ Wᵀ r0 = 0
    r = b - op.matvec(x0)
    mu = _solve_E(basis, jnp.matmul(basis.W.T, r, precision=_HI))
    x = x0 + jnp.matmul(basis.W, mu, precision=_HI)
    r = r - jnp.matmul(basis.AW, mu, precision=_HI)

    z = precond(r)
    p = _project(basis, z)
    rnorm0 = pdot(r, r)
    rho0 = rnorm0 if M is None else pdot(r, z)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    carry = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
             x, r, p, rho0, rnorm0, hist, x, rnorm0)

    def body(c):
        k, done, x, r, p, rho, rnorm, hist, x_best, rnorm_min, divg = c
        q = op.matvec(p)
        pap = pdot(p, q)
        exact = rho == 0
        alpha = jnp.where(exact, 0, rho / jnp.where(exact, 1, pap))
        x = x + alpha * p
        r = r - alpha * q
        # pre-update termination (cg.py semantics) PLUS a divergence
        # guard: past its stagnation floor the projector's E⁻¹ (gain
        # ~1/λ_min per application) amplifies rounding noise
        # exponentially — measured on Poisson-576 at an unattainable
        # tol: ‖r‖² reached 1.4e-21 at k=70, then grew to 9.6e12 by the
        # cap.  Plain CG merely stagnates there; the deflated loop must
        # STOP.  1e6 on ‖r‖² = 1000× in norm over the running best —
        # far above any healthy CG transient.
        tol_met = jnp.sqrt(rnorm) <= tol_arr
        diverged = (rnorm > 1e6 * rnorm_min) & ~tol_met
        done = jnp.isnan(rnorm) | tol_met | diverged
        z = precond(r)
        rnorm_next = pdot(r, r)
        rho_next = rnorm_next if M is None else pdot(r, z)
        beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, rho))
        p = _project(basis, z) + beta * p
        k = k + 1
        hist = hist.at[k].set(rnorm_next)
        better = rnorm_next < rnorm_min
        x_best = jnp.where(better, x, x_best)
        rnorm_min = jnp.where(better, rnorm_next, rnorm_min)
        return (k, done & ~diverged, x, r, p, rho_next, rnorm_next, hist,
                x_best, rnorm_min, divg | diverged)

    carry = carry + (jnp.asarray(False),)

    def cond2(c):
        return (c[0] < maxiter) & (~c[1]) & (~c[10])

    (k, done, x, r, p, rho, rnorm, hist, x_best, rnorm_min,
     divg_flag) = jax.lax.while_loop(cond2, body, carry)
    # return the best iterate: identical to the last one on healthy
    # solves, and the pre-divergence solution when the guard fired
    use_best = rnorm_min < rnorm
    x = jnp.where(use_best, x_best, x)
    rnorm_out = jnp.where(use_best, rnorm_min, rnorm)
    return x, k, done, rho, rnorm_out, hist, divg_flag


def deflated_cg_solve(
    A: Any,
    b: jax.Array,
    basis: DeflationBasis,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
) -> Tuple[jax.Array, CGInfo]:
    """(P)CG with the k lowest modes deflated out of the iteration.

    Same call shape and loop semantics as
    :func:`~conjugategradient_tpu.cg_solve` plus the ``basis`` argument
    (from :func:`make_deflation_basis` /
    :func:`harvest_deflation_basis` — reuse it across solves: that is
    the point).  One jitted ``lax.while_loop``, zero host syncs.

    Two departures from the plain loop, both deflation-specific: the
    solve STOPS (converged=False) if ‖r‖² grows 10⁶× above its running
    minimum — past the stagnation floor the projector amplifies rounding
    noise exponentially, where plain CG merely stagnates — and the
    returned x is the best iterate by ‖r‖, which is the last one on
    every healthy solve.
    """
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    N = op.shape[0]
    maxiter = int(N + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    op_arrays, op_static = jax.tree_util.tree_flatten(op)
    x, k, done, rho, rnorm, hist, diverged = _deflated_core(
        tuple(op_arrays), op_static, basis, b, x0, tol_arr, maxiter, M
    )
    info = CGInfo(
        iterations=k,
        # the divergence guard is a FAILURE stop, never a convergence
        converged=done & ~jnp.isnan(rnorm) & ~diverged,
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )
    return x, info
