"""Differentiable CG solves — implicit-function-theorem VJP.

A capability the C++ reference cannot express and JAX gets almost for free:
gradients THROUGH the linear solve.  For ``x(θ, b) = A(θ)⁻¹ b`` with A
symmetric positive-definite, the implicit function theorem gives

    ∂L/∂b = A⁻¹ ḡ                    (one ADJOINT solve — A is symmetric,
                                      so the adjoint system is the same CG)
    ∂L/∂θ = −wᵀ · ∂(A(θ) x)/∂θ       (a VJP of the MATVEC at the fixed
                                      solution x, with cotangent w = A⁻¹ ḡ)

so the backward pass is exactly one more CG solve plus one matvec-VJP —
independent of how many iterations the forward solve took.  Differentiating
*through* the unrolled ``lax.while_loop`` would instead store every
iterate (maxiter × n floats of rematerialization) and is not even supported
for ``while_loop``; the implicit form is the only sensible reverse rule and
the numerically correct one (Gilbert 1992; same rule as
``jax.scipy.sparse.linalg.cg``'s transpose).

The operator gradient comes from ``jax.vjp(lambda op: op.matvec(x), A)`` —
generic over EVERY registered operator pytree: CSR gets per-nonzero
gradients, DIA per-diagonal-slot, blocked-ELL per-tile-element, symmetric
blocked-ELL per-stored-element (each stored upper entry automatically
receives both of its mirrored contributions), stencil operators get
gradients on their coefficient leaves, and matrix-free operators on
whatever array leaves their pytree carries.

Caveats (documented, deliberate):

* The rule is exact at the SOLUTION; with loose ``tol`` the gradient of the
  *approximate* x differs from the implicit gradient by O(‖r‖).  Tight
  tolerances (or tol=0 → run to the cap, the reference harness's mode,
  test/Tester.cpp:45) make them coincide.
* ``x0`` does not influence the converged solution, so its cotangent is
  zero by construction.
* ``A`` must be symmetric — the same contract CG itself already imposes
  (reference CG.hpp:53-77 assumes SPD without checking).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from .cg import CGInfo, cg_solve


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _solve(A, b, x0, tol, maxiter, M, recompute_r_every, fused):
    return cg_solve(
        A, b, x0, tol=tol, maxiter=maxiter, M=M,
        recompute_r_every=recompute_r_every, fused=fused,
    )


def _solve_fwd(A, b, x0, tol, maxiter, M, recompute_r_every, fused):
    x, info = cg_solve(
        A, b, x0, tol=tol, maxiter=maxiter, M=M,
        recompute_r_every=recompute_r_every, fused=fused,
    )
    return (x, info), (A, x, x0)


def _solve_bwd(tol, maxiter, M, recompute_r_every, fused, res, ct):
    A, x, x0 = res
    gx, _ = ct  # CGInfo cotangents carry no information back (iteration
    # counts / residual history are reported observables, not
    # differentiable quantities)
    # adjoint solve A w = ḡ — symmetric A makes this the SAME solver with
    # the SAME preconditioner (M⁻¹ is symmetric too for every built-in)
    w, _ = cg_solve(
        A, gx.astype(x.dtype), tol=tol, maxiter=maxiter, M=M,
        recompute_r_every=recompute_r_every, fused=fused,
    )
    # ∂L/∂θ = −wᵀ ∂(A(θ)x)/∂θ: one VJP of the matvec at the fixed solution
    y, matvec_vjp = jax.vjp(lambda op: op.matvec(x), A)
    (gA,) = matvec_vjp((-w).astype(y.dtype))
    gb = w.astype(x.dtype)
    gx0 = jax.tree_util.tree_map(jnp.zeros_like, x0)
    return (gA, gb, gx0)


_solve.defvjp(_solve_fwd, _solve_bwd)


def implicit_cg_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
    recompute_r_every: int = 0,
    fused: str = "auto",
) -> Tuple[jax.Array, CGInfo]:
    """:func:`~conjugategradient_tpu.cg_solve` with a custom reverse rule.

    Same signature, same forward values; under ``jax.grad``/``jax.vjp`` the
    backward pass costs ONE adjoint CG solve plus one matvec-VJP instead of
    an (unsupported, memory-explosive) unroll of the iteration.  Gradients
    flow to ``b`` and to every array leaf of the operator pytree; ``x0``
    receives zeros (the converged solution does not depend on it).

    ``tol``/``maxiter``/``M``/``recompute_r_every``/``fused`` are
    non-differentiable static arguments (as in ``cg_solve``'s jit contract).

    Differentiating with respect to the OPERATOR needs
    ``jax.grad(..., allow_int=True)`` (or ``jax.vjp``): operator pytrees
    carry integer structure leaves (CSR indices, blocked-ELL column ids)
    which receive ``float0`` cotangents — standard JAX, nothing to unpack.

    Example::

        def loss(op, b):
            x, _ = implicit_cg_solve(op, b, tol=1e-10, maxiter=200)
            return jnp.sum(x ** 2)

        g_op, g_b = jax.grad(loss, argnums=(0, 1))(op, b)
        # g_op.data — per-nonzero sensitivity for a CSRMatrix operator
    """
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    if maxiter is None:
        maxiter = op.shape[0] + 1
    return _solve(op, b, x0, float(tol), int(maxiter), M,
                  int(recompute_r_every), fused)


# ---------------------------------------------------------------------------
# differentiable GMRES — the NONSYMMETRIC implicit rule
# ---------------------------------------------------------------------------
#
# For nonsymmetric A the adjoint system is Aᵀ w = ḡ, NOT A w = ḡ: the
# implicit-CG shortcut of reusing the same operator is exactly the thing
# that silently mis-differentiates a nonsymmetric solve.  The transpose
# matvec comes from ``jax.linear_transpose`` of the operator's (linear)
# matvec — generic over every layout pytree and every matrix-free callable,
# with no transposed storage needed (XLA turns the CSR gather into a
# scatter; the adjoint solve is a convergence-time cost only).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gmres_solve_vjp(A, b, x0, tol, maxiter, restart, M):
    from .gmres import gmres_solve

    return gmres_solve(
        A, b, x0, tol=tol, maxiter=maxiter, restart=restart, M=M,
    )


def _gmres_fwd(A, b, x0, tol, maxiter, restart, M):
    out = _gmres_solve_vjp(A, b, x0, tol, maxiter, restart, M)
    return out, (A, out[0], x0, b)


def _gmres_bwd(tol, maxiter, restart, M, res, ct):
    from .gmres import gmres_solve

    A, x, x0, b = res
    gx, _ = ct  # GmresInfo cotangents carry no information back
    # adjoint solve Aᵀ w = ḡ: transpose the matvec, not the storage
    t_mv = jax.linear_transpose(lambda v: A.matvec(v), jnp.zeros_like(b))

    def at_matvec(u):
        (r,) = t_mv(u.astype(x.dtype))
        return r

    # The adjoint's natural right preconditioner is Mᵀ (a good M ≈ A⁻¹
    # makes Mᵀ ≈ A⁻ᵀ).  M only steers convergence — the converged w is
    # M-independent — so when M is not structurally linear (an inner
    # Krylov solve) fall back to M untransposed rather than fail.
    Mt = M
    if M is not None:
        try:
            t_m = jax.linear_transpose(M, jnp.zeros_like(b))
            probe = jax.ShapeDtypeStruct(b.shape, b.dtype)
            jax.eval_shape(lambda u: t_m(u)[0], probe)  # nonlinear M raises
            Mt = lambda u: t_m(u.astype(b.dtype))[0]
        except Exception:
            Mt = M
    w, winfo = gmres_solve(
        at_matvec, gx.astype(x.dtype), tol=tol, maxiter=maxiter,
        restart=restart, M=Mt, n=int(b.shape[0]),
    )
    # adjoint non-convergence is silent in the returned gradient (it is
    # inaccurate beyond the documented O(||r||) caveat); surface it
    jax.lax.cond(
        winfo.converged | (jnp.asarray(tol) <= 0),
        lambda: None,
        lambda: jax.debug.print(
            "implicit_gmres_solve: adjoint GMRES did not converge "
            "(rnorm={r:.3e}, tol={t:.3e}) — gradient may be inaccurate",
            r=winfo.rnorm, t=jnp.asarray(tol), ordered=False,
        ),
    )
    y, matvec_vjp = jax.vjp(lambda op: op.matvec(x), A)
    (gA,) = matvec_vjp((-w).astype(y.dtype))
    gb = w.astype(x.dtype)
    gx0 = jax.tree_util.tree_map(jnp.zeros_like, x0)
    return (gA, gb, gx0)


_gmres_solve_vjp.defvjp(_gmres_fwd, _gmres_bwd)


def implicit_gmres_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    restart: int = 30,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
):
    """:func:`~conjugategradient_tpu.gmres_solve` with a custom reverse rule
    — differentiable solves for NONSYMMETRIC operators.

    Same signature, same forward values; under ``jax.grad``/``jax.vjp`` the
    backward pass is ONE adjoint GMRES solve of ``Aᵀ w = ḡ`` (the
    transposed matvec comes from ``jax.linear_transpose`` — no transposed
    storage is built) plus one matvec-VJP at the solution.  This is the
    rule :func:`implicit_cg_solve` cannot provide: its symmetric shortcut
    ``A w = ḡ`` is wrong the moment A ≠ Aᵀ.

    Gradients flow to ``b`` and to every array leaf of the operator pytree
    (``jax.grad(..., allow_int=True)`` for operators carrying integer
    structure leaves); ``x0`` receives zeros.  The rule is exact at the
    solution — with loose ``tol`` forward and implicit gradients differ by
    O(‖r‖), so use tight tolerances (same caveat as implicit_cg_solve).
    A linear ``M`` is transposed (``jax.linear_transpose``) for the adjoint
    solve; a nonlinear ``M`` is reused untransposed (convergence steering
    only).  If the adjoint solve fails to reach ``tol`` within ``maxiter``
    a ``jax.debug.print`` warning is emitted — the returned gradient is
    then inaccurate beyond the O(‖r‖) bound.
    """
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    if maxiter is None:
        maxiter = op.shape[0]
    x0 = jnp.zeros_like(b) if x0 is None else x0
    return _gmres_solve_vjp(op, b, x0, float(tol), int(maxiter),
                            int(restart), M)
