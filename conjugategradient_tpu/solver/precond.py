"""Preconditioners (north-star extension; the reference is unpreconditioned).

A preconditioner here is just a callable ``r -> M⁻¹ r`` that is jit-traceable,
so it fuses into the CG iteration.  Jacobi (config 3 in BASELINE.json) is the
mandated one: M⁻¹ = 1/diag(A), applied as a single elementwise multiply that
XLA fuses with the surrounding axpy — the "fused preconditioner-apply kernel"
falls out of the compiler rather than being hand-written.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..types import as_linear_operator


def jacobi_preconditioner(A: Any, eps: float = 0.0) -> Callable[[jax.Array], jax.Array]:
    """M⁻¹ r = r / diag(A).  ``eps`` guards against (near-)zero diagonals."""
    op = as_linear_operator(A)
    d = op.diagonal()
    if eps:
        d = jnp.where(jnp.abs(d) > eps, d, jnp.sign(d) * eps + (d == 0) * eps)
    inv_d = 1.0 / d

    def apply(r: jax.Array) -> jax.Array:
        return inv_d * r

    return apply


def identity_preconditioner() -> Callable[[jax.Array], jax.Array]:
    return lambda r: r


def estimate_spectral_bounds(
    A: Any,
    n: int = None,
    iters: int = 30,
    seed: int = 0,
    safety: float = 1.1,
):
    """Estimate (λ_min, λ_max) of an SPD operator for Chebyshev setup.

    λ_max by power iteration; λ_min cheaply as λ_max / κ_est where κ_est
    comes from the Rayleigh quotient of the power iterate's residual — crude
    but sufficient: Chebyshev only needs an interval CONTAINING the
    spectrum, so λ_max is inflated by ``safety`` and λ_min deflated by the
    diagonal lower bound when available.
    """
    op = as_linear_operator(A, n=n)
    m = op.shape[0]
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (m,), dtype=op.dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = op.matvec(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    lam_max = float(jnp.vdot(v, op.matvec(v)).real)

    # cheap lower bound: min Gershgorin-ish estimate from the diagonal if
    # exposed, else a conservative fraction of λ_max
    try:
        d = op.diagonal()
        lam_min = float(jnp.min(d)) / 2.0
        lam_min = max(lam_min, lam_max * 1e-6)
    except NotImplementedError:
        lam_min = lam_max / 1e4
    return lam_min / safety, lam_max * safety


def chebyshev_preconditioner(
    A: Any,
    lam_min: float,
    lam_max: float,
    degree: int = 8,
    n: int = None,
) -> Callable[[jax.Array], jax.Array]:
    """Chebyshev polynomial preconditioner: M⁻¹ ≈ p_k(A) ≈ A⁻¹ on
    [lam_min, lam_max].

    TPU-first choice of preconditioner beyond Jacobi: the apply is ``degree``
    extra SpMVs — fully data-parallel streaming work, no triangular solves
    (SSOR/IC-style preconditioners serialize and are hostile to the
    hardware).  Standard Chebyshev iteration recurrence on the residual
    equation; the result is a FIXED linear operator, so PCG theory applies.

    Cost/benefit: each PCG iteration costs (degree+1) SpMVs but contracts
    like CG on a spectrum compressed by the Chebyshev polynomial — a win
    when SpMV is cheap relative to the dots' latency or when iteration
    counts (and thus psum rounds, multi-chip) must shrink.
    """
    if not (0 < lam_min < lam_max):
        raise ValueError(
            f"need 0 < lam_min < lam_max, got [{lam_min}, {lam_max}] "
            "(an inverted/non-positive interval makes M indefinite)"
        )
    op = as_linear_operator(A, n=n)
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma1 = theta / delta

    def apply(r: jax.Array) -> jax.Array:
        # Chebyshev semi-iteration solving A z = r, z0 = 0
        rho_old = 1.0 / sigma1
        z = r / theta  # first step
        z_old = jnp.zeros_like(r)
        d = z  # z - z_old

        def body(i, carry):
            z, z_old, rho_old = carry
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            resid = r - op.matvec(z)
            z_new = rho * (2.0 * resid / delta + rho_old * (z - z_old)) + z
            return (z_new, z, rho)

        z, _, _ = jax.lax.fori_loop(0, degree - 1, body, (z, z_old, rho_old))
        return z

    return apply
