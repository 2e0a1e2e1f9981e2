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

from ..types import LinearOperator, as_linear_operator


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
