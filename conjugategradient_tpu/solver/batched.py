"""Batched multi-RHS CG: solve ``A X = B`` for many right-hand sides at once.

The reference solves one RHS per ``solve()`` call (CG.hpp:255); on TPU,
batching RHS turns the SpMV's (bm, bn)x(bn,) tile products into
(bm, bn)x(bn, R) tile matmuls that feed the MXU properly, and amortizes the
operator stream over R solves — R-fold better arithmetic intensity for the
same HBM traffic.

Implementation: ``jax.vmap`` over the RHS axis of the plain solver.  Under
vmap, ``lax.while_loop`` runs in lockstep until *every* lane's predicate is
false, masking carry updates for lanes that already finished — so each
lane's ``iterations``/``converged``/history are exactly what a solo solve
would report (verified in tests/test_batched.py); the only cost is that the
batch runs for max-over-lanes iterations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from .cg import CGInfo, cg_solve


def cg_solve_batched(
    A: Any,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
) -> Tuple[jax.Array, CGInfo]:
    """Solve ``A X[i] = B[i]`` for every row of ``B``.

    Args:
      A: shared operator (LinearOperator / dense array / callable).
      B: (nrhs, N) right-hand sides.
      X0: optional (nrhs, N) initial guesses.
      Remaining arguments as :func:`~conjugategradient_tpu.cg_solve`.

    Returns (X (nrhs, N), CGInfo with leading nrhs axis on every field).
    """
    op = as_linear_operator(A, n=n, dtype=getattr(B, "dtype", None))
    if B.ndim != 2:
        raise ValueError(f"B must be (nrhs, N), got shape {B.shape}")

    def solve_one(b, x0):
        return cg_solve(op, b, x0, tol=tol, maxiter=maxiter, M=M)

    if X0 is None:
        X0 = jnp.zeros_like(B)
    return jax.vmap(solve_one)(B, X0)
