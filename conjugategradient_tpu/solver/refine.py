"""Mixed-precision CG with iterative refinement (CG-IR).

The reference is a single-precision-template solver — the harness
instantiates ``double`` throughout (test/Tester.cpp:10) and every kernel
streams 8-byte values (src/VectorOperations.hpp:438-466).  On TPU the
economics invert: the SpMV is bandwidth/engine-byte-bound (docs/
performance.md), so halving the operator's value bytes with ``bfloat16``
storage buys real throughput — DIA and blocked-ELL solves are value-byte
dominated — while the MXU/VPU natively compute in bf16/f32.

Plain low-precision CG, however, stalls at the storage dtype's resolution.
The standard fix (Carson & Higham, SIAM J. Sci. Comput. 2018) is iterative
refinement: keep ONE high-precision copy of the operator for residuals, run
the inner solves against the low-precision copy, and correct::

    r_j = b - A_hi x_j          (high-precision true residual)
    solve A_lo d_j = r_j        (inner CG, loose relative tolerance)
    x_{j+1} = x_j + d_j

Each refinement contracts the error by roughly ``eps_lo * kappa(A)`` until
the high dtype's own floor, so a handful of outer steps recover full
f32/f64 accuracy while ~all iterations run on the cheap operator.  Memory
cost: the low copy's value arrays (+50% of the high operator's values for
f32 -> bf16; index/structure arrays are shared by construction in
:meth:`~conjugategradient_tpu.types.LinearOperator.astype`).

The outer loop runs on host — it executes O(1) times (each step is one
matvec + one full inner solve, i.e. two cached-jit dispatches), so the
zero-sync contract of the inner while_loop (solver/cg.py) is untouched.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import as_linear_operator
from .cg import CGInfo, cg_solve


@dataclasses.dataclass(frozen=True)
class RefineInfo:
    """Metadata for a refined solve (host-side; not a pytree)."""

    refinements: int  # outer correction steps taken
    inner_iterations: int  # total CG iterations across all inner solves
    converged: bool  # ‖r‖ (true, high-precision) met tol
    rnorm_sq: float  # final true ‖r‖²
    rnorm_history: Tuple[float, ...]  # true ‖r‖² before each outer step + final
    inner_infos: Tuple[CGInfo, ...]  # per-inner-solve CGInfo


def refined_cg_solve(
    A: Any,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float,
    low_dtype=jnp.bfloat16,
    A_low: Any = None,
    inner_tol: float = 1e-2,
    inner_maxiter: Optional[int] = None,
    max_refinements: int = 20,
    min_contraction: float = 0.5,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    n: Optional[int] = None,
    recompute_r_every: int = 0,
    fused: str = "auto",
) -> Tuple[jax.Array, RefineInfo]:
    """Solve ``A x = b`` to high-precision ``tol`` with low-precision inner CG.

    Args:
      A: the HIGH-precision operator (LinearOperator / dense / callable) —
        used only for the outer true residuals, one matvec per refinement.
      b: right-hand side (high precision; its dtype sets the recurrences').
      tol: ABSOLUTE tolerance on the true ‖b − A x‖₂ (same semantics as
        :func:`~conjugategradient_tpu.cg_solve`).  Must be > 0 — refinement
        without a target would never terminate meaningfully.
      low_dtype: storage dtype for the inner operator (default bfloat16);
        built via ``A.astype(low_dtype)`` unless ``A_low`` is given.
      A_low: optional pre-built low-precision operator — pass this when the
        cheap operator uses a different LAYOUT too (e.g. a bf16
        ``DIAMatrix.with_blocked`` copy of a CSR high operator).
      inner_tol: RELATIVE tolerance for each inner solve (× the current
        outer ‖r‖).  1e-2 is plenty: refinement squares away the rest, and
        looser inner solves waste fewer iterations on directions the next
        correction re-solves anyway.
      inner_maxiter: per-inner-solve cap (default N+1, like cg_solve).
      max_refinements: outer-step cap.
      min_contraction: stagnation guard — stop (unconverged) when an outer
        step fails to shrink ‖r‖ by at least this factor; at that point
        ``eps_lo·κ(A)`` has won and more refinements cannot help.
      M / recompute_r_every / fused: forwarded to the inner ``cg_solve``
        (the preconditioner sees low-precision residual vectors in the
        promoted compute dtype, exactly as in a plain solve).

    Returns ``(x, RefineInfo)``; ``x`` has ``b``'s dtype.
    """
    if float(tol) <= 0.0:
        raise ValueError("refined_cg_solve needs tol > 0 (absolute ‖r‖ target)")
    op_hi = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    op_lo = (
        as_linear_operator(A_low, n=n) if A_low is not None
        else op_hi.astype(low_dtype)
    )
    if op_lo.shape != op_hi.shape:
        raise ValueError(
            f"A_low shape {op_lo.shape} != A shape {op_hi.shape}"
        )
    x = jnp.zeros_like(b) if x0 is None else x0.astype(b.dtype)

    history: List[float] = []
    inner_infos: List[CGInfo] = []
    inner_total = 0
    converged = False
    rnorm_sq = float("nan")
    for j in range(max_refinements + 1):
        r = b - op_hi.matvec(x)
        rnorm_sq = float(jnp.sum(r.astype(jnp.promote_types(r.dtype, jnp.float32)) ** 2))
        history.append(rnorm_sq)
        rnorm = rnorm_sq ** 0.5
        if jnp.isnan(rnorm_sq) or rnorm <= tol:
            converged = bool(rnorm <= tol)
            break
        if len(history) >= 2 and not (rnorm_sq < min_contraction**2 * history[-2]):
            break  # stagnated at the low dtype's floor
        if j == max_refinements:
            break
        d, info = cg_solve(
            op_lo,
            r,
            tol=inner_tol * rnorm,
            maxiter=inner_maxiter,
            M=M,
            recompute_r_every=recompute_r_every,
            fused=fused,
        )
        inner_infos.append(info)
        inner_total += int(jnp.max(info.iterations))
        x = x + d.astype(b.dtype)

    return x, RefineInfo(
        refinements=len(inner_infos),
        inner_iterations=inner_total,
        converged=converged,
        rnorm_sq=rnorm_sq,
        rnorm_history=tuple(history),
        inner_infos=tuple(inner_infos),
    )
