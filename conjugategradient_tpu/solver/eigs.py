"""Public Lanczos eigensolver for SPD operators.

The reference library has no eigensolver — this module makes public the
TPU-native Lanczos infrastructure the framework's own subsystems already
run on: Chebyshev interval estimation (solver/precond.py
estimate_spectral_bounds) and deflation-basis harvesting
(solver/deflated.py make_deflation_basis).  Users get the same one-jitted-
dispatch reorthogonalized Lanczos pass (precond._lanczos_tridiag_device:
the whole k-step recurrence, matvecs included, is ONE device program — no
per-step host round-trips through the ~26 ms relay), plus the small-dense
eigendecomposition on the host, Ritz vectors assembled on device, and the
standard residual bound per pair.

Typical uses: condition-number estimates before choosing a preconditioner,
spectral intervals for Chebyshev, eigenmode extraction for deflation, or
plain "what does this operator's spectrum look like".

Accepts everything ``types.as_linear_operator`` accepts: any of the six
device layouts, scipy.sparse, dense arrays, or a matvec callable with
``n=``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import as_linear_operator

_HI = jax.lax.Precision.HIGHEST

#: Ritz pairs whose Lanczos residual bound falls below this (relative to
#: the pair's |theta|) are flagged converged in :class:`EigsResult`.
DEFAULT_RTOL = 1e-6


class EigsResult(NamedTuple):
    """Ritz approximations to an SPD operator's eigenpairs.

    ``values`` are sorted per ``which`` (ascending for ``"smallest"``,
    descending for ``"largest"``); ``vectors`` is the matching ``(n, k)``
    column stack or ``None`` when ``return_vectors=False``.  ``residuals``
    is the classical Lanczos residual bound ‖A uᵢ − θᵢ uᵢ‖ = β_m·|yᵢ[m−1]|
    — computed from the recurrence, no extra matvec.  ``converged`` marks
    pairs with residual ≤ rtol·|θᵢ|; ``iters`` is the Krylov dimension
    actually used (shorter than requested iff Lanczos found an invariant
    subspace, in which case every Ritz pair in it is exact).
    """

    values: np.ndarray
    vectors: Optional[jax.Array]
    residuals: np.ndarray
    converged: np.ndarray
    iters: int


def _lanczos_ritz(A: Any, iters: int, n: Optional[int], seed: int,
                  v0: Optional[jax.Array]):
    """Shared Lanczos→tridiagonal→eigh pass.

    Returns (op, V, vals, Y, betas, mm): the device Lanczos basis ``V``
    (mm, n), the FULL ascending Ritz spectrum (vals, Y) of the truncated
    tridiagonal, the beta coefficients, and the truncation point mm.
    """
    from .precond import _lanczos_tridiag_device

    op = as_linear_operator(A, n=n)
    m_rows = op.shape[0]
    m = int(min(iters, m_rows))
    if m < 1:
        raise ValueError(f"need iters >= 1, got {iters}")
    if v0 is None:
        v0 = jnp.asarray(
            np.random.default_rng(seed).standard_normal(m_rows),
            dtype=op.dtype,
        )
    op_arrays, op_static = jax.tree_util.tree_flatten(op)
    V, alphas, betas = _lanczos_tridiag_device(
        tuple(op_arrays), op_static, v0, m
    )
    alphas = np.asarray(alphas, np.float64)
    betas = np.asarray(betas, np.float64)
    # truncate at the first breakdown: the Krylov space became invariant
    # and the Ritz pairs inside it are exact eigenpairs
    stop = np.flatnonzero(betas < 1e-12)
    mm = int(stop[0]) + 1 if len(stop) else m
    T = np.diag(alphas[:mm])
    if mm > 1:
        off = betas[: mm - 1]
        T = T + np.diag(off, 1) + np.diag(off, -1)
    vals, Y = np.linalg.eigh(T)
    return op, V, vals, Y, betas, mm


def lanczos_eigs(
    A: Any,
    k: int = 6,
    which: str = "smallest",
    iters: Optional[int] = None,
    n: Optional[int] = None,
    seed: int = 0,
    v0: Optional[jax.Array] = None,
    return_vectors: bool = True,
    rtol: float = DEFAULT_RTOL,
) -> EigsResult:
    """k extreme Ritz pairs of an SPD operator via reorthogonalized Lanczos.

    ``which`` selects the end of the spectrum: ``"smallest"`` (values
    ascending) or ``"largest"`` (descending) — the ends are where Lanczos
    converges first; interior eigenvalues need shift-invert machinery this
    API deliberately does not grow.  ``iters`` (default ``max(2k, k+10)``,
    capped at n) is the Krylov dimension: ONE device dispatch running
    ``iters`` SpMVs + full reorthogonalization, then an ``iters``-sized
    host eigh.  Trust a pair when its ``residuals`` entry is small —
    ``converged`` applies ``rtol`` for you; raise ``iters`` until the pairs
    you need converge.

    Extreme-end accuracy note: Ritz values approximate the spectrum from
    the inside (θ_min ≥ λ_min, θ_max ≤ λ_max) — for guaranteed-enclosing
    Chebyshev intervals use :func:`precond.estimate_spectral_bounds`,
    which pads exactly for that.
    """
    if which not in ("smallest", "largest"):
        raise ValueError(
            f"which must be 'smallest' or 'largest', got {which!r}"
        )
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    m_req = int(iters if iters is not None else max(2 * k, k + 10))
    if k > m_req:
        raise ValueError(f"need k <= iters, got k={k}, iters={m_req}")
    op, V, vals, Y, betas, mm = _lanczos_ritz(A, m_req, n, seed, v0)
    kk = min(k, mm)
    if which == "smallest":
        sel = np.arange(kk)
    else:
        sel = np.arange(len(vals) - 1, len(vals) - 1 - kk, -1)
    theta = vals[sel]
    # classical bound: ‖A uᵢ − θᵢ uᵢ‖ = β_mm · |last component of yᵢ|
    # (exactly 0 past a breakdown, where betas[mm-1] was zeroed)
    beta_last = betas[mm - 1] if mm <= len(betas) else 0.0
    resid = np.abs(beta_last * Y[-1, sel])
    vectors = None
    if return_vectors:
        Yk = jnp.asarray(Y[:, sel], dtype=V.dtype)
        vectors = jnp.matmul(V[:mm].T, Yk, precision=_HI).astype(op.dtype)
    return EigsResult(
        values=theta,
        vectors=vectors,
        residuals=resid,
        converged=resid <= rtol * np.maximum(np.abs(theta), 1e-300),
        iters=mm,
    )


def condition_estimate(
    A: Any,
    iters: int = 30,
    n: Optional[int] = None,
    seed: int = 0,
    v0: Optional[jax.Array] = None,
) -> float:
    """Estimate κ₂(A) = λ_max/λ_min of an SPD operator from one Lanczos pass.

    Both extremes come from the SAME tridiagonal, so this costs exactly one
    :func:`lanczos_eigs` dispatch.  Ritz extremes sit inside the true
    spectrum, so the estimate is a LOWER bound on the true κ₂ — it
    converges from below as ``iters`` grows (the ends converge first, so
    30 steps is usually plenty for the order of magnitude that drives
    CG iteration-count expectations ~√κ).
    """
    _, _, vals, _, _, _ = _lanczos_ritz(A, iters, n, seed, v0)
    lo = float(vals[0])
    if lo <= 0:
        raise ValueError(
            f"smallest Ritz value {lo} is not positive — the operator is "
            "not SPD (or iters is far too small for this spectrum)"
        )
    return float(vals[-1]) / lo
