"""LOBPCG — preconditioned block eigensolver for SPD operators.

Locally Optimal Block Preconditioned Conjugate Gradient (Knyazev): the
eigensolver counterpart of the framework's PCG machinery.  Where
:func:`~.eigs.lanczos_eigs` builds one unpreconditioned Krylov space,
LOBPCG iterates a k-column block with a preconditioner — the SAME ``M``
callables the linear solves use (Jacobi, block-Jacobi, Chebyshev,
multigrid, AMG, FSAI) — and converges to the smallest eigenpairs at a rate
set by M⁻¹A's spectrum, not A's.  The reference has no eigensolver at all
(SURVEY.md §2); this extends the north-star spectral surface
(estimate_spectral_bounds / lanczos_eigs / condition_estimate).

TPU-first shape: the whole iteration is ONE jitted ``lax.while_loop`` —
fixed (n, 3k) basis, block matvecs through the layout-specific multi-RHS
SpMVs where they exist (bell/SELL/DIA lockstep kernels, solver/batched.
_lockstep_ops), (3k)² Rayleigh–Ritz via in-loop ``jnp.linalg.eigh``, zero
host round-trips.  Robustness choice: the search basis is re-orthonormal-
ized by a full QR and A is applied to the ORTHONORMAL Q directly (3k
matvecs/iteration instead of k + triangular back-solves) — rank collapse
near convergence then degrades to harmless orthonormal completions
instead of NaNs from an ill-conditioned Gram/R factor, which is the
classic LOBPCG failure mode.  The preconditioner dominates the cost in
the intended (MG/AMG/FSAI) regime anyway.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import (
    BlockedEllMatrix,
    DIAMatrix,
    SellMatrix,
    SymBellMatrix,
    SymDIAMatrix,
    as_linear_operator,
)
from .eigs import DEFAULT_RTOL, EigsResult

_HI = jax.lax.Precision.HIGHEST


def _block_matvec(op):
    """(n, R) block matvec: layout multi-RHS kernel when one exists,
    otherwise the unrolled column map (NOT vmap — Pallas windowed kernels
    reject vmap's batching rule; see solver/batched._columns_mapped)."""
    from .batched import _columns_mapped, _lockstep_ops

    if isinstance(
        op, (BlockedEllMatrix, SymBellMatrix, SellMatrix, DIAMatrix,
             SymDIAMatrix)
    ):
        mv, _, _ = _lockstep_ops(op, None, None)
        return mv
    return _columns_mapped(op.matvec)


def _normalize_cols(X, tiny):
    nrm = jnp.linalg.norm(X, axis=0)
    return X / jnp.maximum(nrm, tiny)[None, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "op_static", "b_static", "k", "maxiter", "M", "largest", "absolute"
    ),
)
def _lobpcg_device(op_arrays, op_static, b_arrays, b_static, X0, P0, tol,
                   k: int, maxiter: int, M, largest: bool, absolute: bool):
    """The jitted LOBPCG loop.

    Standard (``b_static is None``) or generalized (``A x = λ B x``)
    Rayleigh–Ritz: with B, the (3k)² pencil ``T y = θ G y`` (G = QᵀBQ) is
    reduced through a Cholesky congruence ``L⁻¹ T L⁻ᵀ`` so the in-loop
    solve stays a plain ``eigh`` — the Ritz block comes out B-orthonormal
    for free (yᵀGy = I).  Returns
    (lam, X, rn, theta_scale, iters, lam_hist, rn_hist) with the histories
    in fixed (maxiter+1, k) buffers (entry 0 = the initial Rayleigh–Ritz).
    """
    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    mv = _block_matvec(op)
    dt = jnp.promote_types(X0.dtype, jnp.float32)
    tiny = jnp.asarray(np.finfo(np.dtype(dt)).tiny ** 0.5, dt)
    X0 = X0.astype(dt)
    P0 = P0.astype(dt)
    tol = tol.astype(dt)

    def a_apply(Y):
        return mv(Y.astype(op.dtype)).astype(dt)

    if b_static is None:
        b_apply = None
    else:
        bop = jax.tree_util.tree_unflatten(b_static, b_arrays)
        bmv = _block_matvec(bop)

        def b_apply(Y):
            return bmv(Y.astype(bop.dtype)).astype(dt)

    def m_apply(R):
        if M is None:
            return R
        # unrolled columns (k is static): M is a single-vector apply and
        # may wrap Pallas kernels whose Mosaic lowering rejects vmap
        return jnp.stack([M(R[:, j]) for j in range(k)], axis=1)

    def select(w, C):
        # eigh returns ascending; pick the wanted end, wanted-order
        if largest:
            return w[-k:][::-1], C[:, -k:][:, ::-1]
        return w[:k], C[:, :k]

    def rayleigh_ritz(Q, AQ):
        """Ritz pairs of the pencil (QᵀAQ, QᵀBQ) — plain eigh when B=I.

        Returns (w_full, C_full, BQ): coefficient columns C are
        G-orthonormal (B-orthonormal Ritz vectors); BQ is reused for the
        generalized residual A X − B X Λ."""
        T = jnp.matmul(Q.T, AQ, precision=_HI)
        T = 0.5 * (T + T.T)
        if b_apply is None:
            w, C = jnp.linalg.eigh(T)
            return w, C, None
        BQ = b_apply(Q)
        G = jnp.matmul(Q.T, BQ, precision=_HI)
        G = 0.5 * (G + G.T)
        # Cholesky congruence: G = LLᵀ, eigh(L⁻¹ T L⁻ᵀ), C = L⁻ᵀ C'
        m = Q.shape[1]
        L = jnp.linalg.cholesky(G + tiny * jnp.eye(m, dtype=dt))
        Ti = jax.scipy.linalg.solve_triangular(L, T, lower=True)
        Ti = jax.scipy.linalg.solve_triangular(L, Ti.T, lower=True).T
        w, Cp = jnp.linalg.eigh(0.5 * (Ti + Ti.T))
        C = jax.scipy.linalg.solve_triangular(L.T, Cp, lower=False)
        return w, C, BQ

    def ritz_update(Q, AQ):
        """One Rayleigh–Ritz: returns (lam, Cx, X, AX, R, rn, wmax)."""
        w, C, BQ = rayleigh_ritz(Q, AQ)
        lam, Cx = select(w, C)
        X = jnp.matmul(Q, Cx, precision=_HI)
        AX = jnp.matmul(AQ, Cx, precision=_HI)
        if BQ is None:
            R = AX - X * lam[None, :]
        else:
            BX = jnp.matmul(BQ, Cx, precision=_HI)
            R = AX - BX * lam[None, :]
        rn = jnp.linalg.norm(R, axis=0)
        return lam, Cx, X, AX, R, rn, jnp.abs(w).max()

    def scale_of(theta):
        return jnp.asarray(1.0, dt) if absolute else theta

    # ---- initial Rayleigh–Ritz on span(X0) ------------------------------
    Xq, _ = jnp.linalg.qr(X0)
    lam, _, X, AX, R, rn, wmax = ritz_update(Xq, a_apply(Xq))
    theta = jnp.maximum(wmax, tiny)
    P = P0
    lam_h = jnp.full((maxiter + 1, k), jnp.nan, dt).at[0].set(lam)
    rn_h = jnp.full((maxiter + 1, k), jnp.nan, dt).at[0].set(rn)

    def cond(carry):
        _, _, _, _, rn, theta, it, _, _ = carry
        return (it < maxiter) & ~jnp.all(rn <= tol * scale_of(theta))

    def body(carry):
        X, P, lam, R, _, theta, it, lam_h, rn_h = carry
        W = _normalize_cols(m_apply(R), tiny)
        P = _normalize_cols(P, tiny)
        S = jnp.concatenate([X, W, P], axis=1)
        Q, _ = jnp.linalg.qr(S)  # (n, 3k) orthonormal; QR absorbs rank loss
        lam_new, Cx, X_new, _, R_new, rn_new, wmax = ritz_update(
            Q, a_apply(Q))
        # the locally-optimal direction block: the new Ritz vectors minus
        # their component in span(X) — Q[:, :k] spans X exactly (QR is
        # unpivoted), so zeroing the first k coefficient rows removes it
        Cp = Cx.at[:k, :].set(0.0)
        P_new = jnp.matmul(Q, Cp, precision=_HI)
        theta_new = jnp.maximum(theta, wmax)
        lam_h = lam_h.at[it + 1].set(lam_new)
        rn_h = rn_h.at[it + 1].set(rn_new)
        return (X_new, P_new, lam_new, R_new, rn_new, theta_new, it + 1,
                lam_h, rn_h)

    carry = (X, P, lam, R, rn, theta, jnp.asarray(0, jnp.int32),
             lam_h, rn_h)
    X, P, lam, R, rn, theta, it, lam_h, rn_h = jax.lax.while_loop(
        cond, body, carry)
    return lam, X, rn, theta, it, lam_h, rn_h


def lobpcg_eigs(
    A: Any,
    k: int = 4,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    which: str = "smallest",
    X0: Optional[jax.Array] = None,
    tol: float = DEFAULT_RTOL,
    maxiter: int = 100,
    n: Optional[int] = None,
    seed: int = 0,
    dtype=None,
    B: Any = None,
    tol_absolute: bool = False,
    return_history: bool = False,
):
    """k extreme eigenpairs of an SPD (pencil) via preconditioned LOBPCG.

    Solves ``A x = λ x``, or the generalized problem ``A x = λ B x`` when
    ``B`` is given (the FEM stiffness/mass pencil — the reference's hiflow
    context, CG.hpp:104-151, works in exactly this pair).

    Args:
      A: anything :func:`~conjugategradient_tpu.types.as_linear_operator`
        accepts (six device layouts, scipy.sparse, dense, matvec callable
        with ``n=``).
      k: block size = number of eigenpairs.  Requires ``3k <= n`` (the
        search basis is [X, W, P]); for larger k use a dense ``eigh``.
      M: SPD preconditioner apply ``r -> M⁻¹r`` — any of the framework's
        preconditioners (Jacobi/block-Jacobi/Chebyshev/multigrid/AMG/
        FSAI).  ``None`` = unpreconditioned (still locally optimal).
      which: ``"smallest"`` (the preconditioned use case — M ≈ A⁻¹ makes
        the small end easy) or ``"largest"``.
      X0: optional (n, k) initial block (random by ``seed`` otherwise).
      tol: residual tolerance — pair i counts converged when
        ‖A xᵢ − λᵢ (B) xᵢ‖ ≤ tol · θ_max with θ_max the largest Ritz value
        seen (a running lower bound on ‖A‖₂, resp. the pencil's largest
        Ritz value); with ``tol_absolute=True`` the comparison is
        ‖·‖ ≤ tol directly (scipy's convention).
      maxiter: iteration cap (each iteration: 3k A-matvecs + k M-applies
        (+ 3k B-matvecs when generalized), one (n,3k) QR, one (3k)² eigh
        — all inside one device program).
      dtype: forwarded to ``as_linear_operator`` for scipy/callable ingest
        (matrix-free callables default to float32 without it).
      B: optional SPD right-hand operator (same ingest surface as ``A``);
        Ritz vectors come out B-orthonormal.
      return_history: also return ``(lam_history, rnorm_history)`` —
        (iters+1, k) arrays, entry 0 the initial Rayleigh–Ritz.

    Returns :class:`~.eigs.EigsResult` (``iters`` is the LOBPCG iteration
    count actually run), plus the two histories when ``return_history``.
    Deterministic for fixed inputs/seed.
    """
    if which not in ("smallest", "largest"):
        raise ValueError(
            f"which must be 'smallest' or 'largest', got {which!r}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if maxiter < 1:
        raise ValueError(f"need maxiter >= 1, got {maxiter}")
    op = as_linear_operator(A, n=n, dtype=dtype)
    m_rows = op.shape[0]
    if 3 * k > m_rows:
        raise ValueError(
            f"LOBPCG needs 3k <= n (basis [X, W, P]); got k={k}, "
            f"n={m_rows} — use a dense eigensolver at this size"
        )
    if B is not None:
        bop = as_linear_operator(B, n=m_rows, dtype=dtype)
        if bop.shape[0] != m_rows:
            raise ValueError(
                f"B must match A's dimension {m_rows}, got {bop.shape[0]}")
        b_arrays, b_static = jax.tree_util.tree_flatten(bop)
    else:
        b_arrays, b_static = (), None
    rng = np.random.default_rng(seed)
    if X0 is None:
        X0 = jnp.asarray(rng.standard_normal((m_rows, k)), dtype=op.dtype)
    else:
        X0 = jnp.asarray(X0)
        if X0.shape != (m_rows, k):
            raise ValueError(
                f"X0 must have shape ({m_rows}, {k}), got {X0.shape}")
    # a random (orthonormalized-in-loop) initial P keeps the basis full
    # rank on iteration 1 without a shape-changing [X, W]-only special case
    P0 = jnp.asarray(rng.standard_normal((m_rows, k)), dtype=op.dtype)

    op_arrays, op_static = jax.tree_util.tree_flatten(op)
    lam, X, rn, theta, it, lam_h, rn_h = _lobpcg_device(
        tuple(op_arrays), op_static, tuple(b_arrays), b_static, X0, P0,
        jnp.asarray(tol), k, maxiter, M, which == "largest",
        bool(tol_absolute),
    )
    lam_np = np.asarray(lam, np.float64)
    rn_np = np.asarray(rn, np.float64)
    scale = 1.0 if tol_absolute else max(float(theta), 1e-300)
    result = EigsResult(
        values=lam_np,
        vectors=X.astype(op.dtype),
        residuals=rn_np,
        converged=rn_np <= tol * scale,
        iters=int(it),
    )
    if not return_history:
        return result
    stop = int(it) + 1
    return (
        result,
        np.asarray(lam_h, np.float64)[:stop],
        np.asarray(rn_h, np.float64)[:stop],
    )
