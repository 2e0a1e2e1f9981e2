"""`scipy.sparse.linalg.cg`-compatible front-end.

The reference's users arrive from C++/SYCL (compat.CG / docs/migration.md
cover them); Python users usually arrive from ``scipy.sparse.linalg.cg``.
This shim speaks that exact signature and return convention so a scipy
call site migrates by changing one import:

    from conjugategradient_tpu.scipy_compat import cg
    x, info = cg(A_scipy, b, rtol=1e-8)    # info == 0 on convergence

Differences from the reference-parity API (`solver.cg.cg_solve`):

* termination is scipy's: ``‖r_k‖₂ <= max(rtol·‖b‖₂, atol)``, tested on the
  recurrence residual (scipy tests the same), vs the reference's absolute
  tolerance;
* return is scipy's ``(x, info)`` with ``info = 0`` converged, ``> 0`` the
  iteration count at which the cap stopped the solve, ``< 0`` illegal input
  / breakdown (NaN residual);
* ``A`` may be anything `as_linear_operator` ingests — scipy.sparse
  matrices included (duck-typed, CG.hpp:105-151's external-framework ingest
  path) — and the solve runs on whatever backend JAX targets (TPU under
  the default platform), whole loop in one jitted dispatch;
* ``callback(xk)`` is supported but forces a host round-trip per iteration
  (a step-at-a-time eager loop) — leave it None for the compiled path.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .solver.cg import cg_solve
from .types import as_linear_operator

__all__ = ["cg", "bicgstab", "minres", "lobpcg", "eigsh"]


def _check_traceable(fn, n, dtype, what: str):
    """scipy users hand over numpy-backed LinearOperators whose matvec
    cannot run under jit; fail at setup with a actionable message instead
    of a TracerArrayConversionError from inside the compiled loop."""
    try:
        jax.eval_shape(fn, jax.ShapeDtypeStruct((n,), dtype))
    except (
        jax.errors.TracerArrayConversionError,
        jax.errors.ConcretizationTypeError,
    ) as e:
        # only tracer-leak errors mean "not traceable"; genuine shape/dtype
        # bugs in a perfectly traceable matvec propagate with their own
        # traceback instead of a misleading diagnosis
        raise TypeError(
            f"{what} is not JAX-traceable ({type(e).__name__}); a "
            "numpy-backed scipy LinearOperator cannot run inside the "
            "compiled solve — pass a scipy.sparse matrix, a dense array, "
            "or a callable written with jax.numpy"
        ) from e


def cg(
    A: Any,
    b,
    x0=None,
    *,
    rtol: float = 1e-5,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Any] = None,
    callback: Optional[Callable] = None,
) -> Tuple[jax.Array, int]:
    """Drop-in for ``scipy.sparse.linalg.cg`` (see module docstring)."""
    b = jnp.asarray(b)
    if b.ndim != 1:
        raise ValueError(f"b must be 1-D, got shape {b.shape}")
    # n from b so LinearOperator-like / matrix-free A ingests without an
    # explicit dimension (scipy accepts LinearOperator A first-class)
    op = as_linear_operator(A, n=int(b.shape[0]))
    if b.shape[0] != op.shape[0]:
        raise ValueError(
            f"b has shape {b.shape}, expected ({op.shape[0]},)"
        )
    _check_traceable(op.matvec, op.shape[0], b.dtype, "A")
    if x0 is not None:
        x0 = jnp.asarray(x0, b.dtype)

    # scipy's M is an operator approximating A^-1 applied as M @ r; accept
    # a callable, anything with .matvec, or a LinearOperator-ingestible
    M_fn = None
    if M is not None:
        if callable(M) and not hasattr(M, "matvec"):
            M_fn = M
        else:
            M_op = as_linear_operator(M, n=op.shape[0])
            M_fn = M_op.matvec
        _check_traceable(M_fn, op.shape[0], b.dtype, "M")

    bnorm = float(jnp.linalg.norm(b))
    tol = max(float(rtol) * bnorm, float(atol))
    n = op.shape[0]
    mi = int(n * 10 if maxiter is None else maxiter)  # scipy default: 10n

    if callback is None:
        x, info = cg_solve(op, b, x0, tol=tol, maxiter=mi, M=M_fn)
        if bool(jnp.isnan(info.rnorm_sq)):
            return x, -1
        return x, 0 if bool(info.converged) else mi

    return _cg_callback_loop(op, b, x0, tol, mi, M_fn, callback)


def _cg_callback_loop(op, b, x0, tol, mi, M_fn, callback):
    # callback path: step at a time so xk can be observed per iteration
    from .ops.blas import dot
    from .solver.cg import CGState, cg_step

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - op.matvec(x)
    z = M_fn(r) if M_fn is not None else r
    rho = dot(r, z) if M_fn is not None else dot(r, r)
    rnorm0 = dot(r, r)
    hist = jnp.full((mi + 1,), jnp.nan, dtype=rnorm0.dtype).at[0].set(rnorm0)
    state = CGState(
        k=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
        x=x, r=r, p=z, rho=rho, rnorm_sq=rnorm0, hist=hist,
    )
    tol_arr = jnp.asarray(tol, b.dtype)
    step = jax.jit(lambda s: cg_step(op, s, tol_arr, M=M_fn))
    for _ in range(mi):
        if float(jnp.sqrt(state.rnorm_sq)) <= tol:
            return state.x, 0
        if bool(jnp.isnan(state.rnorm_sq)):
            return state.x, -1
        state = step(state)
        callback(np.asarray(state.x))
    if float(jnp.sqrt(state.rnorm_sq)) <= tol:
        return state.x, 0
    return state.x, mi


def minres(
    A: Any,
    b,
    x0=None,
    *,
    shift: float = 0.0,
    rtol: float = 1e-5,
    maxiter: Optional[int] = None,
    M: Optional[Any] = None,
    callback: Optional[Callable] = None,
) -> Tuple[jax.Array, int]:
    """Drop-in for ``scipy.sparse.linalg.minres`` — symmetric indefinite
    systems ``(A − shift·I) x = b`` (solver/minres.py).

    Same conventions as :func:`cg` above: scipy's ``(x, info)`` return,
    relative termination ``φ̄_k <= rtol·‖b‖₂`` on the recurrence residual
    estimate (‖r‖₂ for ``M=None``, else the M-norm), maxiter default 5n
    (scipy's), ``callback(xk)`` supported via the eager step-at-a-time
    path.  ``show``/``check`` are intentionally not reproduced (prints and
    a symmetry probe)."""
    b = jnp.asarray(b)
    if b.ndim != 1:
        raise ValueError(f"b must be 1-D, got shape {b.shape}")
    op = as_linear_operator(A, n=int(b.shape[0]))
    if b.shape[0] != op.shape[0]:
        raise ValueError(
            f"b has shape {b.shape}, expected ({op.shape[0]},)"
        )
    _check_traceable(op.matvec, op.shape[0], b.dtype, "A")
    if x0 is not None:
        x0 = jnp.asarray(x0, b.dtype)

    M_fn = None
    if M is not None:
        if callable(M) and not hasattr(M, "matvec"):
            M_fn = M
        else:
            M_fn = as_linear_operator(M, n=op.shape[0]).matvec
        _check_traceable(M_fn, op.shape[0], b.dtype, "M")

    from .solver.minres import minres_solve

    n = op.shape[0]
    tol = float(rtol) * float(jnp.linalg.norm(b))
    mi = int(5 * n if maxiter is None else maxiter)  # scipy default: 5n

    if callback is None:
        x, info = minres_solve(
            op, b, x0, tol=tol, maxiter=mi, M=M_fn, shift=shift
        )
        if bool(jnp.isnan(info.rnorm)):
            return x, -1
        return x, 0 if bool(info.converged) else mi

    # callback path: step at a time so xk can be observed per iteration
    from .solver.minres import minres_init, minres_step

    tol_arr = jnp.asarray(tol, b.dtype)
    shift_arr = jnp.asarray(shift, b.dtype)
    state = minres_init(op, b, x0, tol_arr, shift_arr, mi, M_fn)
    step = jax.jit(
        lambda s: minres_step(op, s, tol_arr, shift_arr, M_fn)
    )
    for _ in range(mi):
        if bool(state.nan):
            return state.x, -1
        if bool(state.done):
            return state.x, 0
        state = step(state)
        callback(np.asarray(state.x))
    if bool(state.nan):
        return state.x, -1
    return state.x, 0 if bool(state.done) else mi


def bicgstab(
    A: Any,
    b,
    x0=None,
    *,
    rtol: float = 1e-5,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    M: Optional[Any] = None,
    callback: Optional[Callable] = None,
) -> Tuple[jax.Array, int]:
    """Drop-in for ``scipy.sparse.linalg.bicgstab`` — NONSYMMETRIC systems
    (solver/bicgstab.py).

    Same conventions as :func:`cg` above: scipy's ``(x, info)`` return with
    termination ``‖r_k‖₂ <= max(rtol·‖b‖₂, atol)`` on the recurrence
    residual (tested after each half-step too, like scipy), maxiter default
    10n (scipy's), ``callback(xk)`` via the eager step-at-a-time path.
    Breakdown returns scipy's ``info = -10``.
    """
    b = jnp.asarray(b)
    if b.ndim != 1:
        raise ValueError(f"b must be 1-D, got shape {b.shape}")
    op = as_linear_operator(A, n=int(b.shape[0]))
    if b.shape[0] != op.shape[0]:
        raise ValueError(
            f"b has shape {b.shape}, expected ({op.shape[0]},)"
        )
    _check_traceable(op.matvec, op.shape[0], b.dtype, "A")
    if x0 is not None:
        x0 = jnp.asarray(x0, b.dtype)

    M_fn = None
    if M is not None:
        if callable(M) and not hasattr(M, "matvec"):
            M_fn = M
        else:
            M_fn = as_linear_operator(M, n=op.shape[0]).matvec
        _check_traceable(M_fn, op.shape[0], b.dtype, "M")

    from .solver.bicgstab import bicgstab_solve

    n = op.shape[0]
    tol = max(float(rtol) * float(jnp.linalg.norm(b)), float(atol))
    mi = int(10 * n if maxiter is None else maxiter)  # scipy default: 10n

    if callback is None:
        x, info = bicgstab_solve(op, b, x0, tol=tol, maxiter=mi, M=M_fn)
        if bool(info.breakdown):
            return x, -10  # scipy's bicgstab breakdown code
        return x, 0 if bool(info.converged) else mi

    # callback path: step at a time so xk can be observed per iteration
    from .solver.bicgstab import bicgstab_init, bicgstab_step

    tol_arr = jnp.asarray(tol, b.dtype)
    state = bicgstab_init(op, b, x0, tol_arr, mi, M_fn)
    step = jax.jit(lambda s: bicgstab_step(op, s, tol_arr, M_fn))
    for _ in range(mi):
        if bool(state.broke):
            return state.x, -10
        if bool(state.done):
            return state.x, 0
        state = step(state)
        callback(np.asarray(state.x))
    if bool(state.broke):
        return state.x, -10
    return state.x, 0 if bool(state.done) else mi


def gmres(
    A: Any,
    b,
    x0=None,
    *,
    rtol: float = 1e-5,
    atol: float = 0.0,
    restart: Optional[int] = None,
    maxiter: Optional[int] = None,
    M: Optional[Any] = None,
    callback: Optional[Callable] = None,
    callback_type: Optional[str] = None,
) -> Tuple[jax.Array, int]:
    """Drop-in for ``scipy.sparse.linalg.gmres`` (solver/gmres.py).

    scipy conventions kept: ``(x, info)`` return with ``info = 0`` on
    success and ``info = maxiter`` (cycles) on a blown budget; termination
    ``‖r‖₂ <= max(rtol·‖b‖₂, atol)``; ``restart`` defaults to scipy's 20;
    ``maxiter`` counts RESTART CYCLES (scipy's meaning — the native
    ``gmres_solve(maxiter=)`` counts inner steps instead), defaulting so
    total inner steps ≈ 10n like the other compat wrappers.

    Documented deviations: preconditioning is RIGHT preconditioning (the
    residual tested is the TRUE ``b − A x``; scipy's legacy path tests the
    left-preconditioned residual — ours is the stricter, unscaled test),
    and ``callback(xk)`` fires once per restart CYCLE (callback_type "x";
    the per-inner-step "pr_norm" / "legacy" modes are rejected — inner
    state never leaves the compiled cycle).
    """
    b = jnp.asarray(b)
    if b.ndim != 1:
        raise ValueError(f"b must be 1-D, got shape {b.shape}")
    op = as_linear_operator(A, n=int(b.shape[0]))
    if b.shape[0] != op.shape[0]:
        raise ValueError(
            f"b has shape {b.shape}, expected ({op.shape[0]},)"
        )
    _check_traceable(op.matvec, op.shape[0], b.dtype, "A")
    if x0 is not None:
        x0 = jnp.asarray(x0, b.dtype)
    if callback is not None and callback_type not in (None, "x"):
        raise ValueError(
            "callback_type 'pr_norm'/'legacy' is not supported (per-inner-"
            "step state never leaves the compiled cycle); use "
            "callback_type='x' (one callback per restart cycle)"
        )

    M_fn = None
    if M is not None:
        if callable(M) and not hasattr(M, "matvec"):
            M_fn = M
        else:
            M_fn = as_linear_operator(M, n=op.shape[0]).matvec
        _check_traceable(M_fn, op.shape[0], b.dtype, "M")

    from .solver.gmres import gmres_solve

    n = op.shape[0]
    if restart is not None and int(restart) < 1:
        # restart=0 would otherwise surface as a ZeroDivisionError from the
        # default-cycle-count ceil division below
        raise ValueError(f"restart must be >= 1, got {restart}")
    rst = min(20 if restart is None else int(restart), n)
    cycles = (
        max(1, -(-10 * n // rst)) if maxiter is None else int(maxiter)
    )
    tol = max(float(rtol) * float(jnp.linalg.norm(b)), float(atol))

    if callback is None:
        x, info = gmres_solve(
            op, b, x0, tol=tol, maxiter=cycles * rst, restart=rst, M=M_fn
        )
        if bool(info.breakdown):
            return x, -1
        return x, 0 if bool(info.converged) else cycles

    # callback path: one compiled CYCLE at a time so xk can be observed;
    # warm-starting from x IS the restart (each call recomputes r)
    x = x0
    for _ in range(cycles):
        x, info = gmres_solve(
            op, b, x, tol=tol, maxiter=rst, restart=rst, M=M_fn
        )
        callback(np.asarray(x))
        if bool(info.breakdown):
            return x, -1
        if bool(info.converged):
            return x, 0
    return x, cycles


def lobpcg(
    A: Any,
    X,
    B: Any = None,
    M: Optional[Any] = None,
    Y=None,
    tol: Optional[float] = None,
    maxiter: Optional[int] = None,
    largest: bool = True,
    verbosityLevel: int = 0,
    retLambdaHistory: bool = False,
    retResidualNormsHistory: bool = False,
    restartControl: int = 20,
):
    """Drop-in for ``scipy.sparse.linalg.lobpcg`` (solver/lobpcg.py).

    Same conventions as scipy: ``X`` is the required (n, k) initial block
    (its column count sets the number of pairs), eigenvalues come back
    descending for ``largest=True`` / ascending otherwise, convergence is
    the ABSOLUTE test ``‖A xᵢ − λᵢ (B) xᵢ‖ ≤ tol`` with scipy's default
    ``tol = n · sqrt(eps)``, maxiter defaults to 20, and the optional
    history returns are lists of (k,) arrays (entry 0 = the initial
    Rayleigh–Ritz, matching scipy's).  ``B`` (generalized pencil) and
    ``M`` (preconditioner, applied as ``M @ r``) take anything
    `as_linear_operator` ingests.

    Intentional differences: ``Y`` (constraint subspace) is not supported
    — orthogonality constraints against known eigenvectors are this
    framework's deflation surface (:func:`~conjugategradient_tpu.
    deflated_cg_solve` / ``make_deflation_basis``); ``verbosityLevel``
    prints and ``restartControl`` are no-ops (the compiled loop re-
    orthonormalizes the [X, W, P] basis by a full QR every iteration, so
    there is no separate restart heuristic to control).
    """
    if Y is not None:
        raise NotImplementedError(
            "lobpcg(Y=...) constraint subspaces are not supported; "
            "project the operator or use the deflation surface "
            "(make_deflation_basis / deflated_cg_solve) instead"
        )
    from .solver.lobpcg import lobpcg_eigs

    X = jnp.asarray(X)
    if X.ndim != 2:
        raise ValueError(f"X must be 2-D (n, k), got shape {X.shape}")
    n, k = int(X.shape[0]), int(X.shape[1])
    op = as_linear_operator(A, n=n, dtype=X.dtype)
    _check_traceable(op.matvec, n, X.dtype, "A")

    M_fn = None
    if M is not None:
        if callable(M) and not hasattr(M, "matvec"):
            M_fn = M
        else:
            M_fn = as_linear_operator(M, n=n, dtype=X.dtype).matvec
        _check_traceable(M_fn, n, X.dtype, "M")

    if tol is None:
        tol = n * float(np.sqrt(np.finfo(np.asarray(X).dtype).eps))
    mi = 20 if maxiter is None else int(maxiter)  # scipy default: 20

    result, lam_h, rn_h = lobpcg_eigs(
        op,
        k=k,
        M=M_fn,
        which="largest" if largest else "smallest",
        X0=X,
        tol=float(tol),
        maxiter=mi,
        B=B,
        dtype=X.dtype,
        tol_absolute=True,
        return_history=True,
    )
    w = result.values
    v = np.asarray(result.vectors)
    out = [w, v]
    if retLambdaHistory:
        out.append([row for row in lam_h])
    if retResidualNormsHistory:
        out.append([row for row in rn_h])
    return tuple(out) if len(out) > 2 else (w, v)


def eigsh(
    A: Any,
    k: int = 6,
    M: Any = None,
    sigma: Optional[float] = None,
    which: str = "LM",
    v0=None,
    ncv: Optional[int] = None,
    maxiter: Optional[int] = None,
    tol: float = 0,
    return_eigenvectors: bool = True,
    Minv: Any = None,
    OPinv: Any = None,
    mode: str = "normal",
):
    """Drop-in for ``scipy.sparse.linalg.eigsh`` on SPD operators.

    Same conventions as scipy/ARPACK for the supported surface:
    eigenvalues return ASCENDING regardless of ``which``; ``which`` picks
    the converged end — ``"LM"``/``"LA"`` the largest, ``"SM"``/``"SA"``
    the smallest (identical pairs on the SPD domain this framework
    serves); convergence is ARPACK's ``‖A xᵢ − λᵢ xᵢ‖ ≤ tol·|λᵢ|``;
    ``ncv`` seeds the Krylov subspace size (ARPACK's default
    ``min(n, max(2k+1, 20))``); ``v0`` starts the iteration.

    Standard problems run the one-dispatch reorthogonalized Lanczos pass
    (:func:`~conjugategradient_tpu.lanczos_eigs`), doubling the subspace
    until every requested pair converges — the restart-free analogue of
    ARPACK's implicit restarts (``maxiter`` caps the total Krylov
    dimension instead of a restart count; default: the full space,
    where reorthogonalized Lanczos is exact).  Generalized problems
    (``M`` = the SPD mass matrix, ``A x = λ M x``) run preconditioned
    LOBPCG (:func:`~conjugategradient_tpu.lobpcg_eigs`), where ``maxiter``
    caps LOBPCG iterations (default 200).  When the budget runs out before
    every pair meets the per-pair test, scipy's own
    ``ArpackNoConvergence`` is raised (carrying the converged
    eigenvalues) — matching the failure contract migrating code relies
    on.

    Intentional differences: ``tol=0`` (ARPACK: machine precision) maps
    to ``sqrt(eps)`` of the operator dtype — the single-pass Lanczos
    residual bound stagnates near there; shift-invert (``sigma``/
    ``Minv``/``OPinv``/``mode != "normal"``) is not supported — interior
    eigenvalues need inner solves this API deliberately does not grow
    (``which="SM"`` converges the small end DIRECTLY, no factorization,
    which is the usual reason scipy users reach for sigma=0); ``"BE"``
    (both ends) is not supported.
    """
    if sigma is not None or Minv is not None or OPinv is not None \
            or mode != "normal":
        raise NotImplementedError(
            "shift-invert (sigma/Minv/OPinv/mode) is not supported: the "
            "small end converges directly with which='SM' (Lanczos) or "
            "via preconditioned LOBPCG (scipy_compat.lobpcg / "
            "lobpcg_eigs(M=...)) — no factorization needed"
        )
    if which not in ("LM", "LA", "SM", "SA"):
        raise NotImplementedError(
            f"which={which!r} is not supported (use 'LM'/'LA'/'SM'/'SA'; "
            "'BE' needs two calls, one per end)"
        )
    from .solver.eigs import lanczos_eigs
    from .solver.lobpcg import lobpcg_eigs

    op = as_linear_operator(A)
    n = op.shape[0]
    k = int(k)
    if not 0 < k < n:
        raise ValueError(f"k={k} must satisfy 0 < k < n={n}")
    end = "largest" if which in ("LM", "LA") else "smallest"
    eps = float(np.finfo(np.dtype(op.dtype)).eps)
    rtol = float(tol) if tol else float(np.sqrt(eps))

    def _pair_converged(res):
        # ARPACK's per-pair test ‖A xᵢ − λᵢ xᵢ‖ ≤ tol·|λᵢ| — recomputed
        # here because lobpcg_eigs's own flag scales by the LARGEST Ritz
        # value (looser for interior/small pairs)
        vals = np.asarray(res.values, np.float64)
        resid = np.asarray(res.residuals, np.float64)
        return vals.size >= k and bool(
            np.all(resid <= rtol * np.maximum(np.abs(vals), 1e-300))
        )

    def _lobpcg(tol_inner=None, absolute=False, X0=None, mi_default=200):
        return lobpcg_eigs(
            op, k=k, B=None if M is None else op_m, which=end,
            tol=rtol if tol_inner is None else tol_inner,
            tol_absolute=absolute, X0=X0,
            maxiter=mi_default if maxiter is None else int(maxiter),
        )

    def _lobpcg_to_pair_tol():
        # lobpcg_eigs's internal test scales by the LARGEST Ritz value of
        # the whole pencil (≈ λ_max); the ARPACK contract is per-pair
        # (rtol·|λᵢ|).  One warm-restarted refinement round at the
        # ABSOLUTE tolerance rtol·min|λᵢ| (implied by the strictest pair)
        # closes the gap when the first pass stopped at its looser test.
        res = _lobpcg()
        if not _pair_converged(res):
            vals = np.abs(np.asarray(res.values, np.float64))
            if vals.size and vals.min() > 0:
                res = _lobpcg(tol_inner=rtol * float(vals.min()),
                              absolute=True, X0=res.vectors)
        return res

    if M is not None:
        op_m = as_linear_operator(M, n=n, dtype=op.dtype)
        res = _lobpcg_to_pair_tol()
    else:
        vals, vecs = _eigsh_lanczos_deflated(
            op, lanczos_eigs, _lobpcg_to_pair_tol, k, end, rtol,
            ncv, maxiter, v0, n,
        )
        res = None

    if res is not None:
        vals = np.asarray(res.values, np.float64)
        if not _pair_converged(res):
            _raise_no_convergence(res.values, res.residuals, k, rtol, n)
        vecs = None if not return_eigenvectors else np.asarray(res.vectors)

    # scipy returns ascending for eigsh regardless of which end converged
    order = np.argsort(vals)
    w = vals[order]
    if not return_eigenvectors:
        return w
    return w, np.asarray(vecs)[:, order]


def _raise_no_convergence(vals, resids, k, rtol, n):
    vals = np.asarray(vals, np.float64)
    conv = (np.asarray(resids, np.float64)
            <= rtol * np.maximum(np.abs(vals), 1e-300))
    w_ok = np.sort(vals[conv[: vals.size]])
    try:  # raise scipy's own exception type where available
        from scipy.sparse.linalg import ArpackNoConvergence

        raise ArpackNoConvergence(
            f"eigsh: only {int(conv.sum())}/{k} pairs converged to "
            f"tol={rtol:g} within the iteration budget (raise maxiter/"
            "ncv, or precondition via lobpcg_eigs(M=...))",
            w_ok, np.empty((n, 0)),
        )
    except ImportError:  # pragma: no cover - scipy always present here
        raise RuntimeError(
            f"eigsh: only {int(conv.sum())}/{k} pairs converged "
            f"(tol={rtol:g}); converged eigenvalues: {w_ok}"
        ) from None


def _eigsh_lanczos_deflated(op, lanczos_eigs, lobpcg_fallback, k, end,
                            rtol, ncv, maxiter, v0, n):
    """The eigsh standard-problem engine: adaptive Lanczos passes with
    EXPLICIT DEFLATION between passes.

    A single Krylov vector cannot resolve eigenvalue MULTIPLICITY — one
    pass of (even exact) Lanczos finds at most ONE copy of a repeated
    eigenvalue, so ``eigsh(I, k=3)`` would return one pair and a
    degenerate pair like (1, 1) would come back as (1, next-distinct).
    ARPACK splits multiplicities through its restarts; the equivalent
    here is explicit deflation: after each pass, accepted eigenvectors V
    are shifted OUT of the wanted end (``A ± σ·VVᵀ``, σ spanning the
    spectral range) and the next pass — a fresh random start — finds
    whatever the subspace hid, including further copies.  Passes repeat
    until one adds nothing to the k-best set (the common
    no-multiplicity case costs exactly two passes: find + verify).
    Every accepted pair is re-checked against the UNDEFLATED operator:
    Rayleigh quotient + exact ‖A v − ρ v‖ ≤ rtol·|ρ| after
    orthogonalization against the accepted basis.
    """
    m0 = int(ncv) if ncv is not None else min(n, max(2 * k + 1, 20))
    m0 = max(m0, 2 * k)
    m_cap = min(n, int(maxiter)) if maxiter is not None else n
    m_cap = max(m_cap, min(2 * k, n))
    v0j = None if v0 is None else jnp.asarray(v0)

    def adaptive(target, seed, use_v0):
        m = m0
        while True:
            r = lanczos_eigs(
                target, k=k, which=end, iters=min(m, m_cap),
                v0=v0j if use_v0 else None, seed=seed, rtol=rtol, n=n,
            )
            vs = np.asarray(r.values, np.float64)
            ok = (vs.size >= k and bool(np.all(
                np.asarray(r.residuals, np.float64)
                <= rtol * np.maximum(np.abs(vs), 1e-300))))
            if ok or m >= m_cap:
                return r
            m = min(2 * m, m_cap)

    # spectral-range probe for the deflation shift (one tiny pass at the
    # opposite end; Ritz extremes are interior, hence the safety factor)
    other = "largest" if end == "smallest" else "smallest"
    probe = lanczos_eigs(op, k=1, which=other, iters=min(30, n), n=n,
                         return_vectors=False)
    span = float(np.abs(np.asarray(probe.values, np.float64)).max())
    sgn = 1.0 if end == "smallest" else -1.0

    found_w: list = []
    V = np.zeros((n, 0), dtype=np.float64)

    for attempt in range(k + 2):
        # the shift must clear the whole spectral range so every accepted
        # eigenvalue leaves the wanted end: scale by BOTH ends (the
        # opposite-end probe and the largest accepted magnitude so far)
        sigma = 4.0 * max(span, max((abs(w) for w in found_w), default=0.0),
                          1.0)
        if V.shape[1]:
            Vj = jnp.asarray(V, dtype=op.dtype)

            def mv(x, _V=Vj):
                return op.matvec(x) + (sgn * sigma) * (_V @ (_V.T @ x))

            # wrap explicitly so the Krylov pass runs in op.dtype — the
            # bare-callable default is float32, which degrades the pass's
            # vectors below the exact f64 acceptance residual
            target = as_linear_operator(mv, n=n, dtype=op.dtype)
        else:
            target = op
        r = adaptive(target, seed=attempt, use_v0=attempt == 0)
        vs = np.asarray(r.values, np.float64)
        rs = np.asarray(r.residuals, np.float64)
        improved = False
        for i in range(vs.size):
            lam = float(vs[i])
            # (deflated copies of found pairs need no eigenvalue filter:
            # their vectors fail the new-direction check below, and any
            # mixed candidate faces the exact undeflated residual test)
            if rs[i] > rtol * max(abs(lam), 1e-300):
                continue
            v = np.asarray(r.vectors[:, i], np.float64)
            if V.shape[1]:
                v = v - V @ (V.T @ v)
                nrm = float(np.linalg.norm(v))
                if nrm < 0.5:  # same direction as an accepted vector
                    continue
                v = v / nrm
            # exact acceptance vs the UNDEFLATED operator
            av = np.asarray(
                op.matvec(jnp.asarray(v, op.dtype)), np.float64)
            rho = float(v @ av)
            if float(np.linalg.norm(av - rho * v)) > rtol * max(
                    abs(rho), 1e-300):
                continue
            # does it enter the k-best?
            if len(found_w) >= k:
                kth = (max(sorted(found_w)[:k]) if end == "smallest"
                       else min(sorted(found_w)[-k:]))
                better = rho < kth if end == "smallest" else rho > kth
                if not better:
                    continue
            found_w.append(rho)
            V = np.concatenate([V, v[:, None]], axis=1)
            improved = True
        if len(found_w) >= k and not improved:
            break
        if not improved and len(found_w) < k:
            break  # another identical pass will not help; fall back

    if len(found_w) < k:
        # invariant-subspace starvation the deflation passes could not
        # feed (or a genuinely unconverged end): block iteration when a
        # 3k basis fits, dense diagonalization when n is tiny
        if 3 * k <= n:
            res = lobpcg_fallback()
            vals = np.asarray(res.values, np.float64)
            resid = np.asarray(res.residuals, np.float64)
            if vals.size < k or bool(np.any(
                    resid > rtol * np.maximum(np.abs(vals), 1e-300))):
                _raise_no_convergence(vals, resid, k, rtol, n)
            return vals, np.asarray(res.vectors, np.float64)
        eye = jnp.eye(n, dtype=op.dtype)
        # column-at-a-time (n < 3k, so n is ~tens at most; some layout
        # matvecs do not vmap — Pallas)
        dense = jnp.stack([op.matvec(eye[:, j]) for j in range(n)], axis=1)
        w_all, v_all = np.linalg.eigh(np.asarray(dense, np.float64))
        sl = slice(0, k) if end == "smallest" else slice(n - k, n)
        return w_all[sl], v_all[:, sl]

    order = np.argsort(np.asarray(found_w))
    order = order[:k] if end == "smallest" else order[-k:]
    return np.asarray(found_w)[order], V[:, order]
