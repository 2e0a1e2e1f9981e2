"""The CG driver — TPU-native rebuild of ``src/CG.hpp`` (class CG, :53-601).

Design: the reference submits ~9 dependent SYCL tasks per iteration and
synchronizes the host once per iteration (CG.hpp:359-436, ``executeQueue()``
at :425).  Here the *entire* solve — init, iteration loop, termination test —
is one jitted ``lax.while_loop``: zero host round-trips, the event DAG
becomes XLA data flow, and α/β never leave the device (matching the
reference's device-resident ``Scalar`` contract, LinearAlgebraTypes.hpp:210-250).

Numerical semantics reproduce SURVEY.md §2.3 exactly:

* classic unpreconditioned CG with the recurrence residual and
  Hestenes–Stiefel α/β (CG.hpp:386,414);
* x₀ defaults to 0 (CG.hpp:291-297);
* ``tol`` is an **absolute** tolerance on ‖r‖₂; an iteration k tests the
  *pre-update* residual ρ_k = r_kᵀr_k: done ⇔ isnan(ρ_k) or √ρ_k ≤ tol
  (CG.hpp:401-402).  The reference evaluates this test *after* performing
  update k (its data race resolved to the deterministic interpretation per
  SURVEY §2.3(5)), so convergence is observed one update late — we replicate
  that to get iteration-for-iteration parity;
* iteration cap: the reference's ``do {…} while (counter++ < N)`` executes at
  most N+1 iterations (CG.hpp:436), hence ``maxiter`` defaults to N+1;
* the per-iteration residual observable is ρ_k (the device scalar ``rxr``),
  returned as ``CGInfo.rho_history``.

Preconditioning (Jacobi & friends) is the PCG generalization the reference
lacks; with ``M=None`` the recurrences reduce bit-for-bit to plain CG.
"""

from __future__ import annotations

import dataclasses
import functools

from collections import OrderedDict
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import LinearOperator, as_linear_operator
from ..ops.blas import dot
from .restart import while_with_periodic_restart


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CGInfo:
    """Solve metadata (replaces the reference's side-channel clog prints,
    CG.hpp:428-434, with returned data)."""

    iterations: jax.Array  # int32 — number of loop bodies executed
    converged: jax.Array  # bool — tolerance met (not the iteration cap)
    rho: jax.Array  # final r·r (or r·z in PCG — see rnorm_sq)
    rnorm_sq: jax.Array  # final ‖r‖² (== rho when unpreconditioned)
    rho_history: jax.Array  # (maxiter+1,) ‖r_k‖² per iteration; NaN-padded

    def tree_flatten(self):
        return (
            self.iterations,
            self.converged,
            self.rho,
            self.rnorm_sq,
            self.rho_history,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def residual_norms(self):
        return jnp.sqrt(self.rho_history)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CGState:
    """Explicit solver carry — checkpointable pytree (SURVEY §5: the rebuild
    exposes ``(x, r, p, rho, k)`` so checkpoint/resume falls out for free)."""

    k: jax.Array
    done: jax.Array
    x: jax.Array
    r: jax.Array
    p: jax.Array
    rho: jax.Array  # r·z (== r·r unpreconditioned)
    rnorm_sq: jax.Array  # r·r, the termination/history observable
    hist: jax.Array

    def tree_flatten(self):
        return (
            self.k,
            self.done,
            self.x,
            self.r,
            self.p,
            self.rho,
            self.rnorm_sq,
            self.hist,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _identity_precond(r):
    return r


def cg_init(
    A: LinearOperator,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    maxiter: int = 0,
) -> CGState:
    """Build the initial carry: r₀ = b − A·x₀, p₀ = z₀ = M⁻¹r₀.

    Mirrors the reference's fused init kernel ``r = b − A·x₀; p = r``
    (CG.hpp:314-333) — under jit, XLA fuses the subtraction into the SpMV
    epilogue exactly like the reference's hand-fused kernel.
    """
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - A.matvec(x0)
    z0 = r0 if M is None else M(r0)
    rnorm0 = dot(r0, r0)
    rho0 = rnorm0 if M is None else dot(r0, z0)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=rnorm0.dtype)
    hist = hist.at[0].set(rnorm0)
    return CGState(
        k=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        x=x0,
        r=r0,
        p=z0,
        rho=rho0,
        rnorm_sq=rnorm0,
        hist=hist,
    )


def cg_step(
    A: LinearOperator,
    state: CGState,
    tol: jax.Array,
    M: Optional[Callable[[jax.Array], jax.Array]] = None,
    dot_fn: Callable[[jax.Array, jax.Array], jax.Array] = dot,
) -> CGState:
    """One CG iteration — the rebuild of the reference's per-iteration task
    DAG (CG.hpp:359-425; see SURVEY §2.3(6) for the edge list).

    ``dot_fn`` is injectable so the sharded solver can drop in a
    psum-reducing dot (parallel/sharded_cg.py) without touching this code.

    Exact-convergence guard: when ρ_k is exactly 0 (warm start at the
    solution, b = 0), the reference computes α = 0/0 = NaN and poisons x in
    the body that then observes convergence; here α and β are forced to 0
    in that case so the final body is a no-op and x survives.  When ρ_k > 0
    but pᵀAp = 0 (A singular/indefinite), α still becomes NaN/inf and the
    NaN exit fires exactly like the reference (CG.hpp:401).
    """
    q = A.matvec(state.p)  # spmv                     (CG.hpp:374)
    pap = dot_fn(state.p, q)  # dot(Ap, p) -> value2     (CG.hpp:378)
    exact = state.rho == 0
    alpha = jnp.where(exact, 0, state.rho / jnp.where(exact, 1, pap))
    # dot() widens scalars to >= f32; compute the updates in the promoted
    # dtype but cast back so low-precision (bf16) carries keep their type
    x = (state.x + alpha * state.p).astype(state.x.dtype)  # sapbx (CG.hpp:390)
    r = (state.r - alpha * q).astype(state.r.dtype)  # sambx       (CG.hpp:392)
    # Termination tests the PRE-update residual ρ_k (CG.hpp:401-402, race
    # resolved deterministically per SURVEY §2.3(5)).
    done = jnp.isnan(state.rnorm_sq) | (jnp.sqrt(state.rnorm_sq) <= tol)
    z = r if M is None else M(r)
    rnorm_next = dot_fn(r, r) if M is not None else dot_fn(r, z)
    rho_next = rnorm_next if M is None else dot_fn(r, z)
    beta = jnp.where(exact, 0, rho_next / jnp.where(exact, 1, state.rho))
    p = (z + beta * state.p).astype(state.p.dtype)  # sapbx (CG.hpp:418)
    k = state.k + 1
    hist = state.hist.at[k].set(rnorm_next)
    return CGState(
        k=k,
        done=done,
        x=x,
        r=r,
        p=p,
        rho=rho_next,
        rnorm_sq=rnorm_next,
        hist=hist,
    )


def cg_solve(
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
    """Solve the SPD system ``A x = b`` with (preconditioned) CG.

    Functional replacement for the reference's stateful
    ``setMatrix/setTarget/setInitial/solve/extract`` object API
    (CG.hpp:87-255,517-532): one call in, ``(x, info)`` out.

    Args:
      A: LinearOperator / dense array / callable (with ``n=``).
      b: right-hand side.
      x0: initial guess; defaults to zeros (CG.hpp:291-297).
      tol: ABSOLUTE tolerance on ‖r‖₂ — the reference's ``improvement``
        argument (CG.hpp:255,401-402).  0 runs to the iteration cap, like the
        harness's 1e-24 (test/Tester.cpp:45).
      maxiter: iteration cap; defaults to N+1 (the reference's do-while
        executes at most N+1 bodies, CG.hpp:436).
      M: preconditioner apply ``r -> M⁻¹ r`` (extension; None = plain CG).
      recompute_r_every: if > 0, replace the recurrence residual with the
        true residual ``b − A x`` every that many iterations (van der
        Vorst-style residual replacement).  In float32 at large N the
        recurrence drifts from the true residual; replacement keeps the
        termination test and reported history honest at the cost of one
        extra SpMV per interval.  0 (default) reproduces the reference's
        never-recompute semantics (CG.hpp:392).  Composes with the fused
        TPU path (round 5): the hot body stays the two-kernel loop and the
        replacement runs at while-loop boundaries (solver/restart.py).

      fused: "auto" (default) dispatches f32 solves on TPU to the
        two-fused-Pallas-kernel iteration — blocked-ELL and SYMMETRIC
        blocked-ELL (solver/fused.py, incl. Jacobi-PCG when M comes from
        ``jacobi_preconditioner``) and matrix-free stencil
        (solver/fused_stencil.py); "never" forces the portable loop;
        "always" requires a fused-capable operator.

    Note: the whole solve is cached as one compiled program keyed on the
    operator structure/shapes and on ``M``'s identity — reuse the same
    preconditioner object across solves (a fresh closure per call compiles
    a fresh executable).

    Jit-compatible: ``jax.jit(cg_solve, static_argnames=("maxiter", "n",
    "M", "recompute_r_every", "fused"))`` — these steer Python control flow
    at trace time, so they must be static too.  The body is a single
    ``lax.while_loop`` either way.
    """
    op = as_linear_operator(A, n=n, dtype=getattr(b, "dtype", None))
    N = op.shape[0]
    if maxiter is None:
        maxiter = N + 1
    maxiter = int(maxiter)

    # TPU fast path: blocked-ELL operators with f32 vectors run the
    # two-fused-Pallas-kernel iteration (solver/fused.py) — same semantics,
    # ~2 device kernels per iteration instead of ~10.  "never" forces the
    # portable loop below (the float64/parity/preconditioned path).
    # Jacobi-PCG fast path: a preconditioner built by jacobi_preconditioner
    # carries its diagonal (precond.py); the fused kernels fold the M⁻¹
    # apply into the direction update and the ρ reduction (config 3's
    # "fused preconditioner-apply kernel").
    inv_diag = getattr(M, "inv_diag", None)
    if fused in ("auto", "always") and inv_diag is not None:
        from .fused import fused_bell_pcg_solve, fused_supported

        if fused_supported(op, dtype=getattr(b, "dtype", None)):
            return fused_bell_pcg_solve(
                op, b, inv_diag, x0, tol=tol, maxiter=maxiter,
                recompute_r_every=recompute_r_every,
            )
        if fused == "always":
            raise ValueError(
                "fused='always' with Jacobi needs a fused-capable "
                "blocked-ELL operator on a TPU backend (solver/fused.py)"
            )

    if fused == "always" and M is not None and inv_diag is None:
        # "always" must fail loudly rather than silently run the portable
        # loop: only Jacobi preconditioning folds into the fused kernels.
        # (Residual replacement DOES compose — solver/restart.py boundary
        # chunks around the fused while_loop.)
        raise ValueError(
            "fused='always' supports only unpreconditioned or Jacobi "
            "(jacobi_preconditioner) solves"
        )
    if fused != "never" and M is None:
        from .fused import fused_bell_cg_solve, fused_supported
        from .fused_stencil import (
            fused_stencil_cg_solve,
            fused_stencil_supported,
        )

        bdt = getattr(b, "dtype", None)
        if fused == "always":
            try:
                backend = jax.default_backend()
            except Exception:  # pragma: no cover
                backend = "cpu"
            if backend != "tpu":
                # the compiled (non-interpret) Pallas kernels only lower on
                # TPU; crashing inside pallas_call on CPU helps nobody
                raise ValueError(
                    "fused='always' needs a TPU backend; for CPU testing "
                    "call solver.fused.fused_bell_cg_solve / "
                    "solver.fused_stencil.fused_stencil_cg_solve with "
                    "interpret=True"
                )
            if fused_supported(op, dtype=bdt):
                return fused_bell_cg_solve(
                    op, b, x0, tol=tol, maxiter=maxiter,
                    recompute_r_every=recompute_r_every,
                )
            if fused_stencil_supported(op, dtype=bdt):
                return fused_stencil_cg_solve(
                    op, b, x0, tol=tol, maxiter=maxiter,
                    recompute_r_every=recompute_r_every,
                )
            raise ValueError(
                "fused='always' needs a blocked-ELL operator with square "
                "lane-aligned tiles or a lane-aligned StencilOperator, with "
                "float32 vectors (solver/fused.py, solver/fused_stencil.py)"
            )
        if fused == "auto":
            if fused_supported(op, dtype=bdt):
                return fused_bell_cg_solve(
                    op, b, x0, tol=tol, maxiter=maxiter,
                    recompute_r_every=recompute_r_every,
                )
            if fused_stencil_supported(op, dtype=bdt):
                return fused_stencil_cg_solve(
                    op, b, x0, tol=tol, maxiter=maxiter,
                    recompute_r_every=recompute_r_every,
                )

    # The WHOLE solve (init, loop, info assembly) runs as one jitted call:
    # eager setup ops cost a full dispatch round-trip each on remote-relay
    # backends (~26 ms apiece measured — they dominated an entire 1.6M-row
    # solve before this), and jax.jit's cache keys on the operator pytree
    # structure + shapes, so repeat solves skip retracing entirely.
    tol_arr = jnp.asarray(tol, dtype=b.dtype)

    # DIA fast path on TPU: compile the solve PER OPERATOR with the
    # diagonals closed over as jit constants.  A diagonal array passed as a
    # jit ARGUMENT costs a per-iteration relayout in front of the Pallas
    # kernel (measured at 99 diagonals / n=331K: 0.62 ms/matvec as an arg
    # vs 0.19 as a constant — neither blocked re-layouts nor flat-1-D args
    # recover it, and XLA does not hoist the conversion out of the
    # while_loop); as a CONSTANT, XLA pre-tiles it once at compile time
    # and pins what fits in VMEM.  Worth a per-operator compile exactly in
    # the production pattern (one A, many b); bounded LRU, big-operator
    # gate (closures ≳400 MB die in remote-compile — CLAUDE.md).
    from ..types import DIAMatrix, SymDIAMatrix

    # the per-operator caches below require a CONCRETE operator AND concrete
    # vectors: under an outer jit/vmap op.diags (or b/x0) is a tracer —
    # caching the operator would leak the trace, and a traced b defers the
    # constant-closure compile to outer execution, bypassing both the
    # HTTP-413 runtime fallback and the failure caching below
    def _concrete(a):
        return a is None or not isinstance(a, jax.core.Tracer)

    # SymDIAMatrix rides the same constant-closure cache (the compiled
    # solve is matvec-generic and keys on diags identity + offsets); its
    # halved constant footprint doubles the reach of the 320 MB gate.
    # Past the gate BOTH layouts upgrade to their pre-blocked Pallas
    # argument form — SymDIA keeps its halved operator stream there via
    # the halo'd blocked layout (sym_dia_spmv_pallas_blocked, round 4).
    if isinstance(op, (DIAMatrix, SymDIAMatrix)) and _concrete(op.diags):
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            backend = "cpu"
        nbytes = op.diags.size * op.diags.dtype.itemsize
        # the gate bounds the compiled program's constant footprint: a
        # 131 MB solve closure compiles through the remote relay, a 608 MB
        # one dies with HTTP 413 (a trivial 608 MB closure alone passes —
        # the limit is on the whole serialized program); the runtime
        # fallback below catches relay-limit failures regardless
        if (
            backend == "tpu"
            and (1 << 20) <= nbytes <= (320 << 20)
            # a traced b/x0 defers compilation to the OUTER trace's execution,
            # where the try/except fallback below cannot catch relay failures
            and _concrete(b)
            and _concrete(x0)
        ):
            return _dia_const_solve(
                op, b, x0, tol_arr, maxiter, M, recompute_r_every
            )
        if (
            backend == "tpu"
            and nbytes > (320 << 20)
            and op.offsets
            and max(abs(o) for o in op.offsets) >= 1024
            # mirror dia_spmv's Pallas dtype gate — other dtypes run the
            # XLA path, where the blocked copy would be dead HBM weight
            and op.dtype in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
        ):
            # too big for a constant closure, but in the Pallas-kernel
            # regime: upgrade to the pre-blocked layout once per operator
            # so the argument streams without per-iteration relayouts
            op = _blocked_dia(op)

    if x0 is None:
        return _cg_solve_core(op, b, None, tol_arr, maxiter, M,
                              recompute_r_every)
    return _cg_solve_core(op, b, x0, tol_arr, maxiter, M, recompute_r_every)


# per-operator pre-blocked DIA layouts (DIAMatrix.with_blocked), id-keyed
# and identity-checked like the constant cache below
_DIA_BLOCKED_CACHE: "OrderedDict" = OrderedDict()
_DIA_BLOCKED_CACHE_MAX = 2


def clear_dia_caches() -> None:
    """Drop the per-operator DIA caches (pre-blocked layouts + compiled
    constant-closure solves).  They hold strong references to operator
    arrays — up to ~GBs of HBM at Flan-class sizes — so call this when
    discarding large operators for good."""
    _DIA_BLOCKED_CACHE.clear()
    _DIA_CONST_CACHE.clear()


def _blocked_dia(op):
    key = id(op.diags)
    ent = _DIA_BLOCKED_CACHE.get(key)
    if ent is not None and ent[0] is op.diags:
        _DIA_BLOCKED_CACHE.move_to_end(key)
        return ent[1]
    upgraded = op.with_blocked()
    _DIA_BLOCKED_CACHE[key] = (op.diags, upgraded)
    _DIA_BLOCKED_CACHE.move_to_end(key)
    while len(_DIA_BLOCKED_CACHE) > _DIA_BLOCKED_CACHE_MAX:
        _DIA_BLOCKED_CACHE.popitem(last=False)
    return upgraded


# per-operator compiled DIA solves (see the dispatch comment above): each
# entry closes over one operator's diagonals as compile-time constants.
# Keyed on everything else static; the stored diags reference is identity-
# checked so a different operator with equal shapes cannot reuse a program.
_DIA_CONST_CACHE: "OrderedDict" = OrderedDict()
_DIA_CONST_CACHE_MAX = 4


def _dia_const_solve(op, b, x0, tol_arr, maxiter, M, recompute_r_every):
    key = (
        id(op.diags), op.offsets, op.shape, str(op.dtype), str(b.dtype),
        b.shape, maxiter, M, recompute_r_every, x0 is None,
    )
    ent = _DIA_CONST_CACHE.get(key)
    if ent is not None and ent[0] is op.diags:
        _DIA_CONST_CACHE.move_to_end(key)
        fn = ent[1]
    else:
        if x0 is None:
            fn = jax.jit(
                lambda b_, t_: _cg_solve_core_impl(
                    op, b_, None, t_, maxiter, M, recompute_r_every
                )
            )
        else:
            fn = jax.jit(
                lambda b_, x0_, t_: _cg_solve_core_impl(
                    op, b_, x0_, t_, maxiter, M, recompute_r_every
                )
            )
        _DIA_CONST_CACHE[key] = (op.diags, fn)
        _DIA_CONST_CACHE.move_to_end(key)
        while len(_DIA_CONST_CACHE) > _DIA_CONST_CACHE_MAX:
            _DIA_CONST_CACHE.popitem(last=False)
    def _arg_fallback():
        from ..types import DIAMatrix as _DIA

        o = op
        # same gates as cg_solve's >320MB branch: the blocked copy only pays
        # off where dia_spmv runs the Pallas windowed kernel (offsets >= 1024
        # AND an f32/bf16 operator) — other dtypes take the XLA path, where
        # a pre-blocked copy would be dead HBM weight
        if (
            isinstance(o, _DIA)
            and o.offsets
            and max(abs(x) for x in o.offsets) >= 1024
            and o.dtype in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
        ):
            o = _blocked_dia(o)  # keep the relayout-free argument layout
        return _cg_solve_core(o, b, x0, tol_arr, maxiter, M, recompute_r_every)

    if fn is None:  # previously failed to compile for this operator
        return _arg_fallback()
    try:
        return fn(b, tol_arr) if x0 is None else fn(b, x0, tol_arr)
    except Exception as e:
        from ..utils.logging import get_logger

        deterministic = "413" in str(e) or "length limit" in str(e)
        get_logger().warning(
            "DIA constant-closure solve failed (%s: %.200s); falling back "
            "to the operator-as-argument path%s",
            type(e).__name__, e,
            " and caching the failure" if deterministic else "",
        )
        if deterministic:
            # relay program-size limit: deterministic, skip the doomed
            # compile on repeat solves.  Transient errors are NOT cached —
            # the next solve retries the fast path.
            _DIA_CONST_CACHE[key] = (op.diags, None)
        return _arg_fallback()


def _cg_solve_core_impl(op, b, x0, tol_arr, maxiter, M, recompute_r_every):
    state0 = cg_init(op, b, x0, M=M, maxiter=maxiter)

    def cond(s: CGState):
        return (s.k < maxiter) & (~s.done)

    def body(s: CGState):
        return cg_step(op, s, tol_arr, M=M)

    def replace(s: CGState) -> CGState:
        # Full restart: recompute the true residual AND reset the
        # search direction to it.  Replacing r while keeping the
        # drifted p breaks the alpha/beta consistency and diverges
        # (observed at n=16.7M f32); a restart is uncondition-
        # ally stable at the cost of briefly losing Krylov momentum.
        # Runs OUTSIDE the hot body (solver/restart.py: a lax.cond here
        # cost ~40% of the iteration on TPU even when never taken);
        # masked so a non-boundary or finished-solve call is a no-op.
        # no `k < maxiter` term: a solve capping EXACTLY on a restart
        # boundary still gets its final rnorm/hist replaced with the
        # true residual — the honesty this feature exists for
        mask = (~s.done) & (s.k % recompute_r_every == 0)
        r_true = b - op.matvec(s.x)
        rnorm = dot(r_true, r_true)
        z = r_true if M is None else M(r_true)
        rho = rnorm if M is None else dot(r_true, z)
        hist = s.hist.at[s.k].set(jnp.where(mask, rnorm, s.hist[s.k]))
        return CGState(
            k=s.k, done=s.done, x=s.x,
            r=jnp.where(mask, r_true, s.r),
            p=jnp.where(mask, z, s.p),
            rho=jnp.where(mask, rho, s.rho),
            rnorm_sq=jnp.where(mask, rnorm, s.rnorm_sq),
            hist=hist,
        )

    s = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda s: s.k, state0
    )
    info = CGInfo(
        iterations=s.k,
        # a NaN residual terminates the loop (like the reference) but is a
        # breakdown, not convergence — don't fold it into the flag
        converged=s.done & ~jnp.isnan(s.rnorm_sq),
        rho=s.rho,
        rnorm_sq=s.rnorm_sq,
        rho_history=s.hist,
    )
    return s.x, info


_cg_solve_core = functools.partial(
    jax.jit, static_argnames=("maxiter", "M", "recompute_r_every")
)(_cg_solve_core_impl)


def accuracy(A: Any, b: jax.Array, x: jax.Array, n: Optional[int] = None) -> jax.Array:
    """|Σ(b−Ax)² / Σx²| — the reference's ``accuracy()`` verification pass
    (CG.hpp:463-515): a ratio of SQUARED norms, no sqrt (CG.hpp:510).  Kept
    bug-for-bug identical because the harness prints it as "relative error"
    (test/Tester.cpp:53-54) and parity tests compare it."""
    op = as_linear_operator(A, n=n)
    res = b - op.matvec(x)
    return jnp.abs(dot(res, res) / dot(x, x))


def expected_step_count(
    A: Any,
    accuracy: float,
    n: Optional[int] = None,
    lanczos_iters: int = 30,
    seed: int = 0,
) -> int:
    """Predicted CG iteration count to reduce the A-norm error by ``accuracy``.

    The reference declares this API but never implemented it
    (``void calculateExpectedStepCount(DT accuracy) {}``, CG.hpp:235 — empty
    body).  This is the real thing: estimate κ = λ_max/λ_min with a short
    Lanczos run (solver/precond.estimate_spectral_bounds), then apply the
    classic CG error bound ‖x−x_k‖_A ≤ 2·((√κ−1)/(√κ+1))^k·‖x−x₀‖_A, solved
    for k: k = ⌈ln(2/ε) / ln((√κ+1)/(√κ−1))⌉ ≈ ⌈½√κ·ln(2/ε)⌉.

    This is a worst-case bound over the estimated spectral interval; clustered
    spectra converge (much) faster.  Cost: ``lanczos_iters`` matvecs, once.
    """
    import math

    if not (0 < accuracy < 1):
        raise ValueError(f"accuracy must be in (0, 1), got {accuracy}")
    from .precond import estimate_spectral_bounds

    lam_min, lam_max = estimate_spectral_bounds(
        A, n=n, iters=lanczos_iters, seed=seed,
        # raw Ritz interval: the Chebyshev-oriented safety padding would
        # inflate kappa and with it the predicted step count
        safety=1.0, min_margin=1.0,
    )
    kappa = max(lam_max / lam_min, 1.0)
    sk = math.sqrt(kappa)
    if sk <= 1.0 + 1e-12:
        return 1
    k = math.log(2.0 / accuracy) / math.log((sk + 1.0) / (sk - 1.0))
    return max(int(math.ceil(k)), 1)


def memory_footprint(n: int, nnz: int, dtype=jnp.float32, index_bytes: int = 4) -> int:
    """The reference's analytic workspace estimate
    ``(2·NNZ + 4·N)·sizeof(DT) + 2·N·sizeof(int)`` (CG.hpp:555-558).

    Interpretation: matrix values + columns (2·NNZ), x/b plus the four solve
    workspace vectors folded to 4·N, and rows+one more int vector (2·N ints).
    We reproduce the same formula for parity; real per-operator byte counts
    come from ``LinearOperator.memory_footprint()``.
    """
    itemsize = jnp.dtype(dtype).itemsize
    return (2 * nnz + 4 * n) * itemsize + 2 * n * index_bytes
