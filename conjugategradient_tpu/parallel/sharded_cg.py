"""Row-sharded multi-chip CG (north-star config 5; absent in the reference —
SURVEY §2.4 documents that the reference is strictly single-device).

Parallelization contract (SURVEY §2.4 / §5):

* 1-D device mesh over axis "rows"; each chip owns a contiguous block of rows
  of A and the matching shards of x/b/r/p;
* per iteration, the SpMV's remote-column reads are satisfied either by an
  ``all_gather`` of p over ICI (blocked-ELL operators, and SELL operators
  for scattered patterns — column footprint may span all shards) or by a
  ring ``ppermute`` halo exchange (DIA/banded operators — only ±bandwidth
  neighbor elements are remote);
* the two dot products reduce with ``psum`` over ICI;
* the whole while_loop runs inside one ``shard_map``-ed jit: collectives are
  compiled into the loop body, zero host involvement — strictly better than
  the reference's per-iteration host sync (CG.hpp:425).

Numerical semantics match solver/cg.py (and therefore the float64 oracle):
recurrence residual, Hestenes–Stiefel α/β, pre-update termination test on
‖r‖², N+1-style cap, optional Jacobi preconditioning.

Structure (round 4 — one generic sharded-loop core, thin layout configs):

* ``partition.py``   — host-side operator partitioners (once at ingest)
* ``local_ops.py``   — per-shard matvecs + halo exchanges (inside shard_map)
* ``loops.py``       — the loop cores (standard/pipelined/sstep/deflated/
  fused single-RHS; lockstep/block multi-RHS)
* this module        — :func:`_sharded_solve` / :func:`_sharded_solve_batched`,
  the ONE front-end core every layout family configures (local matvec
  builder + static cache key + op sharding specs), plus checkpoint/resume.
"""

from __future__ import annotations

import dataclasses

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..solver.cg import CGInfo
from ..solver.restart import while_with_periodic_restart
from .local_ops import (
    _local_bell_matvec,
    _local_bell_matvec_multi,
    _local_dia_matvec,
    _local_dia_matvec_multi,
    _local_sell_matvec,
    _local_sell_matvec_multi,
    _local_symbell_matvec,
    _local_symdia_matvec,
    _make_dia_mpk_basis,
    _symdia_left_halo,
    ring_halo,
)
from .loops import (
    _batched_loop,
    _default_rcond,
    _fused_shards_supported,
    _pcg_body_fn,
    _pcg_init_carry,
    _pcg_replace_fn,
    _sharded_block_cg,
    _sharded_deflated_pcg,
    _sharded_fused_cg,
    _sharded_fused_minres,
    _sharded_lockstep_pcg,
    _sharded_minres,
    _sharded_bicgstab,
    _sharded_gmres,
    _sharded_pcg,
    _sharded_pipelined_cg,
    _sharded_pipelined_pcg,
    _sharded_sstep_cg,
    _sstep_default_rcond,
)
from .partition import (
    _cdiv,
    make_mesh_2d,
    make_row_mesh,
    partition_csr_blocks_2d,
    partition_csr_rows,
    partition_dia_rows,
    partition_sell_rows,
    partition_symbell_rows,
)

# ---------------------------------------------------------------------------
# compiled-solve cache
# ---------------------------------------------------------------------------

# jax.jit keyed on a fresh closure would retrace every call, paying full XLA
# compilation of the collective while_loop per solve.  Key on everything the
# closure bakes in; values are the jitted shard_map'd functions, reused
# across calls with the same configuration.  LRU-bounded so sweeps over
# distinct maxiter/tol values can't grow it without limit (each entry pins a
# compiled executable).
from collections import OrderedDict

_SOLVE_CACHE: "OrderedDict" = OrderedDict()
_SOLVE_CACHE_MAX = 32


def _cache_get(key):
    fn = _SOLVE_CACHE.get(key)
    if fn is not None:
        _SOLVE_CACHE.move_to_end(key)
    return fn


def _cache_put(key, fn):
    _SOLVE_CACHE[key] = fn
    _SOLVE_CACHE.move_to_end(key)
    while len(_SOLVE_CACHE) > _SOLVE_CACHE_MAX:
        _SOLVE_CACHE.popitem(last=False)


def _mesh_key(mesh: Mesh):
    return (tuple(int(d.id) for d in mesh.devices.flat), mesh.axis_names)


# ---------------------------------------------------------------------------
# general per-shard preconditioners (M_local)
# ---------------------------------------------------------------------------

_M_TOKEN = 0  # monotone id for M_local jit-cache keys (never recycled)


def _next_m_token() -> int:
    # a stable identity token: raw id() can be recycled after GC and
    # would silently reuse a stale compiled program
    global _M_TOKEN
    _M_TOKEN += 1
    return _M_TOKEN


@dataclasses.dataclass(eq=False)
class ShardedPreconditioner:
    """A per-shard ``M^-1`` apply whose OPERATOR DATA is row-sharded.

    A bare callable passed as ``M_local`` closes over its arrays, and
    closure constants inside a shard_map'd jit are REPLICATED on every
    device — fine for tiny state (the sharded multigrid V-cycle's stencil
    coefficients and dense coarse inverse), wrong for preconditioners
    that carry per-level sparse operators (AMG).  This wrapper threads
    the arrays through the solver's shard_map as ARGUMENTS instead:

      op_arrays: host/global arrays with a leading shard axis where the
        matching entry of ``op_specs`` shards them (default: all sharded).
      op_specs: optional per-array PartitionSpec (default ``P(axis)`` on
        the leading axis; pass ``P()`` for replicated small state).
      make_local_apply: ``(op_shards) -> (r_local -> z_local)`` — builds
        the per-shard apply from the SHARD-LOCAL arrays (leading shard
        axis already indexed away for sharded entries); the apply runs
        inside the solver's shard_map and may issue collectives.
      token: stable cache identity (filled by __post_init__).
    """

    op_arrays: tuple
    make_local_apply: Callable
    op_specs: Optional[tuple] = None
    token: int = dataclasses.field(default_factory=_next_m_token)


def _as_sharded_precond(M_local, axis: str) -> ShardedPreconditioner:
    """Normalize an M_local argument: a ShardedPreconditioner passes
    through; a bare callable (the sharded-multigrid style, replicated
    closure state) wraps with no threaded arrays."""
    if isinstance(M_local, ShardedPreconditioner):
        return M_local
    if callable(M_local):
        if not hasattr(M_local, "_cg_cache_token"):
            try:
                M_local._cg_cache_token = _next_m_token()
            except AttributeError:  # unwritable callables (e.g. builtins)
                pass
        tok = getattr(M_local, "_cg_cache_token", None)
        return ShardedPreconditioner(
            op_arrays=(),
            make_local_apply=lambda _shards, _m=M_local: _m,
            token=tok if tok is not None else _next_m_token(),
        )
    raise TypeError(
        "M_local must be a callable (r_local -> z_local) or a "
        f"ShardedPreconditioner, got {type(M_local).__name__}"
    )


def _resolve_single_rhs_method(method, with_m, recompute_r_every, s, rcond, dtype):
    """Validate the single-RHS method triple and normalize the s-step
    hyperparameters: (s_eff, rcond_eff) are baked into the compiled solve
    (and its cache key), so non-sstep methods pin them to inert constants."""
    if method not in ("standard", "pipelined", "sstep", "minres",
                      "bicgstab", "gmres"):
        raise ValueError(f"unknown method {method!r}")
    if method == "sstep" and with_m:
        # pipelined composes with preconditioning (Ghysels–Vanroose,
        # loops._sharded_pipelined_pcg); only s-step stays unpreconditioned
        raise ValueError(
            f"method={method!r} is unpreconditioned (inv_diag=None)"
        )
    if method not in ("standard", "pipelined"):
        if recompute_r_every:
            # pipelined NEEDS replacement more than standard (O(eps·κ)
            # recurrence drift, solver/pipelined.py); sstep/minres have no
            # variant; gmres's restarts ARE residual replacement already
            raise ValueError(
                f"method={method!r} has no residual-replacement variant "
                "(recompute_r_every must be 0)"
            )
    if method != "sstep":
        return 0, 0.0
    s = int(s)
    if s < 1:
        raise ValueError(f"s must be >= 1, got {s}")
    return s, (_sstep_default_rcond(dtype) if rcond is None else float(rcond))


def shard_deflation_basis(basis, n_padded: int, n_shards: int):
    """Row-shard a solver/deflated.DeflationBasis for the mesh loops.

    Returns ``(W_sh (S, m, k), AW_sh (S, m, k), E_chol (k, k))`` — the
    tall-skinny factors split like every other vector (zero-padded rows
    are inert through both applications), the k×k Cholesky factor
    replicated.
    """
    W = np.asarray(basis.W)
    AW = np.asarray(basis.AW)
    n, k = W.shape
    m = n_padded // n_shards
    Wp = np.zeros((n_padded, k), W.dtype)
    Wp[:n] = W
    AWp = np.zeros((n_padded, k), AW.dtype)
    AWp[:n] = AW
    return (
        Wp.reshape(n_shards, m, k),
        AWp.reshape(n_shards, m, k),
        jnp.asarray(basis.E_chol),
    )


def _solve_info(k, done, rho, rnorm, hist) -> CGInfo:
    return CGInfo(
        iterations=k,
        converged=done & ~jnp.isnan(rnorm),
        rho=rho,
        rnorm_sq=rnorm,
        rho_history=hist,
    )


# ---------------------------------------------------------------------------
# the generic single-RHS front-end core
# ---------------------------------------------------------------------------


def _sharded_solve(
    family: str,
    op_arrays: Sequence,
    b: jax.Array,
    x0: Optional[jax.Array],
    *,
    mesh: Mesh,
    axis: str,
    tol: float,
    maxiter: Optional[int],
    inv_diag: Optional[jax.Array],
    make_local_matvec: Callable,
    key_extra: tuple = (),
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
    gmres_restart: int = 30,
    gmres_flexible: bool = False,
    basis=None,
    op_specs: Optional[Sequence] = None,
    op_unwrap: Optional[Callable] = None,
    supports_basis: bool = True,
    fused_fn: Optional[Callable] = None,
    sstep_basis_factory: Optional[Callable] = None,
    M_local=None,
):
    """The ONE sharded single-RHS solve core every layout family configures.

    A layout family supplies host-prepared ``op_arrays`` (leading shard
    axis), a ``make_local_matvec(op_shards) -> local_matvec`` builder whose
    closure may compute loop-invariant collectives (e.g. the symmetric-DIA
    diagonal halo) and issue per-application ones (all_gather / ring halo),
    and ``key_extra`` — every static the closures bake in, since the
    compiled shard_map'd solve is cached by configuration, not closure
    identity.  Optional hooks: ``fused_fn(op_shards, b_s, x0_s, inv_diag_s,
    tol_arr, maxiter)`` replaces the whole per-shard loop (the blocked-ELL
    Pallas path), ``sstep_basis_factory(op_shards)`` supplies a
    matrix-powers-kernel basis for method="sstep" (the DIA ring kernel),
    ``op_specs``/``op_unwrap`` override operator sharding for non-1-D
    meshes (the 2-D block decomposition).  Validation of the
    method/preconditioner/restart/deflation combinations is centralized
    here so every front-end enforces identical semantics.
    """
    n_shards = mesh.devices.size
    n_padded = int(b.shape[0])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=b.dtype)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    with_m = inv_diag is not None
    precond = None
    if M_local is not None:
        if with_m:
            raise ValueError("pass either inv_diag or M_local, not both")
        if method not in ("standard", "minres", "pipelined", "bicgstab",
                          "gmres"):
            # minres/pipelined/bicgstab/gmres compose too (all precondition
            # through the same _precond_apply contract; minres/pipelined
            # need an SPD M, bicgstab/gmres do not — gmres applies it
            # RIGHT-sided) — s-step stays unpreconditioned
            raise ValueError(
                f"M_local runs the standard, minres, pipelined, bicgstab, "
                f"or gmres per-shard loop (method={method!r})"
            )
        if basis is not None:
            raise ValueError("M_local and basis= (deflation) are exclusive")
        if fused_fn is not None:
            raise ValueError(
                "the fused per-shard loop has no general-M variant — "
                "disable it when M_local is set"
            )
        precond = _as_sharded_precond(M_local, axis)
    recompute_r_every = int(recompute_r_every)
    s_eff, rcond_eff = _resolve_single_rhs_method(
        method, with_m, recompute_r_every, s, rcond, b.dtype
    )
    with_basis = basis is not None
    if with_basis:
        if not supports_basis:
            raise ValueError(
                f"the {family} front-end has no deflated (basis=) variant"
            )
        if method != "standard" or recompute_r_every:
            raise ValueError(
                "deflation (basis=) runs the standard per-shard loop "
                "(no method=pipelined/sstep, no recompute_r_every)"
            )
    nop = len(op_arrays)
    op_specs = (
        tuple(op_specs) if op_specs is not None else (P(axis),) * nop
    )
    unwrap = op_unwrap if op_unwrap is not None else (lambda a: a[0])

    pre_specs = ()
    if precond is not None:
        pre_specs = (
            tuple(precond.op_specs) if precond.op_specs is not None
            else (P(axis),) * len(precond.op_arrays)
        )

    gmres_m = (
        max(1, min(int(gmres_restart), maxiter, n_padded))
        if method == "gmres" else 0
    )
    key = (family, _mesh_key(mesh), axis, maxiter, float(tol), with_m,
           key_extra, str(b.dtype), method, recompute_r_every,
           s_eff, rcond_eff, gmres_m, bool(gmres_flexible),
           (basis.k if with_basis else 0),
           fused_fn is not None,
           None if precond is None else precond.token)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(*args_s):
            op_shards = [unwrap(a) for a in args_s[:nop]]
            i = nop
            b_s, x0_s = args_s[i], args_s[i + 1]
            i += 2
            inv_diag_s = None
            if with_m:
                inv_diag_s = args_s[i]
                i += 1
            if precond is not None:
                pre_shards = [
                    a[0] if spec == P(axis) else a
                    for a, spec in zip(args_s[i : i + len(pre_specs)],
                                       pre_specs)
                ]
                i += len(pre_specs)
                inv_diag_s = precond.make_local_apply(pre_shards)
            if with_basis:
                W_s, AW_s, E_chol_r = (
                    args_s[i][0], args_s[i + 1][0], args_s[i + 2]
                )

            if fused_fn is not None:
                return fused_fn(op_shards, b_s, x0_s, inv_diag_s,
                                tol_arr, maxiter)

            local_matvec = make_local_matvec(op_shards)

            if with_basis:
                return _sharded_deflated_pcg(
                    local_matvec, b_s, x0_s, inv_diag_s,
                    W_s, AW_s, E_chol_r, tol_arr, maxiter, axis,
                )
            if method == "minres":
                return _sharded_minres(
                    local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter,
                    axis,
                )
            if method == "bicgstab":
                return _sharded_bicgstab(
                    local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter,
                    axis,
                )
            if method == "gmres":
                return _sharded_gmres(
                    local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter,
                    axis, gmres_m, flexible=bool(gmres_flexible),
                )
            if method == "pipelined":
                if inv_diag_s is not None:
                    return _sharded_pipelined_pcg(
                        local_matvec, b_s, x0_s, inv_diag_s, tol_arr,
                        maxiter, axis,
                        recompute_r_every=recompute_r_every,
                    )
                return _sharded_pipelined_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis,
                    recompute_r_every=recompute_r_every,
                )
            if method == "sstep":
                basis_fn = (
                    sstep_basis_factory(op_shards)
                    if sstep_basis_factory is not None else None
                )
                return _sharded_sstep_cg(
                    local_matvec, b_s, x0_s, tol_arr, maxiter, axis,
                    s_eff, rcond_eff, basis_fn=basis_fn,
                )
            return _sharded_pcg(
                local_matvec, b_s, x0_s, inv_diag_s, tol_arr, maxiter, axis,
                recompute_r_every=recompute_r_every,
            )

        in_specs = list(op_specs) + [P(axis), P(axis)]
        if with_m:
            in_specs.append(P(axis))
        in_specs += list(pre_specs)
        if with_basis:
            in_specs += [P(axis), P(axis), P()]
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec=P(axis): jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, spec)
    )
    args = [put(a, spec) for a, spec in zip(op_arrays, op_specs)]
    args += [put(b), put(x0)]
    if with_m:
        args.append(put(inv_diag))
    if precond is not None:
        args += [put(a, spec) for a, spec in zip(precond.op_arrays,
                                                 pre_specs)]
    if with_basis:
        W_sh, AW_sh, E_chol = shard_deflation_basis(basis, n_padded, n_shards)
        args += [put(W_sh), put(AW_sh), put(E_chol, P())]

    x, k, done, rho, rnorm, hist = solve_jit(*args)
    return x, _solve_info(k, done, rho, rnorm, hist)


# ---------------------------------------------------------------------------
# layout front-ends (thin configurations of _sharded_solve)
# ---------------------------------------------------------------------------


def sharded_cg_solve(
    blocks,
    block_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    ncols_padded: Optional[int] = None,
    use_fused: str = "auto",
    interpret: bool = False,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
    gmres_restart: int = 30,
    gmres_flexible: bool = False,
    basis=None,
    M_local=None,
):
    """Row-sharded (P)CG over a 1-D mesh, blocked-ELL operator.

    Args:
      blocks: (n_shards, nrb, kmax, bm, bn) per-shard blocked-ELL tiles
        (from :func:`partition_csr_rows`).
      block_cols: (n_shards, nrb, kmax) global column-block ids.
      b: (n_padded,) global RHS (zero-padded rows beyond the true n).
      inv_diag: optional (n_padded,) 1/diag(A) for Jacobi PCG (zero-padded
        entries should be 1 to stay inert).
      mesh: 1-D device mesh (defaults to all devices).
      maxiter: iteration cap (static); None (default) means N_padded + 1.
      use_fused: "auto" runs each shard's iteration on the fused Pallas
        kernels (SpMV + p·q partial in one pass, x/r updates + ‖r‖² partial
        in another — the single-chip fast path's kernels, partials psum'd)
        when the operator qualifies on a TPU backend; "never"/"always"
        override.  Jacobi-PCG (``inv_diag``) rides the same kernels via
        fused_update_dot_pcg (the M⁻¹ apply folds into the update pass and
        the r·z reduction).  ``interpret`` runs those kernels in interpret
        mode (CPU testing).
      method: "standard" (Hestenes–Stiefel, two psum rounds/iteration),
        "pipelined" (ONE psum of stacked scalars per iteration — halves
        collective latency; Chronopoulos–Gear, or the Ghysels–Vanroose
        preconditioned recurrences when ``inv_diag``/``M_local`` is given;
        see solver/pipelined.py for the rounding trade), or "sstep"
        (communication-avoiding, ONE psum of a (3s+1)² Gram per ``s``
        iterations — see solver/sstep.py for the algebra and the κ(A)ˢ
        rounding trade; unpreconditioned).
      recompute_r_every: if > 0, replace the recurrence residual with the
        true residual AND reset the direction every that many iterations
        (full restart — solver/cg.py's residual-replacement semantics on the
        mesh).  Takes the XLA per-shard path (no fused variant, like the
        single-device dispatch).  Composes with method="pipelined" (where
        the O(eps·κ) recurrence drift makes it essential for long f32
        runs); excludes method="sstep"/"minres".
      s / rcond: s-step block size and Gram-pseudoinverse cutoff (None =
        dtype-adaptive); only read when method="sstep".
      gmres_restart / gmres_flexible: only read when method="gmres" —
        the restart cycle length m, and Saad's FGMRES variant (keep the
        preconditioned vectors as a second row-sharded (m, n_local) basis
        and update ``x += Zᵀ y`` directly).  Set ``gmres_flexible=True``
        whenever ``M_local`` is not one fixed linear operator (an inner
        Krylov solve, an adaptive cycle) — standard right-preconditioned
        GMRES silently mis-updates with such M (solver/gmres.py
        ``flexible=`` mirrors this on a single device).
      basis: optional solver/deflated.DeflationBasis — runs the DEFLATED
        per-shard loop (directions A-orthogonal to the basis; one extra
        (k,)-payload psum per iteration for the projector).  Standard
        method only; excludes recompute_r_every and the fused path.
      M_local: optional general per-shard preconditioner — a callable
        ``r_local -> z_local`` executed INSIDE the shard_map (may issue
        its own collectives), or a :class:`ShardedPreconditioner` whose
        operator arrays thread through the shard_map as sharded
        arguments (build with :func:`~conjugategradient_tpu.parallel.
        sharded_amg.sharded_amg_preconditioner`).  Mutually exclusive
        with ``inv_diag``; standard method, per-shard XLA loop (the
        fused Pallas path has no general-M variant).  Reuse the same
        object across solves to reuse the compiled program.

    Returns (x, CGInfo); x is row-sharded but exposed as a global jax.Array.
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert blocks.shape[0] == n_shards, (blocks.shape, n_shards)
    bn = int(blocks.shape[-1])
    with_basis = basis is not None
    if use_fused == "always" and with_basis:
        raise ValueError(
            "use_fused='always' has no deflated variant — the projector "
            "runs the per-shard XLA loop (basis=None to force fused)"
        )
    if use_fused == "always" and recompute_r_every:
        raise ValueError(
            "use_fused='always' has no residual-replacement variant — "
            "restarts run the per-shard XLA path (recompute_r_every=0 "
            "to force fused)"
        )
    if use_fused == "always" and M_local is not None:
        raise ValueError(
            "use_fused='always' has no general-M variant — M_local runs "
            "the per-shard XLA loop (M_local=None to force fused)"
        )
    fused = (
        method in ("standard", "minres")
        and not recompute_r_every and not with_basis
        and M_local is None
        and (
            use_fused == "always"
            or (use_fused == "auto"
                and _fused_shards_supported(
                    blocks, b, inv_diag is not None, interpret))
        )
    )

    def fused_fn(ops, b_s, x0_s, inv_diag_s, tol_arr, maxiter_):
        if method == "minres":
            # round 5: the fused per-shard MINRES loop (same collective
            # count as the fused CG path — one all_gather + two psum
            # rounds per iteration; loops._sharded_fused_minres)
            return _sharded_fused_minres(
                ops[0], ops[1], b_s, x0_s, tol_arr.astype(jnp.float32),
                maxiter_, axis, bn, interpret, inv_diag_s=inv_diag_s,
            )
        return _sharded_fused_cg(
            ops[0], ops[1], b_s, x0_s, tol_arr.astype(jnp.float32),
            maxiter_, axis, bn, interpret, inv_diag_s=inv_diag_s,
        )

    def make_lm(ops):
        def local_matvec(v_local):
            v_full = jax.lax.all_gather(v_local, axis, tiled=True)
            return _local_bell_matvec(ops[0], ops[1], v_full.reshape(-1, bn))

        return local_matvec

    return _sharded_solve(
        "bell", (blocks, block_cols), b, x0,
        mesh=mesh, axis=axis, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        make_local_matvec=make_lm, key_extra=(bn, fused, interpret),
        method=method, recompute_r_every=recompute_r_every,
        s=s, rcond=rcond, gmres_restart=gmres_restart,
        gmres_flexible=gmres_flexible, basis=basis,
        fused_fn=fused_fn if fused else None,
        M_local=M_local,
    )


def sharded_symbell_cg_solve(
    diag,
    off,
    off_cols,
    cross,
    cross_rows,
    cross_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    interpret: bool = False,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
    gmres_restart: int = 30,
    gmres_flexible: bool = False,
    basis=None,
):
    """Row-sharded (P)CG on SYMMETRIC blocked-ELL storage.

    The flagship single-chip layout (types.SymBellMatrix — each
    off-diagonal tile stored once, 890-909 GB/s effective vs the 819 GB/s
    roofline) on the mesh: intra-shard tiles stay symmetric (their Bᵀ
    mirror scatters into the shard's own q rows), cross-shard tiles are
    stored fully on the row-owner (see :func:`partition_symbell_rows`), so
    the iteration keeps EXACTLY the full layout's collective pattern — one
    all_gather of p plus two psum dots (one for pipelined, one per s for
    sstep) — while streaming up to 2× fewer operator bytes per shard.

    Args mirror :func:`sharded_cg_solve` (including ``basis=`` for the
    deflated per-shard loop); the six operator arrays come from
    :func:`partition_symbell_rows`.  Returns ``(x, CGInfo)``.
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert diag.shape[0] == n_shards, (diag.shape, n_shards)
    bn = int(diag.shape[-1])
    nrb = int(diag.shape[1])

    def make_lm(ops):
        base_block = jax.lax.axis_index(axis) * nrb

        def local_matvec(v_local):
            v_full = jax.lax.all_gather(v_local, axis, tiled=True)
            return _local_symbell_matvec(
                *ops, v_full.reshape(-1, bn), base_block,
            )

        return local_matvec

    return _sharded_solve(
        "symbell", (diag, off, off_cols, cross, cross_rows, cross_cols),
        b, x0,
        mesh=mesh, axis=axis, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        make_local_matvec=make_lm, key_extra=(bn, interpret),
        method=method, recompute_r_every=recompute_r_every,
        s=s, rcond=rcond, gmres_restart=gmres_restart,
        gmres_flexible=gmres_flexible, basis=basis,
    )


def sharded_cg_solve_2d(
    blocks,
    block_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
    gmres_restart: int = 30,
    gmres_flexible: bool = False,
):
    """(P)CG on a p×p 2-D block decomposition of A.

    Device (i, j) owns block A_ij (:func:`partition_csr_blocks_2d`); all
    vectors live as ROW pieces (piece i on mesh row i, replicated along
    the column axis).  Per SpMV: ONE mesh-transpose ``ppermute`` moves
    piece j to device (i, j) (n/p bytes) and ONE ``psum`` over the
    column axis reduces the partial products (n/p bytes) — versus the
    1-D scheme's n-byte all_gather into every device.  Dot products
    psum over the row axis only (pieces are replicated along columns).
    The loop itself is the SAME per-shard machinery as every 1-D
    front-end (_sharded_pcg / pipelined / sstep), so restart, Jacobi-PCG
    and the communication-avoiding methods compose unchanged.

    ``mesh``: a ("rp", "cp") p×p mesh (default: :func:`make_mesh_2d`
    over ⌊√n_devices⌋²).  Returns ``(x, CGInfo)``.
    """
    if mesh is None:
        p = int(np.sqrt(len(jax.devices())))
        mesh = make_mesh_2d(max(p, 1))
    rp_ax, cp_ax = mesh.axis_names
    p = mesh.devices.shape[0]
    assert mesh.devices.shape == (p, p), mesh.devices.shape
    assert blocks.shape[:2] == (p, p), (blocks.shape, p)
    bn = int(blocks.shape[-1])
    transpose_perm = [
        (a * p + c, c * p + a) for a in range(p) for c in range(p)
    ]

    def make_lm(ops):
        blocks_ij, cols_ij = ops

        def local_matvec(v_row):
            # mesh transpose: device (i, j) trades its row piece i
            # for piece j — the SpMV operand for block A_ij
            v_col = jax.lax.ppermute(
                v_row, (rp_ax, cp_ax), transpose_perm
            )
            q_part = _local_bell_matvec(
                blocks_ij, cols_ij, v_col.reshape(-1, bn)
            )
            # partial products reduce along the block row
            return jax.lax.psum(q_part, cp_ax)

        return local_matvec

    return _sharded_solve(
        "bell2d", (blocks, block_cols), b, x0,
        mesh=mesh, axis=rp_ax, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        make_local_matvec=make_lm, key_extra=(bn,),
        method=method, recompute_r_every=recompute_r_every,
        s=s, rcond=rcond, gmres_restart=gmres_restart,
        gmres_flexible=gmres_flexible,
        op_specs=(P(rp_ax, cp_ax), P(rp_ax, cp_ax)),
        op_unwrap=lambda a: a[0, 0],
        supports_basis=False,
    )


def sharded_dia_cg_solve(
    diags_sharded,
    offsets: Tuple[int, ...],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    method: str = "standard",
    recompute_r_every: int = 0,
    gmres_restart: int = 30,
    gmres_flexible: bool = False,
    s: int = 4,
    rcond: Optional[float] = None,
    basis=None,
):
    """Row-sharded (P)CG with a DIA (banded) operator and ring-halo SpMV.

    The per-iteration communication is two ``ppermute``s of the bandwidth-
    sized halo (O(w) bytes over ICI) plus the two ``psum`` dots — the
    ring-attention-shaped pattern applied to SpMV (SURVEY §5), versus the
    all_gather (O(n) bytes) the general blocked-ELL path needs.

    Args:
      diags_sharded: (n_shards, ndiag, rows_per_shard) from
        :func:`partition_dia_rows`.
      offsets: static diagonal offsets (must satisfy |off| <= rows_per_shard).
      method: "standard" (two psum rounds/iteration), "pipelined"
        (Chronopoulos–Gear, ONE psum round), or "sstep" (ONE Gram psum per
        ``s`` iterations; method="sstep" rides the matrix-powers kernel —
        the whole s-matvec basis from ONE widened ring halo — when
        s·w <= rows_per_shard).  Pipelined composes with ``inv_diag``
        (Ghysels–Vanroose); s-step is unpreconditioned.  The ring-halo
        SpMV count is unchanged either way.
      s / rcond: s-step block size / Gram cutoff (method="sstep" only).
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert diags_sharded.shape[0] == n_shards, (diags_sharded.shape, n_shards)
    rows_per_shard = int(diags_sharded.shape[-1])
    offsets = tuple(int(o) for o in offsets)
    w = max(max(abs(o) for o in offsets), 1)
    if w > rows_per_shard:
        raise ValueError(
            f"bandwidth {w} exceeds rows_per_shard {rows_per_shard}; "
            "use fewer shards or the blocked-ELL path"
        )

    def make_lm(ops):
        return lambda v_local: _local_dia_matvec(ops[0], offsets, v_local, axis)

    # matrix-powers kernel: the whole s-matvec basis from ONE widened ring
    # halo (None when s*w > rows_per_shard — the loop then falls back to
    # halo-per-matvec, same algebra)
    def mpk_factory(ops):
        return _make_dia_mpk_basis(ops[0], offsets, axis, int(s))

    return _sharded_solve(
        "dia", (diags_sharded,), b, x0,
        mesh=mesh, axis=axis, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        make_local_matvec=make_lm, key_extra=(offsets,),
        method=method, recompute_r_every=recompute_r_every,
        gmres_restart=gmres_restart,
        gmres_flexible=gmres_flexible,
        s=s, rcond=rcond, basis=basis,
        sstep_basis_factory=mpk_factory,
    )


def sharded_symdia_cg_solve(
    diags_sharded,
    offsets: Tuple[int, ...],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    method: str = "standard",
    recompute_r_every: int = 0,
    gmres_restart: int = 30,
    gmres_flexible: bool = False,
):
    """Row-sharded (P)CG on SYMMETRIC DIA storage (offsets ≥ 0 only).

    Half of :func:`sharded_dia_cg_solve`'s operator bytes at exactly its
    per-iteration collective count: the forward terms ride the usual ring
    halo of p (2 ppermutes, O(w) bytes), the mirror terms reuse the halo's
    LEFT side plus a once-per-solve (ndiag, w) halo of the neighbor's
    diagonal values (:func:`~.local_ops._symdia_left_halo` — loop-invariant,
    hoisted out of the while_loop by construction).

    Args:
      diags_sharded: (n_shards, ndiag_nonneg, rows_per_shard) — shard the
        SymDIAMatrix's ≥0-offset diagonals with :func:`partition_dia_rows`.
      offsets: static offsets, all ≥ 0, with max(offsets) <= rows_per_shard.
      method: "standard" or "pipelined" (the s-step matrix-powers kernel
        has no symmetric variant yet — use the full DIA layout for sstep).
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert diags_sharded.shape[0] == n_shards, (diags_sharded.shape, n_shards)
    rows_per_shard = int(diags_sharded.shape[-1])
    offsets = tuple(int(o) for o in offsets)
    if any(o < 0 for o in offsets):
        raise ValueError(f"symmetric DIA stores offsets >= 0 only, got {offsets}")
    w = max(max(offsets), 1) if offsets else 1
    if w > rows_per_shard:
        raise ValueError(
            f"bandwidth {w} exceeds rows_per_shard {rows_per_shard}; "
            "use fewer shards or the blocked-ELL path"
        )
    if method not in ("standard", "pipelined"):
        raise ValueError(
            "sharded symmetric DIA supports method='standard'/'pipelined' "
            f"(got {method!r}); use the full DIA layout for sstep"
        )

    def make_lm(ops):
        diags_s = ops[0]
        # loop-invariant: the left neighbor's diagonal tails, once
        dleft = _symdia_left_halo(diags_s, w, axis)

        def local_matvec(v_local):
            return _local_symdia_matvec(diags_s, dleft, offsets, v_local, axis)

        return local_matvec

    return _sharded_solve(
        "symdia", (diags_sharded,), b, x0,
        mesh=mesh, axis=axis, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        make_local_matvec=make_lm, key_extra=(offsets,),
        method=method, recompute_r_every=recompute_r_every,
        gmres_restart=gmres_restart,
        gmres_flexible=gmres_flexible,
        supports_basis=False,
    )


def sharded_sell_cg_solve(
    sell_sharded,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    method: str = "standard",
    recompute_r_every: int = 0,
    s: int = 4,
    rcond: Optional[float] = None,
    gmres_restart: int = 30,
    gmres_flexible: bool = False,
):
    """Row-sharded (P)CG with a SELL (degree-bucketed) operator — the
    scattered-pattern path (north-star config 5 on power-law/circuit
    matrices, where blocked-ELL tile padding explodes).

    Per iteration: all_gather of p over ICI (a scattered column footprint
    spans all shards — the same reason the single-device layout exists),
    one flat gather per shard at the stored global indices (the per-shard
    random-access cost is nnz_shard/n_shards of the single-device solve —
    the scalar floor shards linearly), and the psum'd dots.

    Args:
      sell_sharded: the (diag, pos, cols_flat, vals_flat, bucket_meta,
        n_padded) tuple from :func:`partition_sell_rows`.
      method: "standard" (two psum rounds/iteration), "pipelined"
        (ONE psum round; Ghysels–Vanroose when preconditioned), or "sstep"
        (ONE Gram psum per ``s`` iterations; solver/sstep.py —
        unpreconditioned).
      s / rcond: s-step block size / Gram cutoff (method="sstep" only).
    """
    diag, pos, cols_flat, vals_flat, meta, n_padded_meta = sell_sharded
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert np.asarray(diag).shape[0] == n_shards, (np.asarray(diag).shape, n_shards)
    assert int(b.shape[0]) == int(n_padded_meta), (b.shape[0], n_padded_meta)

    def make_lm(ops):
        def local_matvec(v_local):
            return _local_sell_matvec(*ops, meta, v_local, axis)

        return local_matvec

    return _sharded_solve(
        "sell", (diag, pos, cols_flat, vals_flat), b, x0,
        mesh=mesh, axis=axis, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        make_local_matvec=make_lm, key_extra=(meta,),
        method=method, recompute_r_every=recompute_r_every,
        s=s, rcond=rcond, gmres_restart=gmres_restart,
        gmres_flexible=gmres_flexible,
        supports_basis=False,
    )


# ---------------------------------------------------------------------------
# the generic multi-RHS front-end core and its layout configurations
# ---------------------------------------------------------------------------


def _sharded_solve_batched(
    family: str,
    op_arrays: Sequence,
    B: jax.Array,
    X0: Optional[jax.Array],
    *,
    mesh: Mesh,
    axis: str,
    tol,
    maxiter: Optional[int],
    inv_diag: Optional[jax.Array],
    recompute_r_every: int,
    method: str,
    rcond: Optional[float],
    make_local_matvec_multi: Callable,
    key_extra: tuple = (),
    op_specs: Optional[Sequence] = None,
    op_unwrap: Optional[Callable] = None,
):
    """The sharded multi-RHS solve core (mesh × lanes composition): each
    shard owns its operator rows and an (m, R) slab of every lane's
    vectors; the layout family supplies
    ``make_local_matvec_multi(op_shards) -> ((m, R) -> (m, R))`` and the
    statics it bakes in (``key_extra``).  The loop is
    :func:`~.loops._sharded_lockstep_pcg` (independent lanes) or
    :func:`~.loops._sharded_block_cg` (O'Leary shared space) — both psum
    (R,)/(R,R) payloads, so R solves ride one solve's collective latency.
    ``op_specs``/``op_unwrap`` override operator sharding for non-1-D
    meshes (the 2-D block decomposition), like the single-RHS core."""
    if B.ndim != 2:
        raise ValueError(f"B must be (nrhs, n_padded), got {B.shape}")
    R, n_padded = int(B.shape[0]), int(B.shape[1])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    tol_arr = jnp.asarray(tol, dtype=B.dtype)
    if tol_arr.ndim == 1 and tol_arr.shape[0] != R:
        raise ValueError(f"per-lane tol has length {tol_arr.shape[0]}, expected {R}")
    X0 = jnp.zeros_like(B) if X0 is None else X0
    with_m = inv_diag is not None
    recompute_r_every = int(recompute_r_every)
    rcond = _default_rcond(B.dtype) if rcond is None else float(rcond)
    loop = _batched_loop(method, recompute_r_every, rcond)
    nop = len(op_arrays)
    op_specs = (
        tuple(op_specs) if op_specs is not None else (P(axis),) * nop
    )
    unwrap = op_unwrap if op_unwrap is not None else (lambda a: a[0])

    key = (f"{family}-batched", _mesh_key(mesh), axis, maxiter, R, key_extra,
           str(B.dtype), with_m, tol_arr.shape, recompute_r_every,
           method, rcond)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        def solve_shard(*args_s):
            op_shards = [unwrap(a) for a in args_s[:nop]]
            tol_a, B_s, X0_s = args_s[nop], args_s[nop + 1], args_s[nop + 2]
            inv_diag_s = args_s[nop + 3] if with_m else None
            lm = make_local_matvec_multi(op_shards)
            return loop(lm, B_s, X0_s, inv_diag_s, tol_a, maxiter, axis)

        in_specs = list(op_specs) + [P(), P(None, axis), P(None, axis)]
        if with_m:
            in_specs.append(P(axis))
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, axis), P(), P(), P(), P(), P()),
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
    args = [put(a, spec) for a, spec in zip(op_arrays, op_specs)]
    args += [put(jnp.broadcast_to(tol_arr, tol_arr.shape), P()),
             put(B, P(None, axis)), put(X0, P(None, axis))]
    if with_m:
        args.append(put(inv_diag, P(axis)))
    X, k, done, rho, rnorm, hist = solve_jit(*args)
    return X, _solve_info(k, done, rho, rnorm, hist)


def sharded_cg_solve_batched(
    blocks,
    block_cols,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol=0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
    method: str = "lockstep",
    rcond: Optional[float] = None,
):
    """Row-sharded multi-RHS (P)CG — the mesh × lanes composition: each
    chip owns its row block of A and an (m, R) slab of every lane's
    vectors; per iteration ONE all_gather moves all R lanes' p, the tile
    stream is read once for all lanes (MXU (bm,bn)×(bn,R) products), and
    the two dot rounds psum (R,) lane vectors — R solves for one solve's
    collective latency AND one solve's operator traffic.

    Args:
      blocks / block_cols: per-shard blocked-ELL tiles from
        :func:`partition_csr_rows`.
      B: (R, n_padded) right-hand sides.
      tol: scalar or (R,) per-lane ABSOLUTE tolerances on ‖r‖₂.
      inv_diag: optional (n_padded,) Jacobi diagonal, shared by all lanes.
      method: "lockstep" (independent lanes) or "block" (O'Leary shared
        Krylov space, solver/blockcg.py: the R×R Gram blocks psum over the
        mesh — same two collectives per iteration, (R,R) payload).
      rcond: block method's Gram cutoff (None = dtype-adaptive).

    Returns (X (R, n_padded), CGInfo with a leading/trailing lane axis:
    iterations/converged/rho/rnorm_sq are (R,), rho_history (R, maxiter+1)).
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert blocks.shape[0] == n_shards, (blocks.shape, n_shards)
    bn = int(blocks.shape[-1])

    def make_lm(ops):
        def local_matvec_multi(v_local):  # (m, R)
            v_full = jax.lax.all_gather(v_local, axis, tiled=True)
            return _local_bell_matvec_multi(
                ops[0], ops[1], v_full.reshape(-1, bn, v_local.shape[-1])
            )

        return local_matvec_multi

    return _sharded_solve_batched(
        "bell", (blocks, block_cols), B, X0,
        mesh=mesh, axis=axis, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        recompute_r_every=recompute_r_every, method=method, rcond=rcond,
        make_local_matvec_multi=make_lm, key_extra=(bn,),
    )


def sharded_cg_solve_2d_batched(
    blocks,
    block_cols,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    tol=0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
    method: str = "lockstep",
    rcond: Optional[float] = None,
):
    """Multi-RHS (P)CG on the p×p 2-D block decomposition — the
    composition of :func:`sharded_cg_solve_2d` (collective bytes n → 2n/p
    per SpMV: one mesh-transpose ppermute + one column psum, NO n-byte
    all-gather) with the lockstep lane machinery (operator tiles read
    ONCE per iteration for all R lanes, (R,)-payload dot psums).

    Args as :func:`sharded_cg_solve_2d` (blocks (p, p, nrb, kmax, bm, bn)
    from :func:`partition_csr_blocks_2d`) × :func:`sharded_cg_solve_batched`
    (``B`` (R, n_padded), per-lane ``tol``, ``method`` lockstep/block).
    Returns (X (R, n_padded), CGInfo with per-lane fields).
    """
    if mesh is None:
        p = int(np.sqrt(len(jax.devices())))
        mesh = make_mesh_2d(max(p, 1))
    rp_ax, cp_ax = mesh.axis_names
    p = mesh.devices.shape[0]
    assert mesh.devices.shape == (p, p), mesh.devices.shape
    assert blocks.shape[:2] == (p, p), (blocks.shape, p)
    bn = int(blocks.shape[-1])
    transpose_perm = [
        (a * p + c, c * p + a) for a in range(p) for c in range(p)
    ]

    def make_lm(ops):
        blocks_ij, cols_ij = ops

        def local_matvec_multi(v_row):  # (m, R) row piece i
            # mesh transpose: device (i, j) trades its row piece i for
            # piece j — the SpMV operand for block A_ij, all lanes at once
            v_col = jax.lax.ppermute(
                v_row, (rp_ax, cp_ax), transpose_perm
            )
            q_part = _local_bell_matvec_multi(
                blocks_ij, cols_ij,
                v_col.reshape(-1, bn, v_row.shape[-1]),
            )
            return jax.lax.psum(q_part, cp_ax)

        return local_matvec_multi

    return _sharded_solve_batched(
        "bell2d", (blocks, block_cols), B, X0,
        mesh=mesh, axis=rp_ax, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        recompute_r_every=recompute_r_every, method=method, rcond=rcond,
        make_local_matvec_multi=make_lm, key_extra=(bn,),
        op_specs=(P(rp_ax, cp_ax), P(rp_ax, cp_ax)),
        op_unwrap=lambda a: a[0, 0],
    )


def sharded_sell_cg_solve_batched(
    sell_sharded,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol=0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
    method: str = "lockstep",
    rcond: Optional[float] = None,
):
    """Row-sharded multi-RHS (P)CG on the scattered-pattern SELL layout —
    where multi-RHS matters most: the flat gather at each shard's stored
    global indices fetches R contiguous lane values per index, so the
    ~8 ns/index random-access floor amortizes over lanes (10× measured at
    R=8 single-device) AND shards linearly over the mesh.

    Same contract as :func:`sharded_cg_solve_batched`; ``sell_sharded`` is
    :func:`partition_sell_rows`'s return tuple.
    """
    diag, pos, cols_flat, vals_flat, meta, n_padded_meta = sell_sharded
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert np.asarray(diag).shape[0] == n_shards, (np.asarray(diag).shape, n_shards)
    if B.ndim == 2:
        assert int(B.shape[1]) == int(n_padded_meta), (B.shape, n_padded_meta)

    def make_lm(ops):
        def local_matvec_multi(v_local):  # (m, R)
            return _local_sell_matvec_multi(*ops, meta, v_local, axis)

        return local_matvec_multi

    return _sharded_solve_batched(
        "sell", (diag, pos, cols_flat, vals_flat), B, X0,
        mesh=mesh, axis=axis, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        recompute_r_every=recompute_r_every, method=method, rcond=rcond,
        make_local_matvec_multi=make_lm, key_extra=(meta,),
    )


def sharded_dia_cg_solve_batched(
    diags_sharded,
    offsets: Tuple[int, ...],
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    tol=0.0,
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
    method: str = "lockstep",
    rcond: Optional[float] = None,
):
    """Row-sharded multi-RHS (P)CG on the banded (DIA) layout — the ring
    variant of :func:`sharded_cg_solve_batched`: per iteration two
    ``ppermute``s move only the bandwidth-wide boundary of ALL R lanes
    (O(w·R) bytes vs the all-gather's O(n·R)), the diagonal stream is read
    once for all lanes, and the dots psum (R,) lane vectors.

    Same contract as the bell variant; ``diags_sharded`` comes from
    :func:`partition_dia_rows` and ``|off| <= rows_per_shard`` must hold.
    """
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert diags_sharded.shape[0] == n_shards, (diags_sharded.shape, n_shards)
    rows_per_shard = int(diags_sharded.shape[-1])
    offsets = tuple(int(o) for o in offsets)
    w = max(max(abs(o) for o in offsets), 1)
    if w > rows_per_shard:
        raise ValueError(
            f"bandwidth {w} exceeds rows_per_shard {rows_per_shard}; "
            "use fewer shards or the blocked-ELL path"
        )

    def make_lm(ops):
        def local_matvec_multi(v_local):  # (m, R)
            return _local_dia_matvec_multi(ops[0], offsets, v_local, axis)

        return local_matvec_multi

    return _sharded_solve_batched(
        "dia", (diags_sharded,), B, X0,
        mesh=mesh, axis=axis, tol=tol, maxiter=maxiter, inv_diag=inv_diag,
        recompute_r_every=recompute_r_every, method=method, rcond=rcond,
        make_local_matvec_multi=make_lm, key_extra=(offsets,),
    )


# ---------------------------------------------------------------------------
# checkpoint / resume for long sharded solves (round 3; SURVEY §5 extended
# to the mesh: the carry is an explicit pytree of global arrays, so saving
# is serializing leaves and resuming is re-sharding them)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedCGState:
    """Row-sharded PCG carry.  ``x/r/p`` are global (n_padded,) arrays
    (row-sharded on device, gatherable for serialization); scalars and
    ``hist`` are replicated.  Serialize with ``solver.checkpoint.save_state``
    — the mesh/operator are re-supplied at resume (layout metadata lives in
    the operator arrays, not the carry)."""

    k: jax.Array
    done: jax.Array
    x: jax.Array
    r: jax.Array
    p: jax.Array
    rho: jax.Array
    rnorm: jax.Array
    hist: jax.Array

    def tree_flatten(self):
        return (
            self.k, self.done, self.x, self.r, self.p,
            self.rho, self.rnorm, self.hist,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _bell_local_matvec_fn(blocks_s, cols_s, bn, axis):
    def local_matvec(v_local):
        v_full = jax.lax.all_gather(v_local, axis, tiled=True)
        return _local_bell_matvec(blocks_s, cols_s, v_full.reshape(-1, bn))

    return local_matvec


_STATE_SPECS = lambda axis: (
    P(), P(), P(axis), P(axis), P(axis), P(), P(), P()
)


def _generic_sharded_init(
    kind, extra_key, op_arrays, make_lm, b, x0, inv_diag, mesh, axis, maxiter
) -> ShardedCGState:
    """Shared init core: shard_map the carry construction over the mesh.

    ``op_arrays`` are the layout's shard-axis arrays; ``make_lm`` builds the
    per-shard local matvec from the (leading-dim-stripped) shards and closes
    over the statics recorded in ``extra_key`` (which keys the compiled-fn
    cache alongside everything else static)."""
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert op_arrays[0].shape[0] == n_shards, (op_arrays[0].shape, n_shards)
    n_padded = int(b.shape[0])
    maxiter = int(n_padded + 1 if maxiter is None else maxiter)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    with_m = inv_diag is not None
    nop = len(op_arrays)

    key = (f"{kind}-init", _mesh_key(mesh), axis, maxiter, with_m,
           extra_key, str(b.dtype))
    init_jit = _cache_get(key)
    if init_jit is None:
        def init_shard(*args_s):
            op_shards = [a[0] for a in args_s[:nop]]
            b_s, x0_s = args_s[nop], args_s[nop + 1]
            inv_diag_s = args_s[nop + 2] if with_m else None
            lm = make_lm(op_shards)
            return _pcg_init_carry(lm, b_s, x0_s, inv_diag_s, maxiter, axis)

        in_specs = [P(axis)] * (nop + (3 if with_m else 2))
        init_jit = jax.jit(shard_map(
            init_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=_STATE_SPECS(axis),
            check_vma=False,
        ))
        _cache_put(key, init_jit)

    put = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P(axis)))
    args = [put(a) for a in op_arrays] + [put(b), put(x0)]
    if with_m:
        args.append(put(inv_diag))
    return ShardedCGState(*init_jit(*args))


def _generic_sharded_run(
    kind, extra_key, op_arrays, make_lm, state, tol, steps, b, inv_diag,
    recompute_r_every, mesh, axis
) -> ShardedCGState:
    """Shared resume core: ONE shard_map'd while_loop from the given carry,
    bounded by ``steps``, body == _pcg_body_fn (bit-identical to the
    uninterrupted solve)."""
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = mesh.devices.size
    assert op_arrays[0].shape[0] == n_shards, (op_arrays[0].shape, n_shards)
    maxiter = int(state.hist.shape[0]) - 1
    limit = (
        maxiter if steps is None
        else min(maxiter, int(state.k) + int(steps))
    )
    recompute_r_every = int(recompute_r_every)
    if recompute_r_every > 0 and b is None:
        raise ValueError("recompute_r_every > 0 needs b (the RHS)")
    with_m = inv_diag is not None
    with_b = b is not None
    tol_arr = jnp.asarray(tol, dtype=state.x.dtype)
    nop = len(op_arrays)

    # ``limit`` rides as a DYNAMIC replicated scalar: a static limit would
    # recompile the whole shard_map program every chunk (limit = k + steps
    # moves each call)
    key = (f"{kind}-run", _mesh_key(mesh), axis, maxiter, float(tol),
           with_m, with_b, extra_key, str(state.x.dtype), recompute_r_every)
    run_jit = _cache_get(key)
    if run_jit is None:
        def run_shard(limit_s, *args_s):
            op_shards = [a[0] for a in args_s[:nop]]
            i = nop
            b_s = args_s[i] if with_b else None
            i += 1 if with_b else 0
            inv_diag_s = args_s[i] if with_m else None
            i += 1 if with_m else 0
            carry = tuple(args_s[i:])
            lm = make_lm(op_shards)
            body = _pcg_body_fn(lm, b_s, inv_diag_s, tol_arr, axis)
            replace = _pcg_replace_fn(lm, b_s, inv_diag_s, maxiter, axis,
                                      recompute_r_every)

            def cond(c):
                return (c[0] < limit_s) & (~c[1])

            return while_with_periodic_restart(
                cond, body, replace, recompute_r_every, lambda c: c[0], carry
            )

        in_specs = (
            [P()]
            + [P(axis)] * nop
            + ([P(axis)] if with_b else [])
            + ([P(axis)] if with_m else [])
            + list(_STATE_SPECS(axis))
        )
        run_jit = jax.jit(shard_map(
            run_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=_STATE_SPECS(axis),
            check_vma=False,
        ))
        _cache_put(key, run_jit)

    put = lambda a, spec=P(axis): jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, spec)
    )
    args = [put(jnp.asarray(limit, jnp.int32), P())]
    args.extend(put(a) for a in op_arrays)
    if with_b:
        args.append(put(b))
    if with_m:
        args.append(put(inv_diag))
    specs = _STATE_SPECS(axis)
    leaves, _ = state.tree_flatten()
    args.extend(put(leaf, spec) for leaf, spec in zip(leaves, specs))
    return ShardedCGState(*run_jit(*args))


def sharded_cg_init(
    blocks,
    block_cols,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
) -> ShardedCGState:
    """Build the row-sharded (blocked-ELL) PCG carry — the checkpoint/resume
    entry point for mesh-scale solves (the reference loses all state when
    interrupted, CG.hpp:276-302; here save/resume is save_state/load_state
    plus this init's sibling :func:`sharded_run_cg`)."""
    bn = int(blocks.shape[-1])
    make_lm = lambda sh: _bell_local_matvec_fn(sh[0], sh[1], bn, axis)
    return _generic_sharded_init(
        "bell", (bn,), (blocks, block_cols), make_lm, b, x0, inv_diag,
        mesh, axis, maxiter,
    )


def sharded_run_cg(
    blocks,
    block_cols,
    state: ShardedCGState,
    *,
    tol=0.0,
    steps: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    b: Optional[jax.Array] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
) -> ShardedCGState:
    """Advance a row-sharded solve by up to ``steps`` iterations (or to
    convergence / history capacity) inside ONE shard_map'd while_loop.

    ``inv_diag`` must match what the state was initialized with; ``b`` is
    required only when ``recompute_r_every > 0`` (restarts recompute the
    true residual).  Chunks compose bit-identically with
    :func:`sharded_cg_solve`'s uninterrupted XLA path — the body is the same
    function (_pcg_body_fn)."""
    bn = int(blocks.shape[-1])
    make_lm = lambda sh: _bell_local_matvec_fn(sh[0], sh[1], bn, axis)
    return _generic_sharded_run(
        "bell", (bn,), (blocks, block_cols), make_lm, state, tol, steps, b,
        inv_diag, recompute_r_every, mesh, axis,
    )


def sharded_dia_cg_init(
    diags_sharded,
    offsets,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
) -> ShardedCGState:
    """Checkpointable carry for the ring-halo (DIA/banded) sharded solve —
    the Flan-class long-solve case where resume matters most."""
    offsets = tuple(int(o) for o in offsets)
    make_lm = lambda sh: (
        lambda v: _local_dia_matvec(sh[0], offsets, v, axis)
    )
    return _generic_sharded_init(
        "dia", (offsets,), (jnp.asarray(diags_sharded),), make_lm, b, x0,
        inv_diag, mesh, axis, maxiter,
    )


def sharded_dia_run_cg(
    diags_sharded,
    offsets,
    state: ShardedCGState,
    *,
    tol=0.0,
    steps: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    b: Optional[jax.Array] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
) -> ShardedCGState:
    """Resume sibling of :func:`sharded_dia_cg_init` (ring-halo SpMV)."""
    offsets = tuple(int(o) for o in offsets)
    make_lm = lambda sh: (
        lambda v: _local_dia_matvec(sh[0], offsets, v, axis)
    )
    return _generic_sharded_run(
        "dia", (offsets,), (jnp.asarray(diags_sharded),), make_lm, state,
        tol, steps, b, inv_diag, recompute_r_every, mesh, axis,
    )


def sharded_sell_cg_init(
    sell_sharded,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    maxiter: Optional[int] = None,
    inv_diag: Optional[jax.Array] = None,
) -> ShardedCGState:
    """Checkpointable carry for the scattered-pattern (SELL) sharded solve;
    ``sell_sharded`` is :func:`partition_sell_rows`'s tuple."""
    diag, pos, cols_flat, vals_flat, meta, _ = sell_sharded
    make_lm = lambda sh: (
        lambda v: _local_sell_matvec(sh[0], sh[1], sh[2], sh[3], meta, v, axis)
    )
    ops = tuple(jnp.asarray(a) for a in (diag, pos, cols_flat, vals_flat))
    return _generic_sharded_init(
        "sell", (meta,), ops, make_lm, b, x0, inv_diag, mesh, axis, maxiter,
    )


def sharded_sell_run_cg(
    sell_sharded,
    state: ShardedCGState,
    *,
    tol=0.0,
    steps: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    b: Optional[jax.Array] = None,
    inv_diag: Optional[jax.Array] = None,
    recompute_r_every: int = 0,
) -> ShardedCGState:
    """Resume sibling of :func:`sharded_sell_cg_init`."""
    diag, pos, cols_flat, vals_flat, meta, _ = sell_sharded
    make_lm = lambda sh: (
        lambda v: _local_sell_matvec(sh[0], sh[1], sh[2], sh[3], meta, v, axis)
    )
    ops = tuple(jnp.asarray(a) for a in (diag, pos, cols_flat, vals_flat))
    return _generic_sharded_run(
        "sell", (meta,), ops, make_lm, state, tol, steps, b, inv_diag,
        recompute_r_every, mesh, axis,
    )


def sharded_state_result(state: ShardedCGState):
    """(x, CGInfo) from a carry — what :func:`sharded_cg_solve` returns."""
    return state.x, _solve_info(
        state.k, state.done, state.rho, state.rnorm, state.hist
    )
