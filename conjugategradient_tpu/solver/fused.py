"""Fused-kernel CG driver for blocked-ELL operators (the TPU fast path).

Same algorithm, same semantics as solver/cg.py (SURVEY §2.3: recurrence
residual, Hestenes–Stiefel α/β, pre-update termination on ‖r_k‖², N+1 cap,
NaN exit, ρ==0 guard) — but the iteration body is TWO Pallas kernels instead
of ~10 XLA fusions:

    K1  p = r + β·p;  q = A·p;  pap = p·q     (ops/pallas/fused_cg)
    K2  x += α·p;  r -= α·q;  rnorm = r·r

The direction update (the reference's sapbx at the END of its iteration,
CG.hpp:418) is hoisted into the next iteration's SpMV pass: identical
algebra, one fewer pass over HBM, and the operand is formed directly in the
VMEM buffer the tile gather reads from.  α/β never leave the device as (1,1)
scalars (the reference's device-resident ``Scalar``,
LinearAlgebraTypes.hpp:210-250).

Float32-only (accumulation in f32, like the unfused f32 path); the float64
parity oracle runs the unfused solver on CPU.  Fused-vs-unfused consistency
is tested in interpret mode (tests/test_fused.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import BlockedEllMatrix, SymBellMatrix
from .cg import CGInfo
from .restart import while_with_periodic_restart


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FusedCGState:
    """Carry of the fused loop.  Vectors live as (rows, 128) f32 blocks;
    scalars as (1, 1) f32 so they feed kernel SMEM operands without
    relayout."""

    k: jax.Array
    done: jax.Array
    x: jax.Array  # (rows, bn)
    r: jax.Array  # (rows, bn)
    p: jax.Array  # (rows, bn) — direction of the PREVIOUS iteration
    beta: jax.Array  # (1, 1) — folded into the next K1
    rho: jax.Array  # (1, 1) — ‖r_k‖²
    hist: jax.Array

    def tree_flatten(self):
        return (
            self.k, self.done, self.x, self.r, self.p,
            self.beta, self.rho, self.hist,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def fused_supported(a: Any, dtype=None, interpret: bool = False) -> bool:
    """Whether the fused path can run this operator: blocked-ELL (full or
    symmetric storage), square lane-aligned tiles, square padded shape, f32
    vectors, operand resident in VMEM alongside the tile pipeline."""
    if isinstance(a, SymBellMatrix):
        bm, bn, ku = a.bm, a.bn, a.ku
        tiles_per_row = 1 + ku
        np_, mp = a.padded_shape
    elif isinstance(a, BlockedEllMatrix):
        _, tiles_per_row, bm, bn = a.blocks.shape
        ku = tiles_per_row
        np_, mp = a.padded_shape
    else:
        return False
    vec_bytes = mp * 4
    nrb = np_ // bm
    itemsize = jnp.dtype(a.dtype).itemsize
    ok = (
        bm == bn
        and bn % 128 == 0
        and bm % 8 == 0
        and np_ == mp  # square padded system: q rows align with p rows
        and a.dtype in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
        and (dtype is None or jnp.dtype(dtype) == jnp.dtype(jnp.float32))
        and ku <= 64
        # VMEM: 4 whole vectors + scratch + double-buffered tile groups.
        # v5e VMEM is 128 MB (measured: 67 MB arrays stay resident —
        # docs/performance.md); leave headroom for Mosaic's own buffers.
        and 5 * vec_bytes + 2 * 8 * tiles_per_row * bm * bn * 4
        <= 96 * 1024 * 1024
        # Mosaic block rule (dims divisible by 8 / equal to the array):
        # odd-sized operators fall back to ONE whole-array grid step,
        # viable only while that step stays VMEM-small (caught live on
        # poisson2d_34, nrb=10 — ops/pallas/fused_cg._row_group_for_blocked_q;
        # both storages share the selection so their per-step pap groupings,
        # and hence solve trajectories, stay identical).  The update kernels
        # chunk all vectors (C, bn)-blocked under the same rule.
        and (nrb % 8 == 0
             or nrb * tiles_per_row * bm * bn * itemsize <= 16 * 1024 * 1024)
        and ((mp // bn) % 8 == 0 or mp // bn <= 8192)
    )
    if not ok:
        return False
    if interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def fused_cg_init(
    a: BlockedEllMatrix,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    maxiter: int = 0,
) -> FusedCGState:
    """r₀ = b − A·x₀ (skipping the SpMV when x₀ is the default zero,
    CG.hpp:291-297), p enters the loop through K1 with β=0 ⇒ p₁ = r₀."""
    np_, mp = a.padded_shape
    bn = a.bn
    n = b.shape[0]
    bp = jnp.zeros((mp,), jnp.float32).at[:n].set(b.astype(jnp.float32))
    if x0 is None:
        x2d = jnp.zeros((mp // bn, bn), jnp.float32)
        r2d = bp.reshape(mp // bn, bn)
    else:
        x0p = jnp.zeros((mp,), jnp.float32).at[:n].set(x0.astype(jnp.float32))
        ax = a.matvec(x0p).astype(jnp.float32)  # (n,) true rows
        r = bp - jnp.pad(ax, (0, mp - n))
        x2d = x0p.reshape(mp // bn, bn)
        r2d = r.reshape(mp // bn, bn)
    rho0 = jnp.sum(r2d * r2d).reshape(1, 1)
    hist = jnp.full((maxiter + 1,), jnp.nan, dtype=jnp.float32)
    hist = hist.at[0].set(rho0[0, 0])
    return FusedCGState(
        k=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        x=x2d,
        r=r2d,
        p=jnp.zeros_like(r2d),  # unused at k=0: beta=0 makes p₁ = r₀
        beta=jnp.zeros((1, 1), jnp.float32),
        rho=rho0,
        hist=hist,
    )


def _auto_mirror(a: SymBellMatrix) -> str:
    """Measured-best Bᵀ landing scheme for a symmetric operator's pattern.

    v5e at the n=256K headline (tools/symbell_mirror_ab.py, K=128 chains,
    3 reps x 2 interleaved rounds): banded 397.9 us/iter (1038 GB/s eff)
    vs scatter 429.0 (963) vs split 439.6 (940) vs full-storage 501.1
    (824.5) — the pure aligned-write q assembly wins whenever the
    block-tridiagonal pattern allows it; the general pattern keeps the
    per-tile scatter (split's dedicated RMW phase measured slower).
    """
    return "banded" if a.banded and a.off_blocks.shape[1] == 1 else "scatter"


def fused_cg_step(
    a: BlockedEllMatrix,
    state: FusedCGState,
    tol: jax.Array,
    interpret: bool = False,
    mirror: str = "auto",
) -> FusedCGState:
    """One CG iteration in two fused kernels.  Semantics == solver/cg.cg_step
    (same update order, same pre-update termination test, same ρ==0 guard).

    ``mirror`` (symmetric storage only) picks the Bᵀ landing scheme of the
    K1 kernel; ``"auto"`` uses the measured-best default per pattern (see
    ops/pallas/fused_cg._sym_dir_spmv_kernel and docs/performance.md)."""
    from ..ops.pallas.fused_cg import (
        fused_dir_spmv_dot,
        fused_update_dot,
        sym_fused_dir_spmv_dot,
    )

    if isinstance(a, SymBellMatrix):
        if mirror == "auto":
            mirror = _auto_mirror(a)
        elif mirror == "banded" and not a.banded:
            # the kernel would silently land every mirror at row+1; ku==1
            # alone does not guarantee that pattern — only the static flag
            raise ValueError(
                "mirror='banded' requires a block-tridiagonal operator "
                "(SymBellMatrix.banded); this pattern has off-band tiles"
            )
        p_new, q, pap = sym_fused_dir_spmv_dot(
            a.diag_blocks, a.off_blocks, a.off_cols,
            state.r, state.p, state.beta, interpret=interpret,
            mirror=mirror,
        )
    else:
        p_new, q, pap = fused_dir_spmv_dot(
            a.blocks, a.block_cols, state.r, state.p, state.beta,
            interpret=interpret,
        )
    rho = state.rho[0, 0]
    exact = rho == 0  # warm start at the solution: keep α=β=0 (cg.py:152-158)
    alpha = jnp.where(exact, 0.0, rho / jnp.where(exact, 1.0, pap[0, 0]))
    x, r, rnorm = fused_update_dot(
        state.x, p_new, state.r, q.reshape(state.r.shape),
        alpha.reshape(1, 1), interpret=interpret,
    )
    # pre-update termination (CG.hpp:401-402, deterministic per SURVEY §2.3(5))
    done = jnp.isnan(rho) | (jnp.sqrt(rho) <= tol)
    beta = jnp.where(exact, 0.0, rnorm[0, 0] / jnp.where(exact, 1.0, rho))
    k = state.k + 1
    hist = state.hist.at[k].set(rnorm[0, 0])
    return FusedCGState(
        k=k,
        done=done,
        x=x,
        r=r,
        p=p_new,
        beta=beta.reshape(1, 1),
        rho=rnorm,
        hist=hist,
    )


def fused_bell_cg_solve(
    a: BlockedEllMatrix,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    interpret: bool = False,
    recompute_r_every: int = 0,
) -> Tuple[jax.Array, CGInfo]:
    """Whole fused solve in one jitted ``lax.while_loop`` — the drop-in fast
    path :func:`~conjugategradient_tpu.cg_solve` dispatches to on TPU.

    ``recompute_r_every > 0`` composes residual replacement with the fused
    iteration: the hot body stays the two-kernel loop, and every that many
    iterations a boundary step (solver/restart.py) replaces the recurrence
    residual with the true ``b − A x`` and resets the direction (β = 0 makes
    the next K1 emit p = r_true) — the f32 honesty mechanism at the fused
    per-iteration cost."""
    n = a.shape[0]
    if maxiter is None:
        maxiter = n + 1
    maxiter = int(maxiter)
    tol_arr = jnp.asarray(tol, jnp.float32)
    # one jitted call for the whole solve (eager setup ops cost a dispatch
    # round-trip each over remote relays; see solver/cg._cg_solve_core)
    return _fused_solve_core(a, b, x0, tol_arr, maxiter, interpret,
                             int(recompute_r_every))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FusedPCGState:
    """PCG carry: like FusedCGState plus the separate ρ = r·z scalar
    (preconditioned CG tracks both r·z and ‖r‖²; unpreconditioned they
    coincide)."""

    k: jax.Array
    done: jax.Array
    x: jax.Array
    r: jax.Array
    p: jax.Array
    beta: jax.Array  # (1, 1)
    rho: jax.Array  # (1, 1) — r·z, drives α/β
    rnorm: jax.Array  # (1, 1) — ‖r‖², drives termination/history
    hist: jax.Array

    def tree_flatten(self):
        return (self.k, self.done, self.x, self.r, self.p,
                self.beta, self.rho, self.rnorm, self.hist), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def fused_bell_pcg_solve(
    a: BlockedEllMatrix,
    b: jax.Array,
    inv_diag: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 0.0,
    maxiter: Optional[int] = None,
    interpret: bool = False,
    recompute_r_every: int = 0,
) -> Tuple[jax.Array, CGInfo]:
    """Jacobi-PCG with the fused two-kernel iteration (BASELINE config 3's
    "fused preconditioner-apply kernel", literally: the M⁻¹ multiply happens
    inside K1's direction update and K2's ρ reduction — zero extra passes
    beyond one read of inv_diag per kernel).  ``recompute_r_every`` composes
    like :func:`fused_bell_cg_solve` (restart boundary resets p to M⁻¹r)."""
    n = a.shape[0]
    if maxiter is None:
        maxiter = n + 1
    maxiter = int(maxiter)
    tol_arr = jnp.asarray(tol, jnp.float32)
    return _fused_pcg_core(a, b, inv_diag, x0, tol_arr, maxiter, interpret,
                           int(recompute_r_every))


@functools.partial(
    jax.jit, static_argnames=("maxiter", "interpret", "recompute_r_every")
)
def _fused_pcg_core(a, b, inv_diag, x0, tol_arr, maxiter, interpret,
                    recompute_r_every=0):
    from ..ops.pallas.fused_cg import (
        fused_dir_spmv_dot,
        fused_update_dot_pcg,
        sym_fused_dir_spmv_dot,
    )

    n = a.shape[0]
    _, mp = a.padded_shape
    bn = a.bn
    base = fused_cg_init(a, b, x0, maxiter=maxiter)
    # padding slots get d=1 (inert: r is zero there anyway)
    d2d = (
        jnp.ones((mp,), jnp.float32)
        .at[:n].set(inv_diag.astype(jnp.float32))
        .reshape(mp // bn, bn)
    )
    rho0 = jnp.sum(base.r * base.r * d2d).reshape(1, 1)
    state0 = FusedPCGState(
        k=base.k, done=base.done, x=base.x, r=base.r, p=base.p,
        beta=base.beta, rho=rho0, rnorm=base.rho, hist=base.hist,
    )

    def cond(s):
        return (s.k < maxiter) & (~s.done)

    def body(s):
        if isinstance(a, SymBellMatrix):
            p_new, q, pap = sym_fused_dir_spmv_dot(
                a.diag_blocks, a.off_blocks, a.off_cols,
                s.r, s.p, s.beta, inv_diag2d=d2d, interpret=interpret,
                mirror=_auto_mirror(a),
            )
        else:
            p_new, q, pap = fused_dir_spmv_dot(
                a.blocks, a.block_cols, s.r, s.p, s.beta, inv_diag2d=d2d,
                interpret=interpret,
            )
        rho = s.rho[0, 0]
        exact = rho == 0
        alpha = jnp.where(exact, 0.0, rho / jnp.where(exact, 1.0, pap[0, 0]))
        x, r, rnorm, rho_next = fused_update_dot_pcg(
            s.x, p_new, s.r, q.reshape(s.r.shape), d2d,
            alpha.reshape(1, 1), interpret=interpret,
        )
        done = jnp.isnan(s.rnorm[0, 0]) | (jnp.sqrt(s.rnorm[0, 0]) <= tol_arr)
        beta = jnp.where(
            exact, 0.0, rho_next[0, 0] / jnp.where(exact, 1.0, rho)
        )
        k = s.k + 1
        hist = s.hist.at[k].set(rnorm[0, 0])
        return FusedPCGState(
            k=k, done=done, x=x, r=r, p=p_new,
            beta=beta.reshape(1, 1), rho=rho_next, rnorm=rnorm, hist=hist,
        )

    def replace(s):
        # full restart at the chunk boundary (solver/cg.py replace):
        # r ← b − A x (true residual), β ← 0 so the next K1 emits
        # p = M⁻¹r — the drifted direction is dropped with the drifted r
        mask = (~s.done) & (s.k % recompute_r_every == 0)
        bp = jnp.zeros((s.r.size,), jnp.float32).at[:n].set(
            b.astype(jnp.float32))
        ax = a.matvec(s.x.reshape(-1)).astype(jnp.float32)
        r_true = (bp - jnp.pad(ax, (0, s.r.size - n))).reshape(s.r.shape)
        rnorm = jnp.sum(r_true * r_true).reshape(1, 1)
        rho = jnp.sum(r_true * r_true * d2d).reshape(1, 1)
        hist = s.hist.at[s.k].set(
            jnp.where(mask, rnorm[0, 0], s.hist[s.k]))
        sel = lambda a_, b_: jnp.where(mask, a_, b_)
        return FusedPCGState(
            k=s.k, done=s.done, x=s.x,
            r=sel(r_true, s.r), p=s.p,
            beta=sel(jnp.zeros((1, 1), jnp.float32), s.beta),
            rho=sel(rho, s.rho), rnorm=sel(rnorm, s.rnorm), hist=hist,
        )

    s = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda s: s.k, state0
    )
    rnorm = s.rnorm[0, 0]
    info = CGInfo(
        iterations=s.k,
        converged=s.done & ~jnp.isnan(rnorm),
        rho=s.rho[0, 0].astype(b.dtype),
        rnorm_sq=rnorm.astype(b.dtype),
        rho_history=s.hist,
    )
    return s.x.reshape(-1)[:n].astype(b.dtype), info


@functools.partial(
    jax.jit, static_argnames=("maxiter", "interpret", "recompute_r_every")
)
def _fused_solve_core(a, b, x0, tol_arr, maxiter, interpret,
                      recompute_r_every=0):
    n = a.shape[0]
    state0 = fused_cg_init(a, b, x0, maxiter=maxiter)

    def cond(s: FusedCGState):
        return (s.k < maxiter) & (~s.done)

    def body(s: FusedCGState):
        return fused_cg_step(a, s, tol_arr, interpret=interpret)

    def replace(s: FusedCGState) -> FusedCGState:
        # full restart (solver/cg.py replace, fused representation):
        # r ← b − A x, β ← 0 — the next K1's p = r + β·p then emits the
        # reset direction p = r_true.  Runs at while-boundaries only
        # (solver/restart.py), so the two-kernel hot body is untouched.
        mask = (~s.done) & (s.k % recompute_r_every == 0)
        bp = jnp.zeros((s.r.size,), jnp.float32).at[:n].set(
            b.astype(jnp.float32))
        ax = a.matvec(s.x.reshape(-1)).astype(jnp.float32)
        r_true = (bp - jnp.pad(ax, (0, s.r.size - n))).reshape(s.r.shape)
        rnorm = jnp.sum(r_true * r_true).reshape(1, 1)
        hist = s.hist.at[s.k].set(
            jnp.where(mask, rnorm[0, 0], s.hist[s.k]))
        sel = lambda a_, b_: jnp.where(mask, a_, b_)
        return FusedCGState(
            k=s.k, done=s.done, x=s.x,
            r=sel(r_true, s.r), p=s.p,
            beta=sel(jnp.zeros((1, 1), jnp.float32), s.beta),
            rho=sel(rnorm, s.rho), hist=hist,
        )

    s = while_with_periodic_restart(
        cond, body, replace, recompute_r_every, lambda s: s.k, state0
    )
    rnorm = s.rho[0, 0]
    info = CGInfo(
        iterations=s.k,
        converged=s.done & ~jnp.isnan(rnorm),
        rho=rnorm.astype(b.dtype),
        rnorm_sq=rnorm.astype(b.dtype),
        rho_history=s.hist,
    )
    return s.x.reshape(-1)[:n].astype(b.dtype), info
