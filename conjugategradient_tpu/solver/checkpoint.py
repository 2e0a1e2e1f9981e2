"""Checkpoint / resume for long solves.

The reference runs ``solve()`` to completion with all intermediate state in
device workspace (CG.hpp:276-302) — stopping loses everything.  Here the
solver carry (:class:`~conjugategradient_tpu.solver.cg.CGState`) is an
explicit pytree, so checkpointing is just serializing its leaves (SURVEY §5).
This module provides a plain-npz implementation plus resumable driving:

    state = cg_init(A, b, maxiter=100000)
    state = run_cg(A, state, tol, steps=5000)      # 5000 fused iterations
    save_state("ckpt.npz", state)
    ...
    state = load_state("ckpt.npz")
    state = run_cg(A, state, tol, steps=5000)      # continues exactly

``run_cg`` executes a bounded number of iterations inside one jitted
while_loop (honoring convergence), so a driver can checkpoint every N
iterations with a single host sync per chunk.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .batched import BatchedCGState
from .cg import CGState, cg_step
from .fused import FusedCGState, fused_cg_step
from ..types import LinearOperator


def _sharded_state_cls():
    # lazy: parallel/ imports solver/ (CGInfo), so a top-level import here
    # would be circular
    from ..parallel.sharded_cg import ShardedCGState

    return ShardedCGState


_KINDS = {
    "CGState": CGState,
    "FusedCGState": FusedCGState,
    "BatchedCGState": BatchedCGState,
}


def _kinds():
    kinds = dict(_KINDS)
    kinds["ShardedCGState"] = _sharded_state_cls()
    return kinds


def save_state(path, state) -> None:
    """Serialize a solver carry (CGState / FusedCGState / BatchedCGState /
    ShardedCGState) to ``.npz``.  Sharded carries gather to host arrays —
    resuming re-shards them onto whatever mesh :func:`sharded_run_cg`
    receives (the layout lives in the operator, not the carry)."""
    kind = type(state).__name__
    if kind not in _kinds():
        raise TypeError(f"not a checkpointable solver state: {kind}")
    fields = [f.name for f in dataclasses.fields(state)]
    np.savez(
        path,
        __kind__=np.asarray(kind),
        **{name: np.asarray(getattr(state, name)) for name in fields},
    )


def load_state(path):
    """Load a carry saved by :func:`save_state` (kind restored from the
    file; files from before the fused path default to CGState)."""
    with np.load(path) as z:
        kind = str(z["__kind__"]) if "__kind__" in z else "CGState"
        cls = _kinds()[kind]
        fields = [f.name for f in dataclasses.fields(cls)]
        return cls(**{name: jnp.asarray(z[name]) for name in fields})


def run_cg(
    A: LinearOperator,
    state: CGState,
    tol,
    steps: Optional[int] = None,
    M=None,
) -> CGState:
    """Advance the solve by up to ``steps`` iterations (or to convergence /
    the history capacity) inside one jitted while_loop.

    ``M`` must match the preconditioner the state was initialized with
    (``cg_init(..., M=M)``): mixing a PCG carry with plain-CG steps (or vice
    versa) silently corrupts the beta recurrence.

    Accepts either the portable ``CGState`` or the TPU fast path's
    ``FusedCGState`` (from ``solver.fused.fused_cg_init``; ``A`` must then
    be the BlockedEllMatrix it was built for, and ``M`` must be None).
    """
    maxiter = int(state.hist.shape[0]) - 1
    limit = maxiter if steps is None else min(maxiter, int(state.k) + int(steps))
    fused = isinstance(state, FusedCGState)
    if fused and M is not None:
        raise ValueError("FusedCGState carries are unpreconditioned (M=None)")
    tol_arr = jnp.asarray(
        tol, dtype=jnp.float32 if fused else state.x.dtype
    )

    def cond(s):
        return (s.k < limit) & (~s.done)

    def body(s):
        if fused:
            return fused_cg_step(A, s, tol_arr)
        return cg_step(A, s, tol_arr, M=M)

    return jax.lax.while_loop(cond, body, state)
