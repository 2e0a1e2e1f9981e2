"""Row-sharded FSAI preconditioner (the multi-chip variant of solver/fsai.py).

The FSAI apply is two SpMVs (z = Gᵀ(G r)); on a row mesh each becomes the
solver's own sharded-SpMV pattern — all_gather the input vector over ICI,
multiply the shard's blocked-ELL row block — so the apply costs exactly two
all_gathers per PCG iteration on top of the solve's collectives (the same
count a second operator matvec would; no new collective shapes).  The G
factor is built ONCE on host by the single-device setup (solver/fsai.
_build_g_host — identical factor, parity by construction) and partitioned
with the same machinery the sharded AMG levels use.

The reference has no preconditioning and no distribution (SURVEY.md §2.4);
this composes two of the rebuild's extension axes.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..solver.amg import _to_scipy_csr
from ..solver.fsai import _build_g_host
from ..types import CSRMatrix
from .local_ops import _local_bell_matvec
from .sharded_amg import _block_of, _partition_level_op
from .sharded_cg import ShardedPreconditioner


def sharded_fsai_preconditioner(
    A: Any,
    n_shards: int,
    n_padded: int,
    *,
    axis: str = "rows",
    power: int = 1,
    dtype=None,
) -> ShardedPreconditioner:
    """Build the row-sharded FSAI ``M_local`` for
    :func:`~conjugategradient_tpu.parallel.sharded_cg_solve`.

    Args mirror :func:`~conjugategradient_tpu.fsai_preconditioner` plus the
    sharding geometry:

      n_shards: mesh size (must match the solve's mesh).
      n_padded: the SOLVER's padded global size — the third return of
        ``partition_csr_rows`` — so the factor's row shards line up with
        the CG loop's vectors.
      axis: mesh axis name (must match the solve's).

    Returns a :class:`~.sharded_cg.ShardedPreconditioner` threading the
    per-shard G / Gᵀ blocked-ELL row blocks through the solver's shard_map
    as sharded ARGUMENTS (a bare closure would replicate both factors on
    every device).  Diagnostics: ``.nnz``, ``.G_host``.
    """
    if dtype is None:
        dtype = A.dtype if isinstance(A, CSRMatrix) else (
            jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
        )
    A_sp = _to_scipy_csr(A)
    n = A_sp.shape[0]
    if A_sp.shape[0] != A_sp.shape[1]:
        raise ValueError(f"FSAI needs a square operator, got {A_sp.shape}")
    if n_padded < n:
        raise ValueError(f"n_padded={n_padded} < matrix size {n}")
    if n_padded % n_shards:
        raise ValueError(
            f"n_padded={n_padded} not divisible by n_shards={n_shards}")

    G_sp = _build_g_host(A_sp, power)
    rps = n_padded // n_shards
    bn = _block_of(rps)
    G_blocks, G_cols = _partition_level_op(
        G_sp, n_shards, rps, n_padded, bn, dtype)
    Gt_blocks, Gt_cols = _partition_level_op(
        G_sp.T.tocsr(), n_shards, rps, n_padded, bn, dtype)

    def make_local_apply(shards):
        G_b, G_c, Gt_b, Gt_c = shards

        def apply(r_local: jax.Array) -> jax.Array:
            r_full = jax.lax.all_gather(r_local, axis, tiled=True)
            y_local = _local_bell_matvec(G_b, G_c, r_full.reshape(-1, bn))
            y_full = jax.lax.all_gather(y_local, axis, tiled=True)
            return _local_bell_matvec(Gt_b, Gt_c, y_full.reshape(-1, bn))

        return apply

    pre = ShardedPreconditioner(
        op_arrays=(G_blocks, G_cols, Gt_blocks, Gt_cols),
        make_local_apply=make_local_apply,
    )
    pre.nnz = int(G_sp.nnz)
    pre.G_host = G_sp
    pre.power = power
    return pre
