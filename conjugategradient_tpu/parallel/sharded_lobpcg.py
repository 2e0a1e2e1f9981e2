"""Row-sharded LOBPCG — the distributed preconditioned block eigensolver.

The mesh composition of :mod:`..solver.lobpcg`: each chip owns a
contiguous row block of A (blocked-ELL tiles from
:func:`~.partition.partition_csr_rows`) and the matching (m, ·) slabs of
the X/W/P blocks.  The reference has no eigensolver and no multi-device
code at all (SURVEY.md §2.4); this is the north-star extension pattern —
every solver family gets a sharded twin riding the same partitioners and
collective vocabulary as the linear solves.

TPU-first shape — the whole iteration is one ``shard_map``-ed jitted
``lax.while_loop``; per iteration the collectives are:

* ONE ``all_gather`` of the (m, 3k) search block for the block SpMV
  (the tile stream is read once for all 3k columns — MXU (bm,bn)×(bn,3k)
  products, exactly the lockstep multi-RHS amortization);
* TWO ``psum`` s of (3k, 3k) Gram payloads — the distributed tall-skinny
  QR is **CholQR²** (Gram → Cholesky → triangular solve, applied twice:
  one pass squares the basis condition number, the second cleans it up —
  the standard communication-optimal TSQR substitute when the panel is
  this skinny), and the Rayleigh–Ritz projection ``QᵀAQ`` is the same
  psum shape;
* ONE ``psum`` of the (k,) residual norms.

Everything (3k)² — Cholesky, eigh, coefficient solves — is replicated
per device: at block sizes that fit LOBPCG (3k ≪ n/devices) the
redundant flops are noise next to one avoided gather.

Padded rows (partition_csr_rows rounds n up to shard-homogeneous row
blocks) are kept EXACTLY zero in X/W/P by a per-shard mask, so the
Gram/projection matrices — and therefore the Ritz spectrum — are those
of the true n×n operator; a zero-padded operator row would otherwise
contribute spurious zero eigenvalues at the "smallest" end being solved
for.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.eigs import DEFAULT_RTOL, EigsResult
from .local_ops import _local_bell_matvec_multi
from .partition import make_row_mesh
from .sharded_cg import (
    _as_sharded_precond,
    _cache_get,
    _cache_put,
    _mesh_key,
    shard_map,
)

_HI = jax.lax.Precision.HIGHEST

__all__ = ["sharded_lobpcg_eigs"]


def _chol_qr(S_local, axis, ridge):
    """One CholQR pass over the row-sharded tall-skinny block.

    G = psum(SᵀS) replicates the (3k)² Gram on every device; Cholesky and
    the triangular solve are redundant-replicated; only the Gram psum
    touches the network.  ``ridge`` (eps·tr(G)) keeps the factor finite
    when the basis has collapsed directions — CholQR's classic failure —
    and the second pass restores orthonormality to working precision.
    """
    G = jax.lax.psum(
        jnp.matmul(S_local.T, S_local, precision=_HI), axis
    )
    m = G.shape[0]
    G = 0.5 * (G + G.T) + ridge * jnp.trace(G) * jnp.eye(m, dtype=G.dtype)
    L = jnp.linalg.cholesky(G)
    Qt = jax.scipy.linalg.solve_triangular(L, S_local.T, lower=True)
    return Qt.T


def sharded_lobpcg_eigs(
    blocks,
    block_cols,
    k: int = 4,
    *,
    n: int,
    mesh: Optional[Mesh] = None,
    axis: str = "rows",
    M_local: Optional[Any] = None,
    which: str = "smallest",
    X0: Optional[jax.Array] = None,
    tol: float = DEFAULT_RTOL,
    maxiter: int = 100,
    seed: int = 0,
    tol_absolute: bool = False,
) -> EigsResult:
    """k extreme eigenpairs of a row-sharded SPD operator via LOBPCG.

    Args:
      blocks / block_cols: per-shard blocked-ELL tiles from
        :func:`~.partition.partition_csr_rows` (leading shard axis).
      k: block size = number of eigenpairs; needs ``3k <= n``.
      n: the TRUE global dimension (pre-padding) — required so padded
        rows are masked out of the search space (see module docstring).
      mesh / axis: the row mesh (default: all devices).
      M_local: per-shard preconditioner apply ``r_local -> z_local`` —
        a bare callable (replicated closure state) or a
        :class:`~.sharded_cg.ShardedPreconditioner` (AMG/FSAI: operator
        data threaded as sharded arguments); the same objects the
        sharded linear solves take.
      which: ``"smallest"`` or ``"largest"``.
      X0: optional (n_padded, k) global initial block (random otherwise;
        padded rows are zeroed either way).
      tol: pair i converges when ‖A xᵢ − λᵢ xᵢ‖ ≤ tol·θ_max (relative,
        default) or ≤ tol (``tol_absolute=True``).
      maxiter: iteration cap.

    Returns :class:`~.eigs.EigsResult` — ``vectors`` is the (n_padded, k)
    globally-sharded Ritz block (rows past ``n`` are zero).  Semantics
    match single-device :func:`~conjugategradient_tpu.lobpcg_eigs` up to
    reduction association order (psum of per-shard Gram partials).
    """
    if which not in ("smallest", "largest"):
        raise ValueError(
            f"which must be 'smallest' or 'largest', got {which!r}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if maxiter < 1:
        raise ValueError(f"need maxiter >= 1, got {maxiter}")
    if 3 * k > n:
        raise ValueError(
            f"LOBPCG needs 3k <= n (basis [X, W, P]); got k={k}, n={n}")
    mesh = mesh or make_row_mesh(axis=axis)
    n_shards = int(mesh.devices.size)
    if blocks.shape[0] != n_shards:
        raise ValueError(
            f"blocks has {blocks.shape[0]} shards, mesh has {n_shards}")
    bn = int(blocks.shape[-1])
    nrb, bm = int(blocks.shape[1]), int(blocks.shape[-2])
    m_rows = nrb * bm  # rows per shard
    n_padded = m_rows * n_shards
    if not (n <= n_padded):
        raise ValueError(f"n={n} exceeds the padded dimension {n_padded}")
    dt = jnp.promote_types(blocks.dtype, jnp.float32)

    rng = np.random.default_rng(seed)
    if X0 is None:
        X0 = jnp.asarray(rng.standard_normal((n_padded, k)), dt)
    else:
        X0 = jnp.asarray(X0, dt)
        if X0.shape != (n_padded, k):
            raise ValueError(
                f"X0 must have shape ({n_padded}, {k}), got {X0.shape}")
    P0 = jnp.asarray(rng.standard_normal((n_padded, k)), dt)
    row_mask = (np.arange(n_padded) < n).astype(np.dtype(dt))
    X0 = X0 * row_mask[:, None]
    P0 = P0 * row_mask[:, None]

    mp = _as_sharded_precond(M_local, axis) if M_local is not None else None
    m_arrays = tuple(mp.op_arrays) if mp is not None else ()
    m_specs = (
        (mp.op_specs if mp.op_specs is not None
         else tuple(P(axis) for _ in m_arrays))
        if mp is not None else ()
    )
    nmop = len(m_arrays)

    largest = which == "largest"
    absolute = bool(tol_absolute)
    key = ("lobpcg", _mesh_key(mesh), axis, k, maxiter, bn, str(dt),
           largest, absolute, mp.token if mp is not None else None)
    solve_jit = _cache_get(key)
    if solve_jit is None:
        eps = float(np.finfo(np.dtype(dt)).eps)
        tiny = float(np.finfo(np.dtype(dt)).tiny ** 0.5)

        def solve_shard(blocks_s, cols_s, *rest):
            blocks_l, cols_l = blocks_s[0], cols_s[0]
            m_shards = [
                a[0] if spec == P(axis) else a
                for a, spec in zip(rest[:nmop], m_specs)
            ]
            X0_s, P0_s, mask_s, tol_a = rest[nmop:]
            mask = mask_s[:, None]
            m_fn = mp.make_local_apply(m_shards) if mp is not None else None

            def a_mv(V_local):  # (m, R) -> (m, R), R static
                v_full = jax.lax.all_gather(V_local, axis, tiled=True)
                return _local_bell_matvec_multi(
                    blocks_l, cols_l,
                    v_full.reshape(-1, bn, V_local.shape[-1])
                ).astype(dt)

            def m_apply(R_local):
                if m_fn is None:
                    return R_local
                # unrolled columns: M_local is a single-vector per-shard
                # apply (may wrap Pallas kernels that reject vmap) and may
                # itself issue collectives — unrolling keeps those legal
                return jnp.stack(
                    [m_fn(R_local[:, j]) for j in range(k)], axis=1
                ).astype(dt) * mask

            def normalize(V_local):
                nrm = jnp.sqrt(jax.lax.psum(
                    jnp.sum(jnp.square(V_local), axis=0), axis))
                return V_local / jnp.maximum(nrm, tiny)[None, :]

            def select(w, C):
                if largest:
                    return w[-k:][::-1], C[:, -k:][:, ::-1]
                return w[:k], C[:, :k]

            def ritz(Q_local):
                AQ = a_mv(Q_local)
                T = jax.lax.psum(
                    jnp.matmul(Q_local.T, AQ, precision=_HI), axis)
                w, C = jnp.linalg.eigh(0.5 * (T + T.T))
                lam, Cx = select(w, C)
                X = jnp.matmul(Q_local, Cx, precision=_HI)
                AX = jnp.matmul(AQ, Cx, precision=_HI)
                R = AX - X * lam[None, :]
                rn = jnp.sqrt(jax.lax.psum(
                    jnp.sum(jnp.square(R), axis=0), axis))
                return lam, Cx, X, R, rn, jnp.abs(w).max()

            def scale_of(theta):
                return jnp.asarray(1.0, dt) if absolute else theta

            # ---- initial Rayleigh–Ritz on span(X0) ----------------------
            Xq = _chol_qr(_chol_qr(X0_s, axis, eps), axis, eps)
            lam, _, X, R, rn, wmax = ritz(Xq)
            theta = jnp.maximum(wmax, tiny)

            def cond(c):
                _, _, _, _, rn, theta, it = c
                return (it < maxiter) & ~jnp.all(
                    rn <= tol_a * scale_of(theta))

            def body(c):
                X, Pb, lam, R, _, theta, it = c
                W = normalize(m_apply(R))
                Pb = normalize(Pb)
                S = jnp.concatenate([X, W, Pb], axis=1)
                Q = _chol_qr(_chol_qr(S, axis, eps), axis, eps)
                lam_new, Cx, X_new, R_new, rn_new, wmax = ritz(Q)
                Cp = Cx.at[:k, :].set(0.0)
                P_new = jnp.matmul(Q, Cp, precision=_HI)
                return (X_new, P_new, lam_new, R_new, rn_new,
                        jnp.maximum(theta, wmax), it + 1)

            carry = (X, P0_s * mask, lam, R, rn, theta,
                     jnp.asarray(0, jnp.int32))
            X, _, lam, R, rn, theta, it = jax.lax.while_loop(
                cond, body, carry)
            return X, lam, rn, theta, it

        in_specs = (
            [P(axis), P(axis)] + list(m_specs)
            + [P(axis, None), P(axis, None), P(axis), P()]
        )
        out_specs = (P(axis, None), P(), P(), P(), P())
        solve_jit = jax.jit(shard_map(
            solve_shard,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=out_specs,
            check_vma=False,
        ))
        _cache_put(key, solve_jit)

    put = lambda a, spec: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, spec))
    args = [put(blocks, P(axis)), put(block_cols, P(axis))]
    args += [put(a, s) for a, s in zip(m_arrays, m_specs)]
    args += [
        put(X0, P(axis, None)),
        put(P0, P(axis, None)),
        put(row_mask, P(axis)),
        put(jnp.asarray(tol, dt), P()),
    ]
    X, lam, rn, theta, it = solve_jit(*args)

    lam_np = np.asarray(lam, np.float64)
    rn_np = np.asarray(rn, np.float64)
    scale = 1.0 if absolute else max(float(theta), 1e-300)
    return EigsResult(
        values=lam_np,
        vectors=X,
        residuals=rn_np,
        converged=rn_np <= float(tol) * scale,
        iters=int(it),
    )
