"""Preconditioners (north-star extension; the reference is unpreconditioned).

A preconditioner here is just a callable ``r -> M⁻¹ r`` that is jit-traceable,
so it fuses into the CG iteration.  Jacobi (config 3 in BASELINE.json) is the
mandated one: M⁻¹ = 1/diag(A), applied as a single elementwise multiply that
XLA fuses with the surrounding axpy — the "fused preconditioner-apply kernel"
falls out of the compiler rather than being hand-written.
"""

from __future__ import annotations

import functools

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..types import as_linear_operator


def jacobi_preconditioner(A: Any, eps: float = 0.0) -> Callable[[jax.Array], jax.Array]:
    """M⁻¹ r = r / diag(A).  ``eps`` guards against (near-)zero diagonals."""
    op = as_linear_operator(A)
    d = op.diagonal()
    if eps:
        d = jnp.where(jnp.abs(d) > eps, d, jnp.sign(d) * eps + (d == 0) * eps)
    inv_d = 1.0 / d

    def apply(r: jax.Array) -> jax.Array:
        return inv_d * r

    # expose the diagonal so cg_solve can dispatch Jacobi solves to the
    # fused PCG kernels (the apply folds into K1/K2 with zero extra passes)
    apply.inv_diag = inv_d
    return apply


def identity_preconditioner() -> Callable[[jax.Array], jax.Array]:
    return lambda r: r


def _diagonal_blocks_host(op: Any, b: int):
    """Extract A's diagonal b×b blocks as a host (nb, b, b) array.

    Host-side, once at setup (like RCM / layout packing).  Rows past n pad
    with identity so the batched inversion stays well-posed.
    """
    import numpy as np

    from ..types import (
        CSRMatrix,
        DenseOperator,
        DIAMatrix,
        SellMatrix,
        StencilOperator,
    )

    n = op.shape[0]
    nb = -(-n // b)
    blocks = np.zeros((nb, b, b), dtype=np.float64)
    pad = np.arange(n, nb * b)
    blocks[pad // b, pad % b, pad % b] = 1.0

    def scatter(rows, cols, vals):
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        keep = rows // b == cols // b
        r, c, v = rows[keep], cols[keep], np.asarray(vals, np.float64)[keep]
        np.add.at(blocks, (r // b, r % b, c % b), v)

    if isinstance(op, CSRMatrix):
        scatter(np.asarray(op.row_ids), np.asarray(op.indices), np.asarray(op.data))
    elif isinstance(op, SellMatrix):
        rows = np.arange(n, dtype=np.int64)
        scatter(rows, rows, np.asarray(op.diag))
        row_perm = np.argsort(np.asarray(op.pos, dtype=np.int64), kind="stable")
        cols_flat = np.asarray(op.cols_flat, dtype=np.int64)
        vals_flat = np.asarray(op.vals_flat, dtype=np.float64)
        start = base = 0
        for nb_, k in op.bucket_meta:
            if k == 0:
                start += nb_
                continue
            r = np.repeat(row_perm[start : start + nb_], k)
            # padding slots carry val 0 — harmless in the scatter-add
            scatter(r, cols_flat[base : base + nb_ * k], vals_flat[base : base + nb_ * k])
            start += nb_
            base += nb_ * k
    elif isinstance(op, DIAMatrix):
        diags = np.asarray(op.diags, dtype=np.float64)
        for d, off in enumerate(op.offsets):
            if abs(off) >= b:
                continue
            i = np.arange(max(0, -off), min(n, n - off), dtype=np.int64)
            scatter(i, i + off, diags[d, i])
    elif isinstance(op, StencilOperator):
        nx, ny, nz = op.grid_shape
        center = float(np.asarray(op.center))
        off = float(np.asarray(op.off))
        i = np.arange(n, dtype=np.int64)
        scatter(i, i, np.full(n, center))
        # the only index-adjacent coupling is the z±1 neighbor, absent
        # across a z-line boundary ((i+1) % nz == 0); x/y neighbors are
        # ±nz·{1, ny} away and land in-block only if b > nz
        for stride in (1, nz, ny * nz):
            if stride >= n:
                continue
            j = i[: n - stride]
            if stride == 1:
                j = j[(j + 1) % nz != 0]
            elif stride == nz:
                j = j[(j // nz + 1) % ny != 0]
            vals = np.full(len(j), off)
            scatter(j, j + stride, vals)
            scatter(j + stride, j, vals)
    elif isinstance(op, DenseOperator):
        a = np.asarray(op.a, dtype=np.float64)
        for i in range(nb):
            lo, hi = i * b, min((i + 1) * b, n)
            blocks[i, : hi - lo, : hi - lo] = a[lo:hi, lo:hi]
    else:
        raise TypeError(
            f"block_jacobi_preconditioner cannot extract diagonal blocks "
            f"from {type(op).__name__}; build it from a CSR/SELL/DIA/dense/"
            "stencil operator or pass an explicit preconditioner"
        )
    return blocks


def block_jacobi_preconditioner(
    A: Any, block_size: int = 8, n: int = None
) -> Callable[[jax.Array], jax.Array]:
    """Block-Jacobi: M = block-diag(A) with ``block_size``×``block_size``
    blocks, M⁻¹ r applied as one batched (nb, b, b)×(nb, b) contraction.

    TPU-first generalization of scalar Jacobi: the blocks are extracted and
    inverted ONCE at setup (host-side batched inversion — SPD principal
    submatrices of an SPD matrix are SPD, hence invertible), and the apply
    is dense batched matmul work the MXU/VPU streams at full rate — no
    triangular solves (forward/back substitution serializes; hostile to the
    hardware, which is why IC(0)/SSOR are deliberately absent).  With
    ``block_size=1`` this reduces to scalar Jacobi exactly.  Stronger local
    coupling captured per block ⇒ fewer CG iterations ⇒ fewer psum rounds
    when sharded — the classic line-Jacobi effect on grid problems (pick
    ``block_size = nz`` for a z-line smoother on a stencil).
    """
    import numpy as np

    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    op = as_linear_operator(A, n=n)
    if block_size == 1:
        return jacobi_preconditioner(op)
    m = op.shape[0]
    blocks = _diagonal_blocks_host(op, block_size)
    inv_np = np.linalg.inv(blocks)
    npad = inv_np.shape[0] * block_size

    if block_size <= 16:
        # Lane-friendly apply: a block-diagonal multiply IS a banded
        # (DIA) matvec with 2b−1 diagonals — W_δ[k] = inv[k//b, k%b, k%b+δ]
        # where in-block, else 0 — so the apply becomes 2b−1 shifted
        # streaming multiply-adds.  The (nb, b)-shaped einsum wastes the
        # 128-wide lanes on a b-element minor dim (measured on v5e at
        # b=3, n=331K: 0.373 ms/apply vs ~0.03 ms of compulsory traffic —
        # it dominated the whole PCG iteration); this formulation streams
        # at the DIA rate.  Large blocks keep the einsum: b ≥ ~32 rows
        # use the lanes properly and 2b−1 streams would pad too much.
        bsz = block_size
        k = np.arange(npad)
        i_blk, a_row = k // bsz, k % bsz
        W = np.zeros((2 * bsz - 1, npad), dtype=np.float64)
        for d, delta in enumerate(range(-(bsz - 1), bsz)):
            jcol = a_row + delta
            ok = (jcol >= 0) & (jcol < bsz)
            W[d, ok] = inv_np[i_blk[ok], a_row[ok], jcol[ok]]
        Wj = jnp.asarray(W, dtype=op.dtype)
        lpad = bsz - 1

        def apply(r: jax.Array) -> jax.Array:
            rp = jnp.pad(r, (lpad, lpad + npad - m))
            y = jnp.zeros((npad,), dtype=jnp.promote_types(r.dtype, Wj.dtype))
            for d, delta in enumerate(range(-(bsz - 1), bsz)):
                lo = delta + lpad
                y = y + Wj[d] * jax.lax.slice(rp, (lo,), (lo + npad,))
            return y[:m].astype(r.dtype)

        # introspection only — keep the blocks on the HOST here; a device
        # copy would be dead HBM weight (the apply reads only Wj)
        apply.inv_blocks = inv_np

    else:
        inv_blocks = jnp.asarray(inv_np, dtype=op.dtype)

        def apply(r: jax.Array) -> jax.Array:
            rp = jnp.pad(r, (0, npad - m)) if npad != m else r
            y = jnp.einsum(
                "nij,nj->ni",
                inv_blocks.astype(r.dtype),
                rp.reshape(-1, block_size),
                precision=jax.lax.Precision.HIGHEST,
            )
            return y.reshape(-1)[:m]

        apply.inv_blocks = inv_blocks

    apply.block_size = block_size
    return apply


@functools.partial(jax.jit, static_argnames=("op_static", "k"))
def _lanczos_tridiag_device(op_arrays, op_static, v0, k: int):
    """k Lanczos steps with full reorthogonalization, entirely on device.

    One jitted dispatch instead of k eager matvecs — the eager version cost
    a dispatch round-trip AND an n-vector device→host pull per step (~26 ms
    + the tunnel transfer each; minutes at the 1.5M-row target sizes).
    Returns (alphas, betas) of the Lanczos tridiagonal; a (near-)zero
    beta[j] marks an invariant subspace — the caller truncates there.
    """
    op = jax.tree_util.tree_unflatten(op_static, op_arrays)
    m = v0.shape[0]
    # run the recurrence in at least float32: a bf16 operator would otherwise
    # put the whole reorthogonalization (and breakdown_tol=1e-6, far below
    # bf16's resolution) in bf16 — only the matvec input drops to op.dtype
    dt = jnp.promote_types(v0.dtype, jnp.float32)
    v0 = v0.astype(dt)
    v = v0 / jnp.linalg.norm(v0)

    # MXU default-precision f32 matmuls round operands through bf16 —
    # poison for the Ritz values Chebyshev/expected_step_count consume
    # (same rule as every compute path feeding CG; CLAUDE.md)
    hi = jax.lax.Precision.HIGHEST
    # breakdown threshold must live above the dtype's noise floor or the
    # invariant-subspace truncation never fires in f32
    breakdown_tol = 1e-12 if jnp.dtype(dt).itemsize >= 8 else 1e-6

    def body(j, carry):
        V, alphas, betas, v, v_prev, beta = carry
        V = V.at[j].set(v)
        w = op.matvec(v.astype(op.dtype)).astype(dt)
        alpha = jnp.dot(v, w, precision=hi)
        w = w - alpha * v - beta * v_prev
        # full reorthogonalization keeps Ritz values clean at small k;
        # rows past j are zero so the masked basis costs nothing extra
        w = w - jnp.matmul(V.T, jnp.matmul(V, w, precision=hi), precision=hi)
        beta_new = jnp.linalg.norm(w)
        # on breakdown (invariant subspace) freeze: emit zero vectors so
        # later alphas stay 0 and the caller truncates at the zero beta
        safe = beta_new > breakdown_tol
        v_next = jnp.where(safe, w / jnp.where(safe, beta_new, 1.0), 0.0)
        return (
            V,
            alphas.at[j].set(alpha),
            betas.at[j].set(jnp.where(safe, beta_new, 0.0)),
            v_next,
            v,
            jnp.where(safe, beta_new, 0.0),
        )

    V = jnp.zeros((k, m), dtype=dt)
    alphas = jnp.zeros((k,), dtype=dt)
    betas = jnp.zeros((k,), dtype=dt)
    carry = (V, alphas, betas, v, jnp.zeros_like(v), jnp.asarray(0.0, dt))
    V, alphas, betas, *_ = jax.lax.fori_loop(0, k, body, carry)
    # V rides along for Ritz-VECTOR consumers (solver/deflated.py); the
    # bounds estimator below ignores it
    return V, alphas, betas


def estimate_spectral_bounds(
    A: Any,
    n: int = None,
    iters: int = 30,
    seed: int = 0,
    safety: float = 1.1,
    min_margin: float = 4.0,
):
    """Estimate (λ_min, λ_max) of an SPD operator for Chebyshev setup.

    Runs ``iters`` steps of Lanczos (with full reorthogonalization) as ONE
    jitted device dispatch and takes the extreme Ritz values of the small
    tridiagonal (host eigvalsh).  Ritz values approximate the spectrum
    from the INSIDE — the largest underestimates λ_max and the smallest
    overestimates λ_min — so λ_max is inflated by ``safety`` and λ_min
    deflated by ``min_margin``.  (An earlier min(diag)/2 heuristic exceeded
    the true λ_min on Poisson-like matrices; Chebyshev stays SPD with a
    wrong interval but loses contraction on the excluded low modes — err
    low on λ_min.)  Supply exact bounds when known — tighter intervals
    precondition better.
    """
    from .eigs import _lanczos_ritz

    op = as_linear_operator(A, n=n)
    m = op.shape[0]
    # cap the reorthogonalization basis at ~1 GB of device memory; the
    # result is only a padded interval estimate, so a shorter basis is fine
    itemsize = jnp.dtype(op.dtype).itemsize
    k = int(min(iters, max(3, (1 << 30) // (itemsize * m))))
    _, _, ritz, _, _, _ = _lanczos_ritz(op, k, n, seed, None)
    lam_max = float(ritz[-1]) * safety
    lam_min = max(float(ritz[0]) / min_margin, lam_max * 1e-8)
    return lam_min, lam_max


def chebyshev_preconditioner(
    A: Any,
    lam_min: float,
    lam_max: float,
    degree: int = 8,
    n: int = None,
) -> Callable[[jax.Array], jax.Array]:
    """Chebyshev polynomial preconditioner: M⁻¹ ≈ p_k(A) ≈ A⁻¹ on
    [lam_min, lam_max].

    TPU-first choice of preconditioner beyond Jacobi: the apply performs
    ``degree - 1`` SpMVs (the first semi-iteration step is matvec-free) —
    fully data-parallel streaming work, no triangular solves (SSOR/IC-style
    preconditioners serialize and are hostile to the hardware).  Standard
    Chebyshev semi-iteration on the residual equation; the result is a
    FIXED linear operator, so PCG theory applies.

    Cost/benefit: each PCG iteration costs ``degree`` SpMVs total (the CG
    matvec plus degree−1 in the apply) but contracts like CG on a spectrum
    compressed by the Chebyshev polynomial — a win when SpMV is cheap
    relative to the dots' latency or when iteration counts (and thus psum
    rounds, multi-chip) must shrink.  ``degree`` must be ≥ 2; degree 1
    would be a pure scaling with no spectral compression.
    """
    if degree < 2:
        raise ValueError(f"degree must be >= 2, got {degree}")
    if not (0 < lam_min < lam_max):
        raise ValueError(
            f"need 0 < lam_min < lam_max, got [{lam_min}, {lam_max}] "
            "(an inverted/non-positive interval makes M indefinite)"
        )
    op = as_linear_operator(A, n=n)
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma1 = theta / delta

    def apply(r: jax.Array) -> jax.Array:
        # Chebyshev semi-iteration solving A z = r, z0 = 0
        rho_old = 1.0 / sigma1
        z = r / theta  # first step
        z_old = jnp.zeros_like(r)

        def body(i, carry):
            z, z_old, rho_old = carry
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            resid = r - op.matvec(z)
            z_new = rho * (2.0 * resid / delta + rho_old * (z - z_old)) + z
            return (z_new, z, rho)

        z, _, _ = jax.lax.fori_loop(0, degree - 1, body, (z, z_old, rho_old))
        return z

    return apply
