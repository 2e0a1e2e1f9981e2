"""Fused MINRES-iteration Pallas kernels (blocked-ELL fast path).

MINRES (solver/minres.py) has the same per-iteration kernel shape as the CG
iteration the reference defines (CG.hpp:374-407): ONE SpMV + two global
reductions + a handful of vector updates.  The portable loop dispatches
~10 XLA kernels per iteration; these kernels collapse it to TWO passes,
exactly like ops/pallas/fused_cg.py does for CG:

* :func:`minres_dir_spmv_dot` — one pass over the operator tiles computing
    w_{k-1} = (v_{k-1} − ε̄·w_{k-3} − δ̄·w_{k-2}) / γ̄   (the PREVIOUS
    x      += φ̄ · w_{k-1}                                iteration's
                                                          solution update)
    v_k   = (M⁻¹ r2) / β_k        (Lanczos normalization; M⁻¹ = Jacobi or I)
    q     = A·v_k − σ·v_k         (the SpMV, with the Paige–Saunders shift)
    vq    = v_k · q,  vr1 = v_k · r1      (both reduction partials)
  The solution update of iteration k needs the Givens scalars that depend
  on β_{k+1} — which only exists after iteration k's second kernel — so it
  is HOISTED into iteration k+1's tile pass (the same trick fused CG uses
  for the direction update, solver/fused.py): identical algebra, zero extra
  passes over HBM, and the tail update is flushed once after the loop.

* :func:`minres_update_dot` — one elementwise pass computing
    r2' = q − c1·r1 − (α/β)·r2          (the two Lanczos projections)
    βsq = r2' · (M⁻¹ r2')               (the next β², fused reduction)

All accumulation in float32; every scalar stays on device as a packed
(1, 8) SMEM row (the reference's device-resident ``Scalar`` contract,
LinearAlgebraTypes.hpp:210-250).  Symmetric storage
(:func:`sym_minres_dir_spmv_dot`) streams the upper-triangle tiles once and
applies B + Bᵀ in the same pass, with the same mirror schemes as the CG
kernel (scatter / banded — ops/pallas/fused_cg._sym_dir_spmv_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_cg import _largest_divisor_leq, _row_group_for_blocked_q

# packed scalar-row slots for the K1 SMEM operand
SU_INV_BETA = 0
SU_SHIFT = 1
SU_OLDEPS = 2  # ε̄ of the pending (previous-iteration) solution update
SU_DELTA = 3   # δ̄ of the pending update
SU_IGAMMA = 4  # 1/γ̄ of the pending update (0 ⇒ no pending update)
SU_PHI = 5     # φ̄ of the pending update


def _minres_spmv_kernel(R: int, kmax: int, bm: int, bn: int,
                        precond: bool = False):
    rows_per_g = (R * bm) // bn

    def kernel(cols_ref, su_ref, block_ref, r2_ref, r1_ref, vprev_ref,
               wm1_ref, wm2_ref, x_ref, *rest):
        if precond:
            d_ref = rest[0]
            v_ref, q_ref, w_ref, xout_ref, vq_ref, vr1_ref, pv = rest[1:]
        else:
            v_ref, q_ref, w_ref, xout_ref, vq_ref, vr1_ref, pv = rest
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            # pending solution update of the PREVIOUS iteration (zeros on
            # the first: igamma = phi = 0 make it an exact no-op)
            wnew = (
                vprev_ref[:]
                - su_ref[0, SU_OLDEPS] * wm2_ref[:]
                - su_ref[0, SU_DELTA] * wm1_ref[:]
            ) * su_ref[0, SU_IGAMMA]
            w_ref[:] = wnew
            xout_ref[:] = x_ref[:] + su_ref[0, SU_PHI] * wnew
            # Lanczos operand v = (M⁻¹ r2) / β, formed ONCE into VMEM
            # scratch before any tile product (the gather reads any row)
            z = d_ref[:] * r2_ref[:] if precond else r2_ref[:]
            pv[:] = z * su_ref[0, SU_INV_BETA]
            v_ref[:] = pv[:]
            vq_ref[0, 0] = 0.0
            vr1_ref[0, 0] = 0.0

        for rr in range(R):
            row = g * R + rr
            acc = None
            for k in range(kmax):
                c = cols_ref[row * kmax + k]
                xb = pv[c, :]  # (bn,) VMEM row gather
                blk = block_ref[rr, k].astype(jnp.float32)  # (bm, bn)
                part = jnp.sum(blk * xb[None, :], axis=1)
                acc = part if acc is None else acc + part
            q_ref[rr, :] = acc

        base = g * rows_per_g
        vrows = pv[pl.ds(base, rows_per_g), :]
        r1rows = r1_ref[pl.ds(base, rows_per_g), :]
        # the Paige–Saunders shift rides the pass as ONE vectorized window
        # op: q = (A − σI)v.  A per-ROW `acc − σ·xr` inside the tile loop
        # measured +204 us/iter at the headline shape — it breaks Mosaic's
        # tile-product schedule (tools/minres_kernel_variants.py).
        qwin = q_ref[:] - su_ref[0, SU_SHIFT] * vrows.reshape(R, bm)
        q_ref[:] = qwin
        vq_ref[0, 0] += jnp.sum(qwin * vrows.reshape(R, bm))
        vr1_ref[0, 0] += jnp.sum(vrows * r1rows)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_group"))
def minres_dir_spmv_dot(
    blocks: jax.Array,
    block_cols: jax.Array,
    r2_2d: jax.Array,
    r1_2d: jax.Array,
    vprev2d: jax.Array,
    wm1_2d: jax.Array,
    wm2_2d: jax.Array,
    x2d: jax.Array,
    su: jax.Array,
    inv_diag2d: jax.Array = None,
    interpret: bool = False,
    row_group: int = 8,
):
    """K1 of the fused MINRES iteration (full blocked-ELL storage).

    ``su``: (1, 8) float32 packed device scalars (SU_* slots above).
    Returns ``(v, q, w_new, x_new, vq, vr1)``; vectors (ncb, bn)/(nrb, bm)
    f32, the two dot partials (1, 1) f32.
    """
    nrb, kmax, bm, bn = blocks.shape
    ncb = r2_2d.shape[0]
    if bm != bn:
        raise ValueError(f"fused kernel needs square tiles, got {bm}x{bn}")
    R = _row_group_for_blocked_q(nrb, row_group)
    precond = inv_diag2d is not None

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8), lambda g, cols: (0, 0),
                     memory_space=pltpu.SMEM),  # su
        pl.BlockSpec((R, kmax, bm, bn), lambda g, cols: (g, 0, 0, 0)),
        whole, whole, whole, whole, whole, whole,  # r2 r1 vprev wm1 wm2 x
    ]
    operands = [block_cols.reshape(-1), su, blocks, r2_2d, r1_2d,
                vprev2d, wm1_2d, wm2_2d, x2d]
    if precond:
        in_specs.append(whole)
        operands.append(inv_diag2d)

    scalar = pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                          memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=in_specs,
        out_specs=[
            whole,  # v
            pl.BlockSpec((R, bm), lambda g, cols: (g, 0)),  # q
            whole,  # w_new
            whole,  # x_new
            scalar,  # vq
            scalar,  # vr1
        ],
        scratch_shapes=[pltpu.VMEM((ncb, bn), jnp.float32)],
    )

    vec_bytes = ncb * bn * 4
    # VMEM budget: 10 whole-vector residents (6 inputs + v/w/x' outputs +
    # pv scratch, +1 with Jacobi) + double-buffered tile groups.  The
    # default 16 MB scoped-vmem stack is EXCEEDED at headline sizes and
    # the pipeline crawls without this (measured: fused SLOWER than the
    # portable loop at n=256K until the limit was raised — CLAUDE.md).
    resid = (11 if precond else 10) * vec_bytes
    blk_bytes = 2 * R * kmax * bm * bn * blocks.dtype.itemsize
    vmem_limit = max(16 << 20, min(110 << 20, resid + blk_bytes + (12 << 20)))
    return pl.pallas_call(
        _minres_spmv_kernel(R, kmax, bm, bn, precond=precond),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        out_shape=(
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * kmax * bm * bn + 12 * ncb * bn,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + ((7 if precond else 6) + 3) * vec_bytes + nrb * bm * 4,
            transcendentals=0,
        ),
    )(*operands)


def _sym_minres_spmv_kernel(R: int, ku: int, bm: int, bn: int,
                            precond: bool = False, mirror: str = "scatter"):
    """Symmetric-storage twin of :func:`_minres_spmv_kernel` — the tile
    stream is the upper triangle applied as B + Bᵀ in one pass, with the
    same mirror landing schemes (and the same per-step finalization
    argument) as ops/pallas/fused_cg._sym_dir_spmv_kernel."""
    if mirror not in ("scatter", "banded"):
        raise ValueError(f"unknown mirror scheme {mirror!r}")
    if mirror == "banded" and ku != 1:
        raise ValueError("mirror='banded' requires ku == 1 storage")

    def kernel(cols_ref, su_ref, dblk_ref, oblk_ref, r2_ref, r1_ref,
               vprev_ref, wm1_ref, wm2_ref, x_ref, *rest):
        if precond:
            d_ref = rest[0]
            rest = rest[1:]
        v_ref, q_ref, w_ref, xout_ref, vq_ref, vr1_ref, pv = rest[:7]
        scratch = rest[7:]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            wnew = (
                vprev_ref[:]
                - su_ref[0, SU_OLDEPS] * wm2_ref[:]
                - su_ref[0, SU_DELTA] * wm1_ref[:]
            ) * su_ref[0, SU_IGAMMA]
            w_ref[:] = wnew
            xout_ref[:] = x_ref[:] + su_ref[0, SU_PHI] * wnew
            z = d_ref[:] * r2_ref[:] if precond else r2_ref[:]
            pv[:] = z * su_ref[0, SU_INV_BETA]
            v_ref[:] = pv[:]
            if mirror == "banded":
                scratch[0][:] = jnp.zeros_like(scratch[0])  # mirror carry
            else:
                q_ref[:] = jnp.zeros_like(q_ref)
            vq_ref[0, 0] = 0.0
            vr1_ref[0, 0] = 0.0

        if mirror == "scatter":
            for rr in range(R):
                row = g * R + rr
                xr = pv[row, :]
                acc = jnp.sum(
                    dblk_ref[rr].astype(jnp.float32) * xr[None, :], axis=1
                )
                for k in range(ku):
                    c = cols_ref[row * ku + k]
                    blk = oblk_ref[rr, k].astype(jnp.float32)
                    acc = acc + jnp.sum(blk * pv[c, :][None, :], axis=1)
                    tpart = jnp.sum(blk * xr[:, None], axis=0)
                    q_ref[c, :] = q_ref[c, :] + tpart
                q_ref[row, :] = q_ref[row, :] + acc
            # window-level shift once the rows are final (see the full
            # kernel's comment: per-row shift measured +204 us/iter)
            base = pl.multiple_of(g * R, R)
            vwin = pv[pl.ds(base, R), :].reshape(R, bm)
            qrows = q_ref[pl.ds(base, R), :] - su_ref[0, SU_SHIFT] * vwin
            q_ref[pl.ds(base, R), :] = qrows
        else:  # banded (block-tridiagonal): pure aligned q window write
            carry = scratch[0]
            base = pl.multiple_of(g * R, R)
            carry_in = carry[0, :]
            accs, tps = [], []
            for rr in range(R):
                row = base + rr
                xr = pv[row, :]
                acc = jnp.sum(
                    dblk_ref[rr].astype(jnp.float32) * xr[None, :], axis=1
                )
                c = cols_ref[row]
                blk = oblk_ref[rr, 0].astype(jnp.float32)
                acc = acc + jnp.sum(blk * pv[c, :][None, :], axis=1)
                accs.append(acc)
                tps.append(jnp.sum(blk * xr[:, None], axis=0))
            carry[0, :] = tps[R - 1]
            mirrors = [carry_in] + tps[: R - 1]
            qrows = jnp.stack(accs, axis=0) + jnp.stack(mirrors, axis=0)
            # window-level shift (per-row measured +204 us/iter)
            qrows = qrows - su_ref[0, SU_SHIFT] * pv[
                pl.ds(base, R), :].reshape(R, bm)
            q_ref[pl.ds(base, R), :] = qrows

        # rows [gR, (g+1)R) hold every contribution by now (upper tiles
        # point forward) — accumulate both dot partials on the window
        base = g * R
        vrows = pv[pl.ds(base, R), :]
        r1rows = r1_ref[pl.ds(base, R), :]
        vq_ref[0, 0] += jnp.sum(qrows.reshape(R, bm) * vrows)
        vr1_ref[0, 0] += jnp.sum(vrows * r1rows)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "row_group", "mirror")
)
def sym_minres_dir_spmv_dot(
    diag_blocks: jax.Array,
    off_blocks: jax.Array,
    off_cols: jax.Array,
    r2_2d: jax.Array,
    r1_2d: jax.Array,
    vprev2d: jax.Array,
    wm1_2d: jax.Array,
    wm2_2d: jax.Array,
    x2d: jax.Array,
    su: jax.Array,
    inv_diag2d: jax.Array = None,
    interpret: bool = False,
    row_group: int = 8,
    mirror: str = "scatter",
):
    """K1 on SYMMETRIC blocked-ELL storage — same contract as
    :func:`minres_dir_spmv_dot` with the operator tile stream cut to the
    upper triangle.  ``mirror`` as in fused_cg (callers pass ``"banded"``
    only for ``SymBellMatrix.banded`` operators)."""
    nrb, bm, bn = diag_blocks.shape
    ku = off_blocks.shape[1]
    ncb = r2_2d.shape[0]
    if bm != bn:
        raise ValueError(f"fused kernel needs square tiles, got {bm}x{bn}")
    # honor an explicit small row_group exactly (q is whole-VMEM here so
    # any divisor of nrb is Mosaic-legal — same rationale as
    # fused_cg.sym_fused_dir_spmv_dot, whose unit tests force R=1/4 to
    # exercise the banded carry across step boundaries); the default hint
    # matches _row_group_for_blocked_q's selection
    if nrb % row_group == 0:
        R = row_group
    else:
        R = _row_group_for_blocked_q(nrb, row_group)
    precond = inv_diag2d is not None

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8), lambda g, cols: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((R, bm, bn), lambda g, cols: (g, 0, 0)),
        pl.BlockSpec((R, ku, bm, bn), lambda g, cols: (g, 0, 0, 0)),
        whole, whole, whole, whole, whole, whole,
    ]
    operands = [off_cols.reshape(-1), su, diag_blocks, off_blocks,
                r2_2d, r1_2d, vprev2d, wm1_2d, wm2_2d, x2d]
    if precond:
        in_specs.append(whole)
        operands.append(inv_diag2d)

    scalar = pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                          memory_space=pltpu.SMEM)
    scratch_shapes = [pltpu.VMEM((ncb, bn), jnp.float32)]
    if mirror == "banded":
        scratch_shapes.append(pltpu.VMEM((1, bn), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=in_specs,
        out_specs=[
            whole,  # v
            whole,  # q (whole accumulator — scatter needs RMW access)
            whole,  # w_new
            whole,  # x_new
            scalar,  # vq
            scalar,  # vr1
        ],
        scratch_shapes=scratch_shapes,
    )

    vec_bytes = ncb * bn * 4
    tile_bytes = (diag_blocks.size + off_blocks.size) \
        * diag_blocks.dtype.itemsize
    # +1 resident vs the full kernel: q is a whole-VMEM accumulator here
    resid = (12 if precond else 11) * vec_bytes
    blk_bytes = 2 * R * (1 + ku) * bm * bn * diag_blocks.dtype.itemsize
    vmem_limit = max(16 << 20, min(110 << 20, resid + blk_bytes + (12 << 20)))
    return pl.pallas_call(
        _sym_minres_spmv_kernel(R, ku, bm, bn, precond=precond,
                                mirror=mirror),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        out_shape=(
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * (1 + 2 * ku) * bm * bn + 12 * ncb * bn,
            bytes_accessed=tile_bytes
            + ((7 if precond else 6) + 3) * vec_bytes + nrb * bm * 4,
            transcendentals=0,
        ),
    )(*operands)


def _minres_update_kernel(precond: bool):
    def kernel(c1_ref, ia_ref, q_ref, r1_ref, r2_ref, *rest):
        if precond:
            d_ref, r2out_ref, bsq_ref = rest
        else:
            r2out_ref, bsq_ref = rest
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            bsq_ref[0, 0] = 0.0

        # two (1, 1) SMEM scalars, matching fused_cg._update_kernel — a
        # packed (1, 8) SMEM row measured 3x slower here (33 vs 11 us at
        # the headline shape, tools/minres_kernel_variants.py session)
        c1 = c1_ref[0, 0]
        ia = ia_ref[0, 0]
        y = q_ref[:] - c1 * r1_ref[:] - ia * r2_ref[:]
        r2out_ref[:] = y
        # β² = r2' · (M⁻¹ r2'): the Lanczos inner product, fused into the
        # same pass (the reference's sambx + dot shape, CG.hpp:392-407)
        bsq_ref[0, 0] += jnp.sum((d_ref[:] * y if precond else y) * y)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def minres_update_dot(
    q2d: jax.Array,
    r1_2d: jax.Array,
    r2_2d: jax.Array,
    c1: jax.Array,
    ia: jax.Array,
    inv_diag2d: jax.Array = None,
    interpret: bool = False,
):
    """K2: ``(r2', βsq) = (q − c1·r1 − ia·r2,  r2'·(M⁻¹ r2'))``.

    ``c1`` (= β/oldβ) and ``ia`` (= α/β): (1, 1) float32 device scalars.
    All vectors (rows, 128) f32.
    """
    rows, lanes = q2d.shape
    C = _largest_divisor_leq(rows, 1024)
    blk = pl.BlockSpec((C, lanes), lambda g: (g, 0))
    scalar_in = pl.BlockSpec((1, 1), lambda g: (0, 0),
                             memory_space=pltpu.SMEM)
    scalar_out = pl.BlockSpec((1, 1), lambda g: (0, 0),
                              memory_space=pltpu.SMEM)
    precond = inv_diag2d is not None
    in_specs = [scalar_in, scalar_in, blk, blk, blk] + (
        [blk] if precond else [])
    operands = [c1, ia, q2d, r1_2d, r2_2d] + (
        [inv_diag2d] if precond else [])
    grid_spec = pl.GridSpec(
        grid=(rows // C,),
        in_specs=in_specs,
        out_specs=[blk, scalar_out],
    )
    nbytes = rows * lanes * 4
    return pl.pallas_call(
        _minres_update_kernel(precond),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(8 if precond else 7) * rows * lanes,
            bytes_accessed=(5 if precond else 4) * nbytes,
            transcendentals=0,
        ),
    )(*operands)


def _minres_shard_kernel(R: int, kmax: int, bm: int, bn: int):
    """Sharded K1 (the mesh sibling of :func:`_minres_spmv_kernel`): the
    SpMV operand is the ALL-GATHERED global v (normalization happened
    shard-locally before the gather), this shard's q rows sit at
    ``row_offset`` within it, and the pending w/x solution update runs on
    the shard-LOCAL vectors — no collectives inside the kernel, exactly
    like ops/pallas/fused_cg.bell_spmv_dot."""
    rows_per_g = (R * bm) // bn

    def kernel(cols_ref, off_ref, su_ref, block_ref, vfull_ref, r1_ref,
               vprev_ref, wm1_ref, wm2_ref, x_ref,
               q_ref, w_ref, xout_ref, vq_ref, vr1_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            wnew = (
                vprev_ref[:]
                - su_ref[0, SU_OLDEPS] * wm2_ref[:]
                - su_ref[0, SU_DELTA] * wm1_ref[:]
            ) * su_ref[0, SU_IGAMMA]
            w_ref[:] = wnew
            xout_ref[:] = x_ref[:] + su_ref[0, SU_PHI] * wnew
            vq_ref[0, 0] = 0.0
            vr1_ref[0, 0] = 0.0

        for rr in range(R):
            row = g * R + rr
            acc = None
            for k in range(kmax):
                c = cols_ref[row * kmax + k]
                xb = vfull_ref[c, :].astype(jnp.float32)
                blk = block_ref[rr, k].astype(jnp.float32)
                part = jnp.sum(blk * xb[None, :], axis=1)
                acc = part if acc is None else acc + part
            q_ref[rr, :] = acc

        # this shard's window of the gathered operand (global rows)
        gbase = off_ref[0] // bn + g * rows_per_g
        vrows = vfull_ref[pl.ds(gbase, rows_per_g), :].astype(
            jnp.float32).reshape(R, bm)
        # window-level shift (per-row inside the tile loop measured
        # +204 us/iter — see _minres_spmv_kernel)
        qwin = q_ref[:] - su_ref[0, SU_SHIFT] * vrows
        q_ref[:] = qwin
        lbase = g * rows_per_g
        r1rows = r1_ref[pl.ds(lbase, rows_per_g), :]
        vq_ref[0, 0] += jnp.sum(qwin * vrows)
        vr1_ref[0, 0] += jnp.sum(
            vrows.reshape(rows_per_g, bn) * r1rows)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_group"))
def minres_shard_spmv_dot(
    blocks: jax.Array,
    block_cols: jax.Array,
    vfull2d: jax.Array,
    r1l2d: jax.Array,
    vprevl2d: jax.Array,
    wm1l2d: jax.Array,
    wm2l2d: jax.Array,
    xl2d: jax.Array,
    su: jax.Array,
    row_offset: jax.Array,
    interpret: bool = False,
    row_group: int = 8,
):
    """Sharded K1: ``(q_l, w_l, x_l', vq_partial, vr1_partial)``.

    ``vfull2d``: the all-gathered global operand (ncb_global, bn);
    ``r1l2d``/``vprevl2d``/``wm1l2d``/``wm2l2d``/``xl2d``: this shard's
    local slices; ``row_offset``: (1,) int32 first global row.  The dot
    partials psum to the global v·q and v·r1
    (parallel/loops._sharded_fused_minres)."""
    nrb, kmax, bm, bn = blocks.shape
    ncl = r1l2d.shape[0]
    if bm != bn:
        raise ValueError(f"fused kernel needs square tiles, got {bm}x{bn}")
    R = _row_group_for_blocked_q(nrb, row_group)

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                          memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # row_offset (1,)
            pl.BlockSpec((1, 8), lambda g, cols: (0, 0),
                         memory_space=pltpu.SMEM),  # su
            pl.BlockSpec((R, kmax, bm, bn), lambda g, cols: (g, 0, 0, 0)),
            whole,  # gathered v
            whole, whole, whole, whole, whole,  # r1 vprev wm1 wm2 x (local)
        ],
        out_specs=[
            pl.BlockSpec((R, bm), lambda g, cols: (g, 0)),  # q_l
            whole,  # w_l
            whole,  # x_l'
            scalar, scalar,  # vq, vr1 partials
        ],
    )
    vec_bytes = ncl * bn * 4
    resid = vfull2d.size * 4 + 7 * vec_bytes
    blk_bytes = 2 * R * kmax * bm * bn * blocks.dtype.itemsize
    vmem_limit = max(16 << 20, min(110 << 20, resid + blk_bytes + (12 << 20)))
    return pl.pallas_call(
        _minres_shard_kernel(R, kmax, bm, bn),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        out_shape=(
            jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
            jax.ShapeDtypeStruct((ncl, bn), jnp.float32),
            jax.ShapeDtypeStruct((ncl, bn), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * kmax * bm * bn + 10 * ncl * bn,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + vfull2d.size * 4 + 8 * vec_bytes + nrb * bm * 4,
            transcendentals=0,
        ),
    )(block_cols.reshape(-1), row_offset, su, blocks, vfull2d,
      r1l2d, vprevl2d, wm1l2d, wm2l2d, xl2d)
