"""Fused CG-iteration Pallas kernels (blocked-ELL fast path).

The reference issues ~9 dependent device tasks per CG iteration
(CG.hpp:359-425): spmv, two reduction dots, three axpy-family updates, plus
scalar single-tasks.  XLA fuses the elementwise tail but cannot fuse across
the SpMV pallas_call or fold reductions into producers across kernels, so the
jitted step still dispatches ~10 back-to-back kernels; at bench scale the
fixed per-kernel cost is the measured gap between the CG iteration and the
raw SpMV stream rate (docs/performance.md).  These two kernels collapse the
whole iteration into two passes:

* :func:`fused_dir_spmv_dot` — one pass over the operator tiles computing
    p_new = r + beta * p_old        (the reference's sapbx, CG.hpp:418,
                                     hoisted into the NEXT iteration's SpMV)
    q     = A @ p_new               (spmv, CG.hpp:374)
    pap   = p_new . q               (dot(Ap, p) -> value2, CG.hpp:378)
  The operand vectors live wholly in VMEM; tiles stream HBM->VMEM in
  R-row-block groups exactly like ops/pallas/ell_spmv.py (the measured
  ~94%-of-peak schedule).  The dot accumulates into an SMEM scalar across
  the (sequential) grid — no separate reduction pass, no extra HBM reads.

* :func:`fused_update_dot` — one elementwise pass computing
    x' = x + alpha * p              (sapbx, CG.hpp:390)
    r' = r - alpha * q              (sambx, CG.hpp:392)
    rnorm = r' . r'                 (dot(rnext, rnext) -> value3, CG.hpp:406)
  i.e. the reference's sambx+dot pair (SURVEY §7 stage 2) plus the x update,
  fused into a single read of (x, p, r, q) and single write of (x', r').

Numerics: all accumulation in float32 (same as the unfused f32 path); the
alpha/beta scalars stay on device as (1,1) arrays read from SMEM — the
reference's device-resident ``Scalar`` contract (LinearAlgebraTypes.hpp:210).

Restrictions (the caller gates; solver/cg.py falls back to the unfused path):
square tiles bm == bn, f32/bf16 tiles, f32 vectors, operand resident in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_group_for_blocked_q(nrb: int, row_group: int = 8) -> int:
    """Row-group size for kernels whose q streams as (R, bm) output blocks.

    Mosaic requires a block's second-to-last dim to be divisible by 8,
    equal to the array dim, or 1 (caught live on poisson2d_34: nrb=10
    picked R=2 and the TPU lowering rejected the (2, 128) q block).
    ``row_group`` is a hint, not a cap: prefer the largest multiple of 8
    ≤ max(row_group, 8) dividing nrb; fall back to one whole-array grid
    step (R == nrb) — :func:`solver.fused.fused_supported` caps the tile
    bytes that single step would hold in VMEM, and the ungated unfused
    SpMV path (ops/pallas/ell_spmv.py) drops to the always-legal R=1
    instead when the one-step grid would blow VMEM.
    """
    R = max(row_group - row_group % 8, 8)
    while R >= 8:
        if nrb % R == 0:
            return R
        R -= 8
    return nrb


def _dir_spmv_kernel(R: int, kmax: int, bm: int, bn: int,
                     precond: bool = False):
    rows_per_g = (R * bm) // bn  # rows of the (ncb, bn) operand per grid step

    def kernel(cols_ref, beta_ref, block_ref, r_ref, pold_ref,
               *rest):
        if precond:
            d_ref, pnew_ref, q_ref, pap_ref, pv = rest
        else:
            pnew_ref, q_ref, pap_ref, pv = rest
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            # p_new = z + beta * p_old with z = M⁻¹r (Jacobi) or z = r,
            # formed ONCE into VMEM scratch before any tile product (the
            # gather below reads arbitrary rows of it)
            z = d_ref[:] * r_ref[:] if precond else r_ref[:]
            pv[:] = z + beta_ref[0, 0] * pold_ref[:]
            pnew_ref[:] = pv[:]
            pap_ref[0, 0] = 0.0

        for rr in range(R):
            acc = None
            for k in range(kmax):
                # cols_ref is FLAT (nrb*kmax,): a 2-D (nrb, kmax) SMEM array
                # pads the minor dim to 128 lanes — 1 MB of SMEM at nrb=2048,
                # the whole space.  Flat costs nrb*kmax*4 bytes.
                c = cols_ref[(g * R + rr) * kmax + k]
                xb = pv[c, :]  # (bn,) VMEM row gather
                blk = block_ref[rr, k].astype(jnp.float32)  # (bm, bn)
                part = jnp.sum(blk * xb[None, :], axis=1)  # (bm,) VPU
                acc = part if acc is None else acc + part
            q_ref[rr, :] = acc

        # pap partial: this step's q rows dotted with the matching p rows
        prows = pv[pl.ds(g * rows_per_g, rows_per_g), :]  # (rows_per_g, bn)
        pap_ref[0, 0] += jnp.sum(q_ref[:] * prows.reshape(R, bm))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_group"))
def fused_dir_spmv_dot(
    blocks: jax.Array,
    block_cols: jax.Array,
    r2d: jax.Array,
    pold2d: jax.Array,
    beta: jax.Array,
    inv_diag2d: jax.Array = None,
    interpret: bool = False,
    row_group: int = 8,
):
    """(p_new, q, pap) = (z + beta*p_old,  A @ p_new,  p_new . q) where
    z = inv_diag * r (fused Jacobi apply) or plain r.

    ``r2d``/``pold2d`` (and optional ``inv_diag2d``): vectors reshaped
    (ncb, bn), resident in VMEM.  ``beta``: (1, 1) float32 device scalar.
    Returns p_new (ncb, bn) f32, q (nrb, bm) f32, pap (1, 1) f32.
    """
    nrb, kmax, bm, bn = blocks.shape
    ncb = r2d.shape[0]
    if bm != bn:
        raise ValueError(f"fused kernel needs square tiles, got {bm}x{bn}")
    R = _row_group_for_blocked_q(nrb, row_group)
    precond = inv_diag2d is not None

    in_specs = [
        pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                     memory_space=pltpu.SMEM),  # beta
        pl.BlockSpec((R, kmax, bm, bn), lambda g, cols: (g, 0, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # r (whole)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # p_old (whole)
    ]
    operands = [block_cols.reshape(-1), beta, blocks, r2d, pold2d]
    if precond:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # inv_diag
        operands.append(inv_diag2d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # p_new (whole)
            pl.BlockSpec((R, bm), lambda g, cols: (g, 0)),  # q
            pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                         memory_space=pltpu.SMEM),  # pap
        ],
        scratch_shapes=[pltpu.VMEM((ncb, bn), jnp.float32)],
    )

    vec_bytes = ncb * bn * 4
    # scoped-vmem cap: whole-vector residents + double-buffered tile
    # groups + margin (the minres kernels' round-5 sizing).  Chip A/B at
    # n=1.5M measured NO effect (943.8 without vs 939.0 with — whole-VMEM
    # operands evidently do not ride the 16 MB scoped stack); kept as a
    # protective cap for shapes where Mosaic's AOT check WOULD fail
    # (the symdia-big lesson, CLAUDE.md).
    resid = (6 if precond else 5) * vec_bytes
    blk_bytes = 2 * R * kmax * bm * bn * blocks.dtype.itemsize
    vmem_limit = max(16 << 20, min(110 << 20, resid + blk_bytes + (12 << 20)))
    p_new, q, pap = pl.pallas_call(
        _dir_spmv_kernel(R, kmax, bm, bn, precond=precond),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        out_shape=(
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * kmax * bm * bn + 4 * ncb * bn,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + (4 if precond else 3) * vec_bytes
            + nrb * bm * 4,  # q write
            transcendentals=0,
        ),
    )(*operands)
    return p_new, q, pap


def _sym_dir_spmv_kernel(R: int, ku: int, bm: int, bn: int,
                         precond: bool = False, mirror: str = "scatter"):
    """Symmetric twin of :func:`_dir_spmv_kernel`: the operator arrives as
    diagonal tiles + strictly-UPPER tiles only (types.SymBellMatrix), and
    each upper tile is applied twice — ``q[row] += B @ p[c]`` along the
    stored direction and ``q[c] += Bᵀ @ p[row]`` as its mirror.  The mirror
    is the same broadcast-multiply reduced along the other axis (no physical
    transpose), scattered into a q that stays WHOLLY RESIDENT in VMEM as an
    accumulator across the sequential grid.

    Correctness of the in-pass p·q accumulation: mirror contributions to
    block-row ``row`` come only from rows < ``row`` (upper tiles point
    forward), so after step g finishes, q rows [gR, (g+1)R) are final and
    can be dotted against the matching p rows immediately.

    ``mirror`` selects how the Bᵀ contributions land in q (same math, same
    streamed bytes — the A/B closes the measured ~100 µs gap between the
    scatter kernel and the 279 MB engine bound, docs/performance.md):

    * ``"scatter"`` — per-tile read-modify-write ``q[c] += tpart`` inline
      with the forward products (the round-3 kernel).
    * ``"split"`` — per-row products write to (R, ·) VMEM scratch only
      (no dynamic q access inside the compute loop, so Mosaic can pipeline
      it against the tile DMAs); the dynamic q updates happen in a short
      dedicated phase at step end.
    * ``"banded"`` — block-tridiagonal specialization (SymBellMatrix.banded):
      every real upper tile targets the NEXT block-row, so the step's
      window q[gR : gR+R] receives ALL its contributions within step g —
      the forward products, the mirrors of its own first R−1 rows, and the
      previous step's last mirror via a (1, bn) carry scratch.  q becomes a
      PURE ALIGNED WRITE assembled in registers: no dynamic addressing, no
      read-modify-write, no zero-init pass.  (Distinct from the round-3
      per-ROW register carry that serialized rows and lost — this carry
      crosses STEP boundaries only, which the sequential grid serializes
      anyway; docs/performance.md "Negative results".)
    """
    if mirror not in ("scatter", "split", "banded"):
        raise ValueError(f"unknown mirror scheme {mirror!r}")
    if mirror == "banded" and ku != 1:
        raise ValueError("mirror='banded' requires ku == 1 storage")

    def kernel(cols_ref, beta_ref, dblk_ref, oblk_ref, r_ref, pold_ref,
               *rest):
        if precond:
            d_ref, pnew_ref, q_ref, pap_ref, pv = rest[:5]
            scratch = rest[5:]
        else:
            pnew_ref, q_ref, pap_ref, pv = rest[:4]
            scratch = rest[4:]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            z = d_ref[:] * r_ref[:] if precond else r_ref[:]
            pv[:] = z + beta_ref[0, 0] * pold_ref[:]
            pnew_ref[:] = pv[:]
            if mirror == "banded":
                scratch[0][:] = jnp.zeros_like(scratch[0])  # mirror carry
            else:
                q_ref[:] = jnp.zeros_like(q_ref)
            pap_ref[0, 0] = 0.0

        if mirror == "scatter":
            for rr in range(R):
                row = g * R + rr
                xr = pv[row, :]  # (bn,)
                acc = jnp.sum(
                    dblk_ref[rr].astype(jnp.float32) * xr[None, :], axis=1
                )  # (bm,)
                for k in range(ku):
                    c = cols_ref[row * ku + k]
                    blk = oblk_ref[rr, k].astype(jnp.float32)  # (bm, bn)
                    xb = pv[c, :]  # (bn,)
                    acc = acc + jnp.sum(blk * xb[None, :], axis=1)
                    # mirror: q[c] += Bᵀ p[row] — reduce the OTHER axis
                    tpart = jnp.sum(blk * xr[:, None], axis=0)  # (bn,)
                    q_ref[c, :] = q_ref[c, :] + tpart
                q_ref[row, :] = q_ref[row, :] + acc
        elif mirror == "banded":
            carry = scratch[0]
            base = pl.multiple_of(g * R, R)
            carry_in = carry[0, :]  # previous step's last mirror (or zeros)
            accs = []
            tps = []
            for rr in range(R):
                row = base + rr
                xr = pv[row, :]
                acc = jnp.sum(
                    dblk_ref[rr].astype(jnp.float32) * xr[None, :], axis=1
                )
                # the single upper tile; the last global row carries an
                # inert zero tile pointing at itself (SymBellMatrix._pack_np)
                c = cols_ref[row]
                blk = oblk_ref[rr, 0].astype(jnp.float32)
                acc = acc + jnp.sum(blk * pv[c, :][None, :], axis=1)
                accs.append(acc)
                tps.append(jnp.sum(blk * xr[:, None], axis=0))
            carry[0, :] = tps[R - 1]
            # window rows gR..gR+R-1: forward accs + mirrors of rows
            # gR-1..gR+R-2 — everything lands here IN this step, so q is a
            # pure aligned write (banded ⇒ mirror of row j targets j+1)
            mirrors = [carry_in] + tps[: R - 1]
            qwin = jnp.stack(accs, axis=0) + jnp.stack(mirrors, axis=0)
            q_ref[pl.ds(base, R), :] = qwin
            prows = pv[pl.ds(base, R), :]
            pap_ref[0, 0] += jnp.sum(qwin * prows.reshape(R, bm))
            return  # pap handled with the in-register window above

        else:  # split: products into scratch, dedicated dynamic-RMW phase
            accs, tparts = scratch
            # phase 1 — all tile products, only static scratch-row writes
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
                    if ku == 1:
                        tparts[rr, :] = tpart
                    else:
                        tparts[rr, k, :] = tpart
                accs[rr, :] = acc
            # phase 2 — land the step's contributions in q
            for rr in range(R):
                row = g * R + rr
                q_ref[row, :] = q_ref[row, :] + accs[rr, :]
                for k in range(ku):
                    c = cols_ref[row * ku + k]
                    t = tparts[rr, :] if ku == 1 else tparts[rr, k, :]
                    q_ref[c, :] = q_ref[c, :] + t

        # rows [gR, (g+1)R) received every mirror contribution by now
        qrows = q_ref[pl.ds(g * R, R), :]
        prows = pv[pl.ds(g * R, R), :]
        pap_ref[0, 0] += jnp.sum(qrows * prows)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "row_group", "mirror")
)
def sym_fused_dir_spmv_dot(
    diag_blocks: jax.Array,
    off_blocks: jax.Array,
    off_cols: jax.Array,
    r2d: jax.Array,
    pold2d: jax.Array,
    beta: jax.Array,
    inv_diag2d: jax.Array = None,
    interpret: bool = False,
    row_group: int = 8,
    mirror: str = "scatter",
):
    """(p_new, q, pap) on symmetric blocked-ELL storage — same contract as
    :func:`fused_dir_spmv_dot` with the operator tile stream cut to the
    upper triangle (up to 2× fewer HBM bytes per CG iteration; exactly
    1.5× on a block-tridiagonal band).  ``mirror`` selects the Bᵀ landing
    scheme (see :func:`_sym_dir_spmv_kernel`); callers must only pass
    ``"banded"`` for operators with ``SymBellMatrix.banded`` set."""
    nrb, bm, bn = diag_blocks.shape
    ku = off_blocks.shape[1]
    ncb = r2d.shape[0]
    if bm != bn:
        raise ValueError(f"fused kernel needs square tiles, got {bm}x{bn}")
    # q here is whole-VMEM scratch and the operand blocks are ≥3-D
    # (singleton-safe leading dims), so ANY divisor of nrb is Mosaic-legal
    # — honor an explicit small row_group exactly (the unit tests use
    # R=1/4 to force the banded carry across step boundaries).  At the
    # default hint the selection matches the full kernel's, keeping the
    # per-step pap association aligned across storages (trajectory parity,
    # tests/test_symbell._assert_storage_parity).
    if nrb % row_group == 0:
        R = row_group
    else:
        R = _row_group_for_blocked_q(nrb, row_group)
    precond = inv_diag2d is not None

    in_specs = [
        pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                     memory_space=pltpu.SMEM),  # beta
        pl.BlockSpec((R, bm, bn), lambda g, cols: (g, 0, 0)),  # diag tiles
        pl.BlockSpec((R, ku, bm, bn), lambda g, cols: (g, 0, 0, 0)),  # upper
        pl.BlockSpec(memory_space=pltpu.VMEM),  # r (whole)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # p_old (whole)
    ]
    operands = [off_cols.reshape(-1), beta, diag_blocks, off_blocks,
                r2d, pold2d]
    if precond:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(inv_diag2d)

    scratch_shapes = [pltpu.VMEM((ncb, bn), jnp.float32)]
    if mirror == "banded":
        scratch_shapes.append(pltpu.VMEM((1, bn), jnp.float32))  # carry
    elif mirror == "split":
        # per-step product staging: forward rows + mirror rows
        scratch_shapes.append(pltpu.VMEM((R, bm), jnp.float32))
        tshape = (R, bn) if ku == 1 else (R, ku, bn)
        scratch_shapes.append(pltpu.VMEM(tshape, jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # p_new (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q (whole, accumulator)
            pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                         memory_space=pltpu.SMEM),  # pap
        ],
        scratch_shapes=scratch_shapes,
    )

    vec_bytes = ncb * bn * 4
    tile_bytes = (diag_blocks.size + off_blocks.size) * diag_blocks.dtype.itemsize
    resid = (7 if precond else 6) * vec_bytes  # + q whole accumulator
    blk_bytes = 2 * R * (1 + ku) * bm * bn * diag_blocks.dtype.itemsize
    vmem_limit = max(16 << 20, min(110 << 20, resid + blk_bytes + (12 << 20)))
    p_new, q, pap = pl.pallas_call(
        _sym_dir_spmv_kernel(R, ku, bm, bn, precond=precond, mirror=mirror),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        out_shape=(
            jax.ShapeDtypeStruct((ncb, bn), jnp.float32),
            jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # each stored upper tile does double work
            flops=2 * nrb * (1 + 2 * ku) * bm * bn + 4 * ncb * bn,
            bytes_accessed=tile_bytes
            + (4 if precond else 3) * vec_bytes
            + nrb * bm * 4,
            transcendentals=0,
        ),
    )(*operands)
    return p_new, q, pap


def _spmv_dot_kernel(R: int, kmax: int, bm: int, bn: int):
    """SpMV + p·q only (no direction update): the sharded solver's per-shard
    kernel, where the operand is the ALL-GATHERED global p and this shard's
    q rows sit at ``row_offset`` within it."""
    rows_per_g = (R * bm) // bn

    def kernel(cols_ref, off_ref, block_ref, x_ref, q_ref, pap_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            pap_ref[0, 0] = 0.0

        for rr in range(R):
            acc = None
            for k in range(kmax):
                c = cols_ref[(g * R + rr) * kmax + k]
                xb = x_ref[c, :].astype(jnp.float32)
                blk = block_ref[rr, k].astype(jnp.float32)
                part = jnp.sum(blk * xb[None, :], axis=1)
                acc = part if acc is None else acc + part
            q_ref[rr, :] = acc

        base = off_ref[0] // bn + g * rows_per_g
        prows = x_ref[pl.ds(base, rows_per_g), :]
        pap_ref[0, 0] += jnp.sum(q_ref[:] * prows.reshape(R, bm))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_group"))
def bell_spmv_dot(
    blocks: jax.Array,
    block_cols: jax.Array,
    x2d: jax.Array,
    row_offset: jax.Array,
    interpret: bool = False,
    row_group: int = 8,
):
    """(q, pap) = (A_local @ x, x[row_offset : row_offset+local_n] . q).

    ``x2d``: the (global) operand reshaped (ncb, bn), resident in VMEM.
    ``row_offset``: (1,) int32 — this shard's first global row (a multiple
    of bn).  Building block for the fused sharded iteration
    (parallel/sharded_cg.py): the local dot partial psums to the global p·q.
    """
    nrb, kmax, bm, bn = blocks.shape
    if bm != bn:
        raise ValueError(f"fused kernel needs square tiles, got {bm}x{bn}")
    R = _row_group_for_blocked_q(nrb, row_group)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # row_offset (1,)
            pl.BlockSpec((R, kmax, bm, bn), lambda g, cols: (g, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole gathered x
        ],
        out_specs=[
            pl.BlockSpec((R, bm), lambda g, cols: (g, 0)),
            pl.BlockSpec((1, 1), lambda g, cols: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    q, pap = pl.pallas_call(
        _spmv_dot_kernel(R, kmax, bm, bn),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * kmax * bm * bn,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + x2d.size * 4 + nrb * bm * 4,
            transcendentals=0,
        ),
    )(block_cols.reshape(-1), row_offset, blocks, x2d)
    return q, pap


def _update_kernel(alpha_ref, x_ref, p_ref, r_ref, q_ref,
                   xout_ref, rout_ref, rnorm_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        rnorm_ref[0, 0] = 0.0

    a = alpha_ref[0, 0]
    xout_ref[:] = x_ref[:] + a * p_ref[:]
    rnew = r_ref[:] - a * q_ref[:]
    rout_ref[:] = rnew
    rnorm_ref[0, 0] += jnp.sum(rnew * rnew)


def _update_kernel_pcg(alpha_ref, x_ref, p_ref, r_ref, q_ref, d_ref,
                       xout_ref, rout_ref, rnorm_ref, rho_ref):
    """PCG twin: additionally accumulates rho = r'·(M⁻¹r') = Σ d·r'² — the
    second per-iteration reduction preconditioned CG needs (dot(r,z))."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        rnorm_ref[0, 0] = 0.0
        rho_ref[0, 0] = 0.0

    a = alpha_ref[0, 0]
    xout_ref[:] = x_ref[:] + a * p_ref[:]
    rnew = r_ref[:] - a * q_ref[:]
    rout_ref[:] = rnew
    r2 = rnew * rnew
    rnorm_ref[0, 0] += jnp.sum(r2)
    rho_ref[0, 0] += jnp.sum(d_ref[:] * r2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_update_dot_pcg(
    x2d: jax.Array,
    p2d: jax.Array,
    r2d: jax.Array,
    q2d: jax.Array,
    d2d: jax.Array,
    alpha: jax.Array,
    interpret: bool = False,
):
    """(x', r', rnorm, rho) with rho = r'·(d⊙r') — the Jacobi-PCG update."""
    rows, lanes = x2d.shape
    C = _largest_divisor_leq(rows, 1024)
    blk = pl.BlockSpec((C, lanes), lambda g: (g, 0))
    scalar = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)
    grid_spec = pl.GridSpec(
        grid=(rows // C,),
        in_specs=[scalar, blk, blk, blk, blk, blk],
        out_specs=[blk, blk, scalar, scalar],
    )
    nbytes = rows * lanes * 4
    return pl.pallas_call(
        _update_kernel_pcg,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=9 * rows * lanes,
            bytes_accessed=7 * nbytes,
            transcendentals=0,
        ),
    )(alpha, x2d, p2d, r2d, q2d, d2d)


def _largest_divisor_leq(n: int, cap: int) -> int:
    """Largest chunk C ≤ cap with C | n and C ≡ 0 (mod 8) — the Mosaic
    block-shape rule for the (C, lanes) update blocks (divisible by 8 or
    equal to the array dim).  Falls back to one whole-array step (C == n)
    when no such divisor exists; fused_supported bounds n there."""
    c = min(n, cap)
    c -= c % 8
    while c >= 8:
        if n % c == 0:
            return c
        c -= 8
    return n


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_update_dot(
    x2d: jax.Array,
    p2d: jax.Array,
    r2d: jax.Array,
    q2d: jax.Array,
    alpha: jax.Array,
    interpret: bool = False,
):
    """(x', r', rnorm) = (x + alpha*p,  r - alpha*q,  r'.r').

    All vectors reshaped (rows, 128) float32; ``alpha`` is (1, 1) float32.
    """
    rows, lanes = x2d.shape
    # one grid step handles up to 1024 rows (0.5 MB/array); bigger vectors
    # stream in row chunks with the rnorm accumulating across the grid
    C = _largest_divisor_leq(rows, 1024)

    grid_spec = pl.GridSpec(
        grid=(rows // C,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, lanes), lambda g: (g, 0)),
            pl.BlockSpec((C, lanes), lambda g: (g, 0)),
            pl.BlockSpec((C, lanes), lambda g: (g, 0)),
            pl.BlockSpec((C, lanes), lambda g: (g, 0)),
        ],
        out_specs=[
            pl.BlockSpec((C, lanes), lambda g: (g, 0)),
            pl.BlockSpec((C, lanes), lambda g: (g, 0)),
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
    )
    nbytes = rows * lanes * 4
    return pl.pallas_call(
        _update_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * rows * lanes,
            bytes_accessed=6 * nbytes,
            transcendentals=0,
        ),
    )(alpha, x2d, p2d, r2d, q2d)
