#!/usr/bin/env python
"""North-star-scale end-to-end solves on the chip (BASELINE.md configs 2/4/5
scale) — prints one JSON line per run for docs/performance.md.

One config per invocation (one process per TPU task — grant discipline):

  python tools/northstar_run.py poisson3d   # 117^3 = 1,601,613 rows, DIA
  python tools/northstar_run.py powerlaw    # 1,572,864 rows irregular, CSR
  python tools/northstar_run.py stencil     # 256^3 = 16.8M matrix-free

Methodology: the whole solve is one jitted while_loop dispatch; wall time is
measured around that single dispatch with a 1-element readback sync and the
measured RPC overhead subtracted (utils/benchmarking.rpc_overhead_s).  The
manufactured solution x*=1 gives b=A·1, so the true residual/error are
reported independently of the recurrence (SURVEY §4: the reference declared
a manufactured-solutions test and never wrote it, test/utils.hpp:66-67).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the persistent compile cache)


def _solve_and_time(op, b, tol, maxiter, **kw):
    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu import cg_solve
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    ovh = rpc_overhead_s()
    # warm-up: compile + run once
    x, info = cg_solve(op, b, tol=tol, maxiter=maxiter, **kw)
    float(info.rnorm_sq)
    t0 = time.perf_counter()
    x, info = cg_solve(op, b, tol=tol, maxiter=maxiter, **kw)
    float(info.rnorm_sq)  # readback sync
    wall = time.perf_counter() - t0 - ovh
    r_true = b - op.matvec(x)
    import jax.numpy as jnp

    rel = float(jnp.linalg.norm(r_true) / jnp.linalg.norm(b))
    return x, info, wall, rel


def run_poisson3d(nx=117, tol_rel=1e-7):
    import jax.numpy as jnp

    from conjugategradient_tpu.problems import poisson3d_coo
    from conjugategradient_tpu.types import CSRMatrix, DIAMatrix

    rows, cols, vals, shape = poisson3d_coo(nx)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    op = DIAMatrix.from_csr(csr)  # 7 diagonals — the auto-layout choice
    n = shape[0]
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)  # manufactured solution x* = 1
    tol = tol_rel * float(jnp.linalg.norm(b))
    x, info, wall, rel = _solve_and_time(op, b, tol, maxiter=2000)
    iters = int(info.iterations)
    bytes_it = op.diags.size * 4 + 7 * n * 4
    return {
        "metric": "poisson3d_117_solve_wall",
        "value": round(wall * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "nnz": csr.nnz, "layout": "dia(7)",
            "iterations": iters, "true_rel_residual": rel,
            "per_iter_ms": round(wall * 1e3 / max(iters, 1), 3),
            "gbps_effective": round(bytes_it * iters / wall / 1e9, 1),
            "err_vs_ones": float(jnp.max(jnp.abs(x - 1.0))),
        },
    }


def _powerlaw_sell_sorted(n, avg_degree, seed=0, dtype=np.float32):
    """Power-law CSR → degree-sorted SELL (pos == identity: the matvec
    skips its order-restore gather) — what load_matrix(layout='auto',
    reorder=True) produces for this pattern."""
    from conjugategradient_tpu.problems import powerlaw_spd_coo
    from conjugategradient_tpu.reorder import degree_sort_permutation, permute_csr
    from conjugategradient_tpu.types import CSRMatrix, SellMatrix

    rows, cols, vals, shape = powerlaw_spd_coo(n, avg_degree=avg_degree, seed=seed)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=dtype)
    d, i, p = np.asarray(csr.data), np.asarray(csr.indices), np.asarray(csr.indptr)
    perm = degree_sort_permutation(i, p, n)
    d, i, p = permute_csr(d, i, p, shape, perm)
    op = SellMatrix.from_csr_host(d, i, p, shape)
    assert op.pos_identity
    return csr, op


def run_powerlaw(n=1572864, avg_degree=4.8, tol_rel=1e-6, layout="sell"):
    import jax.numpy as jnp

    from conjugategradient_tpu.problems import powerlaw_spd_coo
    from conjugategradient_tpu.types import CSRMatrix

    # sell is the auto-layout choice for scattered patterns: one gather per
    # stored slot instead of CSR's gather + scalar segment-sum (2x measured);
    # degree-sorted so pos == identity (manufactured x*=1 is permutation-
    # invariant, so the recorded metrics are directly comparable)
    if layout == "sell":
        csr, op = _powerlaw_sell_sorted(n, avg_degree)
    else:
        rows, cols, vals, shape = powerlaw_spd_coo(n, avg_degree=avg_degree, seed=0)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        op = csr
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)
    tol = tol_rel * float(jnp.linalg.norm(b))
    x, info, wall, rel = _solve_and_time(op, b, tol, maxiter=600)
    iters = int(info.iterations)
    op_bytes = op.memory_footprint()
    return {
        "metric": "powerlaw_1p5M_solve_wall",
        "value": round(wall * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "nnz": op.nnz,
            "layout": ("sell (degree-sorted, pos==identity)"
                       if layout == "sell" else "csr (gather fallback)"),
            "iterations": iters, "true_rel_residual": rel,
            "per_iter_ms": round(wall * 1e3 / max(iters, 1), 3),
            "gbps_effective": round((op_bytes + 7 * n * 4) * iters / wall / 1e9, 1),
            "err_vs_ones": float(jnp.max(jnp.abs(x - 1.0))),
        },
    }


def run_powerlaw_multi(n=1572864, avg_degree=4.8, tol_rel=1e-6, R=8):
    """R simultaneous right-hand sides on the 1.5M-row scattered matrix via
    the lockstep multi-RHS loop (sell_spmv_multi): the flat gather fetches R
    contiguous lane values per stored index, amortizing the scalar-access
    floor that dominates the single-RHS solve."""
    import time

    import jax.numpy as jnp

    from conjugategradient_tpu import cg_solve_batched
    from conjugategradient_tpu.ops.spmv import sell_spmv_multi
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    _, op = _powerlaw_sell_sorted(n, avg_degree)
    # distinct manufactured solutions per lane, PER-LANE tolerances: near
    # the f32 floor a shared absolute tol that is even 1% tighter in
    # relative terms for some lane doubles that lane's iterations
    # (measured: 129-139 vs 63 — see cg_solve_batched's tol docstring)
    scales = (1.0 + 0.1 * np.arange(R)).astype(np.float32)
    Xstar = jnp.ones((n, R), jnp.float32) * jnp.asarray(scales)[None, :]
    B = sell_spmv_multi(op, Xstar).T  # (R, n)
    tol = tol_rel * jnp.linalg.norm(B, axis=1)  # (R,)

    ovh = rpc_overhead_s()
    X, info = cg_solve_batched(op, B, tol=tol, maxiter=600)  # warm-up/compile
    float(jnp.max(info.rnorm_sq))
    t0 = time.perf_counter()
    X, info = cg_solve_batched(op, B, tol=tol, maxiter=600)
    float(jnp.max(info.rnorm_sq))
    wall = time.perf_counter() - t0 - ovh
    iters = int(jnp.max(info.iterations))
    Rtrue = B - sell_spmv_multi(op, X.T).T
    rel = float(jnp.max(jnp.linalg.norm(Rtrue, axis=1) / jnp.linalg.norm(B, axis=1)))
    return {
        "metric": "powerlaw_1p5M_multi8_per_rhs_wall",
        "value": round(wall * 1e3 / R, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "nnz": op.nnz, "R": R,
            "layout": "sell lockstep multi-RHS",
            "iterations_max": iters,
            "all_converged": bool(jnp.all(info.converged)),
            "wall_total_ms": round(wall * 1e3, 1),
            "per_rhs_ms": round(wall * 1e3 / R, 1),
            "true_rel_residual_max": rel,
            "err_vs_xstar": float(jnp.max(jnp.abs(X - Xstar.T))),
        },
    }


def run_powerlaw_block(n=1572864, avg_degree=4.8, tol_rel=1e-6, R=8,
                       rre=50):
    """Block CG vs lockstep A/B on the 1.5M-row scattered matrix: same
    operator, same (R,n) manufactured right-hand sides, same per-lane
    tolerances, both solved in this one process.  Block CG shares one
    Krylov space across the lanes, so its per-lane iteration counts should
    undercut the lockstep loop's while paying the same one multi-vector
    SpMV per iteration (plus an R×R eigh pair — measured here)."""
    import time

    import jax.numpy as jnp

    from conjugategradient_tpu import block_cg_solve, cg_solve_batched
    from conjugategradient_tpu.ops.spmv import sell_spmv_multi
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    _, op = _powerlaw_sell_sorted(n, avg_degree)
    # INDEPENDENT random lane solutions — scaled copies of one vector (the
    # powerlaw-multi construction) form a rank-1 RHS block, the degenerate
    # case where a shared Krylov space adds nothing (measured: block CG
    # NEEDS independent lanes to undercut lockstep iteration counts)
    rng = np.random.default_rng(0)
    Xstar = jnp.asarray(rng.standard_normal((n, R)), jnp.float32)
    B = sell_spmv_multi(op, Xstar).T  # (R, n)
    tol = tol_rel * jnp.linalg.norm(B, axis=1)  # (R,)
    ovh = rpc_overhead_s()

    def timed(solve):
        X, info = solve()  # warm-up/compile
        float(jnp.max(info.rnorm_sq))
        t0 = time.perf_counter()
        X, info = solve()
        float(jnp.max(info.rnorm_sq))
        wall = time.perf_counter() - t0 - ovh
        Rtrue = B - sell_spmv_multi(op, X.T).T
        rel = float(jnp.max(jnp.linalg.norm(Rtrue, axis=1)
                            / jnp.linalg.norm(B, axis=1)))
        return X, info, wall, rel

    _, il, wall_l, rel_l = timed(
        lambda: cg_solve_batched(op, B, tol=tol, maxiter=600))
    _, ib, wall_b, rel_b = timed(
        lambda: block_cg_solve(op, B, tol=tol, maxiter=600,
                               recompute_r_every=rre))
    kl = int(jnp.max(il.iterations))
    kb = int(jnp.max(ib.iterations))
    return {
        "metric": "powerlaw_1p5M_blockcg_vs_lockstep_wall_ratio",
        "value": round(wall_l / wall_b, 3),
        "unit": "x",
        "vs_baseline": round(rel_b, 12),
        "detail": {
            "n": n, "nnz": op.nnz, "R": R, "recompute_r_every": rre,
            "lockstep": {"iterations_max": kl,
                         "wall_ms": round(wall_l * 1e3, 1),
                         "per_iter_ms": round(wall_l * 1e3 / max(kl, 1), 2),
                         "true_rel_residual_max": rel_l,
                         "all_converged": bool(jnp.all(il.converged))},
            "block": {"iterations_max": kb,
                      "wall_ms": round(wall_b * 1e3, 1),
                      "per_iter_ms": round(wall_b * 1e3 / max(kb, 1), 2),
                      "true_rel_residual_max": rel_b,
                      "all_converged": bool(jnp.all(ib.converged))},
        },
    }


def run_poisson3d_refine(nx=117, tol_rel=1e-7):
    """Mixed-precision CG-IR A/B at north-star scale (config on the DIA
    layout, where value bytes dominate the stream): plain f32 DIA solve vs
    refined_cg_solve with a bfloat16 inner operator + f32 outer residuals,
    both to the SAME true-residual target in this one process.  The bf16
    copy halves the 7-diagonal stream, so inner iterations should run
    ~1.7x faster; a few outer corrections buy back full f32 accuracy."""
    import time

    import jax.numpy as jnp

    from conjugategradient_tpu import cg_solve, refined_cg_solve
    from conjugategradient_tpu.problems import poisson3d_coo
    from conjugategradient_tpu.types import CSRMatrix, DIAMatrix
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    rows, cols, vals, shape = poisson3d_coo(nx)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    op = DIAMatrix.from_csr(csr)
    op_lo = op.astype(jnp.bfloat16)
    n = shape[0]
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)
    tol = tol_rel * float(jnp.linalg.norm(b))
    ovh = rpc_overhead_s()

    def timed(solve):
        x, _ = solve()  # warm-up/compile
        float(jnp.sum(x))
        t0 = time.perf_counter()
        x, info = solve()
        float(jnp.sum(x))
        wall = time.perf_counter() - t0 - ovh
        rel = float(jnp.linalg.norm(b - op.matvec(x)) / jnp.linalg.norm(b))
        return x, info, wall, rel

    x32, i32, wall32, rel32 = timed(
        lambda: cg_solve(op, b, tol=tol, maxiter=2000))
    xr, ir, wallr, relr = timed(
        lambda: refined_cg_solve(op, b, tol=tol, A_low=op_lo,
                                 inner_maxiter=2000))
    return {
        "metric": "poisson3d_117_refine_bf16_speedup",
        "value": round(wall32 / wallr, 3),
        "unit": "x",
        "vs_baseline": round(relr, 12),
        "detail": {
            "n": n, "nnz": csr.nnz, "layout": "dia(7)",
            "f32": {"iterations": int(i32.iterations),
                    "wall_ms": round(wall32 * 1e3, 1),
                    "true_rel_residual": rel32},
            "refined_bf16": {
                "refinements": ir.refinements,
                "inner_iterations": ir.inner_iterations,
                "wall_ms": round(wallr * 1e3, 1),
                "true_rel_residual": relr,
                "converged": ir.converged,
            },
        },
    }


def run_circuit(n=1585478, tol_rel=1e-6, precond="jacobi"):
    """G3_circuit at its REAL published size (n=1,585,478, nnz≈7.66M, avg
    degree 4.83 — the round-2 VERDICT's missing pattern-matched replica):
    circuit conductance topology from problems.circuit_spd_coo, degree-sorted
    SELL layout (narrow degree distribution → tiny bucket padding), Jacobi
    PCG (the standard choice for conductance matrices)."""
    import jax.numpy as jnp

    from conjugategradient_tpu.problems import circuit_spd_coo
    from conjugategradient_tpu.reorder import degree_sort_permutation, permute_csr
    from conjugategradient_tpu.solver import jacobi_preconditioner
    from conjugategradient_tpu.types import CSRMatrix, SellMatrix

    rows, cols, vals, shape = circuit_spd_coo(n, seed=0)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    d, i, p = np.asarray(csr.data), np.asarray(csr.indices), np.asarray(csr.indptr)
    perm = degree_sort_permutation(i, p, n)
    d, i, p = permute_csr(d, i, p, shape, perm)
    op = SellMatrix.from_csr_host(d, i, p, shape)
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)  # manufactured solution x* = 1
    tol = tol_rel * float(jnp.linalg.norm(b))
    M = jacobi_preconditioner(op) if precond == "jacobi" else None
    x, info, wall, rel = _solve_and_time(op, b, tol, maxiter=3000, M=M)
    iters = int(info.iterations)
    op_bytes = op.memory_footprint()
    return {
        "metric": "circuit_g3_solve_wall",
        "value": round(wall * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "nnz": op.nnz,
            "layout": "sell (degree-sorted, pos==identity)",
            "precond": precond,
            "iterations": iters, "true_rel_residual": rel,
            "per_iter_ms": round(wall * 1e3 / max(iters, 1), 3),
            "gbps_effective": round(
                (op_bytes + 7 * n * 4) * iters / wall / 1e9, 1
            ),
            "err_vs_ones": float(jnp.max(jnp.abs(x - 1.0))),
            "sell_padding": round(op.padding_ratio(), 4),
        },
    }


def run_elasticity(nx=48, tol_rel=1e-6):
    """bcsstk17-class block-stiffness system at scale (BASELINE config 2's
    structural-matrix class): 3 dof/node on an nx³ grid, dense 3×3 blocks,
    auto layout (DIA at ~135 diagonals, stencil-scale offsets → the Pallas
    windowed kernel), block-Jacobi(3) vs scalar Jacobi."""
    import jax.numpy as jnp

    from conjugategradient_tpu import cg_solve
    from conjugategradient_tpu.problems import elasticity3d_coo
    from conjugategradient_tpu.solver.precond import (
        block_jacobi_preconditioner,
        jacobi_preconditioner,
    )
    from conjugategradient_tpu.types import CSRMatrix, DIAMatrix

    rows, cols, vals, shape = elasticity3d_coo(nx, seed=0)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    op = DIAMatrix.from_csr(csr)
    n = shape[0]
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)
    tol = tol_rel * float(jnp.linalg.norm(b))

    M_bj = block_jacobi_preconditioner(csr, block_size=3)
    x, info, wall, rel = _solve_and_time(op, b, tol, maxiter=4000, M=M_bj)
    iters_bj = int(info.iterations)
    _, info_j = cg_solve(op, b, tol=tol, maxiter=4000, M=jacobi_preconditioner(csr))
    return {
        "metric": f"elasticity{nx}_blockjacobi_solve_wall",
        "value": round(wall * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "nnz": csr.nnz, "ndiag": len(op.offsets),
            "layout": "dia (auto; Pallas windowed kernel at these offsets)",
            "iterations_blockjacobi3": iters_bj,
            "iterations_jacobi": int(info_j.iterations),
            "true_rel_residual": rel,
            "per_iter_ms": round(wall * 1e3 / max(iters_bj, 1), 3),
            "err_vs_ones": float(jnp.max(jnp.abs(x - 1.0))),
        },
    }


def run_powerlaw_sstep(n=1572864, avg_degree=4.8, K=256, s=4):
    """s-step vs standard CG per-iteration cost on one chip (1.5M-row
    degree-sorted SELL operator).  On a single device there is no
    collective latency to avoid, so this measures what s-step COSTS
    locally — the Gram einsum, the pinv solves, and the skinny updates —
    per iteration of equal SpMV work.  Fixed iteration budget (tol=0,
    maxiter=K) on the same manufactured system: the 1.5M power-law's
    iteration counts at tol are chaotically sensitive (CLAUDE.md), so the
    honest comparison is per-iteration wall at equal K, with both solvers'
    true residuals at that equal budget reported alongside."""
    import time

    import jax.numpy as jnp

    from conjugategradient_tpu import cg_solve, sstep_cg_solve
    from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

    _, op = _powerlaw_sell_sorted(n, avg_degree)
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)
    bnorm = float(jnp.linalg.norm(b))
    ovh = rpc_overhead_s()

    def timed(solve):
        x, info = solve()  # warm-up/compile
        float(info.rnorm_sq)
        t0 = time.perf_counter()
        x, info = solve()
        float(info.rnorm_sq)
        wall = time.perf_counter() - t0 - ovh
        rel = float(jnp.linalg.norm(b - op.matvec(x))) / bnorm
        return int(info.iterations), wall, rel

    k_std, wall_std, rel_std = timed(
        lambda: cg_solve(op, b, tol=0.0, maxiter=K))
    k_ss, wall_ss, rel_ss = timed(
        lambda: sstep_cg_solve(op, b, s=s, tol=0.0, maxiter=K))
    it_std = wall_std * 1e3 / max(k_std, 1)
    it_ss = wall_ss * 1e3 / max(k_ss, 1)
    return {
        "metric": "powerlaw_1p5M_sstep_per_iter_overhead",
        "value": round(it_ss / it_std, 3),
        "unit": "x",
        "vs_baseline": round(rel_ss, 12),
        "detail": {
            "n": n, "nnz": op.nnz, "s": s, "maxiter": K,
            "standard": {"iterations": k_std,
                         "wall_ms": round(wall_std * 1e3, 1),
                         "per_iter_ms": round(it_std, 3),
                         "true_rel_residual": rel_std},
            "sstep": {"iterations": k_ss,
                      "wall_ms": round(wall_ss * 1e3, 1),
                      "per_iter_ms": round(it_ss, 3),
                      "true_rel_residual": rel_ss},
        },
    }


def run_stencil(nx=256, tol_rel=2.4e-4):
    import jax.numpy as jnp

    from conjugategradient_tpu.types import StencilOperator

    op = StencilOperator.poisson((nx, nx, nx), dtype=jnp.float32)
    n = nx ** 3
    ones = jnp.ones((n,), jnp.float32)
    b = op.matvec(ones)
    tol = tol_rel * float(jnp.linalg.norm(b))
    x, info, wall, rel = _solve_and_time(op, b, tol, maxiter=2000)
    iters = int(info.iterations)
    return {
        "metric": "stencil256_solve_wall",
        "value": round(wall * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rel, 12),
        "detail": {
            "n": n, "layout": "matrix-free 7-point",
            "iterations": iters, "true_rel_residual": rel,
            "per_iter_ms": round(wall * 1e3 / max(iters, 1), 3),
            "gbps_ideal": round(2 * n * 4 * iters / wall / 1e9, 1),
            "err_vs_ones": float(jnp.max(jnp.abs(x - 1.0))),
        },
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "config",
        choices=("poisson3d", "powerlaw", "powerlaw-multi", "powerlaw-block",
                 "powerlaw-sstep", "poisson3d-refine",
                 "elasticity", "stencil", "circuit"),
    )
    ap.add_argument("--nx", type=int, default=None,
                    help="grid edge override (poisson3d/elasticity/stencil; "
                         "elasticity --nx 80 is the Flan_1565-class scale: "
                         "n=1.54M, ~124M nnz)")
    args = ap.parse_args(argv)
    kw = {}
    if args.nx is not None:
        if args.config not in ("poisson3d", "elasticity", "stencil"):
            ap.error("--nx applies to poisson3d/elasticity/stencil")
        kw["nx"] = args.nx
    out = {"poisson3d": run_poisson3d, "powerlaw": run_powerlaw,
           "powerlaw-multi": run_powerlaw_multi,
           "powerlaw-block": run_powerlaw_block,
           "powerlaw-sstep": run_powerlaw_sstep,
           "poisson3d-refine": run_poisson3d_refine,
           "elasticity": run_elasticity,
           "stencil": run_stencil,
           "circuit": run_circuit}[args.config](**kw)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
