"""Batched multi-RHS CG tests."""

import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu import CSRMatrix, cg_solve, cg_solve_batched
from conjugategradient_tpu.problems import poisson2d_coo
from conjugategradient_tpu.solver import jacobi_preconditioner


def _problem(nx=10):
    rows, cols, vals, shape = poisson2d_coo(nx)
    return CSRMatrix.from_coo(rows, cols, vals, shape), shape[0]


def test_batched_matches_sequential(rng):
    A, n = _problem()
    B = jnp.asarray(rng.standard_normal((4, n)))
    X, info = cg_solve_batched(A, B, tol=1e-10)
    assert X.shape == (4, n)
    for i in range(4):
        x_i, info_i = cg_solve(A, B[i], tol=1e-10)
        np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_i), rtol=1e-8)
        # per-lane info reflects its own convergence point
        assert bool(info.converged[i])
    # residual check
    R = B - jnp.stack([A.matvec(X[i]) for i in range(4)])
    assert float(jnp.max(jnp.abs(R))) < 1e-8


def test_batched_with_preconditioner(rng):
    A, n = _problem(8)
    B = jnp.asarray(rng.standard_normal((3, n)))
    X, info = cg_solve_batched(A, B, tol=1e-9, M=jacobi_preconditioner(A))
    R = B - jnp.stack([A.matvec(X[i]) for i in range(3)])
    assert float(jnp.max(jnp.abs(R))) < 1e-7


def test_batched_shape_validation(rng):
    A, n = _problem(5)
    try:
        cg_solve_batched(A, jnp.ones((n,)))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_batched_bell_dedicated_loop_matches_sequential(rng):
    """BlockedEllMatrix dispatches to the bell_spmv_multi lockstep loop;
    per-lane iterations/history must match solo solves exactly."""
    from conjugategradient_tpu.types import BlockedEllMatrix

    A, n = _problem(16)  # n=256: two 128-row blocks
    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=128)
    B = jnp.asarray(rng.standard_normal((4, n)))
    X, info = cg_solve_batched(bell, B, tol=1e-10)
    assert X.shape == (4, n)
    assert info.rho_history.shape[0] == 4
    for i in range(4):
        x_i, info_i = cg_solve(bell, B[i], tol=1e-10, fused="never")
        np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_i), rtol=1e-8)
        assert int(info.iterations[i]) == int(info_i.iterations)
        assert bool(info.converged[i]) == bool(info_i.converged)
        k = int(info_i.iterations)
        np.testing.assert_allclose(
            np.asarray(info.rho_history[i])[: k + 1],
            np.asarray(info_i.rho_history)[: k + 1],
            rtol=1e-6,
        )


def test_batched_bell_heterogeneous_convergence(rng):
    """Lanes converging at different iterations: late lanes must not disturb
    early lanes' frozen state."""
    from conjugategradient_tpu.types import BlockedEllMatrix

    A, n = _problem(16)
    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=128)
    # lane 0: zero RHS (converges at iteration 1); lane 1: hard RHS
    B = jnp.stack([jnp.zeros((n,)), jnp.asarray(rng.standard_normal(n))])
    X, info = cg_solve_batched(bell, B, tol=1e-10)
    assert int(info.iterations[0]) < int(info.iterations[1])
    assert bool(jnp.all(X[0] == 0))
    r1 = np.asarray(B[1]) - np.asarray(bell.matvec(X[1]))
    assert np.linalg.norm(r1) < 1e-8


def test_dia_spmv_multi_parity(rng):
    from conjugategradient_tpu.ops import dia_spmv_multi
    from conjugategradient_tpu.types import DIAMatrix

    A, n = _problem(9)
    dia = DIAMatrix.from_csr(A)
    X = jnp.asarray(rng.standard_normal((n, 6)))
    Y = dia_spmv_multi(dia, X)
    for j in range(6):
        np.testing.assert_allclose(
            np.asarray(Y[:, j]), np.asarray(dia.matvec(X[:, j])),
            rtol=1e-12, atol=1e-12,
        )


def test_batched_dia_dedicated_loop_matches_sequential(rng):
    """DIAMatrix dispatches to the dia_spmv_multi lockstep loop; per-lane
    iterations/history must match solo solves exactly (the shifted-slice
    formulation reduces in the same order per lane)."""
    from conjugategradient_tpu.types import DIAMatrix

    A, n = _problem(12)
    dia = DIAMatrix.from_csr(A)
    B = jnp.asarray(rng.standard_normal((4, n)))
    X, info = cg_solve_batched(dia, B, tol=1e-10)
    assert X.shape == (4, n)
    for i in range(4):
        x_i, info_i = cg_solve(dia, B[i], tol=1e-10, fused="never")
        np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_i), rtol=1e-8)
        assert int(info.iterations[i]) == int(info_i.iterations)
        assert bool(info.converged[i]) == bool(info_i.converged)


def test_batched_per_lane_tol(rng):
    """tol may be an (nrhs,) array: each lane terminates at ITS tolerance,
    matching solo solves with the same per-lane values."""
    from conjugategradient_tpu.types import DIAMatrix

    A, n = _problem(12)
    dia = DIAMatrix.from_csr(A)
    B = jnp.stack([jnp.asarray(rng.standard_normal(n)),
                   10.0 * jnp.asarray(rng.standard_normal(n))])
    tols = jnp.asarray([1e-8, 1e-4])
    X, info = cg_solve_batched(dia, B, tol=tols)
    for i in range(2):
        x_i, info_i = cg_solve(dia, B[i], tol=float(tols[i]), fused="never")
        assert int(info.iterations[i]) == int(info_i.iterations)
        np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_i), rtol=1e-8)
    # the loose lane stops earlier than the tight lane would have
    assert int(info.iterations[1]) < int(info.iterations[0]) + n

    # vmap fallback path (CSR) honors per-lane tol too: each lane must
    # match its own solo CSR solve exactly
    Xc, infoc = cg_solve_batched(A, B, tol=tols)
    for i in range(2):
        x_i, info_i = cg_solve(A, B[i], tol=float(tols[i]), fused="never")
        assert int(infoc.iterations[i]) == int(info_i.iterations)
        np.testing.assert_allclose(np.asarray(Xc[i]), np.asarray(x_i), rtol=1e-8)

    # wrong length rejected
    try:
        cg_solve_batched(dia, B, tol=jnp.asarray([1e-8, 1e-8, 1e-8]))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_batched_bell_jacobi_lockstep_matches_solo(rng):
    """Jacobi M rides the lockstep loop (operator amortization kept);
    per-lane iterations/solutions must match solo PCG solves exactly."""
    from conjugategradient_tpu.types import BlockedEllMatrix

    A, n = _problem(16)
    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=128)
    M = jacobi_preconditioner(bell)
    B = jnp.asarray(rng.standard_normal((3, n)))
    X, info = cg_solve_batched(bell, B, tol=1e-10, M=M)
    for i in range(3):
        x_i, info_i = cg_solve(bell, B[i], tol=1e-10, M=M, fused="never")
        assert int(info.iterations[i]) == int(info_i.iterations)
        assert bool(info.converged[i]) == bool(info_i.converged)
        np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_i), rtol=1e-8)


def test_batched_sell_blockjacobi_lockstep_matches_solo(rng):
    """Any traceable M rides the lockstep loop (column-vmapped apply):
    block-Jacobi on a SELL operator must match solo PCG per lane."""
    from conjugategradient_tpu.solver.precond import block_jacobi_preconditioner
    from conjugategradient_tpu.types import SellMatrix

    A, n = _problem(12)
    sell = SellMatrix.from_csr(A)
    M = block_jacobi_preconditioner(A, block_size=4)
    B = jnp.asarray(rng.standard_normal((3, n)))
    X, info = cg_solve_batched(sell, B, tol=1e-10, M=M)
    for i in range(3):
        x_i, info_i = cg_solve(sell, B[i], tol=1e-10, M=M, fused="never")
        assert int(info.iterations[i]) == int(info_i.iterations)
        np.testing.assert_allclose(np.asarray(X[i]), np.asarray(x_i), rtol=1e-8)


def test_batched_lockstep_restart_matches_solo_restart(rng):
    """recompute_r_every in the single-device lockstep loop (round 3):
    per-lane parity with solo restart solves, frozen lanes untouched."""
    rows, cols, vals, shape = poisson2d_coo(14)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    from conjugategradient_tpu.types import BlockedEllMatrix

    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=8)
    n = shape[0]
    R = 3
    B = rng.standard_normal((R, n))
    B = jnp.asarray(np.ascontiguousarray(B))
    every = 5
    X, info = cg_solve_batched(
        bell, B, tol=1e-9, maxiter=n + 1, recompute_r_every=every
    )
    for i in range(R):
        x_i, info_i = cg_solve(
            bell, B[i], tol=1e-9, recompute_r_every=every, fused="never"
        )
        assert int(info.iterations[i]) == int(info_i.iterations)
        np.testing.assert_allclose(
            np.asarray(X[i]), np.asarray(x_i), rtol=1e-7, atol=1e-8
        )


def test_symdia_blocked_multi_rhs_escape(rng, monkeypatch, caplog):
    """On a TPU backend at offsets >= 1024, a SymDIAMatrix CARRYING the
    blocked layout must escape the collapsed multi shift formulation by
    column-mapping the blocked symmetric Pallas kernel (unrolled) (round 4); one
    WITHOUT it keeps the multi path and warns loudly."""
    import logging

    import jax

    import conjugategradient_tpu.ops.pallas.dia_spmv as pdia
    import conjugategradient_tpu.solver.batched as batched
    from conjugategradient_tpu.ops.spmv import sym_dia_spmv_multi
    from conjugategradient_tpu.types import SymDIAMatrix

    n, k = 4096, 1100
    d0 = (4.0 + rng.random(n)).astype(np.float32)
    d1 = (0.1 * rng.standard_normal(n)).astype(np.float32)
    d1[n - k:] = 0.0
    sym = SymDIAMatrix(
        jnp.asarray(np.stack([d0, d1])), (0, k), (n, n),
        int(n + 2 * (n - k)),
    )
    blk = sym.with_blocked(block_len=1024)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert batched._dia_multi_collapses(blk)

    # run the TPU-only Pallas kernel in interpret mode so the vmapped
    # escape is executable on the CPU test backend
    real = pdia.sym_dia_spmv_pallas_blocked
    monkeypatch.setattr(
        pdia, "sym_dia_spmv_pallas_blocked",
        lambda *a, **kw: real(*a, **{**kw, "interpret": True}),
    )

    matvec_multi, _, _ = batched._lockstep_ops(blk, None, None)
    X = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    Y = np.asarray(matvec_multi(X))
    Y_ref = np.asarray(sym_dia_spmv_multi(sym, X))
    np.testing.assert_allclose(Y, Y_ref, rtol=1e-5, atol=1e-5)

    # no blocked layout: multi fallback + loud warning
    with caplog.at_level(logging.WARNING, logger="conjugategradient_tpu"):
        matvec_nb, _, _ = batched._lockstep_ops(sym, None, None)
    assert any("with_blocked" in r.message for r in caplog.records)
    np.testing.assert_allclose(
        np.asarray(matvec_nb(X)), Y_ref, rtol=1e-6, atol=1e-6
    )


def test_full_dia_collapse_escape_unrolled(rng, monkeypatch):
    """The full-DIA collapse escape must column-UNROLL the windowed Pallas
    kernel (jax.vmap over its ANY-space manual-DMA operand fails Mosaic
    lowering on TPU — caught live, round 4) and agree with the multi
    shift formulation numerically."""
    import jax

    import conjugategradient_tpu.ops.pallas.dia_spmv as pdia
    import conjugategradient_tpu.solver.batched as batched
    from conjugategradient_tpu.ops.spmv import dia_spmv_multi
    from conjugategradient_tpu.types import DIAMatrix

    n, k = 4096, 1100
    d0 = (4.0 + rng.random(n)).astype(np.float32)
    up = (0.1 * rng.standard_normal(n)).astype(np.float32)
    up[n - k:] = 0.0
    lo = np.zeros(n, np.float32)
    lo[k:] = up[: n - k]
    dia = DIAMatrix(
        jnp.asarray(np.stack([lo, d0, up])), (-k, 0, k), (n, n),
        int(n + 2 * (n - k)),
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert batched._dia_multi_collapses(dia)

    real = pdia.dia_spmv_pallas
    monkeypatch.setattr(
        pdia, "dia_spmv_pallas",
        lambda *a, **kw: real(*a, **{**kw, "interpret": True}),
    )

    matvec_multi, _, _ = batched._lockstep_ops(dia, None, None)
    X = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    Y = np.asarray(matvec_multi(X))
    Y_ref = np.asarray(dia_spmv_multi(dia, X))
    np.testing.assert_allclose(Y, Y_ref, rtol=1e-5, atol=1e-5)
