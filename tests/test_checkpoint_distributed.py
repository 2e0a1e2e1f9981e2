"""Checkpoint/resume for the sharded and lockstep-batched solves (round 3).

The round-2 checkpoint layer covered only the single-device carries; the
long-running, expensive solves where resume matters most are exactly the
mesh-scale and multi-RHS ones.  These tests save mid-solve, reload, resume,
and require the interrupted run to reproduce the uninterrupted run
bit-for-bit (same body function, same op order, same backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix
from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs
from conjugategradient_tpu.solver.checkpoint import load_state, save_state

N_DEV = 8


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


def test_batched_lockstep_checkpoint_resume(tmp_path, rng):
    from conjugategradient_tpu.solver import (
        batched_cg_init,
        batched_state_result,
        cg_solve_batched,
        run_batched_cg,
    )
    from conjugategradient_tpu.types import BlockedEllMatrix

    rows, cols, vals, shape = poisson2d_coo(14)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=8)
    n = shape[0]
    R = 3
    B = jnp.asarray(rng.standard_normal((R, n)))
    tol = 1e-9

    X_ref, info_ref = cg_solve_batched(bell, B, tol=tol, maxiter=n + 1)

    state = batched_cg_init(bell, B, maxiter=n + 1)
    state = run_batched_cg(bell, state, tol, steps=10)
    path = tmp_path / "batched.npz"
    save_state(path, state)
    state2 = load_state(path)
    # the roundtrip is lossless
    for f in ("k", "done", "X", "r", "p", "rho", "rnorm", "hist"):
        np.testing.assert_array_equal(
            np.asarray(getattr(state2, f)), np.asarray(getattr(state, f))
        )
    state2 = run_batched_cg(bell, state2, tol)  # run to completion
    X_ck, info_ck = batched_state_result(state2)

    np.testing.assert_array_equal(
        np.asarray(info_ck.iterations), np.asarray(info_ref.iterations)
    )
    np.testing.assert_array_equal(np.asarray(X_ck), np.asarray(X_ref))
    np.testing.assert_array_equal(
        np.asarray(info_ck.rho_history), np.asarray(info_ref.rho_history)
    )


def test_batched_lockstep_checkpoint_with_jacobi_and_restart(tmp_path, rng):
    from conjugategradient_tpu.solver import (
        batched_cg_init,
        batched_state_result,
        cg_solve_batched,
        jacobi_preconditioner,
        run_batched_cg,
    )
    from conjugategradient_tpu.types import BlockedEllMatrix

    rows, cols, vals, shape = poisson2d_coo(12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=8)
    n = shape[0]
    M = jacobi_preconditioner(bell)
    R = 2
    B = jnp.asarray(rng.standard_normal((R, n)))
    tol, every = 1e-9, 6

    X_ref, info_ref = cg_solve_batched(
        bell, B, tol=tol, maxiter=n + 1, M=M, recompute_r_every=every
    )
    state = batched_cg_init(bell, B, maxiter=n + 1, M=M)
    while True:
        state = run_batched_cg(
            bell, state, tol, steps=7, M=M, B=B, recompute_r_every=every
        )
        if bool(jnp.all(state.done | (state.k >= n + 1))):
            break
    X_ck, info_ck = batched_state_result(state)
    np.testing.assert_array_equal(
        np.asarray(info_ck.iterations), np.asarray(info_ref.iterations)
    )
    np.testing.assert_array_equal(np.asarray(X_ck), np.asarray(X_ref))


def test_sharded_checkpoint_resume_bit_identical(tmp_path):
    from conjugategradient_tpu.parallel import (
        partition_csr_rows,
        sharded_cg_init,
        sharded_cg_solve,
        sharded_run_cg,
        sharded_state_result,
    )

    rows, cols, vals, shape = poisson2d_coo(16)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    blocks, bcols = jnp.asarray(blocks), jnp.asarray(bcols)
    tol = 1e-10

    x_ref, info_ref = sharded_cg_solve(blocks, bcols, b, tol=tol,
                                       maxiter=n + 1)

    state = sharded_cg_init(blocks, bcols, b, maxiter=n + 1)
    state = sharded_run_cg(blocks, bcols, state, tol=tol, steps=9)
    assert int(state.k) == 9
    path = tmp_path / "sharded.npz"
    save_state(path, state)
    state2 = load_state(path)
    assert type(state2).__name__ == "ShardedCGState"
    state2 = sharded_run_cg(blocks, bcols, state2, tol=tol, steps=13)
    assert int(state2.k) == 22
    state2 = sharded_run_cg(blocks, bcols, state2, tol=tol)  # to completion
    x_ck, info_ck = sharded_state_result(state2)

    assert int(info_ck.iterations) == int(info_ref.iterations)
    assert bool(info_ck.converged) == bool(info_ref.converged)
    np.testing.assert_array_equal(np.asarray(x_ck), np.asarray(x_ref))
    np.testing.assert_array_equal(
        np.asarray(info_ck.rho_history), np.asarray(info_ref.rho_history)
    )


def test_sharded_checkpoint_with_jacobi(tmp_path):
    from conjugategradient_tpu.parallel import (
        partition_csr_rows,
        sharded_cg_init,
        sharded_cg_solve,
        sharded_run_cg,
        sharded_state_result,
    )

    rows, cols, vals, shape = poisson2d_coo(12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    inv_diag = jnp.ones((n_pad,)).at[:n].set(
        1.0 / jnp.asarray(np.asarray(A.diagonal()))
    )
    blocks, bcols = jnp.asarray(blocks), jnp.asarray(bcols)
    tol = 1e-10

    x_ref, info_ref = sharded_cg_solve(
        blocks, bcols, b, tol=tol, maxiter=n + 1, inv_diag=inv_diag
    )
    state = sharded_cg_init(blocks, bcols, b, maxiter=n + 1,
                            inv_diag=inv_diag)
    while not bool(state.done) and int(state.k) < n + 1:
        state = sharded_run_cg(blocks, bcols, state, tol=tol, steps=11,
                               inv_diag=inv_diag)
    x_ck, info_ck = sharded_state_result(state)
    assert int(info_ck.iterations) == int(info_ref.iterations)
    np.testing.assert_array_equal(np.asarray(x_ck), np.asarray(x_ref))


def test_sharded_run_requires_b_for_restart():
    from conjugategradient_tpu.parallel import (
        partition_csr_rows,
        sharded_cg_init,
        sharded_run_cg,
    )

    rows, cols, vals, shape = poisson2d_coo(8)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    state = sharded_cg_init(jnp.asarray(blocks), jnp.asarray(bcols), b,
                            maxiter=n + 1)
    with pytest.raises(ValueError, match="needs b"):
        sharded_run_cg(jnp.asarray(blocks), jnp.asarray(bcols), state,
                       recompute_r_every=5)


def test_sharded_dia_checkpoint_resume_bit_identical(tmp_path):
    from conjugategradient_tpu.parallel import (
        partition_dia_rows,
        sharded_dia_cg_init,
        sharded_dia_cg_solve,
        sharded_dia_run_cg,
        sharded_state_result,
    )
    from conjugategradient_tpu.problems import banded_spd_coo
    from conjugategradient_tpu.types import DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(280, bandwidth=6, seed=9)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    dia = DIAMatrix.from_csr(A)
    n = shape[0]
    diags_sh, n_pad = partition_dia_rows(np.asarray(dia.diags), shape, N_DEV)
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    tol = 1e-9

    x_ref, info_ref = sharded_dia_cg_solve(
        jnp.asarray(diags_sh), dia.offsets, b, tol=tol, maxiter=n + 1
    )
    state = sharded_dia_cg_init(diags_sh, dia.offsets, b, maxiter=n + 1)
    state = sharded_dia_run_cg(diags_sh, dia.offsets, state, tol=tol, steps=7)
    path = tmp_path / "dia.npz"
    save_state(path, state)
    state = load_state(path)
    state = sharded_dia_run_cg(diags_sh, dia.offsets, state, tol=tol)
    x_ck, info_ck = sharded_state_result(state)
    assert int(info_ck.iterations) == int(info_ref.iterations)
    np.testing.assert_array_equal(np.asarray(x_ck), np.asarray(x_ref))
    np.testing.assert_array_equal(
        np.asarray(info_ck.rho_history), np.asarray(info_ref.rho_history)
    )


def test_sharded_sell_checkpoint_resume_bit_identical(tmp_path):
    from conjugategradient_tpu.parallel import (
        partition_sell_rows,
        sharded_sell_cg_init,
        sharded_sell_cg_solve,
        sharded_sell_run_cg,
        sharded_state_result,
    )
    from conjugategradient_tpu.problems import powerlaw_spd_coo

    rows, cols, vals, shape = powerlaw_spd_coo(400, avg_degree=4.0, seed=5)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    sell_sh = partition_sell_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV,
    )
    n = shape[0]
    n_pad = sell_sh[-1]
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    tol = 1e-9

    x_ref, info_ref = sharded_sell_cg_solve(sell_sh, b, tol=tol,
                                            maxiter=n + 1)
    state = sharded_sell_cg_init(sell_sh, b, maxiter=n + 1)
    state = sharded_sell_run_cg(sell_sh, state, tol=tol, steps=5)
    state = sharded_sell_run_cg(sell_sh, state, tol=tol)
    x_ck, info_ck = sharded_state_result(state)
    assert int(info_ck.iterations) == int(info_ref.iterations)
    np.testing.assert_array_equal(np.asarray(x_ck), np.asarray(x_ref))


def test_chunked_driving_compiles_once():
    """The chunk limit is a DYNAMIC operand: driving a sharded solve in
    many chunks must reuse ONE compiled program (a static limit recompiled
    the whole shard_map per chunk — seconds each at mesh scale)."""
    import conjugategradient_tpu.parallel.sharded_cg as sc
    from conjugategradient_tpu.parallel import (
        partition_csr_rows,
        sharded_cg_init,
        sharded_run_cg,
    )

    rows, cols, vals, shape = poisson2d_coo(12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    blocks, bcols = jnp.asarray(blocks), jnp.asarray(bcols)
    state = sharded_cg_init(blocks, bcols, b, maxiter=n + 1)
    state = sharded_run_cg(blocks, bcols, state, tol=1e-10, steps=5)
    n_cached = len(sc._SOLVE_CACHE)
    for steps in (7, 3, 11):
        state = sharded_run_cg(blocks, bcols, state, tol=1e-10, steps=steps)
    assert len(sc._SOLVE_CACHE) == n_cached, (
        "chunked driving must hit the one cached program"
    )
    assert int(state.k) == 5 + 7 + 3 + 11


def test_batched_chunked_driving_compiles_once(rng):
    from conjugategradient_tpu.solver import (
        batched_cg_init,
        run_batched_cg,
    )
    from conjugategradient_tpu.solver.batched import _batched_run_core
    from conjugategradient_tpu.types import BlockedEllMatrix

    rows, cols, vals, shape = poisson2d_coo(12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float64)
    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=8)
    B = jnp.asarray(rng.standard_normal((2, shape[0])))
    state = batched_cg_init(bell, B, maxiter=shape[0] + 1)
    state = run_batched_cg(bell, state, 1e-10, steps=5)
    n_compiles = _batched_run_core._cache_size()
    for steps in (7, 3):
        state = run_batched_cg(bell, state, 1e-10, steps=steps)
    assert _batched_run_core._cache_size() == n_compiles
