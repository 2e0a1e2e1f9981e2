"""Iteration-for-iteration residual-history parity with the reference
semantics (SURVEY §2.3; golden model: conjugategradient_tpu.oracle).

The contract: the JAX solver in float64 on CPU must reproduce the float64
NumPy oracle's iteration count exactly and its ρ_k = ‖r_k‖² history to
roundoff, for every operator layout.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import BlockedEllMatrix, CSRMatrix, DenseOperator, cg_solve
from conjugategradient_tpu.oracle import accuracy_np, csr_matvec_np_fast, reference_cg
from conjugategradient_tpu.problems import (
    banded_spd_coo,
    poisson2d_coo,
    random_spd_dense,
    reference_rhs,
)
from conjugategradient_tpu.solver import accuracy


def _oracle_matvec(csr):
    d, i, p = np.asarray(csr.data), np.asarray(csr.indices), np.asarray(csr.indptr)
    return lambda x: csr_matvec_np_fast(d, i, p, x)


def _check_parity(
    A, b, oracle_mv, tol, maxiter=None, x0=None, hist_rtol=1e-6, hist_floor=1e-15
):
    ora = reference_cg(oracle_mv, np.asarray(b), x0=x0, tol=tol, maxiter=maxiter)
    x, info = cg_solve(
        A, jnp.asarray(b), None if x0 is None else jnp.asarray(x0),
        tol=tol, maxiter=maxiter,
    )
    assert int(info.iterations) == ora.iterations, (
        f"iterations {int(info.iterations)} != oracle {ora.iterations}"
    )
    assert bool(info.converged) == ora.converged
    k = int(info.iterations)
    got = np.asarray(info.rho_history)[: k + 1]
    want = ora.rho_history[: k + 1]
    # Compare while residuals are meaningfully above the f64 noise floor:
    # as rho_k/rho_0 approaches machine epsilon the recurrence residual is
    # roundoff-dominated and different matvec summation orders (jnp vs numpy
    # BLAS) legitimately diverge, faster for larger condition numbers.
    # BASELINE.md's contract is parity to 1e-10; the default floor checks
    # 15 orders of decay.
    floor = want[0] * hist_floor
    sel = want > floor
    np.testing.assert_allclose(got[sel], want[sel], rtol=hist_rtol)
    np.testing.assert_allclose(np.asarray(x), ora.x, rtol=1e-8, atol=1e-10)
    return ora, x, info


def test_poisson2d_parity():
    rows, cols, vals, shape = poisson2d_coo(20)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = reference_rhs(shape[0])
    _check_parity(A, b, _oracle_matvec(A), tol=1e-10)


def test_banded_parity():
    rows, cols, vals, shape = banded_spd_coo(700, bandwidth=7, seed=5)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = reference_rhs(shape[0])
    _check_parity(A, b, _oracle_matvec(A), tol=1e-9)


def test_dense_parity():
    a = random_spd_dense(96, seed=1, cond=50.0)
    A = DenseOperator(jnp.asarray(a))
    b = reference_rhs(96)
    # jnp and numpy use different dense-BLAS summation orders, so the tail
    # diverges earlier than for the sparse paths; the BASELINE.md contract
    # (parity to 1e-10) is still checked.
    _check_parity(A, b, lambda x: a @ x, tol=1e-11, hist_floor=1e-10)


def test_bell_layout_parity():
    """The blocked-ELL layout must give the same history as CSR (same math,
    different storage)."""
    rows, cols, vals, shape = poisson2d_coo(16)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape)
    bell = BlockedEllMatrix.from_csr(csr, bm=8, bn=128)
    b = reference_rhs(shape[0])
    _check_parity(bell, b, _oracle_matvec(csr), tol=1e-10)


def test_nonzero_x0_parity():
    rows, cols, vals, shape = poisson2d_coo(12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = reference_rhs(shape[0])
    x0 = np.linspace(-1, 1, shape[0])
    _check_parity(A, b, _oracle_matvec(A), tol=1e-10, x0=x0)


def test_run_to_cap_like_reference_harness():
    """tol=0 (the harness's 1e-24, test/Tester.cpp:45) runs to the cap:
    do-while executes at most N+1 bodies (CG.hpp:436)."""
    rows, cols, vals, shape = poisson2d_coo(6)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    n = shape[0]
    b = reference_rhs(n)
    ora = reference_cg(_oracle_matvec(A), b, tol=0.0)
    x, info = cg_solve(A, jnp.asarray(b), tol=0.0)
    assert int(info.iterations) == ora.iterations == n + 1
    assert not bool(info.converged)


def test_convergence_observed_one_update_late():
    """The reference tests the PRE-update residual inside body k
    (CG.hpp:401-402): with tol huge, body 1 still executes fully."""
    rows, cols, vals, shape = poisson2d_coo(5)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = reference_rhs(shape[0])
    x, info = cg_solve(A, jnp.asarray(b), tol=1e30)
    assert int(info.iterations) == 1  # one body ran, then done was observed
    assert bool(info.converged)
    # and that body did perform its update (x != 0)
    assert float(jnp.max(jnp.abs(x))) > 0


def test_nan_terminates():
    """NaN residual -> clean termination (CG.hpp:401)."""
    a = np.zeros((4, 4))  # singular: pᵀAp = 0 -> alpha = inf -> NaN rho
    A = DenseOperator(jnp.asarray(a))
    b = np.ones(4)
    ora = reference_cg(lambda x: a @ x, b, tol=1e-10)
    x, info = cg_solve(A, jnp.asarray(b), tol=1e-10)
    assert int(info.iterations) == ora.iterations
    assert int(info.iterations) <= 3


def test_accuracy_matches_oracle_metric():
    """accuracy() = |Σ(b−Ax)²/Σx²| — squared-norm ratio (CG.hpp:463-515)."""
    rows, cols, vals, shape = poisson2d_coo(9)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = reference_rhs(shape[0])
    x, _ = cg_solve(A, jnp.asarray(b), tol=1e-8)
    got = float(accuracy(A, jnp.asarray(b), x))
    want = accuracy_np(_oracle_matvec(A), b, np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got < 1e-12


def test_monotone_a_norm_error():
    """Property: CG error is monotonically decreasing in the A-norm."""
    a = random_spd_dense(60, seed=7, cond=30.0)
    b = reference_rhs(60)
    x_star = np.linalg.solve(a, b)
    A = DenseOperator(jnp.asarray(a))

    errs = []
    from conjugategradient_tpu.solver.cg import cg_init, cg_step

    state = cg_init(A, jnp.asarray(b), maxiter=30)
    for _ in range(30):
        e = np.asarray(state.x) - x_star
        errs.append(float(e @ (a @ e)))
        state = cg_step(A, state, jnp.asarray(0.0))
    errs = np.array(errs)
    assert np.all(np.diff(errs) <= errs[:-1] * 1e-9 + 1e-30)
