"""Reference-compatible object API tests (compat.CG mirrors src/CG.hpp's
setters/solve/accuracy/extract workflow, exercised like test/Tester.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CG, CSRMatrix, cg_solve
from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs


@pytest.fixture(scope="module")
def system():
    rows, cols, vals, shape = poisson2d_coo(12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    return A, shape[0]


def test_tester_cpp_workflow(system):
    """The exact call sequence of the reference harness (test/Tester.cpp)."""
    A, n = system
    cg = CG.createCG(verbose=False)
    cg.setMatrix(np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr))
    cg.setTarget(reference_rhs(n))
    cg.solve(1e-24)
    x = cg.extract()
    assert cg.getDimension() == n
    assert x.shape == (n,)
    assert cg.accuracy() < 1e-20
    # parity with the functional API
    x_fn, _ = cg_solve(A, jnp.asarray(reference_rhs(n)), tol=1e-24)
    np.testing.assert_allclose(x, np.asarray(x_fn), rtol=1e-12)


def test_missing_inputs_raise(system):
    A, n = system
    cg = CG()
    with pytest.raises(RuntimeError, match="No b vector"):
        cg.solve(1e-8)
    cg.setTarget(reference_rhs(n))
    with pytest.raises(RuntimeError, match="No Matrix"):
        cg.solve(1e-8)


def test_set_initial_and_typo_alias(system):
    A, n = system
    b = reference_rhs(n)
    x0 = np.linspace(0, 1, n)
    cg1 = CG()
    cg1.setMatrix(A)
    cg1.setTarget(b)
    cg1.setInitial(x0)
    cg1.solve(1e-10)
    cg2 = CG()
    cg2.setMatrix(A)
    cg2.setTarget(b)
    cg2.setInital(x0)  # the reference's typo'd spelling (CG.hpp:215)
    cg2.solve(1e-10)
    np.testing.assert_array_equal(cg1.extract(), cg2.extract())
    assert cg1.iterations == cg2.iterations > 0
    assert cg1.converged


def test_extract_to(system):
    A, n = system
    cg = CG()
    cg.setMatrix(A)
    cg.setTarget(reference_rhs(n))
    cg.solve(1e-10)
    buf = np.zeros(n)
    cg.extractTo(buf)
    np.testing.assert_array_equal(buf, cg.extract())
    lst = [0.0] * n
    cg.extractTo(lst)
    np.testing.assert_allclose(lst, cg.extract())


def test_memory_footprint_and_history(system):
    A, n = system
    cg = CG()
    cg.setMatrix(np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr))
    cg.setTarget(reference_rhs(n))
    assert cg.memoryFootprint() == (2 * A.nnz + 4 * n) * 8 + 2 * n * 4
    cg.solve(1e-10)
    h = cg.residual_history
    assert len(h) == cg.iterations + 1
    assert h[-1] < h[0]


def test_checkpoint_roundtrip(tmp_path, system):
    from conjugategradient_tpu.solver import load_state, run_cg, save_state
    from conjugategradient_tpu.solver.cg import cg_init

    A, n = system
    b = jnp.asarray(reference_rhs(n))
    tol = 1e-10

    full = cg_init(A, b, maxiter=n + 1)
    full = run_cg(A, full, tol)

    half = cg_init(A, b, maxiter=n + 1)
    half = run_cg(A, half, tol, steps=20)
    assert int(half.k) == 20
    path = tmp_path / "state.npz"
    save_state(path, half)
    resumed = run_cg(A, load_state(path), tol)

    assert int(resumed.k) == int(full.k)
    np.testing.assert_array_equal(np.asarray(resumed.x), np.asarray(full.x))
    np.testing.assert_array_equal(
        np.asarray(resumed.hist), np.asarray(full.hist)
    )


def test_solve_warm_starts_from_previous_solution(system):
    """The reference persists x across solve() calls (CG.hpp:291-297);
    a repeated solve must warm-start, not re-solve from zeros."""
    A, n = system
    cg = CG()
    cg.setMatrix(A)
    cg.setTarget(reference_rhs(n))
    cg.solve(1e-10)
    first_iters = cg.iterations
    cg.solve(1e-10)  # warm start at the converged solution
    assert cg.iterations <= 2  # pre-update test observes convergence at once
    assert cg.accuracy() < 1e-18
    assert first_iters > 2
