"""Parity tests on the REAL SuiteSparse matrices BASELINE.json names.

This environment has no network egress, so these activate only when
``tools/fetch_suitesparse.py`` has populated ``problems/`` (they skip
cleanly otherwise — round-3 VERDICT item 2).  The synthetic stand-ins
(powerlaw/elasticity3d/circuit generators) carry the always-on coverage.
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

PROBLEMS = pathlib.Path(__file__).resolve().parent.parent / "problems"

#: published SuiteSparse stats (sparse.tamu.edu): name -> (n, nnz_expanded)
PUBLISHED = {
    "1138_bus": (1138, 4054),
    "bcsstk17": (10974, 428650),
    "G3_circuit": (1585478, 7660826),
    "Flan_1565": (1564794, 114165372),
}


def _find(name: str):
    for p in (PROBLEMS / f"{name}.mtx", PROBLEMS / name / f"{name}.mtx"):
        if p.exists():
            return p
    pytest.skip(f"{name}.mtx not fetched (run tools/fetch_suitesparse.py)")


def _load(name: str, dtype):
    from conjugategradient_tpu import load_matrix

    return load_matrix(str(_find(name)), layout="auto", dtype=dtype)


@pytest.mark.parametrize("name", ["1138_bus", "bcsstk17"])
def test_small_real_matrix_solves_and_matches_oracle(name):
    """Full oracle parity on the small real SPD problems: iteration count
    exact, residual history to f64 tolerance (SURVEY §2.3 contract)."""
    from conjugategradient_tpu import CSRMatrix, cg_solve
    from conjugategradient_tpu.io.mtx import read_mtx_csr
    from conjugategradient_tpu.oracle import csr_matvec_np_fast, reference_cg

    data, indices, indptr, shape = read_mtx_csr(str(_find(name)))
    n_pub, nnz_pub = PUBLISHED[name]
    assert shape[0] == n_pub
    assert len(data) == nnz_pub
    n = shape[0]
    b = np.arange(1, n + 1, dtype=np.float64)
    # run-to-tolerance at a level both f64 paths reach
    tol = 1e-6 * float(np.linalg.norm(b))
    ora = reference_cg(
        lambda x: csr_matvec_np_fast(data, indices, indptr, x), b, tol=tol,
        maxiter=n + 1,
    )
    A = CSRMatrix.from_arrays(data, indices, indptr, shape)
    x, info = cg_solve(A, jnp.asarray(b), tol=tol)
    assert int(info.iterations) == ora.iterations
    k = min(int(info.iterations), ora.iterations)
    h = np.asarray(info.rho_history)[:k]
    ho = ora.rho_history[:k]
    sel = ho > ho[0] * 1e-15
    np.testing.assert_allclose(h[sel], ho[sel], rtol=1e-5)


@pytest.mark.parametrize("name", ["G3_circuit", "Flan_1565"])
def test_large_real_matrix_loads_and_descends(name):
    """North-star-scale real matrices: verify the published shape/nnz and
    that 30 CG iterations descend (a full CPU solve at 1.5M rows belongs to
    the TPU harness, not the test suite)."""
    from conjugategradient_tpu import cg_solve

    A = _load(name, dtype=np.float64)
    n_pub, nnz_pub = PUBLISHED[name]
    assert A.shape[0] == n_pub
    assert A.nnz == nnz_pub
    n = A.shape[0]
    b = jnp.arange(1, n + 1, dtype=jnp.float64)
    x, info = cg_solve(A, b, tol=0.0, maxiter=30)
    h = np.asarray(info.rho_history)
    assert np.isfinite(h[:31]).all()
    assert h[30] < h[0]  # descending residual on the real operator


def test_circuit_standin_matches_g3_profile():
    """The always-on counterpart: the circuit generator reproduces
    G3_circuit's published profile (avg nnz/row ~4.83, narrow degree
    distribution — NOT power-law) at any n, and the matrix is SPD."""
    from conjugategradient_tpu import CSRMatrix, cg_solve
    from conjugategradient_tpu.problems import circuit_spd_coo

    n = 4096
    rows, cols, vals, shape = circuit_spd_coo(n, seed=3)
    avg = len(vals) / n
    assert abs(avg - 4.83) < 0.1
    deg = np.bincount(rows, minlength=n)
    assert deg.max() <= 20  # narrow tail; a power-law would have ~n^(1/1.5) hubs
    assert deg.min() >= 1
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = jnp.arange(1, n + 1, dtype=jnp.float64)
    x, info = cg_solve(A, b, tol=1e-8 * float(jnp.linalg.norm(b)))
    assert bool(info.converged)
    r = np.asarray(b) - np.asarray(A.matvec(x))
    assert np.linalg.norm(r) <= 1e-7 * float(jnp.linalg.norm(b))


def test_bcsstk17_standin_matches_published_profile():
    """The always-on counterpart for bcsstk17 (round-4 VERDICT item 5):
    the calibrated elasticity shell hits the PUBLISHED n exactly and nnz
    within 1%, and solves as a real stiffness matrix would."""
    from conjugategradient_tpu import CSRMatrix, cg_solve
    from conjugategradient_tpu.problems import bcsstk17_profile_coo

    rows, cols, vals, shape = bcsstk17_profile_coo()
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    n_pub, nnz_pub = PUBLISHED["bcsstk17"]
    assert A.shape[0] == n_pub
    assert abs(A.nnz - nnz_pub) / nnz_pub < 0.01
    # ~39 nnz/row, the stiffness-matrix regime (vs poisson3d's 7)
    assert 35 <= A.nnz / A.shape[0] <= 43
    n = A.shape[0]
    b = jnp.arange(1, n + 1, dtype=jnp.float64)
    x, info = cg_solve(A, b, tol=1e-6 * float(jnp.linalg.norm(b)),
                       maxiter=4 * n)
    assert bool(info.converged)
    r = np.asarray(b) - np.asarray(A.matvec(x))
    assert np.linalg.norm(r) <= 1e-5 * float(jnp.linalg.norm(b))
