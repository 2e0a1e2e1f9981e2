"""bcsstk17-class block-stiffness problems (BASELINE config 2's second
workload class: structural matrices with dense 3x3 dof blocks).

The reference's real inputs are user-supplied SuiteSparse files
(test/Tester.cpp:14-21); problems.elasticity3d_coo generates the same
shape of matrix without egress.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, cg_solve
from conjugategradient_tpu.problems import elasticity3d_coo


@pytest.fixture(scope="module")
def elast():
    rows, cols, vals, shape = elasticity3d_coo(4, seed=0)
    return CSRMatrix.from_coo(rows, cols, vals, shape)


def test_generator_is_spd_and_symmetric():
    rows, cols, vals, shape = elasticity3d_coo(3, seed=1)
    A = np.zeros(shape)
    np.add.at(A, (rows, cols), vals)
    np.testing.assert_allclose(A, A.T, atol=0)
    ev = np.linalg.eigvalsh(A)
    assert ev[0] > 0


def test_block_profile():
    """3 dof/node, 27-point neighborhood: every stored entry belongs to a
    dense 3x3 block (all 9 entries of its block present)."""
    rows, cols, vals, shape = elasticity3d_coo(3, seed=0)
    blocks = set(zip((rows // 3).tolist(), (cols // 3).tolist()))
    entries = set(zip(rows.tolist(), cols.tolist()))
    for bp, bq in blocks:
        for a in range(3):
            for b in range(3):
                assert (3 * bp + a, 3 * bq + b) in entries
    # interior nodes couple to all 27 neighbors (small grids are
    # boundary-heavy, so the average sits well below the interior 81)
    nnz_per_row = len(rows) / shape[0]
    assert 30 <= nnz_per_row <= 81


def test_cg_solves_it(elast):
    n = elast.shape[0]
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    x, info = cg_solve(elast, b, tol=1e-10)
    assert bool(info.converged)
    r = np.asarray(b) - np.asarray(elast.matvec(x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-5


def test_auto_layout_streams_it(tmp_path):
    """choose_layout must pick a streaming layout (the block-banded grid
    pattern has a modest diagonal count), and its matvec must match CSR."""
    from conjugategradient_tpu.io.loader import choose_layout, load_matrix
    from conjugategradient_tpu.io.mtx import write_mtx

    rows, cols, vals, shape = elasticity3d_coo(3, seed=0)
    path = str(tmp_path / "elast.mtx")
    write_mtx(path, rows, cols, vals, shape, symmetric=True)
    csr = load_matrix(path, layout="csr", dtype=np.float64)
    op = load_matrix(path, layout="auto", dtype=np.float64)
    assert type(op).__name__ != "CSRMatrix"
    x = jnp.asarray(np.random.default_rng(2).standard_normal(shape[0]))
    np.testing.assert_allclose(
        np.asarray(op.matvec(x)), np.asarray(csr.matvec(x)), rtol=1e-12, atol=1e-12
    )


def test_block_jacobi3_beats_scalar_jacobi(elast):
    """The dof-block structure is exactly what block-Jacobi(3) captures:
    it must converge in fewer iterations than scalar Jacobi."""
    from conjugategradient_tpu.solver.precond import (
        block_jacobi_preconditioner,
        jacobi_preconditioner,
    )

    n = elast.shape[0]
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    _, info_j = cg_solve(elast, b, tol=1e-10, M=jacobi_preconditioner(elast))
    _, info_bj = cg_solve(
        elast, b, tol=1e-10, M=block_jacobi_preconditioner(elast, block_size=3)
    )
    assert bool(info_j.converged) and bool(info_bj.converged)
    assert int(info_bj.iterations) < int(info_j.iterations)
