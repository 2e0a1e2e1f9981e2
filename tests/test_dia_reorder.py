"""DIA layout + RCM reordering + auto layout choice tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, DIAMatrix, cg_solve
from conjugategradient_tpu.io.loader import choose_layout, load_matrix
from conjugategradient_tpu.io.mtx import write_mtx
from conjugategradient_tpu.oracle import csr_matvec_np_fast, reference_cg
from conjugategradient_tpu.problems import banded_spd_coo, poisson2d_coo, reference_rhs
from conjugategradient_tpu.reorder import (
    bandwidth,
    count_diagonals,
    permute_csr,
    permute_vector,
    rcm_permutation,
    unpermute_vector,
)


@pytest.fixture(scope="module")
def poisson():
    rows, cols, vals, shape = poisson2d_coo(15, 13)
    return CSRMatrix.from_coo(rows, cols, vals, shape)


def test_dia_matches_csr(poisson, rng):
    dia = DIAMatrix.from_csr(poisson)
    assert dia.ndiag == 5  # 5-point stencil: exactly 5 diagonals
    assert dia.padding_ratio() < 1.2
    x = jnp.asarray(rng.standard_normal(poisson.shape[1]))
    np.testing.assert_allclose(
        np.asarray(dia.matvec(x)), np.asarray(poisson.matvec(x)), rtol=1e-12
    )


def test_dia_diagonal_and_dense(poisson):
    dia = DIAMatrix.from_csr(poisson)
    np.testing.assert_allclose(
        np.asarray(dia.diagonal()), np.asarray(poisson.diagonal()), rtol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(dia.to_dense()), np.asarray(poisson.to_dense()), rtol=1e-14
    )


def test_dia_max_diags_guard(poisson):
    with pytest.raises(ValueError, match="diagonals"):
        DIAMatrix.from_csr(poisson, max_diags=3)


def test_dia_cg_parity(poisson):
    b = reference_rhs(poisson.shape[0])
    d, i, p = np.asarray(poisson.data), np.asarray(poisson.indices), np.asarray(poisson.indptr)
    ora = reference_cg(lambda x: csr_matvec_np_fast(d, i, p, x), b, tol=1e-10)
    x, info = cg_solve(DIAMatrix.from_csr(poisson), jnp.asarray(b), tol=1e-10)
    assert int(info.iterations) == ora.iterations
    np.testing.assert_allclose(np.asarray(x), ora.x, rtol=1e-8)


def test_rcm_reduces_bandwidth(rng):
    """Shuffle a banded matrix, then RCM must restore a narrow band."""
    rows, cols, vals, shape = banded_spd_coo(300, bandwidth=3, seed=8)
    n = shape[0]
    shuffle = rng.permutation(n)
    A = CSRMatrix.from_coo(shuffle[rows], shuffle[cols], vals, shape)
    d, i, p = np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)
    bw_before = bandwidth(i, p)
    perm = rcm_permutation(i, p, n)
    d2, i2, p2 = permute_csr(d, i, p, shape, perm)
    bw_after = bandwidth(i2, p2)
    assert bw_after < bw_before / 4, (bw_before, bw_after)
    assert count_diagonals(i2, p2) <= 2 * bw_after + 1


def test_permute_csr_is_similarity(rng):
    rows, cols, vals, shape = poisson2d_coo(7)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    n = shape[0]
    d, i, p = np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)
    perm = rcm_permutation(i, p, n)
    d2, i2, p2 = permute_csr(d, i, p, shape, perm)
    dense = np.asarray(A.to_dense())
    dense2 = np.zeros_like(dense)
    for r in range(n):
        for j in range(p2[r], p2[r + 1]):
            dense2[r, i2[j]] += d2[j]
    np.testing.assert_allclose(dense2, dense[np.ix_(perm, perm)], rtol=1e-14)


def test_reordered_solve_round_trip(rng):
    """Solve in RCM space and map back: must equal the direct solve."""
    rows, cols, vals, shape = banded_spd_coo(200, bandwidth=5, seed=9)
    n = shape[0]
    shuffle = rng.permutation(n)
    A = CSRMatrix.from_coo(shuffle[rows], shuffle[cols], vals, shape)
    b = reference_rhs(n)
    x_direct, _ = cg_solve(A, jnp.asarray(b), tol=1e-11)

    d, i, p = np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)
    perm = rcm_permutation(i, p, n)
    d2, i2, p2 = permute_csr(d, i, p, shape, perm)
    A2 = DIAMatrix.from_csr_host(d2, i2, p2, shape)
    y, info = cg_solve(A2, jnp.asarray(permute_vector(b, perm)), tol=1e-11)
    x_back = unpermute_vector(np.asarray(y), perm)
    np.testing.assert_allclose(x_back, np.asarray(x_direct), rtol=1e-7, atol=1e-9)


def test_choose_layout():
    rows, cols, vals, shape = poisson2d_coo(20)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    i, p = np.asarray(A.indices), np.asarray(A.indptr)
    assert choose_layout(i, p, shape) == "dia"  # 5 diagonals, perfect fit


def test_load_matrix_auto_and_dia(tmp_path):
    rows, cols, vals, shape = poisson2d_coo(10)
    path = tmp_path / "p.mtx"
    write_mtx(path, rows, cols, vals, shape, symmetric=True)
    op = load_matrix(path, layout="auto", dtype=np.float64)
    assert isinstance(op, DIAMatrix)
    op2 = load_matrix(path, layout="dia", dtype=np.float64)
    b = jnp.ones((shape[0],))
    np.testing.assert_allclose(
        np.asarray(op.matvec(b)), np.asarray(op2.matvec(b)), rtol=1e-14
    )


def test_load_matrix_reorder_returns_perm(tmp_path, rng):
    rows, cols, vals, shape = banded_spd_coo(80, bandwidth=4, seed=2)
    shuffle = rng.permutation(shape[0])
    path = tmp_path / "s.mtx"
    write_mtx(path, shuffle[rows], shuffle[cols], vals, shape, symmetric=True)
    op, perm = load_matrix(path, layout="csr", dtype=np.float64, reorder=True)
    assert perm is not None and len(perm) == shape[0]
    assert sorted(perm) == list(range(shape[0]))


def test_pallas_dia_interpret(poisson, rng):
    from conjugategradient_tpu.ops.pallas.dia_spmv import dia_spmv_pallas

    dia = DIAMatrix.from_csr(poisson)
    x = jnp.asarray(rng.standard_normal(poisson.shape[1]), jnp.float32)
    y_ref = np.asarray(poisson.matvec(jnp.asarray(x, jnp.float64)))
    y_pal = np.asarray(
        dia_spmv_pallas(
            jnp.asarray(dia.diags, jnp.float32), dia.offsets, x,
            interpret=True, block_len=64,
        )
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-4, atol=1e-4)


def test_pallas_dia_nonaligned_n(rng):
    from conjugategradient_tpu.ops.pallas.dia_spmv import dia_spmv_pallas

    rows, cols, vals, shape = banded_spd_coo(333, bandwidth=7, seed=6)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    dia = DIAMatrix.from_csr(csr)
    x = jnp.asarray(rng.standard_normal(shape[1]), jnp.float32)
    y_ref = np.asarray(csr.matvec(x))
    y_pal = np.asarray(
        dia_spmv_pallas(dia.diags, dia.offsets, x, interpret=True, block_len=128)
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-4, atol=1e-4)


def test_pallas_dia_2d_interpret(poisson, rng):
    from conjugategradient_tpu.ops.pallas.dia_spmv import dia_spmv_pallas_2d

    dia = DIAMatrix.from_csr(poisson)
    x = jnp.asarray(rng.standard_normal(poisson.shape[1]), jnp.float32)
    y_ref = np.asarray(poisson.matvec(jnp.asarray(x, jnp.float64)))
    y_pal = np.asarray(
        dia_spmv_pallas_2d(
            jnp.asarray(dia.diags, jnp.float32), dia.offsets, x,
            interpret=True, block_len=1024,
        )
    )
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-4, atol=1e-4)


def test_pallas_dia_2d_lane_crossing_offsets(rng):
    """Offsets spanning lane-tile boundaries (|off| ≥ 128) exercise the
    row-shift + lane-roll + blend decomposition."""
    from conjugategradient_tpu.ops.pallas.dia_spmv import dia_spmv_pallas_2d

    n = 2048
    offsets = (-300, -128, -1, 0, 1, 127, 128, 300)
    diags = np.zeros((len(offsets), n), np.float32)
    rows = np.arange(n)
    dense = np.zeros((n, n), np.float32)
    for d, off in enumerate(offsets):
        cols = rows + off
        valid = (cols >= 0) & (cols < n)
        v = rng.standard_normal(int(valid.sum())).astype(np.float32)
        diags[d, valid] = v
        dense[rows[valid], cols[valid]] = v
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(
        dia_spmv_pallas_2d(
            jnp.asarray(diags), offsets, jnp.asarray(x),
            interpret=True, block_len=1024,
        )
    )
    np.testing.assert_allclose(y, dense @ x, rtol=2e-4, atol=2e-4)
