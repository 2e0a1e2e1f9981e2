"""Row-sharded multi-chip CG tests on 8 virtual CPU devices (SURVEY §2.4/§4:
the psum/all_gather path exercised without a pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, cg_solve
from conjugategradient_tpu.parallel import (
    make_row_mesh,
    partition_csr_rows,
    sharded_cg_solve,
)
from conjugategradient_tpu.problems import banded_spd_coo, poisson2d_coo, reference_rhs

N_DEV = 8


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


def _sharded_setup(rows, cols, vals, shape, bm=8, bn=8, dtype=np.float64):
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=dtype)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data),
        np.asarray(A.indices),
        np.asarray(A.indptr),
        shape,
        N_DEV,
        bm=bm,
        bn=bn,
    )
    n = shape[0]
    b = reference_rhs(n, dtype=dtype)
    b_pad = jnp.zeros((n_pad,), dtype).at[:n].set(jnp.asarray(b))
    return A, jnp.asarray(blocks), jnp.asarray(bcols), b_pad, n


def test_sharded_matches_single_device():
    rows, cols, vals, shape = poisson2d_coo(20)
    A, blocks, bcols, b_pad, n = _sharded_setup(rows, cols, vals, shape)
    x_ref, info_ref = cg_solve(A, jnp.asarray(reference_rhs(n)), tol=1e-10)
    x_sh, info_sh = sharded_cg_solve(blocks, bcols, b_pad, tol=1e-10, maxiter=n + 1)
    assert int(info_sh.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
    )
    k = int(info_ref.iterations)
    h_ref = np.asarray(info_ref.rho_history)[:k]
    h_sh = np.asarray(info_sh.rho_history)[:k]
    sel = h_ref > h_ref[0] * 1e-20
    np.testing.assert_allclose(h_sh[sel], h_ref[sel], rtol=1e-4)


def test_sharded_banded():
    rows, cols, vals, shape = banded_spd_coo(300, bandwidth=9, seed=4)
    A, blocks, bcols, b_pad, n = _sharded_setup(rows, cols, vals, shape)
    x_sh, info_sh = sharded_cg_solve(blocks, bcols, b_pad, tol=1e-9, maxiter=n + 1)
    assert bool(info_sh.converged)
    r = np.asarray(reference_rhs(n)) - np.asarray(A.matvec(jnp.asarray(x_sh[:n])))
    assert np.linalg.norm(r) < 1e-7


def test_partition_csr_rows_shapes():
    rows, cols, vals, shape = poisson2d_coo(10)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    assert blocks.shape[0] == N_DEV
    assert bcols.shape[:2] == blocks.shape[:2]
    assert n_pad % (8 * N_DEV) == 0
    assert n_pad >= shape[0]


def test_partition_matvec_equivalence(rng):
    """Stacking the per-shard blocks and multiplying locally reproduces the
    global SpMV (the all-gather halo contract)."""
    rows, cols, vals, shape = poisson2d_coo(12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    x = rng.standard_normal(n)
    ncb_pad = -(-n_pad // 8) * 8
    x_pad = np.zeros(max(n_pad, ncb_pad))
    x_pad[:n] = x
    x2d = jnp.asarray(x_pad[: n_pad].reshape(-1, 8))
    from conjugategradient_tpu.parallel.sharded_cg import _local_bell_matvec

    ys = [
        np.asarray(_local_bell_matvec(jnp.asarray(blocks[s]), jnp.asarray(bcols[s]), x2d))
        for s in range(N_DEV)
    ]
    y = np.concatenate(ys)[:n]
    np.testing.assert_allclose(y, np.asarray(A.matvec(jnp.asarray(x))), rtol=1e-10)


def test_make_row_mesh():
    mesh = make_row_mesh(jax.devices()[:4])
    assert mesh.devices.size == 4
    assert mesh.axis_names == ("rows",)
