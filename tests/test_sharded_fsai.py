"""Row-sharded FSAI (parallel/sharded_fsai.py) on 8 virtual CPU devices.

Design invariant: the sharded builder consumes the SAME host factor as the
single-device ``fsai_preconditioner`` (both call solver.fsai._build_g_host),
so the apply is pinned to f64 roundoff against the host Gᵀ(G r) and sharded
FSAI-PCG to the single-device iteration count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from conjugategradient_tpu import cg_solve, fsai_preconditioner
from conjugategradient_tpu.parallel import (
    make_row_mesh,
    sharded_cg_solve,
    sharded_fsai_preconditioner,
)
from conjugategradient_tpu.parallel.partition import partition_csr_rows
from conjugategradient_tpu.problems import poisson2d_coo, powerlaw_spd_coo
from conjugategradient_tpu.types import CSRMatrix

N_DEV = 8


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _scipy_csr(A: CSRMatrix):
    import scipy.sparse as sp

    return sp.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=tuple(A.shape),
    )


def _poisson(nx=40):
    rows, cols, vals, shape = poisson2d_coo(nx)
    return CSRMatrix.from_coo(rows, cols, vals, shape), shape[0]


def _partition(A: CSRMatrix, bm=8, bn=8):
    A_sp = _scipy_csr(A)
    return partition_csr_rows(
        A_sp.data, A_sp.indices, A_sp.indptr, tuple(A.shape), N_DEV,
        bm=bm, bn=bn,
    )


def _sharded_apply(pre, r_padded):
    mesh = make_row_mesh()

    def run(*arrs):
        shards = [a[0] for a in arrs[:-1]]
        return pre.make_local_apply(shards)(arrs[-1])

    f = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(P("rows"),) * (len(pre.op_arrays) + 1),
        out_specs=P("rows"), check_vma=False,
    ))
    put = lambda a: jax.device_put(jnp.asarray(a),
                                   NamedSharding(mesh, P("rows")))
    return np.asarray(f(*[put(a) for a in pre.op_arrays], put(r_padded)))


@pytest.mark.parametrize("power", [1, 2])
def test_sharded_apply_matches_host_factor(power):
    A, n = _poisson(40)
    _, _, n_padded = _partition(A)
    pre = sharded_fsai_preconditioner(
        A, N_DEV, n_padded, power=power, dtype=jnp.float64)
    M = fsai_preconditioner(A, power=power, dtype=jnp.float64)
    assert pre.nnz == M.nnz
    r = np.zeros(n_padded)
    r[:n] = np.random.default_rng(0).standard_normal(n)
    got = _sharded_apply(pre, r)
    want = M.G_host.T @ (M.G_host @ r[:n])
    np.testing.assert_allclose(
        got[:n], want, rtol=1e-11, atol=1e-13 * np.abs(want).max()
    )
    # padded rows must stay exactly zero through both factor passes
    assert got[n:].size == 0 or np.abs(got[n:]).max() == 0.0


def test_sharded_apply_scattered_pattern():
    rows, cols, vals, shape = powerlaw_spd_coo(3000, seed=3)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    n = shape[0]
    _, _, n_padded = _partition(A)
    pre = sharded_fsai_preconditioner(A, N_DEV, n_padded, dtype=jnp.float64)
    M = fsai_preconditioner(A, dtype=jnp.float64)
    r = np.zeros(n_padded)
    r[:n] = np.random.default_rng(1).standard_normal(n)
    got = _sharded_apply(pre, r)
    want = M.G_host.T @ (M.G_host @ r[:n])
    np.testing.assert_allclose(
        got[:n], want, rtol=1e-10, atol=1e-12 * np.abs(want).max()
    )


def test_sharded_fsai_pcg_matches_single_device_iterations():
    A, n = _poisson(40)
    blocks, bcols, n_padded = _partition(A)
    b = np.zeros(n_padded)
    b[:n] = np.random.default_rng(2).standard_normal(n)
    b = jnp.asarray(b)
    tol = 1e-9 * float(jnp.linalg.norm(b))

    M = fsai_preconditioner(A, dtype=jnp.float64)
    x1, i1 = cg_solve(A, b[:n], tol=tol, M=M)
    mesh = make_row_mesh()
    pre = sharded_fsai_preconditioner(A, N_DEV, n_padded, dtype=jnp.float64)
    x2, i2 = sharded_cg_solve(
        blocks, bcols, b, mesh=mesh, tol=tol, M_local=pre,
        use_fused="never",
    )
    assert bool(i2.converged)
    assert int(i2.iterations) == int(i1.iterations)
    np.testing.assert_allclose(
        np.asarray(x2)[:n], np.asarray(x1), rtol=1e-8, atol=1e-10
    )
    k = int(i1.iterations)
    np.testing.assert_allclose(
        np.asarray(i2.rho_history)[: k + 1],
        np.asarray(i1.rho_history)[: k + 1],
        rtol=1e-7,
    )


def test_sharded_fsai_beats_plain_sharded_cg():
    A, n = _poisson(48)
    blocks, bcols, n_padded = _partition(A)
    b = np.zeros(n_padded)
    b[:n] = np.random.default_rng(3).standard_normal(n)
    b = jnp.asarray(b)
    tol = 1e-8 * float(jnp.linalg.norm(b))
    mesh = make_row_mesh()
    _, plain = sharded_cg_solve(blocks, bcols, b, mesh=mesh, tol=tol,
                                use_fused="never")
    pre = sharded_fsai_preconditioner(A, N_DEV, n_padded, dtype=jnp.float64)
    _, fs = sharded_cg_solve(blocks, bcols, b, mesh=mesh, tol=tol,
                             M_local=pre, use_fused="never")
    assert bool(fs.converged)
    assert int(fs.iterations) < int(plain.iterations)


def test_geometry_validation():
    A, n = _poisson(10)
    with pytest.raises(ValueError, match="divisible"):
        sharded_fsai_preconditioner(A, 8, n_padded=101)
    with pytest.raises(ValueError, match="n_padded"):
        sharded_fsai_preconditioner(A, 8, n_padded=8)
