"""Sharded algebraic multigrid (parallel/sharded_amg.py) on 8 virtual
CPU devices.

The design invariant is PARITY: the sharded builder consumes the SAME
host hierarchy as the single-device ``smoothed_aggregation_preconditioner``
(both call solver.amg._build_hierarchy), so the tests pin the apply to
f64 roundoff against the single-device apply at every agglomeration
split, and sharded AMG-PCG to the single-device iteration count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from conjugategradient_tpu import cg_solve, smoothed_aggregation_preconditioner
from conjugategradient_tpu.parallel import (
    make_row_mesh,
    sharded_amg_preconditioner,
    sharded_cg_solve,
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


def _poisson(nx=50):
    rows, cols, vals, shape = poisson2d_coo(nx)
    return CSRMatrix.from_coo(rows, cols, vals, shape), shape[0]


def _partition(A: CSRMatrix, bm=8, bn=8):
    A_sp = _scipy_csr(A)
    return partition_csr_rows(
        A_sp.data, A_sp.indices, A_sp.indptr, tuple(A.shape), N_DEV,
        bm=bm, bn=bn,
    )


def _sharded_apply(pre, r_padded):
    """Run the sharded M_local standalone via shard_map; returns the
    assembled result."""
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


@pytest.mark.parametrize(
    "agg_below,kw",
    [
        (10**9, {}),        # whole hierarchy replicated (split=0)
        (600, {}),          # one truly sharded level
        (1, {}),            # every level sharded, coarse-only tail
        (1, {"cycles": 2}),
        (1, {"nu": 1}),
        (1, {"smooth_prolongator": False}),  # P0 transfers both sides
        (1, {"smoother": "chebyshev"}),
        (600, {"smoother": "chebyshev", "nu": 3}),
    ],
)
def test_sharded_apply_matches_single_device(agg_below, kw):
    A, n = _poisson(50)
    _, _, n_padded = _partition(A)
    pre = sharded_amg_preconditioner(
        A, N_DEV, n_padded, agglomerate_below=agg_below,
        dtype=jnp.float64, **kw,
    )
    M = smoothed_aggregation_preconditioner(A, dtype=jnp.float64, **kw)
    assert pre.level_sizes == M.level_sizes
    r = np.zeros(n_padded)
    r[:n] = np.random.default_rng(0).standard_normal(n)
    got = _sharded_apply(pre, r)
    want = np.asarray(M(jnp.asarray(r[:n])))
    np.testing.assert_allclose(
        got[:n], want, rtol=1e-11, atol=1e-13 * np.abs(want).max()
    )
    # padded rows must stay exactly zero through every sweep/transfer
    assert got[n:].size == 0 or np.abs(got[n:]).max() == 0.0


def test_sharded_apply_matches_with_near_nullspace():
    """Near-nullspace (QR tentative prolongator) hierarchies must shard
    identically — the sharded builder consumes the same level_mats, so
    the CSR P/PT transfers carry the mode-preserving columns."""
    import scipy.sparse as sp

    rows, cols, vals, shape = poisson2d_coo(40)
    L = sp.csr_matrix((vals, (rows, cols)), shape=shape)
    rng = np.random.default_rng(9)
    s = np.exp(rng.uniform(-2, 2, shape[0]))
    A_sp = (sp.diags(s) @ L @ sp.diags(s)).tocsr()
    A = CSRMatrix.from_arrays(A_sp.data, A_sp.indices, A_sp.indptr,
                              tuple(shape))
    n = shape[0]
    _, _, n_padded = _partition(A)
    kw = dict(near_nullspace=1.0 / s, dtype=jnp.float64)
    pre = sharded_amg_preconditioner(
        A, N_DEV, n_padded, agglomerate_below=1, **kw)
    M = smoothed_aggregation_preconditioner(A, **kw)
    assert pre.level_sizes == M.level_sizes
    r = np.zeros(n_padded)
    r[:n] = rng.standard_normal(n)
    got = _sharded_apply(pre, r)
    want = np.asarray(M(jnp.asarray(r[:n])))
    np.testing.assert_allclose(
        got[:n], want, rtol=1e-10, atol=1e-12 * np.abs(want).max()
    )


def test_sharded_apply_matches_on_scale_free_graph():
    """The power-law graph trips the densification guard, so the
    hierarchy mixes smoothed and unsmoothed levels — the sharded CSR-P0
    transfers must still match the single-device gather/segment-sum
    path to roundoff."""
    rows, cols, vals, shape = powerlaw_spd_coo(4000, seed=3)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    n = shape[0]
    _, _, n_padded = _partition(A)
    pre = sharded_amg_preconditioner(
        A, N_DEV, n_padded, agglomerate_below=1, dtype=jnp.float64
    )
    M = smoothed_aggregation_preconditioner(A, dtype=jnp.float64)
    assert pre.level_sizes == M.level_sizes
    r = np.zeros(n_padded)
    r[:n] = np.random.default_rng(1).standard_normal(n)
    got = _sharded_apply(pre, r)
    want = np.asarray(M(jnp.asarray(r[:n])))
    np.testing.assert_allclose(
        got[:n], want, rtol=1e-10, atol=1e-12 * np.abs(want).max()
    )


def test_sharded_amg_pcg_matches_single_device_iterations():
    A, n = _poisson(50)
    blocks, bcols, n_padded = _partition(A)
    b = np.zeros(n_padded)
    b[:n] = np.random.default_rng(2).standard_normal(n)
    b = jnp.asarray(b)
    tol = 1e-9 * float(jnp.linalg.norm(b))

    M = smoothed_aggregation_preconditioner(A, dtype=jnp.float64)
    x1, i1 = cg_solve(A, b[:n], tol=tol, M=M)
    mesh = make_row_mesh()
    pre = sharded_amg_preconditioner(
        A, N_DEV, n_padded, agglomerate_below=600, dtype=jnp.float64
    )
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


def test_sharded_amg_pcg_beats_plain_sharded_cg():
    A, n = _poisson(64)
    blocks, bcols, n_padded = _partition(A)
    b = np.zeros(n_padded)
    b[:n] = np.random.default_rng(3).standard_normal(n)
    b = jnp.asarray(b)
    tol = 1e-8 * float(jnp.linalg.norm(b))
    mesh = make_row_mesh()
    _, plain = sharded_cg_solve(blocks, bcols, b, mesh=mesh, tol=tol,
                                use_fused="never")
    pre = sharded_amg_preconditioner(
        A, N_DEV, n_padded, agglomerate_below=600, dtype=jnp.float64
    )
    _, amg = sharded_cg_solve(blocks, bcols, b, mesh=mesh, tol=tol,
                              M_local=pre, use_fused="never")
    assert bool(amg.converged)
    assert int(amg.iterations) <= 20
    assert int(amg.iterations) * 5 < int(plain.iterations)


def test_reuse_compiles_once_and_resolves():
    """Reusing the same ShardedPreconditioner across solves must reuse
    the compiled program (cache keyed on its token) and stay correct."""
    A, n = _poisson(34)
    blocks, bcols, n_padded = _partition(A)
    mesh = make_row_mesh()
    pre = sharded_amg_preconditioner(A, N_DEV, n_padded,
                                     dtype=jnp.float64)
    from conjugategradient_tpu.parallel.sharded_cg import _SOLVE_CACHE

    rng = np.random.default_rng(4)
    sizes_before = None
    tol = 1e-9 * np.sqrt(n)  # fixed: the compiled solve is keyed on tol
    for trial in range(2):
        b = np.zeros(n_padded)
        b[:n] = rng.standard_normal(n)
        b = jnp.asarray(b)
        x, info = sharded_cg_solve(blocks, bcols, b, mesh=mesh, tol=tol,
                                   M_local=pre, use_fused="never")
        assert bool(info.converged)
        A_sp = _scipy_csr(A)
        res = np.linalg.norm(A_sp @ np.asarray(x)[:n] - np.asarray(b)[:n])
        assert res <= 10 * tol
        if trial == 0:
            sizes_before = len(_SOLVE_CACHE)
        else:
            assert len(_SOLVE_CACHE) == sizes_before  # no retrace


def test_validation():
    A, n = _poisson(34)
    blocks, bcols, n_padded = _partition(A)
    mesh = make_row_mesh()
    pre = sharded_amg_preconditioner(A, N_DEV, n_padded,
                                     dtype=jnp.float64)
    b = jnp.zeros((n_padded,), jnp.float64)
    with pytest.raises(ValueError, match="not both"):
        sharded_cg_solve(blocks, bcols, b, mesh=mesh,
                         inv_diag=jnp.ones((n_padded,)), M_local=pre)
    with pytest.raises(ValueError, match="sstep"):
        sharded_cg_solve(blocks, bcols, b, mesh=mesh,
                         method="sstep", M_local=pre)
    # pipelined now COMPOSES with M_local (Ghysels–Vanroose, round 4):
    # the AMG V-cycle rides the single-psum loop
    from conjugategradient_tpu.problems import reference_rhs

    b_real = jnp.zeros((n_padded,), jnp.float64).at[:n].set(
        jnp.asarray(reference_rhs(n)))
    x_gv, i_gv = sharded_cg_solve(blocks, bcols, b_real, mesh=mesh,
                                  method="pipelined", M_local=pre,
                                  tol=1e-8, maxiter=200)
    assert bool(i_gv.converged)
    x_st, i_st = sharded_cg_solve(blocks, bcols, b_real, mesh=mesh,
                                  M_local=pre, tol=1e-8, maxiter=200)
    assert int(i_gv.iterations) == int(i_st.iterations)
    np.testing.assert_allclose(np.asarray(x_gv[:n]), np.asarray(x_st[:n]),
                               rtol=1e-8, atol=1e-10)
    with pytest.raises(ValueError, match="general-M"):
        sharded_cg_solve(blocks, bcols, b, mesh=mesh,
                         use_fused="always", M_local=pre)
    with pytest.raises(ValueError, match="divisible"):
        sharded_amg_preconditioner(A, N_DEV, n_padded + 1)
    with pytest.raises(ValueError, match="n_padded"):
        sharded_amg_preconditioner(A, N_DEV, n - N_DEV)
    with pytest.raises(TypeError, match="M_local"):
        sharded_cg_solve(blocks, bcols, b, mesh=mesh, M_local=42)
