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


def test_sharded_dia_ring_halo_matches_single_device():
    from conjugategradient_tpu.parallel import partition_dia_rows, sharded_dia_cg_solve
    from conjugategradient_tpu.types import DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(280, bandwidth=6, seed=12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    dia = DIAMatrix.from_csr(A)
    n = shape[0]
    b = reference_rhs(n)
    x_ref, info_ref = cg_solve(A, jnp.asarray(b), tol=1e-10)

    diags_sh, n_pad = partition_dia_rows(np.asarray(dia.diags), shape, N_DEV)
    b_pad = jnp.zeros((n_pad,), jnp.float64).at[:n].set(jnp.asarray(b))
    x_sh, info_sh = sharded_dia_cg_solve(
        diags_sh, dia.offsets, b_pad, tol=1e-10, maxiter=n + 1
    )
    assert int(info_sh.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
    )


def test_sharded_jacobi_pcg():
    from conjugategradient_tpu.solver import jacobi_preconditioner

    rows, cols, vals, shape = banded_spd_coo(300, bandwidth=5, seed=13)
    A, blocks, bcols, b_pad, n = _sharded_setup(rows, cols, vals, shape)
    x_ref, info_ref = cg_solve(
        A, jnp.asarray(reference_rhs(n)), tol=1e-9, M=jacobi_preconditioner(A)
    )
    diag = np.asarray(A.diagonal())
    inv_diag = np.ones(b_pad.shape[0])
    inv_diag[:n] = 1.0 / diag
    x_sh, info_sh = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-9, maxiter=n + 1,
        inv_diag=jnp.asarray(inv_diag),
    )
    assert int(info_sh.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-7, atol=1e-9
    )


def test_ring_halo_unit():
    from functools import partial
    from conjugategradient_tpu.parallel import make_row_mesh, ring_halo

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_row_mesh(jax.devices()[:4])
    x = jnp.arange(16.0)

    f = shard_map(
        lambda v: ring_halo(v, 2, "rows"),
        mesh=mesh, in_specs=P("rows"), out_specs=P("rows"),
    )
    out = np.asarray(f(x)).reshape(4, 8)
    # shard 1 owns [4..8); halo = [2,3] + [4,5,6,7] + [8,9]
    np.testing.assert_array_equal(out[1], [2, 3, 4, 5, 6, 7, 8, 9])
    # shard 0's left halo and shard 3's right halo are zeros
    np.testing.assert_array_equal(out[0][:2], [0, 0])
    np.testing.assert_array_equal(out[3][-2:], [0, 0])


def test_sharded_stencil_matches_single_device():
    from conjugategradient_tpu import StencilOperator
    from conjugategradient_tpu.parallel import sharded_stencil_cg_solve

    grid = (16, 6, 10)  # nx divisible by 8 shards
    op = StencilOperator.poisson(grid, dtype=jnp.float64)
    n = op.shape[0]
    b = jnp.asarray(reference_rhs(n)) / n
    x_ref, info_ref = cg_solve(op, b, tol=1e-10)

    x_sh, info_sh = sharded_stencil_cg_solve(grid, b, tol=1e-10, maxiter=n + 1)
    assert int(info_sh.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh), np.asarray(x_ref), rtol=1e-9, atol=1e-11
    )


def test_sharded_stencil_validates_divisibility():
    from conjugategradient_tpu.parallel import sharded_stencil_cg_solve

    with pytest.raises(ValueError, match="divisible"):
        sharded_stencil_cg_solve((10, 4, 4), jnp.ones((160,)), maxiter=2)


def test_sharded_maxiter_zero_and_converged_flags():
    from conjugategradient_tpu.parallel import sharded_stencil_cg_solve

    grid = (16, 4, 4)
    n = 16 * 4 * 4
    b = jnp.asarray(reference_rhs(n)) / n
    x, info = sharded_stencil_cg_solve(grid, b, tol=0.0, maxiter=0)
    assert int(info.iterations) == 0
    assert not bool(info.converged)


def test_sharded_solve_cache_reuse():
    """Second identical solve must reuse the compiled function."""
    from conjugategradient_tpu.parallel import sharded_stencil_cg_solve
    from conjugategradient_tpu.parallel.sharded_cg import _SOLVE_CACHE

    grid = (16, 4, 4)
    n = 16 * 4 * 4
    b = jnp.asarray(reference_rhs(n)) / n
    before = len(_SOLVE_CACHE)
    x1, i1 = sharded_stencil_cg_solve(grid, b, tol=1e-10, maxiter=n + 1)
    after_first = len(_SOLVE_CACHE)
    x2, i2 = sharded_stencil_cg_solve(grid, b, tol=1e-10, maxiter=n + 1)
    assert len(_SOLVE_CACHE) == after_first >= before + 1
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_ring_halo_validates_width():
    from conjugategradient_tpu.parallel import make_row_mesh, ring_halo

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_row_mesh(jax.devices()[:4])
    x = jnp.arange(16.0)
    with pytest.raises(ValueError, match="halo width"):
        f = shard_map(
            lambda v: ring_halo(v, 5, "rows"),  # w=5 > local length 4
            mesh=mesh, in_specs=P("rows"), out_specs=P("rows"),
        )
        f(x)


def test_sharded_fused_kernels_match_xla_path():
    """The fused per-shard iteration (bell_spmv_dot + fused_update_dot with
    psum'd partials) must match the XLA sharded path exactly."""
    rows, cols, vals, shape = poisson2d_coo(32)  # 1024 rows -> 128/shard
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=128, bn=128,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
    )
    x_ref, i_ref = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-4, maxiter=n + 1,
        use_fused="never",
    )
    x_f, i_f = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-4, maxiter=n + 1,
        use_fused="always", interpret=True,
    )
    assert int(i_f.iterations) == int(i_ref.iterations)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               rtol=1e-3, atol=1e-5)
    k = int(i_ref.iterations)
    h_ref = np.asarray(i_ref.rho_history)[:k]
    h_f = np.asarray(i_f.rho_history)[:k]
    sel = h_ref > h_ref[0] * 1e-10  # outside the converged tail
    np.testing.assert_allclose(h_f[sel], h_ref[sel], rtol=1e-4)


def test_sharded_pipelined_single_psum_matches_standard():
    """Chronopoulos–Gear single-sync CG (one psum of [γ, δ] per iteration)
    must match the two-psum standard path's iterations and solution."""
    rows, cols, vals, shape = poisson2d_coo(20)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    x_s, i_s = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-10, maxiter=n + 1
    )
    x_p, i_p = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-10, maxiter=n + 1,
        method="pipelined",
    )
    assert int(i_p.iterations) == int(i_s.iterations)
    assert bool(i_p.converged)
    np.testing.assert_allclose(
        np.asarray(x_p[:n]), np.asarray(x_s[:n]), rtol=1e-8, atol=1e-10
    )


def test_sharded_pipelined_pcg_matches_standard_pcg():
    """Ghysels–Vanroose pipelined PCG (one psum of [γ, δ, ‖r‖²] per
    iteration) must match the two-psum standard Jacobi-PCG path."""
    from conjugategradient_tpu import jacobi_preconditioner

    rows, cols, vals, shape = poisson2d_coo(20)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    inv_diag = jnp.zeros((n_pad,)).at[:n].set(1.0 / A.diagonal())
    x_s, i_s = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-10,
        maxiter=n + 1, inv_diag=inv_diag, use_fused="never",
    )
    x_p, i_p = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-10,
        maxiter=n + 1, inv_diag=inv_diag, method="pipelined",
    )
    assert int(i_p.iterations) == int(i_s.iterations)
    assert bool(i_p.converged)
    np.testing.assert_allclose(
        np.asarray(x_p[:n]), np.asarray(x_s[:n]), rtol=1e-8, atol=1e-10
    )
    # history parity outside the converged tail (both record ‖r_k‖²)
    k = int(i_s.iterations)
    h_s = np.asarray(i_s.rho_history)[:k]
    h_p = np.asarray(i_p.rho_history)[:k]
    sel = h_s > h_s[0] * 1e-12
    np.testing.assert_allclose(h_p[sel], h_s[sel], rtol=1e-6)


def test_sharded_pipelined_m_local_and_sstep_rejection():
    """General M_local callables ride the pipelined loop too; s-step
    stays unpreconditioned."""
    rows, cols, vals, shape = poisson2d_coo(12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    inv_diag = jnp.zeros((n_pad,)).at[:n].set(1.0 / A.diagonal())
    x_ref, i_ref = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-10,
        maxiter=n + 1, inv_diag=inv_diag, method="pipelined",
    )
    d_host = np.asarray(inv_diag).reshape(N_DEV, -1)

    def make_apply(shards):
        (d_s,) = shards
        return lambda r: d_s * r

    from conjugategradient_tpu.parallel import ShardedPreconditioner

    M_local = ShardedPreconditioner(
        op_arrays=(jnp.asarray(d_host),), make_local_apply=make_apply,
    )
    x_m, i_m = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-10,
        maxiter=n + 1, M_local=M_local, method="pipelined",
    )
    assert int(i_m.iterations) == int(i_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_m[:n]), np.asarray(x_ref[:n]), rtol=1e-10, atol=1e-12
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sstep"):
        sharded_cg_solve(
            jnp.asarray(blocks), jnp.asarray(bcols), b,
            inv_diag=inv_diag, method="sstep",
        )


def _sell_setup(n=600, dtype=np.float64):
    from conjugategradient_tpu.parallel import partition_sell_rows
    from conjugategradient_tpu.problems import powerlaw_spd_coo

    rows, cols, vals, shape = powerlaw_spd_coo(n, avg_degree=4.0, seed=7)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=dtype)
    sell_sharded = partition_sell_rows(
        np.asarray(A.data),
        np.asarray(A.indices),
        np.asarray(A.indptr),
        shape,
        N_DEV,
    )
    n_pad = sell_sharded[-1]
    b = reference_rhs(n, dtype=dtype)
    b_pad = jnp.zeros((n_pad,), dtype).at[:n].set(jnp.asarray(b))
    return A, sell_sharded, b_pad, n


def test_partition_sell_rows_matvec_equivalence(rng):
    """The stacked per-shard SELL blocks applied shard-by-shard must equal
    the global CSR matvec (bucket padding and virtual rows inert)."""
    A, sell_sharded, b_pad, n = _sell_setup(500)
    diag, pos, cols_flat, vals_flat, meta, n_pad = sell_sharded
    m = n_pad // N_DEV
    x = rng.standard_normal(n_pad)
    x[n:] = 0.0
    y = np.zeros(n_pad)
    for s in range(N_DEV):
        prods = vals_flat[s] * x[cols_flat[s]]
        parts, base = [], 0
        for nb, k in meta:
            if k == 0:
                parts.append(np.zeros(nb))
                continue
            parts.append(prods[base : base + nb * k].reshape(nb, k).sum(axis=1))
            base += nb * k
        y_sorted = np.concatenate(parts)
        y[s * m : (s + 1) * m] = diag[s] * x[s * m : (s + 1) * m] + y_sorted[pos[s]]
    y_ref = np.asarray(A.matvec(jnp.asarray(x[:n])))
    np.testing.assert_allclose(y[:n], y_ref, rtol=1e-12, atol=1e-12)
    assert np.all(y[n:] == 0)


def test_sharded_sell_matches_single_device():
    """Scattered-pattern sharded CG (config 5 on power-law matrices): the
    all-gather + flat-gather path must track the single-device SELL solve
    iteration-for-iteration."""
    from conjugategradient_tpu.parallel import sharded_sell_cg_solve
    from conjugategradient_tpu.types import SellMatrix

    A, sell_sharded, b_pad, n = _sell_setup(600)
    sell = SellMatrix.from_csr(A)
    x_ref, info_ref = cg_solve(sell, jnp.asarray(reference_rhs(n)), tol=1e-10)
    x_sh, info_sh = sharded_sell_cg_solve(sell_sharded, b_pad, tol=1e-10, maxiter=n + 1)
    assert bool(info_sh.converged)
    assert int(info_sh.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
    )


def test_sharded_sell_jacobi_pcg():
    from conjugategradient_tpu.parallel import sharded_sell_cg_solve

    A, sell_sharded, b_pad, n = _sell_setup(400)
    n_pad = b_pad.shape[0]
    d = np.ones(n_pad)
    d[:n] = np.asarray(A.diagonal())
    inv_d_ref = jnp.asarray(1.0 / d[:n])
    x_ref, info_ref = cg_solve(
        A, jnp.asarray(reference_rhs(n)), tol=1e-10, M=lambda r: inv_d_ref * r
    )
    x_sh, info_sh = sharded_sell_cg_solve(
        sell_sharded, b_pad, tol=1e-10, maxiter=n + 1,
        inv_diag=jnp.asarray(1.0 / d),
    )
    assert bool(info_sh.converged)
    assert int(info_sh.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
    )


def test_sharded_sell_pipelined():
    from conjugategradient_tpu.parallel import sharded_sell_cg_solve

    A, sell_sharded, b_pad, n = _sell_setup(400)
    x_sh, info_sh = sharded_sell_cg_solve(
        sell_sharded, b_pad, tol=1e-10, maxiter=n + 1, method="pipelined"
    )
    assert bool(info_sh.converged)
    r = np.asarray(reference_rhs(n)) - np.asarray(A.matvec(x_sh[:n]))
    assert np.linalg.norm(r) < 1e-9 * max(1.0, np.linalg.norm(reference_rhs(n)))


def test_sharded_batched_bell_matches_single_device_lockstep(rng):
    """Mesh × lanes composition: the row-sharded multi-RHS solve must track
    the single-device lockstep loop per lane (same recurrences, psum'd
    partial dots instead of full-array dots)."""
    from conjugategradient_tpu import cg_solve_batched
    from conjugategradient_tpu.parallel import sharded_cg_solve_batched
    from conjugategradient_tpu.types import BlockedEllMatrix

    rows, cols, vals, shape = poisson2d_coo(16)
    A, blocks, bcols, b_pad, n = _sharded_setup(rows, cols, vals, shape)
    n_pad = b_pad.shape[0]
    R = 3
    B = np.zeros((R, n_pad))
    B[:, :n] = rng.standard_normal((R, n))
    B = jnp.asarray(B)
    X, info = sharded_cg_solve_batched(blocks, bcols, B, tol=1e-10, maxiter=n + 1)
    assert X.shape == (R, n_pad)

    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=128)
    Xr, infor = cg_solve_batched(bell, B[:, :n], tol=1e-10, maxiter=n + 1)
    for i in range(R):
        assert bool(info.converged[i])
        assert int(info.iterations[i]) == int(infor.iterations[i])
        np.testing.assert_allclose(
            np.asarray(X[i, :n]), np.asarray(Xr[i]), rtol=1e-8, atol=1e-9
        )


def test_sharded_batched_sell_with_jacobi_and_per_lane_tol(rng):
    """Scattered-pattern sharded multi-RHS: Jacobi + per-lane tolerances;
    each lane must satisfy ITS residual target."""
    from conjugategradient_tpu.parallel import sharded_sell_cg_solve_batched

    A, sell_sharded, b_pad, n = _sell_setup(400)
    n_pad = b_pad.shape[0]
    R = 2
    B = np.zeros((R, n_pad))
    B[:, :n] = rng.standard_normal((R, n))
    B = jnp.asarray(B)
    d = np.ones(n_pad)
    d[:n] = np.asarray(A.diagonal())
    tols = jnp.asarray([1e-9, 1e-4])
    X, info = sharded_sell_cg_solve_batched(
        sell_sharded, B, tol=tols, maxiter=n + 1,
        inv_diag=jnp.asarray(1.0 / d),
    )
    assert bool(jnp.all(info.converged))
    assert int(info.iterations[1]) < int(info.iterations[0])
    for i in range(R):
        r = np.asarray(B[i, :n]) - np.asarray(A.matvec(X[i, :n]))
        assert np.linalg.norm(r) <= 1.05 * float(tols[i])


def test_sharded_batched_dia_ring_matches_single_device_lockstep(rng):
    """The banded mesh × lanes variant: ring halo moving all R lanes'
    boundary slabs; per-lane parity vs the single-device lockstep loop."""
    from conjugategradient_tpu import cg_solve_batched
    from conjugategradient_tpu.parallel import (
        partition_dia_rows,
        sharded_dia_cg_solve_batched,
    )
    from conjugategradient_tpu.types import DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(280, bandwidth=6, seed=21)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    dia = DIAMatrix.from_csr(A)
    n = shape[0]
    diags_sh, n_pad = partition_dia_rows(np.asarray(dia.diags), shape, N_DEV)
    R = 3
    B = np.zeros((R, n_pad))
    B[:, :n] = rng.standard_normal((R, n))
    B = jnp.asarray(B)
    X, info = sharded_dia_cg_solve_batched(
        jnp.asarray(diags_sh), dia.offsets, B, tol=1e-10, maxiter=n + 1
    )
    assert X.shape == (R, n_pad)
    Xr, infor = cg_solve_batched(dia, B[:, :n], tol=1e-10, maxiter=n + 1)
    for i in range(R):
        assert bool(info.converged[i])
        assert int(info.iterations[i]) == int(infor.iterations[i])
        np.testing.assert_allclose(
            np.asarray(X[i, :n]), np.asarray(Xr[i]), rtol=1e-8, atol=1e-9
        )


def test_sharded_restart_matches_single_device_restart():
    """Residual-replacement full restart on the mesh (round-3: the f32
    recurrence-drift fix was single-device-only) — iteration-identical to
    solver/cg.py's restart path."""
    rows, cols, vals, shape = poisson2d_coo(20)
    A, blocks, bcols, b_pad, n = _sharded_setup(rows, cols, vals, shape)
    every = 7
    x_ref, info_ref = cg_solve(
        A, jnp.asarray(reference_rhs(n)), tol=1e-10, recompute_r_every=every,
        fused="never",
    )
    x_sh, info_sh = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-10, maxiter=n + 1,
        recompute_r_every=every,
    )
    assert int(info_sh.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
    )
    k = int(info_ref.iterations)
    h_ref = np.asarray(info_ref.rho_history)[:k]
    h_sh = np.asarray(info_sh.rho_history)[:k]
    # cutoff above the f64 stagnation floor: past ~1e-15 relative the
    # history is summation-order roundoff noise (restart replaces the
    # recurrence with the true residual, which bounces chaotically there)
    sel = h_ref > h_ref[0] * 1e-15
    np.testing.assert_allclose(h_sh[sel], h_ref[sel], rtol=1e-4)
    # the restart actually fired: histories differ from the no-restart solve
    _, info_plain = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-10, maxiter=n + 1
    )
    kp = min(k, int(info_plain.iterations))
    assert not np.allclose(
        np.asarray(info_sh.rho_history)[:kp],
        np.asarray(info_plain.rho_history)[:kp],
        rtol=1e-12,
    )


def test_sharded_restart_rejects_sstep_and_forced_fused():
    # pipelined composes with recompute_r_every since round 4 (the GV
    # drift fix — see test_sharded_pipelined_residual_replacement);
    # sstep/minres and the fused loop still reject it
    rows, cols, vals, shape = poisson2d_coo(8)
    A, blocks, bcols, b_pad, n = _sharded_setup(rows, cols, vals, shape)
    with pytest.raises(ValueError, match="residual-replacement"):
        sharded_cg_solve(blocks, bcols, b_pad, method="sstep",
                         recompute_r_every=5)
    with pytest.raises(ValueError, match="residual-replacement"):
        sharded_cg_solve(blocks, bcols, b_pad, use_fused="always",
                         recompute_r_every=5)


def test_sharded_batched_restart_matches_solo_restart(rng):
    """Lane-masked restart in the mesh x lanes loop: each lane's iteration
    count and history match a solo solve with the same restart interval."""
    from conjugategradient_tpu.parallel import sharded_cg_solve_batched

    rows, cols, vals, shape = poisson2d_coo(16)
    A, blocks, bcols, b_pad, n = _sharded_setup(rows, cols, vals, shape)
    R = 3
    every = 6
    B = np.zeros((R, b_pad.shape[0]))
    B[:, :n] = rng.standard_normal((R, n))
    # widen the lane spread so lanes freeze at different iterations
    B[1] *= 100.0
    B = jnp.asarray(B)
    X, info = sharded_cg_solve_batched(
        blocks, bcols, B, tol=1e-9, maxiter=n + 1, recompute_r_every=every
    )
    for i in range(R):
        x_i, info_i = cg_solve(
            A, B[i, :n], tol=1e-9, recompute_r_every=every, fused="never"
        )
        assert int(info.iterations[i]) == int(info_i.iterations)
        np.testing.assert_allclose(
            np.asarray(X[i, :n]), np.asarray(x_i), rtol=1e-7, atol=1e-8
        )
        k = int(info_i.iterations)
        h_lane = np.asarray(info.rho_history)[i, :k]
        h_solo = np.asarray(info_i.rho_history)[:k]
        sel = h_solo > h_solo[0] * 1e-20
        np.testing.assert_allclose(h_lane[sel], h_solo[sel], rtol=1e-4)


def test_sharded_fused_pcg_matches_xla_path():
    """Round-3: Jacobi-PCG on the fused per-shard kernels
    (fused_update_dot_pcg partials psum'd) must match the XLA sharded PCG
    path exactly — previously with_m silently fell back to XLA."""
    rows, cols, vals, shape = poisson2d_coo(32)  # 1024 rows -> 128/shard
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=128, bn=128,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32)) / n
    )
    inv_diag = jnp.ones((n_pad,), jnp.float32).at[:n].set(
        1.0 / jnp.asarray(np.asarray(A.diagonal()), jnp.float32)
    )
    x_ref, i_ref = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-4, maxiter=n + 1,
        use_fused="never", inv_diag=inv_diag,
    )
    x_f, i_f = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-4, maxiter=n + 1,
        use_fused="always", interpret=True, inv_diag=inv_diag,
    )
    assert int(i_f.iterations) == int(i_ref.iterations)
    assert bool(i_f.converged)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               rtol=1e-3, atol=1e-5)
    k = int(i_ref.iterations)
    h_ref = np.asarray(i_ref.rho_history)[:k]
    h_f = np.asarray(i_f.rho_history)[:k]
    sel = h_ref > h_ref[0] * 1e-10
    np.testing.assert_allclose(h_f[sel], h_ref[sel], rtol=1e-4)
    # sanity that M actually applied inside the fused kernels: for interior
    # Poisson rows diag=4, so rho = r·M⁻¹r ≈ ‖r‖²/4 — far from rnorm_sq
    assert float(i_f.rho) < 0.5 * float(i_f.rnorm_sq)


def test_sharded_batched_bell_block_matches_single_device_blockcg(rng):
    """method="block" on the mesh: the psum'd R×R Gram blocks must reproduce
    the single-device block CG (solver/blockcg.py) — same shared-Krylov
    recurrences, so per-lane iteration counts and solutions match."""
    from conjugategradient_tpu import block_cg_solve
    from conjugategradient_tpu.parallel import sharded_cg_solve_batched
    from conjugategradient_tpu.types import BlockedEllMatrix

    rows, cols, vals, shape = poisson2d_coo(16)
    A, blocks, bcols, b_pad, n = _sharded_setup(rows, cols, vals, shape)
    n_pad = b_pad.shape[0]
    R = 3
    B = np.zeros((R, n_pad))
    B[:, :n] = rng.standard_normal((R, n))
    B = jnp.asarray(B)
    X, info = sharded_cg_solve_batched(
        blocks, bcols, B, tol=1e-10, maxiter=n + 1, method="block"
    )
    assert X.shape == (R, n_pad)

    bell = BlockedEllMatrix.from_csr(A, bm=8, bn=128)
    Xr, infor = block_cg_solve(bell, B[:, :n], tol=1e-10, maxiter=n + 1)
    for i in range(R):
        assert bool(info.converged[i])
        assert int(info.iterations[i]) == int(infor.iterations[i])
        np.testing.assert_allclose(
            np.asarray(X[i, :n]), np.asarray(Xr[i]), rtol=1e-8, atol=1e-9
        )
    # the whole point: fewer block iterations than independent-lane solves
    from conjugategradient_tpu import cg_solve_batched

    _, info_l = cg_solve_batched(bell, B[:, :n], tol=1e-10, maxiter=n + 1)
    assert int(jnp.max(info.iterations)) < int(jnp.max(info_l.iterations))


def test_sharded_batched_sell_block_jacobi_and_restart(rng):
    """Block method on the scattered SELL layout with Jacobi + periodic
    residual replacement: parity vs single-device preconditioned block CG."""
    from conjugategradient_tpu import block_cg_solve
    from conjugategradient_tpu.parallel import sharded_sell_cg_solve_batched
    from conjugategradient_tpu.types import SellMatrix

    A, sell_sharded, b_pad, n = _sell_setup(400)
    n_pad = b_pad.shape[0]
    R = 2
    B = np.zeros((R, n_pad))
    B[:, :n] = rng.standard_normal((R, n))
    B = jnp.asarray(B)
    d = np.ones(n_pad)
    d[:n] = np.asarray(A.diagonal())
    inv_diag = jnp.asarray(1.0 / d)
    X, info = sharded_sell_cg_solve_batched(
        sell_sharded, B, tol=1e-9, maxiter=n + 1, inv_diag=inv_diag,
        method="block", recompute_r_every=11,
    )
    assert bool(jnp.all(info.converged))

    sell = SellMatrix.from_csr(A)
    Xr, infor = block_cg_solve(
        sell, B[:, :n], tol=1e-9, maxiter=n + 1,
        M=lambda v: inv_diag[:n] * v, recompute_r_every=11,
    )
    for i in range(R):
        assert int(info.iterations[i]) == int(infor.iterations[i])
        r = np.asarray(B[i, :n]) - np.asarray(A.matvec(X[i, :n]))
        assert np.linalg.norm(r) <= 1.05e-9


def test_sharded_batched_dia_block_matches_single_device_blockcg(rng):
    """Block method on the banded ring-halo layout: per-lane parity vs the
    single-device block CG on the same DIA operator."""
    from conjugategradient_tpu import block_cg_solve
    from conjugategradient_tpu.parallel import (
        partition_dia_rows,
        sharded_dia_cg_solve_batched,
    )
    from conjugategradient_tpu.types import DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(280, bandwidth=6, seed=21)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    dia = DIAMatrix.from_csr(A)
    n = shape[0]
    diags_sh, n_pad = partition_dia_rows(np.asarray(dia.diags), shape, N_DEV)
    R = 3
    B = np.zeros((R, n_pad))
    B[:, :n] = rng.standard_normal((R, n))
    B = jnp.asarray(B)
    X, info = sharded_dia_cg_solve_batched(
        jnp.asarray(diags_sh), dia.offsets, B, tol=1e-10, maxiter=n + 1,
        method="block",
    )
    Xr, infor = block_cg_solve(dia, B[:, :n], tol=1e-10, maxiter=n + 1)
    for i in range(R):
        assert bool(info.converged[i])
        assert int(info.iterations[i]) == int(infor.iterations[i])
        np.testing.assert_allclose(
            np.asarray(X[i, :n]), np.asarray(Xr[i]), rtol=1e-8, atol=1e-9
        )


class TestShardedSymBell:
    """Row-sharded SYMMETRIC blocked-ELL (partition_symbell_rows +
    sharded_symbell_cg_solve): intra-shard tiles stored once and mirrored
    locally, cross-shard tiles stored fully — must be iteration-identical
    to the sharded FULL layout and match the single-device solve."""

    def _setup(self, nx=20):
        rows, cols, vals, shape = poisson2d_coo(nx)
        A = CSRMatrix.from_coo(rows, cols, vals, shape)
        from conjugategradient_tpu.parallel import partition_symbell_rows

        parts = partition_symbell_rows(
            np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
            shape, N_DEV, bn=8,
        )
        n = shape[0]
        b_pad = jnp.zeros((parts[-1],)).at[:n].set(
            jnp.asarray(reference_rhs(n))
        )
        return A, parts, b_pad, n

    def test_partition_saves_storage(self):
        A, parts, b_pad, n = self._setup()
        diag, off, offc, cross, crossr, crossc, n_pad = parts
        blocks, bcols, _ = partition_csr_rows(
            np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
            A.shape, N_DEV, bm=8, bn=8,
        )
        sym_tiles = diag.size + off.size + cross.size
        assert sym_tiles < blocks.size

    def test_matches_single_device(self):
        from conjugategradient_tpu.parallel import sharded_symbell_cg_solve

        A, parts, b_pad, n = self._setup()
        diag, off, offc, cross, crossr, crossc, n_pad = parts
        x_ref, i_ref = cg_solve(A, jnp.asarray(reference_rhs(n)), tol=1e-10)
        x_sh, i_sh = sharded_symbell_cg_solve(
            diag, off, offc, cross, crossr, crossc, b_pad, tol=1e-10, maxiter=n + 1
        )
        assert int(i_sh.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(
            np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
        )
        k = int(i_ref.iterations)
        h_ref = np.asarray(i_ref.rho_history)[:k]
        h_sh = np.asarray(i_sh.rho_history)[:k]
        sel = h_ref > h_ref[0] * 1e-20
        np.testing.assert_allclose(h_sh[sel], h_ref[sel], rtol=1e-4)

    def test_matches_sharded_full_layout(self):
        from conjugategradient_tpu.parallel import sharded_symbell_cg_solve

        A, parts, b_pad, n = self._setup()
        diag, off, offc, cross, crossr, crossc, n_pad = parts
        blocks, bcols, _ = partition_csr_rows(
            np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
            A.shape, N_DEV, bm=8, bn=8,
        )
        x_f, i_f = sharded_cg_solve(
            jnp.asarray(blocks), jnp.asarray(bcols), b_pad,
            tol=1e-10, maxiter=n + 1,
        )
        x_s, i_s = sharded_symbell_cg_solve(
            diag, off, offc, cross, crossr, crossc, b_pad, tol=1e-10, maxiter=n + 1
        )
        assert int(i_s.iterations) == int(i_f.iterations)
        np.testing.assert_allclose(
            np.asarray(x_s[:n]), np.asarray(x_f[:n]), rtol=1e-9, atol=1e-10
        )

    def test_jacobi_pcg(self):
        from conjugategradient_tpu.parallel import sharded_symbell_cg_solve
        from conjugategradient_tpu import jacobi_preconditioner

        A, parts, b_pad, n = self._setup()
        diag, off, offc, cross, crossr, crossc, n_pad = parts
        inv_d = np.ones((n_pad,))
        inv_d[:n] = 1.0 / np.asarray(A.diagonal())
        x_ref, i_ref = cg_solve(
            A, jnp.asarray(reference_rhs(n)), tol=1e-10,
            M=jacobi_preconditioner(A),
        )
        x_sh, i_sh = sharded_symbell_cg_solve(
            diag, off, offc, cross, crossr, crossc, b_pad, tol=1e-10, maxiter=n + 1,
            inv_diag=jnp.asarray(inv_d),
        )
        assert int(i_sh.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(
            np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
        )

    def test_pipelined_and_sstep(self):
        from conjugategradient_tpu.parallel import sharded_symbell_cg_solve

        A, parts, b_pad, n = self._setup(nx=12)
        diag, off, offc, cross, crossr, crossc, n_pad = parts
        x_ref, i_ref = cg_solve(A, jnp.asarray(reference_rhs(n)), tol=1e-10)
        for kw in ({"method": "pipelined"}, {"method": "sstep", "s": 1}):
            x_sh, i_sh = sharded_symbell_cg_solve(
                diag, off, offc, cross, crossr, crossc, b_pad, tol=1e-10,
                maxiter=n + 1, **kw,
            )
            assert int(i_sh.iterations) == int(i_ref.iterations), kw
            np.testing.assert_allclose(
                np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-7,
                atol=1e-8, err_msg=str(kw),
            )

    def test_restart_matches_single_device_restart(self):
        from conjugategradient_tpu.parallel import sharded_symbell_cg_solve

        A, parts, b_pad, n = self._setup(nx=12)
        diag, off, offc, cross, crossr, crossc, n_pad = parts
        x_ref, i_ref = cg_solve(
            A, jnp.asarray(reference_rhs(n)), tol=1e-8,
            recompute_r_every=10,
        )
        x_sh, i_sh = sharded_symbell_cg_solve(
            diag, off, offc, cross, crossr, crossc, b_pad, tol=1e-8,
            maxiter=n + 1, recompute_r_every=10,
        )
        assert int(i_sh.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(
            np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
        )


class TestSharded2D:
    """p×p 2-D block decomposition (partition_csr_blocks_2d +
    sharded_cg_solve_2d): mesh-transpose ppermute + column-axis psum
    replace the 1-D all_gather; must be iteration-identical to the
    single-device solve."""

    def _setup(self, nx=20, p=2):
        from conjugategradient_tpu.parallel import (
            make_mesh_2d,
            partition_csr_blocks_2d,
        )

        rows, cols, vals, shape = poisson2d_coo(nx)
        A = CSRMatrix.from_coo(rows, cols, vals, shape)
        blocks, bcols, n_pad = partition_csr_blocks_2d(
            np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
            shape, p, bm=8, bn=8,
        )
        n = shape[0]
        b = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
        return A, blocks, bcols, b, n, make_mesh_2d(p)

    def test_matches_single_device(self):
        from conjugategradient_tpu.parallel import sharded_cg_solve_2d

        A, blocks, bcols, b, n, mesh = self._setup()
        x_ref, i_ref = cg_solve(A, jnp.asarray(reference_rhs(n)), tol=1e-10)
        x, info = sharded_cg_solve_2d(
            blocks, bcols, b, mesh=mesh, tol=1e-10, maxiter=n + 1
        )
        assert int(info.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(
            np.asarray(x[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
        )
        k = int(i_ref.iterations)
        h_ref = np.asarray(i_ref.rho_history)[:k]
        h = np.asarray(info.rho_history)[:k]
        sel = h_ref > h_ref[0] * 1e-20
        np.testing.assert_allclose(h[sel], h_ref[sel], rtol=1e-4)

    def test_jacobi_and_methods(self):
        from conjugategradient_tpu import jacobi_preconditioner
        from conjugategradient_tpu.parallel import sharded_cg_solve_2d

        A, blocks, bcols, b, n, mesh = self._setup(nx=14)
        n_pad = int(b.shape[0])
        inv_d = np.ones((n_pad,))
        inv_d[:n] = 1.0 / np.asarray(A.diagonal())
        x_ref, i_ref = cg_solve(
            A, jnp.asarray(reference_rhs(n)), tol=1e-10,
            M=jacobi_preconditioner(A),
        )
        x, info = sharded_cg_solve_2d(
            blocks, bcols, b, mesh=mesh, tol=1e-10, maxiter=n + 1,
            inv_diag=jnp.asarray(inv_d),
        )
        assert int(info.iterations) == int(i_ref.iterations)
        np.testing.assert_allclose(
            np.asarray(x[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
        )
        x_plain, i_plain = cg_solve(A, jnp.asarray(reference_rhs(n)),
                                    tol=1e-10)
        for kw in ({"method": "pipelined"}, {"method": "sstep", "s": 1}):
            x_m, i_m = sharded_cg_solve_2d(
                blocks, bcols, b, mesh=mesh, tol=1e-10, maxiter=n + 1, **kw
            )
            assert int(i_m.iterations) == int(i_plain.iterations), kw
            np.testing.assert_allclose(
                np.asarray(x_m[:n]), np.asarray(x_plain), rtol=1e-7,
                atol=1e-8, err_msg=str(kw),
            )

    def test_partition_rejects_rect(self):
        from conjugategradient_tpu.parallel import partition_csr_blocks_2d

        with pytest.raises(ValueError, match="square"):
            partition_csr_blocks_2d(
                np.ones(1), np.zeros(1, np.int64), np.array([0, 1, 1]),
                (2, 3), 2,
            )


def test_sharded_pipelined_residual_replacement():
    """recompute_r_every composes with method="pipelined" on the mesh:
    the f32 GV drift stall (solver/pipelined.py) is escaped, and the f64
    replacement trajectory matches single-device exactly."""
    from conjugategradient_tpu import jacobi_preconditioner
    from conjugategradient_tpu.solver.pipelined import pipelined_cg_solve

    rows, cols, vals, shape = poisson2d_coo(34)
    A32 = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A32.data), np.asarray(A32.indices),
        np.asarray(A32.indptr), shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.arange(1, n + 1, dtype=jnp.float32))
    inv_diag = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        1.0 / A32.diagonal())
    _, i_raw = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-3,
        maxiter=n + 1, inv_diag=inv_diag, method="pipelined")
    assert not bool(i_raw.converged)  # f32 GV stall, mesh edition
    x_rr, i_rr = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, tol=1e-3,
        maxiter=n + 1, inv_diag=inv_diag, method="pipelined",
        recompute_r_every=50)
    assert bool(i_rr.converged) and int(i_rr.iterations) < 200

    # f64: sharded replacement == single-device replacement exactly
    A64 = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks64, bcols64, _ = partition_csr_rows(
        np.asarray(A64.data), np.asarray(A64.indices),
        np.asarray(A64.indptr), shape, N_DEV, bm=8, bn=8,
    )
    b64 = jnp.zeros((n_pad,)).at[:n].set(jnp.asarray(reference_rhs(n)))
    inv64 = jnp.zeros((n_pad,)).at[:n].set(1.0 / A64.diagonal())
    x_sh, i_sh = sharded_cg_solve(
        jnp.asarray(blocks64), jnp.asarray(bcols64), b64, tol=1e-10,
        maxiter=n + 1, inv_diag=inv64, method="pipelined",
        recompute_r_every=40)
    M64 = jacobi_preconditioner(A64)
    x_1d, i_1d = pipelined_cg_solve(
        A64, jnp.asarray(reference_rhs(n)), tol=1e-10, M=M64,
        recompute_r_every=40)
    assert int(i_sh.iterations) == int(i_1d.iterations)
    np.testing.assert_allclose(np.asarray(x_sh[:n]), np.asarray(x_1d),
                               rtol=1e-9, atol=1e-11)

    # sstep/minres keep the rejection
    import pytest as _pytest

    with _pytest.raises(ValueError, match="residual-replacement"):
        sharded_cg_solve(jnp.asarray(blocks), jnp.asarray(bcols), b,
                         method="sstep", recompute_r_every=10)
    with _pytest.raises(ValueError, match="residual-replacement"):
        sharded_cg_solve(jnp.asarray(blocks), jnp.asarray(bcols), b,
                         method="minres", recompute_r_every=10)


class TestSharded2DBatched:
    """2-D × multi-RHS composition (round-5 VERDICT item 10): the lockstep
    lanes on the p×p block decomposition must match the single-device
    batched solve per-lane exactly (f64)."""

    def _setup(self, nx=16, p=2, R=3):
        from conjugategradient_tpu.parallel import (
            make_mesh_2d,
            partition_csr_blocks_2d,
        )

        rows, cols, vals, shape = poisson2d_coo(nx)
        A = CSRMatrix.from_coo(rows, cols, vals, shape)
        blocks, bcols, n_pad = partition_csr_blocks_2d(
            np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
            shape, p, bm=8, bn=8,
        )
        n = shape[0]
        rng = np.random.default_rng(11)
        Bd = rng.standard_normal((R, n))
        B = jnp.zeros((R, n_pad)).at[:, :n].set(jnp.asarray(Bd))
        return A, blocks, bcols, B, Bd, n, make_mesh_2d(p)

    def test_matches_single_device_batched_per_lane(self):
        from conjugategradient_tpu import cg_solve_batched
        from conjugategradient_tpu.parallel import sharded_cg_solve_2d_batched
        from conjugategradient_tpu.types import BlockedEllMatrix

        A, blocks, bcols, B, Bd, n, mesh = self._setup()
        bell = BlockedEllMatrix.from_csr(A, bm=8, bn=8)
        X_ref, i_ref = cg_solve_batched(bell, jnp.asarray(Bd), tol=1e-10)
        X, info = sharded_cg_solve_2d_batched(
            blocks, bcols, B, mesh=mesh, tol=1e-10, maxiter=n + 1)
        for i in range(B.shape[0]):
            assert int(info.iterations[i]) == int(i_ref.iterations[i]), i
            np.testing.assert_allclose(
                np.asarray(X[i, :n]), np.asarray(X_ref[i]),
                rtol=1e-8, atol=1e-9)

    def test_per_lane_tol_and_jacobi(self):
        from conjugategradient_tpu.parallel import sharded_cg_solve_2d_batched

        A, blocks, bcols, B, Bd, n, mesh = self._setup(nx=12)
        n_pad = int(B.shape[1])
        inv_d = np.ones((n_pad,))
        inv_d[:n] = 1.0 / np.asarray(A.diagonal())
        tols = jnp.asarray([1e-4, 1e-7, 1e-10])
        X, info = sharded_cg_solve_2d_batched(
            blocks, bcols, B, mesh=mesh, tol=tols, maxiter=n + 1,
            inv_diag=jnp.asarray(inv_d))
        assert bool(jnp.all(info.converged))
        its = np.asarray(info.iterations)
        assert its[0] <= its[1] <= its[2]
        for i in range(3):
            r = np.asarray(Bd[i]) - np.asarray(A.matvec(X[i, :n]))
            assert np.linalg.norm(r) <= 5 * float(tols[i])

    def test_block_method_rides_2d(self):
        from conjugategradient_tpu.parallel import sharded_cg_solve_2d_batched

        A, blocks, bcols, B, Bd, n, mesh = self._setup(nx=12)
        X, info = sharded_cg_solve_2d_batched(
            blocks, bcols, B, mesh=mesh, tol=1e-9, maxiter=n + 1,
            method="block")
        for i in range(B.shape[0]):
            r = np.asarray(Bd[i]) - np.asarray(A.matvec(X[i, :n]))
            assert np.linalg.norm(r) <= 5e-9
