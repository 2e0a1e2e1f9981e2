"""Sharded geometric multigrid (parallel/sharded_multigrid.py) on 8
virtual CPU devices.

The design invariant is PARITY: the sharded V-cycle must compute the same
operator as the single-device ``multigrid_preconditioner`` (same smoothing
order, same transfers, same agglomerated coarse tail), so the tests pin
the apply to f64 roundoff against the single-device apply and the MG-PCG
iteration count to exact equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from conjugategradient_tpu import cg_solve, multigrid_preconditioner
from conjugategradient_tpu.parallel import (
    make_row_mesh,
    sharded_multigrid_preconditioner,
    sharded_stencil_cg_solve,
)
from conjugategradient_tpu.types import StencilOperator

N_DEV = 8


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _sharded_apply(grid_shape, r, **kw):
    """Run the sharded M_local on a full vector via shard_map; returns the
    assembled result."""
    mesh = make_row_mesh()
    M_local = sharded_multigrid_preconditioner(
        grid_shape, N_DEV, dtype=r.dtype, **kw
    )
    f = jax.jit(shard_map(
        M_local, mesh=mesh, in_specs=(P("rows"),), out_specs=P("rows"),
        check_vma=False,
    ))
    r_sh = jax.device_put(r, NamedSharding(mesh, P("rows")))
    return np.asarray(f(r_sh))


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((32, 16, 8), {}),  # small enough that the whole cycle replicates
        ((32, 16, 8), {"agglomerate_below": 1}),  # one truly sharded level
        ((64, 16, 16), {"agglomerate_below": 1}),  # two sharded levels
        ((16, 9, 5), {"center": 6.0, "agglomerate_below": 1}),  # odd y/z
        ((64, 8, 8), {"cycles": 2, "agglomerate_below": 1}),
        ((32, 16, 1), {"center": 4.0, "agglomerate_below": 1}),  # 2-D grid
        ((32, 16, 8), {"smoother": "chebyshev", "agglomerate_below": 1}),
        ((64, 16, 16), {"smoother": "chebyshev", "nu": 3,
                        "agglomerate_below": 1}),
    ],
)
def test_sharded_apply_matches_single_device(shape, kw):
    n = int(np.prod(shape))
    r = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    center = kw.get("center", 6.0)
    op = StencilOperator(
        jnp.asarray(center, jnp.float64), jnp.asarray(-1.0, jnp.float64), shape
    )
    single_kw = {k: v for k, v in kw.items() if k not in ("agglomerate_below", "center")}
    want = np.asarray(multigrid_preconditioner(op, **single_kw)(r))
    got = _sharded_apply(shape, r, off=-1.0, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13 * np.abs(want).max())


def test_sharded_mgpcg_matches_single_device_iterations():
    shape = (32, 16, 16)
    n = int(np.prod(shape))
    b = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    tol = 1e-9 * float(jnp.linalg.norm(b))
    op = StencilOperator.poisson(shape, dtype=jnp.float64)

    x_1, info_1 = cg_solve(op, b, tol=tol, M=multigrid_preconditioner(op))
    mesh = make_row_mesh()
    M_local = sharded_multigrid_preconditioner(shape, N_DEV, dtype=jnp.float64)
    x_s, info_s = sharded_stencil_cg_solve(
        shape, b, mesh=mesh, tol=tol, M_local=M_local
    )
    assert bool(info_s.converged)
    assert int(info_s.iterations) == int(info_1.iterations)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_1), rtol=1e-10,
                               atol=1e-12)
    k = int(info_1.iterations)
    np.testing.assert_allclose(
        np.asarray(info_s.rho_history)[: k + 1],
        np.asarray(info_1.rho_history)[: k + 1],
        rtol=1e-9,
    )


def test_sharded_mgpcg_beats_plain_sharded_cg():
    shape = (32, 16, 16)
    n = int(np.prod(shape))
    b = jnp.asarray(np.random.default_rng(2).standard_normal(n))
    tol = 1e-8 * float(jnp.linalg.norm(b))
    mesh = make_row_mesh()
    x_p, plain = sharded_stencil_cg_solve(shape, b, mesh=mesh, tol=tol)
    M_local = sharded_multigrid_preconditioner(shape, N_DEV, dtype=jnp.float64)
    x_m, mg = sharded_stencil_cg_solve(shape, b, mesh=mesh, tol=tol,
                                       M_local=M_local)
    assert bool(mg.converged)
    assert int(mg.iterations) <= 15
    assert int(mg.iterations) * 3 < int(plain.iterations)


def test_rejects_inv_diag_and_M_local_together():
    shape = (32, 8, 8)
    n = int(np.prod(shape))
    b = jnp.zeros((n,), jnp.float64)
    mesh = make_row_mesh()
    M_local = sharded_multigrid_preconditioner(shape, N_DEV, dtype=jnp.float64)
    with pytest.raises(ValueError, match="not both"):
        sharded_stencil_cg_solve(
            shape, b, mesh=mesh, inv_diag=jnp.ones((n,)), M_local=M_local
        )


def test_builder_validates_shard_divisibility():
    with pytest.raises(ValueError, match="divisible"):
        sharded_multigrid_preconditioner((30, 8, 8), N_DEV)
