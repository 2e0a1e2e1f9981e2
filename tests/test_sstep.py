"""s-step (communication-avoiding) CG tests — solver/sstep.py.

Contract: in exact arithmetic a block of ``s`` advances x exactly as ``s``
consecutive CG iterations (the block directions span the same Krylov space
and the block solve minimizes the A-norm error over it), so at block
boundaries the ‖r‖² history must match plain CG; one Gram psum per block is
the sharded path's only reduction (verified by iteration-identity with the
single-device loop on 8 virtual devices).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, cg_solve, sstep_cg_solve
from conjugategradient_tpu.problems import (
    banded_spd_coo,
    poisson2d_coo,
    reference_rhs,
)

N_DEV = 8


def _poisson(nx=16, dtype=np.float64):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=dtype)
    b = jnp.asarray(reference_rhs(shape[0], dtype=dtype))
    return A, b, shape[0]


def test_sstep_s1_matches_plain_cg():
    """s=1 is plain CG re-derived through the Gram: identical iteration
    count and matching per-iteration ‖r‖² history."""
    A, b, n = _poisson(14)
    x_ref, i_ref = cg_solve(A, b, tol=1e-10)
    x_s, i_s = sstep_cg_solve(A, b, s=1, tol=1e-10)
    assert bool(i_s.converged)
    assert int(i_s.iterations) == int(i_ref.iterations)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-9)
    k = int(i_ref.iterations)
    h_ref = np.asarray(i_ref.rho_history)[:k]
    h_s = np.asarray(i_s.rho_history)[:k]
    sel = h_ref > h_ref[0] * 1e-20
    np.testing.assert_allclose(h_s[sel], h_ref[sel], rtol=1e-5)


@pytest.mark.parametrize("s", [2, 4])
def test_sstep_block_boundary_parity(s):
    """At block boundaries k = 0, s, 2s, … the recorded ‖r_k‖² must equal
    plain CG's ‖r_k‖² (exact-arithmetic equivalence, float64 slack)."""
    A, b, n = _poisson(14)
    x_ref, i_ref = cg_solve(A, b, tol=1e-10)
    x_s, i_s = sstep_cg_solve(A, b, s=s, tol=1e-10)
    assert bool(i_s.converged)
    # block-granular cap: iterations advance in multiples of s
    assert int(i_s.iterations) % s == 0
    k_ref = int(i_ref.iterations)
    h_ref = np.asarray(i_ref.rho_history)
    h_s = np.asarray(i_s.rho_history)
    for k in range(0, min(int(i_s.iterations), k_ref), s):
        if h_ref[k] <= h_ref[0] * 1e-18:
            break  # converged tail — below float64 comparison floor
        np.testing.assert_allclose(h_s[k], h_ref[k], rtol=1e-4,
                                   err_msg=f"block boundary k={k}")
    # NaN between boundaries (history only written once per block)
    if s > 1:
        assert np.isnan(h_s[1])
    # same solution to solver tolerance
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-7)


def test_sstep_true_residual():
    A, b, n = _poisson(20)
    x, info = sstep_cg_solve(A, b, s=4, tol=1e-9)
    assert bool(info.converged)
    r = np.asarray(b) - np.asarray(A.matvec(x))
    assert np.linalg.norm(r) < 1e-7 * np.linalg.norm(np.asarray(b))


def test_sstep_exact_convergence_mid_block():
    """Krylov grade < s (identity operator converges in ONE iteration, s=4):
    the rank-deficient Gram must yield the exact least-squares step instead
    of a breakdown."""
    n = 32
    A = CSRMatrix.from_coo(
        np.arange(n), np.arange(n), 2.0 * np.ones(n), (n, n)
    )
    b = jnp.asarray(reference_rhs(n))
    x, info = sstep_cg_solve(A, b, s=4, tol=1e-12)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(b) / 2.0, rtol=1e-12)


def test_sstep_zero_rhs():
    """ρ₀ = 0: the detecting block is a no-op (zero Gram ⇒ zero step) and
    counts one block — the one-update-late semantics at block granularity."""
    n = 24
    A = CSRMatrix.from_coo(np.arange(n), np.arange(n), np.ones(n), (n, n))
    x, info = sstep_cg_solve(A, jnp.zeros((n,)), s=4, tol=1e-30)
    assert bool(info.converged)
    assert int(info.iterations) == 4
    assert np.all(np.asarray(x) == 0)


def test_sstep_validates_s():
    A, b, n = _poisson(6)
    with pytest.raises(ValueError, match="s must be"):
        sstep_cg_solve(A, b, s=0)


def test_sstep_maxiter_overshoot_bound():
    """The cap may overshoot maxiter by at most s-1 (documented block
    semantics), never more."""
    A, b, n = _poisson(14)
    x, info = sstep_cg_solve(A, b, s=4, tol=0.0, maxiter=10)
    k = int(info.iterations)
    assert 10 <= k <= 10 + 3


# ---------------------------------------------------------------------------
# sharded: ONE Gram psum per s iterations, on 8 virtual devices
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


def test_sharded_sstep_bell_matches_single_device(need_devices):
    from conjugategradient_tpu.parallel import (
        partition_csr_rows,
        sharded_cg_solve,
    )

    rows, cols, vals, shape = poisson2d_coo(20)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.asarray(reference_rhs(n))
    b_pad = jnp.zeros((n_pad,)).at[:n].set(b)
    x_ref, i_ref = sstep_cg_solve(A, b, s=4, tol=1e-10)
    x_sh, i_sh = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b_pad,
        tol=1e-10, maxiter=n + 1, method="sstep", s=4,
    )
    assert bool(i_sh.converged)
    assert int(i_sh.iterations) == int(i_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
    )
    k = int(i_ref.iterations)
    h_ref = np.asarray(i_ref.rho_history)[:k:4]
    h_sh = np.asarray(i_sh.rho_history)[:k:4]
    sel = h_ref > h_ref[0] * 1e-20
    np.testing.assert_allclose(h_sh[sel], h_ref[sel], rtol=1e-6)


def test_sharded_sstep_dia_ring_halo(need_devices):
    from conjugategradient_tpu.parallel import (
        partition_dia_rows,
        sharded_dia_cg_solve,
    )
    from conjugategradient_tpu.types import DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(280, bandwidth=6, seed=12)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    dia = DIAMatrix.from_csr(A)
    n = shape[0]
    b = jnp.asarray(reference_rhs(n))
    diags_sh, n_pad = partition_dia_rows(np.asarray(dia.diags), shape, N_DEV)
    b_pad = jnp.zeros((n_pad,)).at[:n].set(b)
    x_ref, i_ref = sstep_cg_solve(A, b, s=4, tol=1e-10)
    x_sh, i_sh = sharded_dia_cg_solve(
        diags_sh, tuple(int(o) for o in dia.offsets), b_pad,
        tol=1e-10, maxiter=n + 1, method="sstep", s=4,
    )
    assert bool(i_sh.converged)
    assert int(i_sh.iterations) == int(i_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-8, atol=1e-9
    )


def test_sharded_dia_pipelined(need_devices):
    """DIA front-end method parity (round 3): pipelined rides the same
    ring-halo local matvec."""
    from conjugategradient_tpu.parallel import (
        partition_dia_rows,
        sharded_dia_cg_solve,
    )
    from conjugategradient_tpu.types import DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(280, bandwidth=6, seed=3)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    dia = DIAMatrix.from_csr(A)
    n = shape[0]
    b = jnp.asarray(reference_rhs(n))
    diags_sh, n_pad = partition_dia_rows(np.asarray(dia.diags), shape, N_DEV)
    b_pad = jnp.zeros((n_pad,)).at[:n].set(b)
    x_sh, i_sh = sharded_dia_cg_solve(
        diags_sh, tuple(int(o) for o in dia.offsets), b_pad,
        tol=1e-10, maxiter=n + 1, method="pipelined"
    )
    assert bool(i_sh.converged)
    r = np.asarray(b) - np.asarray(A.matvec(x_sh[:n]))
    assert np.linalg.norm(r) < 1e-8 * max(1.0, np.linalg.norm(np.asarray(b)))


def test_sharded_sstep_sell(need_devices):
    from conjugategradient_tpu.parallel import (
        partition_sell_rows,
        sharded_sell_cg_solve,
    )
    from conjugategradient_tpu.problems import powerlaw_spd_coo

    rows, cols, vals, shape = powerlaw_spd_coo(500, avg_degree=4.0, seed=7)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    sell_sharded = partition_sell_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV,
    )
    n = shape[0]
    n_pad = sell_sharded[-1]
    b = jnp.asarray(reference_rhs(n))
    b_pad = jnp.zeros((n_pad,)).at[:n].set(b)
    x_ref, i_ref = sstep_cg_solve(A, b, s=2, tol=1e-10)
    x_sh, i_sh = sharded_sell_cg_solve(
        sell_sharded, b_pad, tol=1e-10, maxiter=n + 1, method="sstep", s=2,
    )
    assert bool(i_sh.converged)
    assert int(i_sh.iterations) == int(i_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-7, atol=1e-8
    )


def test_sharded_sstep_rejects_preconditioner_and_restart(need_devices):
    from conjugategradient_tpu.parallel import (
        partition_csr_rows,
        sharded_cg_solve,
    )

    rows, cols, vals, shape = poisson2d_coo(10)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    b = jnp.ones((n_pad,))
    with pytest.raises(ValueError, match="sstep"):
        sharded_cg_solve(
            jnp.asarray(blocks), jnp.asarray(bcols), b,
            inv_diag=jnp.ones((n_pad,)), method="sstep",
        )
    with pytest.raises(ValueError, match="sstep"):
        sharded_cg_solve(
            jnp.asarray(blocks), jnp.asarray(bcols), b,
            method="sstep", recompute_r_every=10,
        )
    with pytest.raises(ValueError, match="s must be"):
        sharded_cg_solve(
            jnp.asarray(blocks), jnp.asarray(bcols), b, method="sstep", s=0,
        )
