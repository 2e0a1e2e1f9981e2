"""Irregular (scattered power-law) matrix hardening — SURVEY §7(a) names
irregular CSR gathers the #1 hard part; the reference's real input
distribution is user-supplied SuiteSparse workloads (test/Tester.cpp:14-21),
which include bus networks / circuits with power-law-ish degree profiles.
These tests stress exactly what layout-friendly generators cannot:
``choose_layout``'s CSR fallback, blocked-ELL padding blowup, RCM on a
scattered pattern, oracle parity, and the sharded all-gather path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, cg_solve
from conjugategradient_tpu.io.loader import _BELL_MAX_PADDING, choose_layout
from conjugategradient_tpu.oracle import reference_cg
from conjugategradient_tpu.problems import powerlaw_spd_coo, reference_rhs
from conjugategradient_tpu.reorder import bandwidth, permute_csr, rcm_permutation
from conjugategradient_tpu.types import BlockedEllMatrix


@pytest.fixture(scope="module")
def bus1138():
    """1138_bus-calibrated instance: n=1138, avg degree ~3.5, scattered."""
    rows, cols, vals, shape = powerlaw_spd_coo(1138, avg_degree=3.5, seed=0)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape)
    return csr


def test_profile_matches_1138_bus(bus1138):
    n = bus1138.shape[0]
    nnz = bus1138.nnz
    deg = np.diff(np.asarray(bus1138.indptr)) - 1  # off-diagonal degree
    assert n == 1138
    assert 2.5 <= (nnz - n) / n <= 5.0  # avg degree in the bus-network range
    assert deg.max() >= 20  # hub rows exist (power-law tail)
    assert np.median(deg) <= 4  # but most rows are sparse


def test_spd(bus1138):
    # diagonal dominance was the construction; verify on a small instance
    rows, cols, vals, shape = powerlaw_spd_coo(300, seed=1)
    a = np.zeros(shape)
    np.add.at(a, (rows, cols), vals)
    assert np.abs(a - a.T).max() == 0.0
    assert np.linalg.eigvalsh(a).min() > 0


def test_choose_layout_falls_back_to_sell(bus1138):
    # scattered pattern: both streaming layouts pad too much; the fallback
    # is the bucketed-ELL gather layout (round 2's irregular fast path),
    # which beats CSR's gather+segment-sum 2x on hardware (docs/performance.md)
    lay = choose_layout(
        np.asarray(bus1138.indices), np.asarray(bus1138.indptr), bus1138.shape
    )
    assert lay == "sell"


def test_blocked_ell_padding_blowup(bus1138):
    bell = BlockedEllMatrix.from_csr(bus1138, bm=8, bn=128)
    # scattered columns force many nearly-empty tiles: the padding ratio
    # must blow past the auto-policy threshold (that is WHY csr wins above)
    assert bell.padding_ratio() > _BELL_MAX_PADDING
    # the layout is still numerically correct, just wasteful
    x = np.random.default_rng(0).standard_normal(bus1138.shape[0])
    np.testing.assert_allclose(
        np.asarray(bell.matvec(jnp.asarray(x))),
        np.asarray(bus1138.matvec(jnp.asarray(x))),
        rtol=1e-10,
        atol=1e-10,
    )


def test_rcm_improves_bandwidth(bus1138):
    ind, ptr = np.asarray(bus1138.indices), np.asarray(bus1138.indptr)
    bw0 = bandwidth(ind, ptr)
    perm = rcm_permutation(ind, ptr, bus1138.shape[0])
    _, ind2, ptr2 = permute_csr(
        np.asarray(bus1138.data), ind, ptr, bus1138.shape, perm
    )
    bw1 = bandwidth(ind2, ptr2)
    # power-law graphs never become truly banded, but RCM must still cut
    # the scattered bandwidth substantially
    assert bw1 < 0.7 * bw0


def test_oracle_parity_on_irregular(bus1138):
    """Iteration-for-iteration parity vs the float64 NumPy oracle on the
    scattered pattern (the parity contract, SURVEY §2.3)."""
    n = bus1138.shape[0]
    b = reference_rhs(n)
    tol = 1e-8
    x, info = cg_solve(bus1138, jnp.asarray(b), tol=tol, maxiter=n + 1)
    from conjugategradient_tpu.oracle import csr_matvec_np_fast

    data = np.asarray(bus1138.data)
    ind = np.asarray(bus1138.indices)
    ptr = np.asarray(bus1138.indptr)
    ora = reference_cg(
        lambda v: csr_matvec_np_fast(data, ind, ptr, v), b, tol=tol, maxiter=n + 1
    )
    assert int(info.iterations) == ora.iterations
    assert bool(info.converged) == ora.converged
    # Early history matches tightly; past ~10 iterations the trajectories
    # drift (both in f64) because this matrix is ill-conditioned enough that
    # summation-order differences amplify exponentially along the Krylov
    # recurrence — the same drift the C++ reference would show against any
    # reimplementation.  The load-bearing parity facts are the iteration
    # count (exact), the convergence flag, and the solution itself.
    h = np.asarray(info.rho_history)[:10]
    np.testing.assert_allclose(h, ora.rho_history[:10], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(x), ora.x, rtol=1e-10, atol=1e-10)


def test_sharded_all_gather_on_irregular(bus1138):
    """The sharded blocked-ELL path must survive a scattered column footprint
    (every shard's gather spans all shards — the all_gather is load-bearing)."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from conjugategradient_tpu.parallel import partition_csr_rows, sharded_cg_solve

    n = bus1138.shape[0]
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(bus1138.data),
        np.asarray(bus1138.indices),
        np.asarray(bus1138.indptr),
        bus1138.shape,
        8,
        bm=8,
        bn=8,
    )
    b = reference_rhs(n)
    b_pad = jnp.zeros((n_pad,), jnp.float64).at[:n].set(jnp.asarray(b))
    x_ref, info_ref = cg_solve(bus1138, jnp.asarray(b), tol=1e-8, maxiter=n + 1)
    x_sh, info_sh = sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b_pad, tol=1e-8, maxiter=n + 1
    )
    assert int(info_sh.iterations) == int(info_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(x_sh[:n]), np.asarray(x_ref), rtol=1e-7, atol=1e-9
    )
