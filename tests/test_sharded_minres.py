"""Sharded MINRES (method="minres" through the one sharded solve core) on
8 virtual CPU devices: symmetric-indefinite systems on the row mesh with
CG's exact collective pattern (layout halo + two psum dots/iteration).

Parity contract vs the single-device solver (solver/minres.py): same
trajectory to psum-association roundoff and iteration counts within ±2 —
the Givens recurrence amplifies last-ulp dot differences over hundreds of
iterations, so EXACT iteration equality (the CG tests' contract) is not
defensible here; the solution and true residual are pinned tightly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix
from conjugategradient_tpu.parallel import (
    partition_csr_rows,
    sharded_cg_solve,
    sharded_dia_cg_solve,
)
from conjugategradient_tpu.parallel.partition import partition_dia_rows
from conjugategradient_tpu.problems import (
    banded_spd_coo,
    poisson2d_coo,
    reference_rhs,
)
from conjugategradient_tpu.solver.minres import minres_solve

N_DEV = 8


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


def _indefinite_poisson(nx=20, sigma=3.0):
    """2-D Poisson with the diagonal shifted INSIDE the spectrum —
    symmetric, sparse, strongly indefinite."""
    rows, cols, vals, shape = poisson2d_coo(nx)
    vals = np.asarray(vals, float).copy()
    vals[np.asarray(rows) == np.asarray(cols)] -= sigma
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    return A, shape[0]


def _bell_setup(A, n, bm=8, bn=8):
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        (n, n), N_DEV, bm=bm, bn=bn)
    b = reference_rhs(n)
    b_pad = jnp.zeros((n_pad,), jnp.float64).at[:n].set(jnp.asarray(b))
    return jnp.asarray(blocks), jnp.asarray(bcols), b_pad, jnp.asarray(b)


def test_indefinite_matches_single_device():
    A, n = _indefinite_poisson()
    blocks, bcols, b_pad, b = _bell_setup(A, n)
    x_ref, info_ref = minres_solve(A, b, tol=1e-9, maxiter=4 * n)
    x_sh, info_sh = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-9, maxiter=4 * n, method="minres")
    assert bool(info_ref.converged) and bool(info_sh.converged)
    assert abs(int(info_sh.iterations) - int(info_ref.iterations)) <= 2
    r = np.asarray(b) - np.asarray(A.matvec(jnp.asarray(x_sh[:n])))
    assert np.linalg.norm(r) <= 2e-9
    np.testing.assert_allclose(np.asarray(x_sh[:n]), np.asarray(x_ref),
                               atol=1e-8)
    # trajectory parity: the sharded rho_history is phibar^2 (squared, the
    # CGInfo convention); compare against the single-device estimate
    k = min(int(info_ref.iterations), int(info_sh.iterations))
    h_ref = np.asarray(info_ref.rnorm_history)[: k + 1]
    h_sh = np.sqrt(np.asarray(info_sh.rho_history)[: k + 1])
    assert np.max(np.abs(h_sh - h_ref)) <= 1e-2 * h_ref[0]
    # and tightly over the early window, before roundoff accumulates
    np.testing.assert_allclose(h_sh[:20], h_ref[:20], rtol=1e-8)


def test_monotone_history_and_padding_inert():
    A, n = _indefinite_poisson(nx=14, sigma=2.5)
    blocks, bcols, b_pad, b = _bell_setup(A, n)
    x_sh, info = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-9, maxiter=4 * n, method="minres")
    k = int(info.iterations)
    h = np.sqrt(np.asarray(info.rho_history)[: k + 1])
    assert np.all(np.diff(h) <= 1e-12 * h[0])
    # zero-padded rows must stay exactly zero through the recurrence
    assert np.all(np.asarray(x_sh[n:]) == 0)


def test_jacobi_preconditioned_spd():
    """method="minres" composes with inv_diag (Jacobi, SPD): on a scaled
    SPD banded system the preconditioned run converges in fewer
    iterations."""
    rows, cols, vals, shape = banded_spd_coo(300, bandwidth=9, seed=4)
    # scale rows/cols to make the diagonal matter
    n = shape[0]
    scale = np.exp(np.random.default_rng(6).uniform(-1.5, 1.5, n))
    vals = np.asarray(vals, float) * scale[np.asarray(rows)] * scale[
        np.asarray(cols)]
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, b_pad, b = _bell_setup(A, n)
    import scipy.sparse as sp
    diag = sp.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=(n, n)).diagonal()
    inv_diag = jnp.ones((b_pad.shape[0],), jnp.float64).at[:n].set(
        jnp.asarray(1.0 / diag))
    x_u, info_u = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-8, maxiter=4 * n, method="minres")
    x_p, info_p = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-8, maxiter=4 * n, method="minres",
        inv_diag=inv_diag)
    assert bool(info_p.converged)
    r = np.asarray(b) - np.asarray(A.matvec(jnp.asarray(x_p[:n])))
    assert np.linalg.norm(r) <= 1e-6
    assert int(info_p.iterations) < int(info_u.iterations)


def test_dia_front_end_rides_minres():
    """Every layout family reaches method="minres" through the one solve
    core — pin the DIA ring-halo front-end too."""
    rows, cols, vals, shape = banded_spd_coo(256, bandwidth=7, seed=9)
    n = shape[0]
    vals = np.asarray(vals, float).copy()
    vals[np.asarray(rows) == np.asarray(cols)] -= 1.5  # indefinite
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    from conjugategradient_tpu.types import DIAMatrix
    dia = DIAMatrix.from_csr(A)
    diags, n_pad = partition_dia_rows(np.asarray(dia.diags), (n, n), N_DEV)
    offsets = dia.offsets
    b = reference_rhs(n)
    b_pad = jnp.zeros((n_pad,), jnp.float64).at[:n].set(jnp.asarray(b))
    x_ref, info_ref = minres_solve(A, jnp.asarray(b), tol=1e-9, maxiter=4 * n)
    x_sh, info_sh = sharded_dia_cg_solve(
        jnp.asarray(diags), offsets, b_pad, tol=1e-9, maxiter=4 * n,
        method="minres")
    assert bool(info_sh.converged)
    assert abs(int(info_sh.iterations) - int(info_ref.iterations)) <= 2
    r = np.asarray(b) - np.asarray(A.matvec(jnp.asarray(x_sh[:n])))
    assert np.linalg.norm(r) <= 2e-9


def test_minres_excludes_restarts_and_deflation():
    A, n = _indefinite_poisson(nx=10)
    blocks, bcols, b_pad, _ = _bell_setup(A, n)
    with pytest.raises(ValueError, match="residual-replacement"):
        sharded_cg_solve(blocks, bcols, b_pad, method="minres",
                         recompute_r_every=8)


def test_m_local_callable_matches_inv_diag():
    """method="minres" composes with the general per-shard M hook: a bare
    callable Jacobi through M_local must solve like the inv_diag array (both
    flow through _precond_apply inside _sharded_minres)."""
    rows, cols, vals, shape = banded_spd_coo(300, bandwidth=9, seed=4)
    n = shape[0]
    scale = np.exp(np.random.default_rng(6).uniform(-1.5, 1.5, n))
    vals = np.asarray(vals, float) * scale[np.asarray(rows)] * scale[
        np.asarray(cols)]
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    blocks, bcols, b_pad, b = _bell_setup(A, n)
    import scipy.sparse as sp
    diag = sp.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=(n, n)).diagonal()
    inv_diag = jnp.ones((b_pad.shape[0],), jnp.float64).at[:n].set(
        jnp.asarray(1.0 / diag))
    m = b_pad.shape[0] // N_DEV
    inv_local = np.asarray(inv_diag).reshape(N_DEV, m)

    import jax as _jax

    def m_local(r):
        idx = _jax.lax.axis_index("rows")
        return jnp.asarray(inv_local)[idx] * r

    x_a, info_a = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-8, maxiter=4 * n, method="minres",
        inv_diag=inv_diag)
    x_b, info_b = sharded_cg_solve(
        blocks, bcols, b_pad, tol=1e-8, maxiter=4 * n, method="minres",
        M_local=m_local)
    assert bool(info_b.converged)
    assert int(info_a.iterations) == int(info_b.iterations)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_a),
                               rtol=1e-10, atol=1e-12)


class TestShardedFusedMinres:
    """Round 5: the fused per-shard MINRES loop (use_fused='always',
    interpret mode on the CPU mesh) must match the portable sharded loop
    and the single-device solver."""

    def _setup(self, n=1024, bw=5, seed=7):
        from conjugategradient_tpu.problems import banded_spd_coo

        rows, cols, vals, shape = banded_spd_coo(n, bandwidth=bw, seed=seed)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        blocks, bcols, n_pad = partition_csr_rows(
            np.asarray(csr.data), np.asarray(csr.indices),
            np.asarray(csr.indptr), shape, N_DEV, bm=128, bn=128)
        rng = np.random.default_rng(seed)
        b = rng.standard_normal(n).astype(np.float32)
        b_pad = jnp.zeros((n_pad,), jnp.float32).at[:n].set(jnp.asarray(b))
        return csr, jnp.asarray(blocks), jnp.asarray(bcols), b_pad, b, n

    def test_matches_portable_sharded_loop(self):
        csr, blocks, bcols, b_pad, b, n = self._setup()
        x_p, i_p = sharded_cg_solve(
            blocks, bcols, b_pad, tol=0.0, maxiter=24, method="minres",
            use_fused="never")
        x_f, i_f = sharded_cg_solve(
            blocks, bcols, b_pad, tol=0.0, maxiter=24, method="minres",
            use_fused="always", interpret=True)
        assert int(i_f.iterations) == int(i_p.iterations)
        np.testing.assert_allclose(
            np.asarray(i_f.rho_history)[:25],
            np.asarray(i_p.rho_history)[:25], rtol=5e-3)
        np.testing.assert_allclose(np.asarray(x_f[:n]), np.asarray(x_p[:n]),
                                   rtol=1e-3, atol=1e-5)

    def test_converges_and_matches_single_device(self):
        from conjugategradient_tpu.solver.fused_minres import (
            fused_minres_solve,
        )
        from conjugategradient_tpu.types import BlockedEllMatrix

        csr, blocks, bcols, b_pad, b, n = self._setup()
        bell = BlockedEllMatrix.from_csr(csr, bm=128, bn=128)
        x_sd, i_sd = fused_minres_solve(bell, jnp.asarray(b), tol=1e-4,
                                        maxiter=4 * n, interpret=True)
        x_sh, i_sh = sharded_cg_solve(
            blocks, bcols, b_pad, tol=1e-4, maxiter=4 * n, method="minres",
            use_fused="always", interpret=True)
        assert bool(i_sh.converged)
        kf, kr = int(i_sh.iterations), int(i_sd.iterations)
        assert abs(kf - kr) <= max(4, kr // 10)
        r = np.asarray(b) - np.asarray(csr.matvec(x_sh[:n]))
        assert np.linalg.norm(r) <= 5e-4

    def test_jacobi_composes(self):
        csr, blocks, bcols, b_pad, b, n = self._setup(seed=9)
        n_pad = int(b_pad.shape[0])
        inv_d = np.ones((n_pad,), np.float32)
        inv_d[:n] = 1.0 / np.asarray(csr.diagonal())
        x_p, i_p = sharded_cg_solve(
            blocks, bcols, b_pad, tol=0.0, maxiter=20, method="minres",
            use_fused="never", inv_diag=jnp.asarray(inv_d))
        x_f, i_f = sharded_cg_solve(
            blocks, bcols, b_pad, tol=0.0, maxiter=20, method="minres",
            use_fused="always", interpret=True,
            inv_diag=jnp.asarray(inv_d))
        np.testing.assert_allclose(
            np.asarray(i_f.rho_history)[:21],
            np.asarray(i_p.rho_history)[:21], rtol=5e-3)
        np.testing.assert_allclose(np.asarray(x_f[:n]), np.asarray(x_p[:n]),
                                   rtol=1e-3, atol=1e-5)
