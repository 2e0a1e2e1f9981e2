"""Preconditioning tests (north-star config 3; the reference is
unpreconditioned, so the oracle is oracle.reference_pcg)."""

import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu import CSRMatrix, cg_solve, jacobi_preconditioner
from conjugategradient_tpu.oracle import csr_matvec_np_fast, reference_pcg
from conjugategradient_tpu.problems import banded_spd_coo, reference_rhs
from conjugategradient_tpu.solver.precond import identity_preconditioner


def _problem(n=500, bw=6, seed=11):
    rows, cols, vals, shape = banded_spd_coo(n, bandwidth=bw, seed=seed)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = reference_rhs(shape[0])
    d, i, p = np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)
    return A, b, (lambda x: csr_matvec_np_fast(d, i, p, x))


def test_jacobi_parity_with_pcg_oracle():
    A, b, mv = _problem()
    diag = np.asarray(A.diagonal())
    ora = reference_pcg(mv, b, lambda r: r / diag, tol=1e-9)
    M = jacobi_preconditioner(A)
    x, info = cg_solve(A, jnp.asarray(b), tol=1e-9, M=M)
    assert int(info.iterations) == ora.iterations
    k = int(info.iterations)
    got = np.asarray(info.rho_history)[: k + 1]
    want = ora.rho_history[: k + 1]
    sel = want > want[0] * 1e-24
    np.testing.assert_allclose(got[sel], want[sel], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x), ora.x, rtol=1e-7, atol=1e-9)


def test_jacobi_speeds_up_badly_scaled_problem():
    """Jacobi must cut iterations when the diagonal varies wildly."""
    n = 400
    rows, cols, vals, shape = banded_spd_coo(n, bandwidth=4, seed=3)
    scale = np.geomspace(1.0, 1e4, n)
    A0 = CSRMatrix.from_coo(rows, cols, vals, shape)
    # symmetric scaling D A D keeps SPD but wrecks the diagonal
    d_, i_, p_ = np.asarray(A0.data), np.asarray(A0.indices), np.asarray(A0.indptr)
    row_ids = np.repeat(np.arange(n), np.diff(p_))
    A = CSRMatrix.from_arrays(d_ * scale[row_ids] * scale[i_], i_, p_, shape)
    b = reference_rhs(n)

    x_plain, info_plain = cg_solve(A, jnp.asarray(b), tol=1e-6, maxiter=4 * n)
    x_pcg, info_pcg = cg_solve(
        A, jnp.asarray(b), tol=1e-6, maxiter=4 * n, M=jacobi_preconditioner(A)
    )
    assert int(info_pcg.iterations) < int(info_plain.iterations)
    assert bool(info_pcg.converged)


def test_identity_preconditioner_equals_plain_cg():
    A, b, _ = _problem(n=200)
    x1, i1 = cg_solve(A, jnp.asarray(b), tol=1e-8)
    x2, i2 = cg_solve(A, jnp.asarray(b), tol=1e-8, M=identity_preconditioner())
    assert int(i1.iterations) == int(i2.iterations)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-10)
    k = int(i1.iterations)
    np.testing.assert_allclose(
        np.asarray(i1.rho_history)[: k + 1],
        np.asarray(i2.rho_history)[: k + 1],
        rtol=1e-10,
    )


def test_jacobi_eps_guard():
    diag_zero = jnp.asarray(np.array([[0.0, 1.0], [1.0, 2.0]]))
    M = jacobi_preconditioner(diag_zero, eps=1e-3)
    out = np.asarray(M(jnp.ones(2)))
    assert np.all(np.isfinite(out))


def test_chebyshev_preconditioner_cuts_iterations():
    from conjugategradient_tpu.problems import poisson2d_coo
    from conjugategradient_tpu.solver.precond import (
        chebyshev_preconditioner,
        estimate_spectral_bounds,
    )

    rows, cols, vals, shape = poisson2d_coo(30)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = jnp.asarray(reference_rhs(shape[0]))
    _, i_plain = cg_solve(A, b, tol=1e-8)

    lmin, lmax = estimate_spectral_bounds(A)
    assert 0 < lmin < lmax
    M = chebyshev_preconditioner(A, lmin, lmax, degree=8)
    x, i_cheb = cg_solve(A, b, tol=1e-8, M=M)
    # the honest (containing) interval gives a smaller speedup than a
    # cheating tight one would; 1.4x is the robust expectation at degree 8
    assert int(i_cheb.iterations) < int(i_plain.iterations) / 1.4
    r = b - A.matvec(x)
    assert float(jnp.linalg.norm(r)) < 1e-6


def test_spectral_bounds_contain_spectrum():
    """The Lanczos estimator must return a CONTAINING interval (the review
    caught a diag-based heuristic whose lower bound exceeded true λ_min)."""
    from conjugategradient_tpu.ops.stencil import poisson7_csr
    from conjugategradient_tpu.solver.precond import estimate_spectral_bounds

    csr = poisson7_csr((8, 8, 8))
    lmin, lmax = estimate_spectral_bounds(csr)
    ev = np.linalg.eigvalsh(np.asarray(csr.to_dense()))
    assert lmin <= ev[0], (lmin, ev[0])
    assert lmax >= ev[-1], (lmax, ev[-1])


def test_chebyshev_apply_is_linear():
    """PCG requires a fixed linear M⁻¹; Chebyshev z(r) must be linear in r."""
    from conjugategradient_tpu.problems import poisson2d_coo
    from conjugategradient_tpu.solver.precond import chebyshev_preconditioner

    rows, cols, vals, shape = poisson2d_coo(8)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    M = chebyshev_preconditioner(A, 0.5, 8.5, degree=5)
    rng_ = np.random.default_rng(0)
    u = jnp.asarray(rng_.standard_normal(shape[0]))
    v = jnp.asarray(rng_.standard_normal(shape[0]))
    lhs = M(2.0 * u - 3.0 * v)
    rhs = 2.0 * M(u) - 3.0 * M(v)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# block-Jacobi (round 2+: batched b×b inverses, MXU-friendly apply)
# ---------------------------------------------------------------------------

def _dense_block_jacobi_apply(a_dense, b, r):
    """Reference apply: invert the block diagonal densely with numpy."""
    n = a_dense.shape[0]
    nb = -(-n // b)
    out = np.zeros(n)
    for i in range(nb):
        lo, hi = i * b, min((i + 1) * b, n)
        out[lo:hi] = np.linalg.solve(a_dense[lo:hi, lo:hi], r[lo:hi])
    return out


def test_block_jacobi_b1_equals_scalar_jacobi():
    from conjugategradient_tpu import block_jacobi_preconditioner

    A, b, _ = _problem(n=200)
    M1 = block_jacobi_preconditioner(A, block_size=1)
    Mj = jacobi_preconditioner(A)
    r = jnp.asarray(np.random.default_rng(0).standard_normal(200))
    np.testing.assert_array_equal(np.asarray(M1(r)), np.asarray(Mj(r)))


def test_block_jacobi_apply_matches_dense_reference():
    from conjugategradient_tpu import block_jacobi_preconditioner

    A, _, _ = _problem(n=203)  # n not divisible by b: exercises padding
    a_dense = np.asarray(A.to_dense())
    r = np.random.default_rng(1).standard_normal(203)
    for bsz in (4, 8, 16):
        M = block_jacobi_preconditioner(A, block_size=bsz)
        np.testing.assert_allclose(
            np.asarray(M(jnp.asarray(r))),
            _dense_block_jacobi_apply(a_dense, bsz, r),
            rtol=1e-10, atol=1e-12,
        )


def test_block_jacobi_extraction_parity_across_layouts():
    """CSR, DIA, SELL and dense extractions of the same matrix must yield
    the same preconditioner."""
    from conjugategradient_tpu import block_jacobi_preconditioner
    from conjugategradient_tpu.types import DenseOperator, DIAMatrix, SellMatrix

    A, _, _ = _problem(n=160, bw=4)
    ops = [
        A,
        DIAMatrix.from_csr(A),
        SellMatrix.from_csr(A),
        DenseOperator(A.to_dense()),
    ]
    r = jnp.asarray(np.random.default_rng(2).standard_normal(160))
    ref = None
    for op in ops:
        M = block_jacobi_preconditioner(op, block_size=8)
        y = np.asarray(M(r))
        if ref is None:
            ref = y
        else:
            np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-14)


def test_block_jacobi_stencil_matches_csr():
    """The analytic stencil block extraction must agree with extracting from
    the same operator materialized as CSR (poisson3d == 7-point stencil)."""
    from conjugategradient_tpu import block_jacobi_preconditioner
    from conjugategradient_tpu.problems import poisson3d_coo
    from conjugategradient_tpu.types import StencilOperator

    nx, ny, nz = 4, 5, 6
    rows, cols, vals, shape = poisson3d_coo(nx, ny, nz)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape)
    st = StencilOperator.poisson((nx, ny, nz), dtype=jnp.float64)
    r = jnp.asarray(np.random.default_rng(3).standard_normal(shape[0]))
    for bsz in (3, nz, 2 * nz):  # within-line, one z-line, two z-lines
        Mc = block_jacobi_preconditioner(csr, block_size=bsz)
        Ms = block_jacobi_preconditioner(st, block_size=bsz)
        np.testing.assert_allclose(
            np.asarray(Ms(r)), np.asarray(Mc(r)), rtol=1e-12, atol=1e-14
        )


def test_block_jacobi_is_spd():
    from conjugategradient_tpu import block_jacobi_preconditioner

    A, _, _ = _problem(n=64)
    M = block_jacobi_preconditioner(A, block_size=8)
    eye = np.eye(64)
    m_inv = np.stack([np.asarray(M(jnp.asarray(eye[i]))) for i in range(64)])
    np.testing.assert_allclose(m_inv, m_inv.T, rtol=1e-12, atol=1e-13)
    assert np.linalg.eigvalsh(m_inv).min() > 0


def test_block_jacobi_cuts_iterations_vs_scalar_jacobi():
    """Line-Jacobi effect: on a 2-D Poisson problem with strong in-line
    coupling, b = one grid line captures the tridiagonal coupling and must
    converge in fewer iterations than scalar Jacobi."""
    from conjugategradient_tpu import block_jacobi_preconditioner
    from conjugategradient_tpu.problems import poisson2d_coo

    # anisotropic Poisson: strong coupling along the line direction
    ny = 24
    rows, cols, vals, shape = poisson2d_coo(24, ny)
    vals = vals.copy()
    # scale in-line couplings (|i-j| == 1) by 50: strong anisotropy
    inline = np.abs(rows - cols) == 1
    vals[inline] *= 50.0
    diag = rows == cols
    vals[diag] = 1.0  # rebuild diagonal for SPD via dominance
    a = np.zeros(shape)
    np.add.at(a, (rows, cols), vals)
    np.fill_diagonal(a, 0.0)
    d = np.abs(a).sum(axis=1) + 1.0
    A = CSRMatrix.from_coo(
        np.concatenate([rows[~diag], np.arange(shape[0])]),
        np.concatenate([cols[~diag], np.arange(shape[0])]),
        np.concatenate([vals[~diag], d]),
        shape,
    )
    b = jnp.asarray(reference_rhs(shape[0]))
    Mj = jacobi_preconditioner(A)
    Mb = block_jacobi_preconditioner(A, block_size=ny)
    _, ij = cg_solve(A, b, tol=1e-10, maxiter=2000, M=Mj)
    _, ib = cg_solve(A, b, tol=1e-10, maxiter=2000, M=Mb)
    assert bool(ib.converged) and bool(ij.converged)
    assert int(ib.iterations) < int(ij.iterations)


def test_block_jacobi_rejects_bad_input():
    import pytest

    from conjugategradient_tpu import block_jacobi_preconditioner
    from conjugategradient_tpu.types import MatrixFreeOperator

    A, _, _ = _problem(n=32)
    with pytest.raises(ValueError):
        block_jacobi_preconditioner(A, block_size=0)
    op = MatrixFreeOperator(lambda x: x, 32, jnp.float64)
    with pytest.raises(TypeError):
        block_jacobi_preconditioner(op, block_size=4)
