"""Public Lanczos eigensolver (solver/eigs.py).

The same one-dispatch Lanczos pass that powers Chebyshev bounds and
deflation harvesting, exposed as lanczos_eigs/condition_estimate.  Tests
verify Ritz values/vectors against dense eigh, the residual bound against
directly-computed ‖Av − θv‖, breakdown (invariant subspace) handling, and
layout-agnostic ingest.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import (
    CSRMatrix,
    condition_estimate,
    lanczos_eigs,
)
from conjugategradient_tpu.problems import poisson2d_coo


def _spd(rng, n=40, cond=100.0):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.geomspace(1.0, cond, n)
    return (Q * vals) @ Q.T, vals


class TestValues:
    def test_smallest_match_dense(self, rng):
        A, vals = _spd(rng)
        res = lanczos_eigs(A, k=4, which="smallest", iters=40)
        np.testing.assert_allclose(res.values, vals[:4], rtol=1e-8)
        assert res.converged.all()

    def test_largest_match_dense_descending(self, rng):
        A, vals = _spd(rng)
        res = lanczos_eigs(A, k=4, which="largest", iters=40)
        np.testing.assert_allclose(res.values, vals[-1:-5:-1], rtol=1e-8)
        assert res.values[0] >= res.values[-1]  # descending per contract

    def test_values_are_inner_approximations(self, rng):
        """Partial Lanczos: Ritz extremes sit INSIDE the true spectrum."""
        A, vals = _spd(rng, n=80)
        res_lo = lanczos_eigs(A, k=1, which="smallest", iters=12)
        res_hi = lanczos_eigs(A, k=1, which="largest", iters=12)
        assert res_lo.values[0] >= vals[0] - 1e-10
        assert res_hi.values[0] <= vals[-1] + 1e-10


class TestVectors:
    def test_ritz_pairs_satisfy_reported_residual(self, rng):
        """‖A u − θ u‖ computed directly must match the β_m·|y[-1]| bound."""
        A, _ = _spd(rng)
        res = lanczos_eigs(A, k=3, which="smallest", iters=15)
        U = np.asarray(res.vectors, np.float64)
        for i in range(3):
            direct = np.linalg.norm(A @ U[:, i] - res.values[i] * U[:, i])
            assert direct <= res.residuals[i] * 1.05 + 1e-9

    def test_vectors_orthonormal(self, rng):
        A, _ = _spd(rng)
        res = lanczos_eigs(A, k=5, which="largest", iters=40)
        U = np.asarray(res.vectors, np.float64)
        np.testing.assert_allclose(U.T @ U, np.eye(5), atol=1e-7)

    def test_return_vectors_false(self, rng):
        A, _ = _spd(rng)
        res = lanczos_eigs(A, k=2, return_vectors=False)
        assert res.vectors is None
        assert res.values.shape == (2,)


class TestBreakdown:
    def test_invariant_subspace_truncates(self):
        """A has 3 distinct eigenvalues → Lanczos breaks down by step 3;
        the Ritz pairs inside the invariant subspace are exact."""
        d = np.array([1.0, 1.0, 2.0, 2.0, 5.0, 5.0, 5.0, 5.0])
        res = lanczos_eigs(np.diag(d), k=3, which="smallest", iters=8)
        assert res.iters <= 4
        np.testing.assert_allclose(res.values, [1.0, 2.0, 5.0], rtol=1e-10)
        np.testing.assert_allclose(res.residuals, 0.0, atol=1e-9)
        assert res.converged.all()

    def test_identity_breaks_down_at_one(self):
        res = lanczos_eigs(np.eye(16), k=1, iters=10)
        assert res.iters == 1
        np.testing.assert_allclose(res.values, [1.0], rtol=1e-12)


class TestIngest:
    def test_csr_layout(self, rng):
        rows, cols, vals, shape = poisson2d_coo(10)
        csr = CSRMatrix.from_coo(rows, cols, vals, shape)
        dense = np.zeros(shape)
        dense[np.asarray(rows), np.asarray(cols)] = np.asarray(vals)
        res = lanczos_eigs(csr, k=2, which="largest", iters=60)
        ref = np.linalg.eigvalsh(dense)
        np.testing.assert_allclose(res.values, ref[-1:-3:-1], rtol=1e-6)

    def test_matrix_free_callable(self, rng):
        A, vals = _spd(rng, n=32)
        Aj = jnp.asarray(A)
        # callables default to float32 (as_linear_operator), so the
        # matvec rounds at f32 resolution — tolerance to match
        res = lanczos_eigs(lambda v: Aj @ v, n=32, k=2, iters=32)
        np.testing.assert_allclose(res.values, vals[:2], rtol=1e-5)


class TestConditionEstimate:
    def test_converges_to_true_condition(self, rng):
        A, vals = _spd(rng, n=40, cond=50.0)
        kappa = condition_estimate(A, iters=40)
        assert kappa == pytest.approx(vals[-1] / vals[0], rel=1e-7)

    def test_partial_pass_underestimates(self, rng):
        A, vals = _spd(rng, n=100, cond=1000.0)
        kappa = condition_estimate(A, iters=15)
        assert kappa <= vals[-1] / vals[0] * (1 + 1e-9)
        assert kappa > 1.0

    def test_non_spd_rejected(self):
        d = np.diag([-1.0, 1.0, 2.0, 3.0])
        with pytest.raises(ValueError, match="SPD"):
            condition_estimate(d, iters=4)


class TestValidation:
    def test_bad_which(self, rng):
        with pytest.raises(ValueError, match="which"):
            lanczos_eigs(np.eye(4), which="interior")

    def test_bad_k(self):
        with pytest.raises(ValueError, match="k >= 1"):
            lanczos_eigs(np.eye(4), k=0)

    def test_k_exceeds_iters(self):
        with pytest.raises(ValueError, match="k <= iters"):
            lanczos_eigs(np.eye(40), k=9, iters=5)

    def test_iters_zero_rejected(self):
        """iters=0 must surface as an error, not silently fall back to
        the default (the `iters or default` falsy trap)."""
        with pytest.raises(ValueError):
            lanczos_eigs(np.eye(40), k=2, iters=0)
