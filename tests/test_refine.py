"""Mixed-precision CG-IR (solver/refine.py) and operator astype.

The reference solves everything in one template dtype (test/Tester.cpp:10);
the rebuild adds the TPU-economical ladder: low-precision operator storage
for the inner iterations, high-precision residuals for the accuracy.  These
tests run the f64-hi / f32-lo rung on CPU (the conftest's float64 world) —
the same machinery serves f32-hi / bf16-lo on the chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import CSRMatrix, cg_solve, refined_cg_solve
from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs
from conjugategradient_tpu.types import (
    BlockedEllMatrix,
    DIAMatrix,
    DenseOperator,
    SellMatrix,
    StencilOperator,
)


@pytest.fixture(scope="module")
def system():
    rows, cols, vals, shape = poisson2d_coo(16)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = jnp.asarray(reference_rhs(shape[0]))
    return A, b


class TestAstype:
    def test_all_layouts_cast_values_share_structure(self, system):
        A, b = system
        x = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
        for op in (
            A,
            BlockedEllMatrix.from_csr(A, bm=8, bn=128),
            DIAMatrix.from_csr(A),
            SellMatrix.from_csr(A),
            DenseOperator(A.to_dense()),
        ):
            lo = op.astype(jnp.float32)
            assert lo.dtype == jnp.float32
            assert lo.shape == op.shape
            # values rounded, structure identical -> matvec close
            np.testing.assert_allclose(
                np.asarray(lo.matvec(x.astype(jnp.float32))),
                np.asarray(op.matvec(x)),
                rtol=2e-6, atol=2e-6,
            )

    def test_stencil_and_footprint(self):
        st = StencilOperator.poisson((4, 4, 4), dtype=jnp.float64)
        lo = st.astype(jnp.bfloat16)
        assert lo.dtype == jnp.bfloat16
        assert lo.grid_shape == st.grid_shape

    def test_dia_blocked_copy_cast(self, system):
        A, _ = system
        dia = DIAMatrix.from_csr(A).with_blocked(block_len=16384)
        lo = dia.astype(jnp.float32)
        assert lo.diags_blocked is not None
        assert lo.diags_blocked.dtype == jnp.float32

    def test_matrix_free_rejects(self):
        from conjugategradient_tpu.types import MatrixFreeOperator

        op = MatrixFreeOperator(lambda v: v, 8)
        with pytest.raises(NotImplementedError):
            op.astype(jnp.bfloat16)

    def test_memory_halves_f64_to_f32(self, system):
        A, _ = system
        dia = DIAMatrix.from_csr(A)
        assert dia.astype(jnp.float32).memory_footprint() * 2 == dia.memory_footprint()


class TestRefinedCG:
    def test_beats_pure_low_precision_floor(self, system):
        """An f32-only solve stalls above 1e-10; f64-outer refinement with the
        SAME f32 inner operator reaches it in a few corrections."""
        A, b = system
        tol = 1e-10 * float(jnp.linalg.norm(b))
        x, info = refined_cg_solve(A, b, tol=tol, low_dtype=jnp.float32)
        assert info.converged
        r = np.asarray(b) - np.asarray(A.matvec(x))
        assert np.linalg.norm(r) <= tol
        assert info.refinements >= 2  # genuinely needed refinement
        # monotone outer history
        h = info.rnorm_history
        assert all(h[i + 1] < h[i] for i in range(len(h) - 1))

        # the pure low-precision solve cannot reach this target
        x32, i32 = cg_solve(
            A.astype(jnp.float32), b.astype(jnp.float32), tol=tol,
            maxiter=4 * A.shape[0],
        )
        r32 = np.asarray(b) - np.asarray(A.matvec(x32.astype(jnp.float64)))
        assert np.linalg.norm(r32) > np.linalg.norm(r)

    def test_cheaper_outer_count_than_inner_iterations(self, system):
        A, b = system
        tol = 1e-9 * float(jnp.linalg.norm(b))
        x, info = refined_cg_solve(A, b, tol=tol, low_dtype=jnp.float32)
        assert info.converged
        assert info.refinements <= 6
        assert info.inner_iterations > info.refinements  # work is in the inner solves
        assert len(info.inner_infos) == info.refinements

    def test_explicit_low_operator_other_layout(self, system):
        """A_low may use a different layout (the production shape: CSR-hi
        residuals, DIA/SELL-lo inner solves)."""
        A, b = system
        tol = 1e-9 * float(jnp.linalg.norm(b))
        lo = DIAMatrix.from_csr(A).astype(jnp.float32)
        x, info = refined_cg_solve(A, b, tol=tol, A_low=lo)
        assert info.converged
        r = np.asarray(b) - np.asarray(A.matvec(x))
        assert np.linalg.norm(r) <= tol

    def test_preconditioned_inner(self, system):
        A, b = system
        tol = 1e-9 * float(jnp.linalg.norm(b))
        inv_diag = (1.0 / A.diagonal()).astype(jnp.float32)
        x, info = refined_cg_solve(
            A, b, tol=tol, low_dtype=jnp.float32,
            M=lambda v: inv_diag.astype(v.dtype) * v,
        )
        assert info.converged
        r = np.asarray(b) - np.asarray(A.matvec(x))
        assert np.linalg.norm(r) <= tol

    def test_x0_and_immediate_convergence(self, system):
        A, b = system
        x_ref, _ = cg_solve(A, b, tol=1e-12)
        x, info = refined_cg_solve(A, b, x0=x_ref, tol=1e-6)
        assert info.converged
        assert info.refinements == 0

    def test_tol_zero_rejected(self, system):
        A, b = system
        with pytest.raises(ValueError):
            refined_cg_solve(A, b, tol=0.0)

    def test_shape_mismatch_rejected(self, system):
        A, b = system
        rows, cols, vals, shape = poisson2d_coo(8)
        lo = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
        with pytest.raises(ValueError):
            refined_cg_solve(A, b, tol=1e-6, A_low=lo)

    def test_bf16_inner_on_cpu(self, system):
        """The chip configuration (bf16 storage) exercised on CPU: f32-hi /
        bf16-lo refinement reaches an f32-level target bf16 alone cannot."""
        A, b = system
        A32 = A.astype(jnp.float32)
        b32 = b.astype(jnp.float32)
        tol = 1e-5 * float(jnp.linalg.norm(b32))
        x, info = refined_cg_solve(A32, b32, tol=tol, low_dtype=jnp.bfloat16)
        assert info.converged
        r = np.asarray(b32, np.float64) - np.asarray(
            A.matvec(jnp.asarray(np.asarray(x, np.float64)))
        )
        assert np.linalg.norm(r) <= 1.05 * tol

    def test_stagnation_reports_unconverged(self, system):
        """An unreachable target stops on the contraction guard instead of
        burning max_refinements."""
        A, b = system
        A32 = A.astype(jnp.float32)
        b32 = b.astype(jnp.float32)
        x, info = refined_cg_solve(
            A32, b32, tol=1e-30, low_dtype=jnp.bfloat16, max_refinements=50,
        )
        assert not info.converged
        assert info.refinements < 50
