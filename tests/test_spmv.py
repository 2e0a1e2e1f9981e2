"""SpMV kernel tests — CSR vs NumPy, blocked-ELL vs CSR, Pallas vs einsum
(SURVEY §4: "SpMV vs scipy" analogue; ref kernel VectorOperations.hpp:438-466)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.io import native
from conjugategradient_tpu.ops.pallas.ell_spmv import bell_spmv_pallas
from conjugategradient_tpu.ops.spmv import _bell_spmv_jnp, bell_spmv, csr_spmv, dense_spmv
from conjugategradient_tpu.problems import banded_spd_coo, poisson2d_coo
from conjugategradient_tpu.types import BlockedEllMatrix, CSRMatrix


@pytest.fixture(scope="module")
def poisson():
    rows, cols, vals, shape = poisson2d_coo(17, 23)
    return CSRMatrix.from_coo(rows, cols, vals, shape)


def _np_csr_matvec(csr, x):
    y = np.zeros(csr.shape[0])
    data, idx, iptr = np.asarray(csr.data), np.asarray(csr.indices), np.asarray(csr.indptr)
    for r in range(csr.shape[0]):
        y[r] = np.dot(data[iptr[r]:iptr[r + 1]], x[idx[iptr[r]:iptr[r + 1]]])
    return y


def test_csr_spmv_matches_numpy(poisson, rng):
    x = rng.standard_normal(poisson.shape[1])
    got = np.asarray(csr_spmv(poisson, jnp.asarray(x)))
    np.testing.assert_allclose(got, _np_csr_matvec(poisson, x), rtol=1e-12)


def test_dense_spmv(rng):
    a = rng.standard_normal((64, 64))
    x = rng.standard_normal(64)
    np.testing.assert_allclose(
        np.asarray(dense_spmv(jnp.asarray(a), jnp.asarray(x))), a @ x, rtol=1e-12
    )


@pytest.mark.parametrize("bm,bn", [(8, 128), (16, 128), (128, 128)])
def test_bell_matches_csr(poisson, rng, bm, bn):
    bell = BlockedEllMatrix.from_csr(poisson, bm=bm, bn=bn)
    x = jnp.asarray(rng.standard_normal(poisson.shape[1]))
    np.testing.assert_allclose(
        np.asarray(bell.matvec(x)),
        np.asarray(poisson.matvec(x)),
        rtol=1e-10,
        atol=1e-12,
    )


def test_bell_python_fallback_matches_native(poisson):
    if not native.available():
        pytest.skip("native lib not built")
    data = np.asarray(poisson.data)
    idx = np.asarray(poisson.indices)
    iptr = np.asarray(poisson.indptr)
    b_native = BlockedEllMatrix.from_csr_host(data, idx, iptr, poisson.shape, 16, 128)
    orig = native.available
    native.available = lambda: False
    try:
        b_py = BlockedEllMatrix.from_csr_host(data, idx, iptr, poisson.shape, 16, 128)
    finally:
        native.available = orig
    assert b_native.kmax == b_py.kmax
    np.testing.assert_array_equal(np.asarray(b_native.blocks), np.asarray(b_py.blocks))
    np.testing.assert_array_equal(
        np.asarray(b_native.block_cols), np.asarray(b_py.block_cols)
    )


def test_pallas_bell_interpret_matches_einsum(rng):
    nrb, kmax, bm, bn, ncb = 4, 3, 8, 128, 5
    blocks = jnp.asarray(rng.standard_normal((nrb, kmax, bm, bn)), jnp.float32)
    cols = jnp.asarray(rng.integers(0, ncb, (nrb, kmax)), jnp.int32)
    x2d = jnp.asarray(rng.standard_normal((ncb, bn)), jnp.float32)
    y_ref = _bell_spmv_jnp(blocks, cols, x2d)
    y_pal = bell_spmv_pallas(blocks, cols, x2d, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=2e-4)


def test_pallas_bell_duplicate_padding_cols(rng):
    """Zero padding tiles pointing at column-block 0 must not corrupt y."""
    nrb, kmax, bm, bn, ncb = 2, 4, 8, 128, 3
    blocks = np.zeros((nrb, kmax, bm, bn), np.float32)
    blocks[:, 0] = rng.standard_normal((nrb, bm, bn))
    cols = np.zeros((nrb, kmax), np.int32)
    x2d = jnp.asarray(rng.standard_normal((ncb, bn)), jnp.float32)
    y_ref = _bell_spmv_jnp(jnp.asarray(blocks), jnp.asarray(cols), x2d)
    y_pal = bell_spmv_pallas(jnp.asarray(blocks), jnp.asarray(cols), x2d, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=2e-4)


def test_bell_rectangular_padding(rng):
    """n not a multiple of bm / bn: padded rows and columns stay silent."""
    rows, cols, vals, shape = banded_spd_coo(333, bandwidth=5, seed=3)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape)
    bell = BlockedEllMatrix.from_csr(csr, bm=128, bn=128)
    assert bell.padded_shape[0] % 128 == 0
    x = jnp.asarray(rng.standard_normal(shape[1]))
    np.testing.assert_allclose(
        np.asarray(bell.matvec(x)), np.asarray(csr.matvec(x)), rtol=1e-10, atol=1e-12
    )


def test_bell_padding_ratio(poisson):
    bell = BlockedEllMatrix.from_csr(poisson, bm=8, bn=128)
    assert bell.padding_ratio() >= 1.0
    assert bell.nnz == poisson.nnz


def test_mixed_precision_bf16_operator(poisson, rng):
    """bf16-stored operator with f32 operand: result must be f32 and close
    to the f32-operator result (mixed-precision CG support)."""
    data32 = np.asarray(poisson.data, np.float32)
    b32 = BlockedEllMatrix.from_csr_host(
        data32, np.asarray(poisson.indices), np.asarray(poisson.indptr),
        poisson.shape, 8, 128,
    )
    b16 = BlockedEllMatrix(
        jnp.asarray(b32.blocks, jnp.bfloat16), b32.block_cols, b32.shape, b32.nnz
    )
    x = jnp.asarray(rng.standard_normal(poisson.shape[1]), jnp.float32)
    y32 = b32.matvec(x)
    y16 = b16.matvec(x)
    assert y16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(y16), np.asarray(y32), rtol=2e-2, atol=1e-2
    )


def test_mixed_precision_cg_converges(rng):
    """CG with a bf16-stored operator and f32 vectors still converges (to a
    bf16-limited residual)."""
    from conjugategradient_tpu import DIAMatrix, cg_solve
    from conjugategradient_tpu.problems import banded_spd_coo

    rows, cols, vals, shape = banded_spd_coo(256, bandwidth=4, seed=7)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    dia32 = DIAMatrix.from_csr(csr)
    dia16 = DIAMatrix(
        jnp.asarray(dia32.diags, jnp.bfloat16), dia32.offsets, dia32.shape, dia32.nnz
    )
    b = jnp.arange(1, shape[0] + 1, dtype=jnp.float32) / shape[0]
    x, info = cg_solve(dia16, b, tol=1e-2, maxiter=4 * shape[0])
    assert x.dtype == jnp.float32
    assert bool(info.converged)
    # residual vs the TRUE (f32) operator is bf16-limited but bounded
    r = b - csr.matvec(x)
    assert float(jnp.linalg.norm(r)) < 1e-1


def test_dia_blocked_layout_parity(rng):
    """DIAMatrix.with_blocked carries a pre-blocked copy; the blocked
    Pallas kernel (interpret mode) and the plain matvec must agree, and
    the pytree round-trips with the extra leaf."""
    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.ops.pallas.dia_spmv import dia_spmv_pallas_blocked
    from conjugategradient_tpu.problems import banded_spd_coo
    from conjugategradient_tpu.types import CSRMatrix, DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(300, bandwidth=5, seed=9)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    dia = DIAMatrix.from_csr(csr)
    blk = dia.with_blocked(block_len=128)
    assert blk.diags_blocked is not None
    assert blk.with_blocked() is blk  # idempotent

    x = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
    y_ref = dia.matvec(x)
    y_blk = dia_spmv_pallas_blocked(
        blk.diags_blocked, blk.offsets, x, n=shape[0], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y_blk), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )

    # pytree round-trip keeps the blocked leaf
    leaves, treedef = jax.tree_util.tree_flatten(blk)
    assert len(leaves) == 2
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.diags_blocked is not None
    np.testing.assert_array_equal(
        np.asarray(back.diags_blocked), np.asarray(blk.diags_blocked)
    )

    # solving with the upgraded operator matches the plain one (CPU: the
    # XLA path runs either way, exercising the pytree through the jit)
    from conjugategradient_tpu import cg_solve

    b = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
    x1, i1 = cg_solve(dia, b, tol=1e-4, maxiter=400)
    x2, i2 = cg_solve(blk, b, tol=1e-4, maxiter=400)
    assert int(i1.iterations) == int(i2.iterations)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-6)


def test_dia_pallas_mixed_bf16_op_f32_x(rng):
    """bf16 operator + f32 vector through every Pallas DIA entry point
    (the refined_cg_solve inner-solve configuration): the x-window scratch
    must be x-dtype (a diags-dtype scratch asks Mosaic for an f32->bf16
    DMA, rejected on hardware) and the output must be the PROMOTED dtype,
    matching the XLA path."""
    import jax.numpy as jnp

    from conjugategradient_tpu.ops.pallas.dia_spmv import (
        dia_spmv_pallas,
        dia_spmv_pallas_2d,
        dia_spmv_pallas_blocked,
    )
    from conjugategradient_tpu.problems import banded_spd_coo
    from conjugategradient_tpu.types import CSRMatrix, DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(300, bandwidth=5, seed=11)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    dia32 = DIAMatrix.from_csr(csr)
    dia16 = dia32.astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal(shape[0]).astype(np.float32))
    y_ref = dia32.matvec(x)  # f32 reference; bf16 storage rounds vs this

    for y in (
        dia_spmv_pallas(dia16.diags, dia16.offsets, x, interpret=True),
        dia_spmv_pallas_2d(dia16.diags, dia16.offsets, x, interpret=True),
        dia_spmv_pallas_blocked(
            dia16.with_blocked(block_len=128).diags_blocked,
            dia16.offsets, x, n=shape[0], interpret=True,
        ),
    ):
        assert y.dtype == jnp.float32  # promoted, not bf16
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2
        )
