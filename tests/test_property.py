"""Property-based invariants (hypothesis) for layout packing and solves.

The fixed-seed suites pin exact behaviors; these sweep randomized sparsity
patterns so pack/unpack edge cases (empty rows, hub rows, duplicate COO
entries, ragged shard splits) cannot hide between the chosen seeds.
Bounded sizes + derandomized runs keep the suite fast and deterministic.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from conjugategradient_tpu import CSRMatrix, cg_solve
from conjugategradient_tpu.types import (
    BlockedEllMatrix,
    DIAMatrix,
    SellMatrix,
    SymBellMatrix,
    SymDIAMatrix,
    _sell_pack_rows,
)

SETTINGS = dict(max_examples=25, derandomize=True, deadline=None)


@st.composite
def sym_coo(draw, max_n=32):
    """Random symmetric COO with duplicates allowed and an SPD-making
    dominant diagonal; returns (rows, cols, vals, n, dense)."""
    n = draw(st.integers(min_value=2, max_value=max_n))
    m = draw(st.integers(min_value=0, max_value=3 * n))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    i = rng.integers(0, n, size=m)
    j = rng.integers(0, n, size=m)
    v = np.round(rng.standard_normal(m), 3)
    rows = np.concatenate([i, j, np.arange(n)])
    cols = np.concatenate([j, i, np.arange(n)])
    diag = np.ones(n)
    np.add.at(diag, rows[: 2 * m], np.abs(np.concatenate([v, v])))
    vals = np.concatenate([v, v, diag])
    dense = np.zeros((n, n))
    np.add.at(dense, (rows, cols), vals)
    return rows, cols, vals, n, dense


@given(sym_coo())
@settings(**SETTINGS)
def test_all_layouts_agree_with_dense(problem):
    rows, cols, vals, n, dense = problem
    csr = CSRMatrix.from_coo(rows, cols, vals, (n, n))
    x = np.linspace(-1, 1, n)
    want = dense @ x
    xj = jnp.asarray(x)
    for op in (
        csr,
        SellMatrix.from_csr(csr),
        DIAMatrix.from_csr(csr),
        BlockedEllMatrix.from_csr(csr, bm=4, bn=8),
        SymBellMatrix.from_csr(csr, bm=4, bn=4),
        SymDIAMatrix.from_csr(csr),
    ):
        np.testing.assert_allclose(
            np.asarray(op.matvec(xj)), want, rtol=1e-10, atol=1e-10,
            err_msg=type(op).__name__,
        )


@given(sym_coo(max_n=24), st.integers(min_value=1, max_value=5))
@settings(**SETTINGS)
def test_sell_pack_shard_invariance(problem, n_shards):
    """_sell_pack_rows must represent the same matrix for every shard
    count: reassembling per-shard slabs reproduces the CSR matvec, and
    virtual padding rows stay inert."""
    rows, cols, vals, n, dense = problem
    csr = CSRMatrix.from_coo(rows, cols, vals, (n, n))
    diag, pos, cols_flat, vals_flat, meta, n_pad = _sell_pack_rows(
        np.asarray(csr.data), np.asarray(csr.indices), np.asarray(csr.indptr),
        (n, n), n_shards,
    )
    m = n_pad // n_shards
    x = np.zeros(n_pad)
    x[:n] = np.linspace(1, 2, n)
    y = np.zeros(n_pad)
    for s in range(n_shards):
        prods = vals_flat[s] * x[cols_flat[s]]
        parts, base = [], 0
        for nb, k in meta:
            if k == 0:
                parts.append(np.zeros(nb))
                continue
            parts.append(prods[base : base + nb * k].reshape(nb, k).sum(axis=1))
            base += nb * k
        y_sorted = np.concatenate(parts) if parts else np.zeros(0)
        y[s * m : (s + 1) * m] = diag[s] * x[s * m : (s + 1) * m] + y_sorted[pos[s]]
    np.testing.assert_allclose(y[:n], dense @ x[:n], rtol=1e-10, atol=1e-10)
    assert np.all(y[n:] == 0)


@given(sym_coo(max_n=20))
@settings(**SETTINGS)
def test_cg_solves_random_spd(problem):
    """Diagonally dominant symmetric ⇒ SPD ⇒ CG must converge and satisfy
    the residual bound, whatever the pattern."""
    rows, cols, vals, n, dense = problem
    csr = CSRMatrix.from_coo(rows, cols, vals, (n, n))
    b = jnp.asarray(np.linspace(-1, 1, n))
    x, info = cg_solve(csr, b, tol=1e-10, maxiter=5 * n)
    assert bool(info.converged)
    r = np.asarray(b) - dense @ np.asarray(x)
    assert np.linalg.norm(r) <= 1e-8


@given(sym_coo(max_n=20))
@settings(**SETTINGS)
def test_gv_pipelined_pcg_matches_pcg_on_random_spd(problem):
    """Property: on every random SPD pattern, the Ghysels–Vanroose
    pipelined recurrences reproduce standard Jacobi-PCG — same iteration
    count and solution (f64: the recurrences are exact-arithmetic
    identical, so only roundoff separates them)."""
    from conjugategradient_tpu import jacobi_preconditioner
    from conjugategradient_tpu.solver.pipelined import pipelined_cg_solve

    rows, cols, vals, n, dense = problem
    csr = CSRMatrix.from_coo(rows, cols, vals, (n, n))
    b = jnp.asarray(np.linspace(-1, 1, n))
    M = jacobi_preconditioner(csr)
    x_ref, i_ref = cg_solve(csr, b, tol=1e-9, maxiter=5 * n, M=M,
                            fused="never")
    x_gv, i_gv = pipelined_cg_solve(csr, b, tol=1e-9, maxiter=5 * n, M=M)
    assert bool(i_gv.converged) == bool(i_ref.converged)
    assert abs(int(i_gv.iterations) - int(i_ref.iterations)) <= 1
    r = np.asarray(b) - dense @ np.asarray(x_gv)
    assert np.linalg.norm(r) <= 1e-7


@given(sym_coo(max_n=18))
@settings(**SETTINGS)
def test_eigsh_extremes_match_dense_on_random_spd(problem):
    """Property: scipy_compat.eigsh's converged extreme pairs match the
    dense spectrum on every random SPD pattern (both ends)."""
    from conjugategradient_tpu.scipy_compat import eigsh

    rows, cols, vals, n, dense = problem
    if n < 3:
        return
    csr = CSRMatrix.from_coo(rows, cols, vals, (n, n))
    w_true = np.linalg.eigvalsh(dense)
    k = min(2, n - 1)
    for which, sl in (("SM", slice(0, k)), ("LM", slice(n - k, n))):
        w = eigsh(csr, k=k, which=which, return_eigenvectors=False,
                  tol=1e-8)
        np.testing.assert_allclose(w, w_true[sl], rtol=1e-6, atol=1e-8)


@st.composite
def sym_indefinite(draw, n=16):
    """Random symmetric INDEFINITE dense (n fixed so the jitted MINRES
    while_loop compiles once across examples)."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    half = n // 2
    eigs = np.concatenate([
        -draw(st.floats(0.5, 3.0)) * np.linspace(1.0, 2.0, half),
        draw(st.floats(0.5, 3.0)) * np.linspace(1.0, 2.0, n - half),
    ])
    return Q @ np.diag(eigs) @ Q.T


@given(sym_indefinite())
@settings(**SETTINGS)
def test_minres_solves_random_indefinite(dense):
    """Property: MINRES converges on every random symmetric indefinite
    system and the true residual meets the tolerance (CG has no such
    guarantee off the SPD domain — that is why MINRES exists here)."""
    from conjugategradient_tpu import minres_solve

    n = dense.shape[0]
    b = jnp.asarray(np.linspace(-1, 1, n))
    x, info = minres_solve(jnp.asarray(dense), b, tol=1e-9, maxiter=20 * n)
    assert bool(info.converged)
    r = np.asarray(b) - dense @ np.asarray(x)
    assert np.linalg.norm(r) <= 1e-7


@given(sym_coo(max_n=18), st.booleans())
@settings(max_examples=15, derandomize=True, deadline=None)
def test_lobpcg_extremes_match_dense(problem, largest):
    """Property: LOBPCG's converged block matches the dense spectrum's
    extreme end on every random SPD pattern."""
    from conjugategradient_tpu import lobpcg_eigs

    rows, cols, vals, n, dense = problem
    k = 2
    if n < 3 * k + 1:
        return
    csr = CSRMatrix.from_coo(rows, cols, vals, (n, n))
    res = lobpcg_eigs(csr, k=k, which="largest" if largest else "smallest",
                      tol=1e-9, maxiter=300)
    w_true = np.linalg.eigvalsh(dense)
    want = w_true[::-1][:k] if largest else w_true[:k]
    np.testing.assert_allclose(np.asarray(res.values), want,
                               rtol=1e-5, atol=1e-7)
