"""Solver API contract tests (the functional rebuild of CG.hpp's object API:
setters -> cg_solve args, extract -> return value, memoryFootprint ->
memory_footprint, checkpointable CGState)."""

import jax
import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu import CSRMatrix, cg_solve
from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs
from conjugategradient_tpu.solver import memory_footprint
from conjugategradient_tpu.solver.cg import CGState, cg_init, cg_step


def _problem(nx=12):
    rows, cols, vals, shape = poisson2d_coo(nx)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    return A, jnp.asarray(reference_rhs(shape[0]))


def test_cg_solve_is_jittable():
    A, b = _problem()
    jitted = jax.jit(lambda b_: cg_solve(A, b_, tol=1e-9))
    x1, i1 = jitted(b)
    x2, i2 = cg_solve(A, b, tol=1e-9)
    assert int(i1.iterations) == int(i2.iterations)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-12)


def test_deterministic_bitwise():
    """Same input => bit-identical residual history (SURVEY §5: determinism
    replaces the reference's race-prone event DAG)."""
    A, b = _problem()
    _, i1 = cg_solve(A, b, tol=1e-10)
    _, i2 = cg_solve(A, b, tol=1e-10)
    np.testing.assert_array_equal(
        np.asarray(i1.rho_history), np.asarray(i2.rho_history)
    )


def test_maxiter_cap():
    A, b = _problem()
    x, info = cg_solve(A, b, tol=0.0, maxiter=7)
    assert int(info.iterations) == 7
    assert not bool(info.converged)


def test_checkpoint_resume_equivalence():
    """Stopping at k and resuming from the carry must equal an uninterrupted
    run (SURVEY §5 checkpoint/resume: the carry is the checkpoint)."""
    A, b = _problem()
    tol = jnp.asarray(0.0, b.dtype)

    full = cg_init(A, b, maxiter=20)
    for _ in range(20):
        full = cg_step(A, full, tol)

    half = cg_init(A, b, maxiter=20)
    for _ in range(10):
        half = cg_step(A, half, tol)
    # "checkpoint": round-trip the carry through host numpy (like orbax would)
    leaves, treedef = jax.tree_util.tree_flatten(half)
    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(np.asarray(l)) for l in leaves]
    )
    for _ in range(10):
        restored = cg_step(A, restored, tol)

    np.testing.assert_array_equal(np.asarray(restored.x), np.asarray(full.x))
    np.testing.assert_array_equal(
        np.asarray(restored.rnorm_sq), np.asarray(full.rnorm_sq)
    )


def test_info_residual_norms_sqrt():
    A, b = _problem()
    _, info = cg_solve(A, b, tol=1e-9)
    k = int(info.iterations)
    np.testing.assert_allclose(
        np.asarray(info.residual_norms)[:k],
        np.sqrt(np.asarray(info.rho_history)[:k]),
        rtol=1e-14,
    )


def test_memory_footprint_formula():
    """(2·NNZ + 4·N)·sizeof(DT) + 2·N·sizeof(int) — CG.hpp:555-558."""
    assert memory_footprint(100, 500, dtype=jnp.float64) == (
        (2 * 500 + 4 * 100) * 8 + 2 * 100 * 4
    )
    assert memory_footprint(10, 20, dtype=jnp.float32) == (
        (2 * 20 + 4 * 10) * 4 + 2 * 10 * 4
    )


def test_dtype_preserved_f32():
    A, b64 = _problem()
    A32 = CSRMatrix.from_arrays(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        A.shape, dtype=np.float32,
    )
    b = jnp.asarray(np.asarray(b64), jnp.float32)
    x, info = cg_solve(A32, b, tol=1e-4)
    assert x.dtype == jnp.float32
    assert bool(info.converged)


def test_state_is_pytree():
    A, b = _problem(6)
    s = cg_init(A, b, maxiter=3)
    leaves, treedef = jax.tree_util.tree_flatten(s)
    s2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(s2, CGState)


def test_residual_replacement_restart():
    """recompute_r_every: periodic true-residual restart converges and the
    recurrence residual stays honest (close to the true one)."""
    import jax.numpy as jnp

    A, b = _problem(16)
    x, info = cg_solve(A, b, tol=1e-8, recompute_r_every=10)
    assert bool(info.converged)
    r_true = b - A.matvec(x)
    # recurrence and true residual agree at convergence
    assert float(jnp.linalg.norm(r_true)) < 1e-6
    # and 0 keeps the reference's never-recompute semantics (same API)
    x2, info2 = cg_solve(A, b, tol=1e-8, recompute_r_every=0)
    assert bool(info2.converged)


def test_exact_convergence_does_not_poison_x():
    """Warm start at the exact solution: x must survive (the reference's
    alpha = 0/0 would NaN it) and converged must be True."""
    import jax.numpy as jnp

    A, b = _problem(6)
    x_star, _ = cg_solve(A, b, tol=1e-13)
    x, info = cg_solve(A, b, x0=x_star, tol=1e-6)
    assert bool(jnp.all(jnp.isfinite(x)))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_star), rtol=1e-10)
    assert bool(info.converged)
    # b = 0 -> x = 0 exactly, finite
    x0sol, info0 = cg_solve(A, jnp.zeros_like(b), tol=1e-6)
    assert bool(jnp.all(x0sol == 0))
    assert bool(info0.converged)


def test_nan_breakdown_not_reported_as_converged():
    import jax.numpy as jnp

    a = jnp.zeros((4, 4))  # singular: NaN breakdown
    x, info = cg_solve(a, jnp.ones(4), tol=1e-10)
    assert not bool(info.converged)


def test_maxiter_zero_runs_zero_iterations():
    A, b = _problem(6)
    x, info = cg_solve(A, b, tol=0.0, maxiter=0)
    assert int(info.iterations) == 0
    np.testing.assert_array_equal(np.asarray(x), 0.0)


def test_bfloat16_solve_runs():
    """bf16 carries must survive the while_loop (dot widens scalars to f32;
    the vector updates must cast back — review finding)."""
    import jax.numpy as jnp

    A, b64 = _problem(8)
    A16 = CSRMatrix.from_arrays(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        A.shape, dtype=np.float32,
    )
    from conjugategradient_tpu.types import CSRMatrix as _CSR

    A16 = _CSR(
        jnp.asarray(A16.data, jnp.bfloat16), A16.indices, A16.indptr,
        A16.row_ids, A16.shape,
    )
    b = jnp.asarray(np.asarray(b64), jnp.bfloat16) / 100
    x, info = cg_solve(A16, b, tol=1e-1, maxiter=400)
    assert x.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))


def test_fused_state_checkpoint_roundtrip(tmp_path):
    """Checkpoint/resume covers the fused fast path's carry too."""
    import jax.numpy as jnp

    from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs
    from conjugategradient_tpu.solver.checkpoint import (
        load_state,
        run_cg,
        save_state,
    )
    from conjugategradient_tpu.solver.fused import fused_cg_init
    from conjugategradient_tpu.types import BlockedEllMatrix, CSRMatrix

    rows, cols, vals, shape = poisson2d_coo(16)
    csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    bell = BlockedEllMatrix.from_csr(csr, bm=128, bn=128)
    b = jnp.asarray(reference_rhs(shape[0], dtype=np.float32))
    s0 = fused_cg_init(bell, b, maxiter=64)
    path = tmp_path / "fused_ckpt.npz"
    save_state(path, s0)
    s1 = load_state(path)
    assert type(s1).__name__ == "FusedCGState"
    for f in ("k", "x", "r", "p", "beta", "rho", "hist"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s0, f)), np.asarray(getattr(s1, f))
        )


def test_pipelined_cg_matches_plain():
    """Single-synchronization CG (solver/pipelined.py) reproduces plain CG:
    same iteration count, same solution, matching early history."""
    import jax.numpy as jnp

    from conjugategradient_tpu import CSRMatrix, cg_solve
    from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs
    from conjugategradient_tpu.solver.pipelined import pipelined_cg_solve

    rows, cols, vals, shape = poisson2d_coo(16)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    b = jnp.asarray(reference_rhs(shape[0]))
    x_ref, i_ref = cg_solve(A, b, tol=1e-10, fused="never")
    x_p, i_p = pipelined_cg_solve(A, b, tol=1e-10)
    assert int(i_p.iterations) == int(i_ref.iterations)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-10)
    h1 = np.asarray(i_ref.rho_history)[:15]
    h2 = np.asarray(i_p.rho_history)[:15]
    np.testing.assert_allclose(h2, h1, rtol=1e-8)


def test_pipelined_pcg_matches_preconditioned_cg():
    """Ghysels–Vanroose preconditioned pipelined CG (M=) reproduces the
    standard PCG trajectory: same iteration count, same solution, matching
    ‖r‖² history."""
    import jax.numpy as jnp

    from conjugategradient_tpu import CSRMatrix, cg_solve, jacobi_preconditioner
    from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs
    from conjugategradient_tpu.solver.pipelined import pipelined_cg_solve

    rows, cols, vals, shape = poisson2d_coo(16)
    A = CSRMatrix.from_coo(rows, cols, vals, shape)
    # scale rows/cols so Jacobi actually changes the trajectory
    d = jnp.exp(jnp.linspace(0.0, 2.0, shape[0]))
    A = CSRMatrix.from_coo(
        rows, cols,
        np.asarray(vals) * np.asarray(d)[rows] * np.asarray(d)[cols], shape,
    )
    b = jnp.asarray(reference_rhs(shape[0]))
    M = jacobi_preconditioner(A)
    x_ref, i_ref = cg_solve(A, b, tol=1e-10, M=M, fused="never")
    x_p, i_p = pipelined_cg_solve(A, b, tol=1e-10, M=M)
    assert int(i_p.iterations) == int(i_ref.iterations)
    assert bool(i_p.converged)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-10)
    k = int(i_ref.iterations)
    h1 = np.asarray(i_ref.rho_history)[:k]
    h2 = np.asarray(i_p.rho_history)[:k]
    sel = h1 > h1[0] * 1e-12
    np.testing.assert_allclose(h2[sel], h1[sel], rtol=1e-6)
    # CGInfo.rho carries γ = r·u (the PCG ρ convention, like cg.py)
    assert float(i_p.rnorm_sq) <= 1e-20


def test_pipelined_pcg_zero_rhs_and_breakdown():
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.pipelined import pipelined_cg_solve

    x, info = pipelined_cg_solve(
        jnp.eye(8), jnp.zeros((8,)), tol=1e-30, M=lambda z: 0.5 * z
    )
    assert bool(jnp.all(x == 0))
    sing = jnp.zeros((8, 8))
    x2, i2 = pipelined_cg_solve(
        sing, jnp.ones((8,)), tol=1e-10, maxiter=20, M=lambda z: z
    )
    assert not bool(i2.converged)
    assert int(i2.iterations) < 20  # NaN exit, not a spin to the cap


def test_tester_pipelined_precond_flag(capsys):
    """CLI surface: --method pipelined now composes with --precond
    (Ghysels–Vanroose); --method sstep still rejects it."""
    import pathlib

    import tester

    mtx = str(pathlib.Path(__file__).resolve().parent.parent
              / "problems" / "poisson2d_34.mtx")
    rc = tester.main([mtx, "--method", "pipelined", "--precond", "jacobi",
                      "--tol", "1e-8"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parts = line.split()
    assert len(parts) == 4 and int(parts[0]) == 1156
    assert float(parts[3]) < 1e-10
    assert tester.main([mtx, "--method", "sstep", "--precond", "jacobi"]) == 2


def test_tester_recompute_flag(capsys):
    """--recompute N: the f32 GV solve that stalls without replacement
    (chip-verified 133 iters on TPU / 147 on CPU) converges with it."""
    import json
    import pathlib

    import tester

    mtx = str(pathlib.Path(__file__).resolve().parent.parent
              / "problems" / "poisson2d_34.mtx")
    rc = tester.main([mtx, "--method", "pipelined", "--precond", "jacobi",
                      "--tol", "1e-3", "--dtype", "float32",
                      "--recompute", "50", "--summary"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["converged"] == [True]
    assert rec["iterations"][0] < 300
    assert tester.main([mtx, "--method", "sstep", "--recompute", "10"]) == 2
    assert tester.main([mtx, "--recompute", "10", "--nrhs", "2"]) == 2


def test_pipelined_cg_zero_rhs_and_breakdown():
    import jax.numpy as jnp

    from conjugategradient_tpu.solver.pipelined import pipelined_cg_solve

    a = jnp.eye(8)
    x, info = pipelined_cg_solve(a, jnp.zeros((8,)), tol=1e-30)
    assert bool(jnp.all(x == 0))
    # indefinite/singular: NaN exit, not an infinite loop
    sing = jnp.zeros((8, 8))
    x2, i2 = pipelined_cg_solve(sing, jnp.ones((8,)), tol=1e-10, maxiter=20)
    assert not bool(i2.converged)


def test_pipelined_pcg_residual_replacement_escapes_drift_stall():
    """The GV recurrences amplify rounding like O(eps*kappa): an f32
    Jacobi-PCG pipelined solve of the 34^2 Poisson system STALLS above
    an absolute tol of 1e-3 without replacement (measured floor
    ~eps*kappa*||b|| ~ 2), and converges with recompute_r_every=50 —
    CPU-reproducible, the exact failure observed on chip."""
    import jax.numpy as jnp

    from conjugategradient_tpu import jacobi_preconditioner, load_matrix
    from conjugategradient_tpu.solver.pipelined import pipelined_cg_solve
    import pathlib

    mtx = str(pathlib.Path(__file__).resolve().parent.parent
              / "problems" / "poisson2d_34.mtx")
    A = load_matrix(mtx, layout="csr", dtype=jnp.float32)
    n = A.shape[0]
    b = jnp.arange(1, n + 1, dtype=jnp.float32)
    M = jacobi_preconditioner(A)
    x_raw, i_raw = pipelined_cg_solve(A, b, tol=1e-3, M=M)
    assert not bool(i_raw.converged)  # the documented stall
    x_rr, i_rr = pipelined_cg_solve(A, b, tol=1e-3, M=M,
                                    recompute_r_every=50)
    assert bool(i_rr.converged)
    assert int(i_rr.iterations) < 200  # measured 147
    # the recurrence residual it reports is HONEST (replaced 3 iterations
    # before exit at most): true residual within a small factor of tol
    true_r = float(jnp.linalg.norm(b - A.matvec(x_rr)))
    assert true_r < 1.0  # f32 attainable floor; raw GV diverged to ~1.5e3

    # unpreconditioned replacement path compiles and converges too
    x_p, i_p = pipelined_cg_solve(A, b, tol=1e-3, recompute_r_every=50)
    assert bool(i_p.converged)
