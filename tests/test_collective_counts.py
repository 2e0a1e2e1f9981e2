"""Structural verification of the communication-avoiding claims: count the
collectives XLA actually compiled into each sharded method's while-loop body.

Per iteration, the methods' reduction rounds must be:

* standard   — 2 all-reduces (the reference's value2/value3 scalars,
               CG.hpp:378,406, as psums);
* pipelined  — 1 all-reduce (the stacked [γ, δ] pair);
* sstep(s)   — 1 all-reduce per s iterations (the (3s+1)² Gram).

This is the property the methods exist for, asserted on the compiled HLO —
not on our own source code.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from conjugategradient_tpu import CSRMatrix
import conjugategradient_tpu.parallel.sharded_cg as sc
from conjugategradient_tpu.parallel import (
    make_row_mesh,
    partition_csr_rows,
    sharded_cg_solve,
)
from conjugategradient_tpu.problems import poisson2d_coo, reference_rhs

N_DEV = 8


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(jax.devices())}")


def _compiled_hlo(method, **kw):
    rows, cols, vals, shape = poisson2d_coo(16)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32))
    )
    mesh = make_row_mesh(jax.devices()[:N_DEV])
    sc._SOLVE_CACHE.clear()
    sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, mesh=mesh,
        tol=0.0, maxiter=4, method=method, use_fused="never", **kw
    )
    ((key, fn),) = list(sc._SOLVE_CACHE.items())
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("rows")))
    args = [put(jnp.asarray(blocks)), put(jnp.asarray(bcols)), put(b),
            put(jnp.zeros_like(b))]
    txt = fn.lower(*args).compile().as_text()
    sc._SOLVE_CACHE.clear()
    return txt


def _while_body_collectives(hlo: str):
    """(all_reduces, all_gathers) inside the solve's while-loop body."""
    m = re.search(r"while\(.*body=%?([\w.\-]+)", hlo)
    assert m, "no while loop in compiled HLO"
    body = m.group(1)
    # slice the body computation's text: from its header to the next
    # top-level computation header (a line starting without indentation)
    start = re.search(rf"^%?{re.escape(body)} [^\n]*\{{", hlo, re.M)
    assert start, f"body computation {body} not found"
    rest = hlo[start.end():]
    end = re.search(r"^\}", rest, re.M)
    section = rest[: end.start()] if end else rest
    ar = len(re.findall(r"all-reduce(?:-start)?\(", section))
    ag = len(re.findall(r"all-gather(?:-start)?\(", section))
    return ar, ag


def test_standard_two_reductions_per_iteration():
    ar, ag = _while_body_collectives(_compiled_hlo("standard"))
    assert ar == 2, f"standard CG must psum twice per iteration, got {ar}"
    assert ag == 1  # one halo all-gather per SpMV


def test_pipelined_one_reduction_per_iteration():
    ar, ag = _while_body_collectives(_compiled_hlo("pipelined"))
    assert ar == 1, f"pipelined CG must psum ONCE per iteration, got {ar}"
    assert ag == 1


def test_pipelined_pcg_one_reduction_per_iteration():
    """The preconditioned (Ghysels–Vanroose) pipelined loop must keep the
    single fused reduction — that is the variant's entire reason to exist
    next to standard PCG's two sequential psum rounds."""
    rows, cols, vals, shape = poisson2d_coo(16)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32))
    )
    inv_diag = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        1.0 / A.diagonal()
    )
    mesh = make_row_mesh(jax.devices()[:N_DEV])
    sc._SOLVE_CACHE.clear()
    sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, mesh=mesh,
        tol=0.0, maxiter=4, method="pipelined", inv_diag=inv_diag,
        use_fused="never",
    )
    ((key, fn),) = list(sc._SOLVE_CACHE.items())
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("rows")))
    args = [put(jnp.asarray(blocks)), put(jnp.asarray(bcols)), put(b),
            put(jnp.zeros_like(b)), put(inv_diag)]
    txt = fn.lower(*args).compile().as_text()
    sc._SOLVE_CACHE.clear()
    ar, ag = _while_body_collectives(txt)
    assert ar == 1, f"pipelined PCG must psum ONCE per iteration, got {ar}"
    assert ag == 1  # ONE SpMV per GV iteration (ν = A·m); w rides a recurrence


def test_minres_matches_cg_collective_pattern():
    """MINRES's whole point on the mesh: indefinite capability at CG's
    exact communication cost — 2 psums (v·y, the Lanczos β norm) + 1
    halo all-gather per iteration, asserted on the compiled HLO."""
    ar, ag = _while_body_collectives(_compiled_hlo("minres"))
    assert ar == 2, f"minres must psum twice per iteration, got {ar}"
    assert ag == 1


def _all_while_body_collectives(hlo: str):
    """{body_name: (all_reduces, all_gathers)} for EVERY while loop —
    needed for methods whose compiled solve nests loops (GMRES's Arnoldi
    fori inside the restart-cycle while)."""
    out = {}
    for m in re.finditer(r"while\(.*body=%?([\w.\-]+)", hlo):
        body = m.group(1)
        start = re.search(rf"^%?{re.escape(body)} [^\n]*\{{", hlo, re.M)
        if not start:
            continue
        rest = hlo[start.end():]
        end = re.search(r"^\}", rest, re.M)
        section = rest[: end.start()] if end else rest
        out[body] = (
            len(re.findall(r"all-reduce(?:-start)?\(", section)),
            len(re.findall(r"all-gather(?:-start)?\(", section)),
        )
    return out


def test_gmres_collective_pattern():
    """GMRES's mesh contract (loops._sharded_gmres): the inner Arnoldi
    step costs ONE halo all-gather (the SpMV) + THREE psums (two CGS2
    projection vectors + the basis norm); the restart-cycle body adds the
    true-residual recompute (one more matvec + psum) and the cycle-start
    residual (one matvec + psum) — asserted on the compiled HLO."""
    counts = _all_while_body_collectives(
        _compiled_hlo("gmres", gmres_restart=4))
    pairs = set(counts.values())
    assert (3, 1) in pairs, (
        f"no while body with the Arnoldi (3 psum, 1 all-gather) "
        f"pattern; bodies: {counts}"
    )
    assert (2, 2) in pairs, (
        f"no while body with the cycle-level (2 psum, 2 all-gather) "
        f"pattern; bodies: {counts}"
    )


@pytest.mark.parametrize("s", [2, 4])
def test_sstep_one_reduction_per_s_iterations(s):
    ar, ag = _while_body_collectives(_compiled_hlo("sstep", s=s))
    assert ar == 1, (
        f"s-step CG must psum ONE Gram per {s}-iteration block, got {ar}"
    )
    assert ag == s  # the s basis matvecs keep their halos — SpMV unchanged


def _compiled_dia_hlo(method, **kw):
    from conjugategradient_tpu.parallel import (
        partition_dia_rows,
        sharded_dia_cg_solve,
    )
    from conjugategradient_tpu.problems import banded_spd_coo
    from conjugategradient_tpu.types import DIAMatrix

    rows, cols, vals, shape = banded_spd_coo(256, bandwidth=4, seed=5)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    dia = DIAMatrix.from_csr(A)
    n = shape[0]
    diags_sh, n_pad = partition_dia_rows(np.asarray(dia.diags), shape, N_DEV)
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32))
    )
    mesh = make_row_mesh(jax.devices()[:N_DEV])
    sc._SOLVE_CACHE.clear()
    sharded_dia_cg_solve(
        jnp.asarray(diags_sh, jnp.float32),
        tuple(int(o) for o in dia.offsets), b,
        mesh=mesh, tol=0.0, maxiter=4, method=method, **kw,
    )
    ((key, fn),) = list(sc._SOLVE_CACHE.items())
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("rows")))
    args = [put(jnp.asarray(diags_sh, jnp.float32)), put(b),
            put(jnp.zeros_like(b))]
    txt = fn.lower(*args).compile().as_text()
    sc._SOLVE_CACHE.clear()
    return txt


def _body_permutes(hlo: str):
    m = re.search(r"while\(.*body=%?([\w.\-]+)", hlo)
    assert m, "no while loop in compiled HLO"
    start = re.search(rf"^%?{re.escape(m.group(1))} [^\n]*\{{", hlo, re.M)
    rest = hlo[start.end():]
    end = re.search(r"^\}", rest, re.M)
    section = rest[: end.start()] if end else rest
    ar = len(re.findall(r"all-reduce(?:-start)?\(", section))
    cp = len(re.findall(r"collective-permute(?:-start)?\(", section))
    return ar, cp


def test_dia_standard_collectives_per_iteration():
    ar, cp = _body_permutes(_compiled_dia_hlo("standard"))
    assert ar == 2
    assert cp == 2  # the ring halo's two ppermutes per SpMV


def test_dia_sstep_matrix_powers_kernel_collectives():
    """The banded s-step path must ride the matrix-powers kernel: ONE
    widened ring halo (2 ppermutes) + ONE Gram psum per s-iteration block —
    versus the standard loop's s*(2 ppermutes + 2 psums)."""
    ar, cp = _body_permutes(_compiled_dia_hlo("sstep", s=4))
    assert ar == 1, f"one Gram psum per block expected, got {ar}"
    assert cp == 2, (
        f"the MPK basis must exchange ONE s*w-wide halo per block "
        f"(2 ppermutes), got {cp}"
    )


def test_2d_decomposition_no_allgather():
    """The 2-D block decomposition's whole point: NO n-byte all-gather in
    the loop body — one n/p mesh-transpose permute + the q-partial psum
    (plus standard CG's two dot psums)."""
    from conjugategradient_tpu.parallel import (
        make_mesh_2d,
        partition_csr_blocks_2d,
        sharded_cg_solve_2d,
    )

    rows, cols, vals, shape = poisson2d_coo(16)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    blocks, bcols, n_pad = partition_csr_blocks_2d(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, 2, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32))
    )
    mesh = make_mesh_2d(2)
    sc._SOLVE_CACHE.clear()
    sharded_cg_solve_2d(
        jnp.asarray(blocks), jnp.asarray(bcols), b, mesh=mesh,
        tol=0.0, maxiter=4,
    )
    ((key, fn),) = list(sc._SOLVE_CACHE.items())
    put_op = lambda a: jax.device_put(a, NamedSharding(mesh, P("rp", "cp")))
    put_v = lambda a: jax.device_put(a, NamedSharding(mesh, P("rp")))
    args = [put_op(jnp.asarray(blocks)), put_op(jnp.asarray(bcols)),
            put_v(b), put_v(jnp.zeros_like(b))]
    txt = fn.lower(*args).compile().as_text()
    sc._SOLVE_CACHE.clear()
    ar, ag = _while_body_collectives(txt)
    ar2, cp = _body_permutes(txt)
    assert ag == 0, f"2-D loop must not all-gather, got {ag}"
    assert cp == 1, f"one mesh-transpose permute per iteration, got {cp}"
    assert ar == 3, f"q-partial psum + 2 dot psums, got {ar}"


def test_symdia_collectives_match_full_dia():
    """Symmetric DIA on the ring must keep the full layout's PER-ITERATION
    collective count (2 ring ppermutes + 2 dot psums); the extra diagonal
    halo is ONE ppermute hoisted OUTSIDE the while-loop body."""
    from conjugategradient_tpu.parallel import (
        partition_dia_rows,
        sharded_symdia_cg_solve,
    )
    from conjugategradient_tpu.problems import banded_spd_coo
    from conjugategradient_tpu.types import DIAMatrix, SymDIAMatrix

    rows, cols, vals, shape = banded_spd_coo(256, bandwidth=4, seed=5)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    sym = SymDIAMatrix.from_dia(DIAMatrix.from_csr(A))
    n = shape[0]
    diags_sh, n_pad = partition_dia_rows(np.asarray(sym.diags), shape, N_DEV)
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32))
    )
    mesh = make_row_mesh(jax.devices()[:N_DEV])
    sc._SOLVE_CACHE.clear()
    sharded_symdia_cg_solve(
        jnp.asarray(diags_sh, jnp.float32), sym.offsets, b,
        mesh=mesh, tol=0.0, maxiter=4,
    )
    ((key, fn),) = list(sc._SOLVE_CACHE.items())
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("rows")))
    args = [put(jnp.asarray(diags_sh, jnp.float32)), put(b),
            put(jnp.zeros_like(b))]
    txt = fn.lower(*args).compile().as_text()
    sc._SOLVE_CACHE.clear()
    ar, cp = _body_permutes(txt)
    assert ar == 2, f"2 dot psums per iteration, got {ar}"
    assert cp == 2, f"2 ring ppermutes per iteration, got {cp}"
    # the diagonal halo is loop-invariant: at least one collective-permute
    # exists OUTSIDE the loop body
    total_cp = len(re.findall(r"collective-permute(?:-start)?\(", txt))
    assert total_cp > cp, "the once-per-solve diagonal halo went missing"


def test_2d_batched_no_allgather():
    """2-D × multi-RHS (round-5 VERDICT item 10): the lockstep lanes keep
    the 2-D scheme's collective shape — one mesh-transpose permute + the
    q-partial psum + 2 (R,)-payload dot psums, ZERO all-gathers."""
    from conjugategradient_tpu.parallel import (
        make_mesh_2d,
        partition_csr_blocks_2d,
        sharded_cg_solve_2d_batched,
    )

    rows, cols, vals, shape = poisson2d_coo(16)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    blocks, bcols, n_pad = partition_csr_blocks_2d(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, 2, bm=8, bn=8,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32)))
    B = jnp.stack([b, 2.0 * b, jnp.roll(b, 1)])
    mesh = make_mesh_2d(2)
    sc._SOLVE_CACHE.clear()
    sharded_cg_solve_2d_batched(
        jnp.asarray(blocks), jnp.asarray(bcols), B, mesh=mesh,
        tol=0.0, maxiter=4,
    )
    ((key, fn),) = list(sc._SOLVE_CACHE.items())
    put_op = lambda a: jax.device_put(a, NamedSharding(mesh, P("rp", "cp")))
    put_r = lambda a: jax.device_put(a, NamedSharding(mesh, P()))
    put_v = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "rp")))
    args = [put_op(jnp.asarray(blocks)), put_op(jnp.asarray(bcols)),
            put_r(jnp.asarray(0.0, jnp.float32)), put_v(B),
            put_v(jnp.zeros_like(B))]
    txt = fn.lower(*args).compile().as_text()
    sc._SOLVE_CACHE.clear()
    ar, ag = _while_body_collectives(txt)
    ar2, cp = _body_permutes(txt)
    assert ag == 0, f"2-D batched loop must not all-gather, got {ag}"
    assert cp == 1, f"one mesh-transpose permute per iteration, got {cp}"
    assert ar == 3, f"q-partial psum + 2 lane-dot psums, got {ar}"


def test_fused_sharded_minres_collective_pattern():
    """Round 5: the FUSED sharded MINRES loop (interpret kernels on the
    CPU mesh) must keep exactly the fused CG path's collective count —
    one halo all-gather + two all-reduce rounds (the stacked [v·q, v·r1]
    psum and the β² psum) per iteration."""
    from conjugategradient_tpu.problems import banded_spd_coo

    rows, cols, vals, shape = banded_spd_coo(1024, bandwidth=4, seed=1)
    A = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
    blocks, bcols, n_pad = partition_csr_rows(
        np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr),
        shape, N_DEV, bm=128, bn=128,
    )
    n = shape[0]
    b = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        jnp.asarray(reference_rhs(n, dtype=np.float32)))
    mesh = make_row_mesh(jax.devices()[:N_DEV])
    sc._SOLVE_CACHE.clear()
    sharded_cg_solve(
        jnp.asarray(blocks), jnp.asarray(bcols), b, mesh=mesh,
        tol=0.0, maxiter=4, method="minres", use_fused="always",
        interpret=True,
    )
    ((key, fn),) = list(sc._SOLVE_CACHE.items())
    put = lambda a: jax.device_put(a, NamedSharding(mesh, P("rows")))
    args = [put(jnp.asarray(blocks)), put(jnp.asarray(bcols)), put(b),
            put(jnp.zeros_like(b))]
    txt = fn.lower(*args).compile().as_text()
    sc._SOLVE_CACHE.clear()
    ar, ag = _while_body_collectives(txt)
    assert ag == 1, f"fused minres: one gather per iteration, got {ag}"
    assert ar == 2, f"fused minres: two psum rounds per iteration, got {ar}"
