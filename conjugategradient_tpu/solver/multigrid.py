"""Geometric multigrid V-cycle preconditioner for the matrix-free stencil.

The reference solves every system with plain CG (src/CG.hpp:255-454); its
iteration count grows like sqrt(kappa) ~ O(n_x) on Poisson problems.  For
the regular-grid operators this framework adds (types.StencilOperator,
BASELINE config 4), the TPU-idiomatic answer is geometric multigrid: every
component — damped-Jacobi smoothing, full-weighting restriction, linear
prolongation, a rediscretized coarse stencil — is a dense, statically
shaped, regular-memory-access pass that XLA fuses and streams at bandwidth,
and the whole V-cycle recursion unrolls at trace time into one compiled
program (no dynamic control flow).  Used as ``M=`` in
:func:`~conjugategradient_tpu.cg_solve`, it makes the iteration count
essentially mesh-independent (O(10) instead of O(n_x)).

Design notes (all verified by tests/test_multigrid.py):

* **Vertex coarsening at odd fine indices.**  Coarse point ``c`` sits at
  fine index ``2c + 1`` (physical position ``2h·(c+1)`` for a Dirichlet box
  with spacing ``h``), so ``n_c = n // 2`` — defined for EVERY n >= 2, not
  just the textbook ``2^k - 1`` sizes.  On even sizes the right edge is
  h-asymmetric; as a *preconditioner* inside CG that costs a couple of
  iterations, not correctness.
* **P = linear interpolation, R = (1/2)^d P^T** (full weighting).  The
  transpose pairing plus equal pre/post smoothing sweeps makes the V-cycle
  operator SYMMETRIC, which PCG requires; symmetry is asserted to 1e-12 in
  the tests rather than assumed.
* **Rediscretized coarse operator, x4 residual scale.**  The stencil
  (center, off) is dimensionless — it is ``h^2 A_h``.  Halving the grid
  doubles h, so the coarse equation in dimensionless form is
  ``S e = 4 · R r`` at every level (the factor is d-independent: it is the
  ``h^2`` in front of the operator, not the volume element).  Dropping the
  4 breaks the h-hierarchy and multigrid degrades to a smoother.
* **Damped Jacobi smoother** ``x += (omega / center) (b - S x)``: the
  diagonal is constant so this is one fused stream per sweep, and Jacobi
  is self-adjoint, preserving V-cycle symmetry.
* **Dense coarsest solve.**  The hierarchy bottoms out at
  ``<= coarse_size`` points; the stencil matrix there is assembled on host
  (float64), inverted once at build time, and the inverse rides the solve
  as a jit constant (VMEM-pinned, docs/performance.md) — the coarse solve
  is one tiny MXU matmul at ``Precision.HIGHEST`` (CLAUDE.md: default
  precision rounds through bf16 and breaks CG-feeding paths).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stencil import _neighbor_sum
from ..types import StencilOperator


def _coarse_shape(shape: Tuple[int, int, int]) -> Tuple[int, int, int]:
    """Next-level grid: halve every axis that still has >= 2 points."""
    return tuple((n // 2) if n >= 2 else n for n in shape)


def _restrict_axis0(u: jax.Array) -> jax.Array:
    """Full-weighting restriction along axis 0 (coarse c <- fine 2c+1)."""
    n = u.shape[0]
    nc = n // 2
    upad = jnp.pad(u, ((0, 1),) + ((0, 0),) * (u.ndim - 1))
    a = jax.lax.slice_in_dim(upad, 0, 2 * nc - 1, 2, axis=0)  # f[2c]
    b = jax.lax.slice_in_dim(upad, 1, 2 * nc, 2, axis=0)  # f[2c+1]
    c = jax.lax.slice_in_dim(upad, 2, 2 * nc + 1, 2, axis=0)  # f[2c+2]
    return 0.25 * a + 0.5 * b + 0.25 * c


def _prolong_axis0(e: jax.Array, n: int) -> jax.Array:
    """Linear interpolation along axis 0: exact transpose of
    ``2 * _restrict_axis0`` (tests assert the adjoint identity).

    The interleave is a stack + reshape, NOT a strided ``.at[::2].set``
    scatter — on TPU the scatter lowering dominated the whole V-cycle
    (measured 256^3: ~15.6 ms/PCG-iteration with scatters vs ~4 stencil
    passes' worth without)."""
    nc = e.shape[0]
    ce = n - nc  # number of even fine indices (= ceil(n/2))
    rest = ((0, 0),) * (e.ndim - 1)
    e_left = jnp.pad(e, ((1, 0),) + rest)[:ce]  # e[c-1], zero at c=0
    e_right = jnp.pad(e, ((0, 1),) + rest)[:ce]  # e[c], zero past the end
    even = 0.5 * (e_left + e_right)
    if n == 2 * nc:  # even size: perfect [even, odd] interleave
        return jnp.stack([even, e], axis=1).reshape((n,) + e.shape[1:])
    # odd size (n == 2*nc + 1): interleave the first 2*nc, append even[nc]
    body = jnp.stack([even[:nc], e], axis=1).reshape((2 * nc,) + e.shape[1:])
    return jnp.concatenate([body, even[nc:]], axis=0)


def _restrict(u: jax.Array, coarse: Tuple[int, int, int]) -> jax.Array:
    for axis in range(3):
        if coarse[axis] != u.shape[axis]:
            u = jnp.moveaxis(
                _restrict_axis0(jnp.moveaxis(u, axis, 0)), 0, axis
            )
    return u


def _prolong(e: jax.Array, fine: Tuple[int, int, int]) -> jax.Array:
    for axis in range(3):
        if fine[axis] != e.shape[axis]:
            e = jnp.moveaxis(
                _prolong_axis0(jnp.moveaxis(e, axis, 0), fine[axis]), 0, axis
            )
    return e


def _stencil_apply(u: jax.Array, center, off) -> jax.Array:
    return center * u + off * _neighbor_sum(u)


def _dense_stencil_inverse(
    shape: Tuple[int, int, int], center: float, off: float
) -> np.ndarray:
    """Assemble the coarsest-level stencil matrix densely (float64) and
    invert it.  Mirrors ops/stencil.poisson7_csr's connectivity for
    arbitrary (center, off)."""
    nx, ny, nz = shape
    n = nx * ny * nz
    A = np.zeros((n, n), dtype=np.float64)
    idx = lambda i, j, k: (i * ny + j) * nz + k
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                r = idx(i, j, k)
                A[r, r] = center
                for di, dj, dk in (
                    (-1, 0, 0), (1, 0, 0), (0, -1, 0),
                    (0, 1, 0), (0, 0, -1), (0, 0, 1),
                ):
                    ii, jj, kk = i + di, j + dj, k + dk
                    if 0 <= ii < nx and 0 <= jj < ny and 0 <= kk < nz:
                        A[r, idx(ii, jj, kk)] = off
    return np.linalg.inv(A)


def _level_shapes(
    shape: Tuple[int, int, int], coarse_size: int, max_levels: Optional[int]
) -> List[Tuple[int, int, int]]:
    shapes = [tuple(shape)]
    while True:
        if max_levels is not None and len(shapes) >= max_levels:
            break
        if int(np.prod(shapes[-1])) <= coarse_size:
            break
        nxt = _coarse_shape(shapes[-1])
        if nxt == shapes[-1]:
            break
        shapes.append(nxt)
    return shapes


def _stencil_rho_bound(shape: Tuple[int, int, int], center: float,
                       off: float) -> float:
    """Gershgorin bound on rho(D^-1 S): the max row gets 2 neighbors per
    axis with >= 3 points, 1 per length-2 axis, 0 per singleton axis."""
    k = sum(0 if n <= 1 else (1 if n == 2 else 2) for n in shape)
    return (abs(center) + k * abs(off)) / center


def _make_vcycle(shapes, center, off, inv_diag_omega, inv_coarse, nu: int,
                 smoother: str = "jacobi", cheb_steps=None):
    """Build the recursive V-cycle ``(level, b) -> approx solution`` over
    the given level hierarchy.  Shared by the single-device preconditioner
    and the agglomerated (replicated) coarse tail of the sharded one
    (parallel/sharded_multigrid.py) so both compute the SAME operator.

    ``smoother="chebyshev"`` runs the degree-``nu`` preconditioned
    Chebyshev semi-iteration (solver/amg._cheb_smooth_steps) instead of
    nu damped-Jacobi sweeps; the dimensionless stencil is IDENTICAL on
    every level (the h^2 scale lives in the residual transfer), so ONE
    static (step_1, coeffs) schedule serves the whole hierarchy.  Here
    ``inv_diag_omega`` must be the RAW 1/center."""
    if smoother == "chebyshev":
        step1, coeffs = cheb_steps

    def smooth(u: jax.Array, b: jax.Array) -> jax.Array:
        # nu is O(1) and shapes are static: unroll (a fori_loop would
        # re-materialize the carry; unrolled sweeps fuse into nu streams)
        if smoother == "chebyshev":
            z = inv_diag_omega * (b - _stencil_apply(u, center, off))
            d = step1 * z
            u = u + d
            for c_d, c_z in coeffs:
                z = inv_diag_omega * (b - _stencil_apply(u, center, off))
                d = c_d * d + c_z * z
                u = u + d
            return u
        for _ in range(nu):
            u = u + inv_diag_omega * (b - _stencil_apply(u, center, off))
        return u

    def smooth_from_zero(b: jax.Array) -> jax.Array:
        # sweep 1 from the zero guess is analytically a scaling of b
        # (saves one full stencil pass per level)
        if smoother == "chebyshev":
            d = step1 * (inv_diag_omega * b)
            u = d
            for c_d, c_z in coeffs:
                z = inv_diag_omega * (b - _stencil_apply(u, center, off))
                d = c_d * d + c_z * z
                u = u + d
            return u
        u = inv_diag_omega * b
        for _ in range(nu - 1):
            u = u + inv_diag_omega * (b - _stencil_apply(u, center, off))
        return u

    def v_cycle(level: int, b: jax.Array) -> jax.Array:
        """Solve S u = b approximately on `level` (zero initial guess)."""
        if level == len(shapes) - 1:
            flat = jnp.matmul(
                inv_coarse,
                b.reshape(-1),
                precision=jax.lax.Precision.HIGHEST,
            )
            return flat.reshape(shapes[level])
        u = smooth_from_zero(b)
        r = b - _stencil_apply(u, center, off)
        # dimensionless stencil at every level => h^2 scale factor of 4
        r_c = 4.0 * _restrict(r, shapes[level + 1])
        e_c = v_cycle(level + 1, r_c)
        u = u + _prolong(e_c, shapes[level])
        return smooth(u, b)

    return v_cycle


def multigrid_preconditioner(
    A: Any,
    *,
    nu: int = 2,
    omega: float = 0.85,
    cycles: int = 1,
    coarse_size: int = 512,
    max_levels: Optional[int] = None,
    smoother: str = "jacobi",
    cheb_lower: float = 1.0 / 6.0,
) -> Callable[[jax.Array], jax.Array]:
    """Build ``M⁻¹ r`` = ``cycles`` symmetric geometric-multigrid V-cycles.

    Args:
      A: a :class:`~conjugategradient_tpu.types.StencilOperator` (the
        matrix-free 7-point family; 2-D problems ride as ``(nx, ny, 1)``
        grids with ``center=4``).
      nu: smoothing sweeps — used for BOTH pre- and post-smoothing (equal
        counts are what keep the cycle symmetric; an asymmetric split would
        silently break PCG).
      omega: Jacobi damping.  0.85 ≈ the 6/7 smoothing-optimal factor for
        the 3-D 7-point operator; anything in (0, 1) is safe.
      cycles: V-cycles per apply.  >1 trades matvecs for fewer (and
        cheaper-to-reduce) CG iterations — same trade as
        ``chebyshev_preconditioner(degree=...)``.
      coarse_size: stop coarsening at ``<=`` this many points and solve
        densely (host-built float64 inverse, applied as a jit-constant
        matmul).
      max_levels: optional cap on hierarchy depth (None = coarsen to
        ``coarse_size``).
      smoother: "jacobi" (default) or "chebyshev" — the degree-``nu``
        preconditioned Chebyshev semi-iteration on D^-1 S over
        [cheb_lower*rho, rho] (Gershgorin rho; one static schedule for
        the whole hierarchy since the dimensionless stencil repeats per
        level).  Same stencil-pass count per sweep set; ``omega`` is
        ignored (the polynomial owns its step sizes); commuting factors
        keep the cycle symmetric for PCG.
      cheb_lower: Chebyshev interval lower end as a fraction of the
        Gershgorin bound (only read when smoother="chebyshev").

    Returns an ``apply`` closure for ``cg_solve(..., M=apply)``.  Building
    is host-side work (dense coarsest inverse); reuse the closure across
    solves like the other preconditioner builders in this module's family.
    """
    if not isinstance(A, StencilOperator):
        raise TypeError(
            "multigrid_preconditioner is the geometric (regular-grid) "
            f"preconditioner and needs a StencilOperator, got {type(A).__name__}; "
            "for assembled sparse operators use block_jacobi_preconditioner "
            "or chebyshev_preconditioner"
        )
    if nu < 1:
        raise ValueError(f"nu must be >= 1, got {nu}")
    if not (0.0 < omega < 2.0):
        raise ValueError(f"omega must be in (0, 2), got {omega}")
    if cycles < 1:
        raise ValueError(f"cycles must be >= 1, got {cycles}")
    if smoother not in ("jacobi", "chebyshev"):
        raise ValueError(
            f"smoother must be 'jacobi' or 'chebyshev', got {smoother!r}")
    if not (0.0 < cheb_lower < 1.0):
        raise ValueError(f"cheb_lower must be in (0, 1), got {cheb_lower}")

    shapes = _level_shapes(A.grid_shape, coarse_size, max_levels)
    center_f = float(A.center)
    off_f = float(A.off)
    if center_f <= 0.0:
        raise ValueError(
            f"stencil center must be positive for an SPD operator, got {center_f}"
        )
    dtype = A.dtype
    inv_coarse = jnp.asarray(
        _dense_stencil_inverse(shapes[-1], center_f, off_f), dtype=dtype
    )
    center = jnp.asarray(center_f, dtype=dtype)
    off = jnp.asarray(off_f, dtype=dtype)
    cheb_steps = None
    if smoother == "chebyshev":
        from .amg import _cheb_smooth_steps

        rho_b = _stencil_rho_bound(shapes[0], center_f, off_f)
        cheb_steps = _cheb_smooth_steps(cheb_lower * rho_b, rho_b, nu)
        inv_diag_omega = jnp.asarray(1.0 / center_f, dtype=dtype)
    else:
        inv_diag_omega = jnp.asarray(omega / center_f, dtype=dtype)
    v_cycle = _make_vcycle(shapes, center, off, inv_diag_omega, inv_coarse,
                           nu, smoother=smoother, cheb_steps=cheb_steps)

    nx, ny, nz = shapes[0]

    def apply(rhs: jax.Array) -> jax.Array:
        b = rhs.reshape(nx, ny, nz)
        z = v_cycle(0, b)
        for _ in range(cycles - 1):
            z = z + v_cycle(0, b - _stencil_apply(z, center, off))
        return z.reshape(rhs.shape)

    return apply
