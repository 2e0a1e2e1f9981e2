"""Reference-compatible object API.

The reference exposes a stateful solver object (class ``CG``,
src/CG.hpp:53-601): construct via ``createCG()`` (:70), feed it the system
with ``setMatrix`` (:87) / ``setTarget`` (:164) / ``setInital``/``setInitial``
(:215,:244), run ``solve(improvement)`` (:255), then inspect with
``accuracy()`` (:463), ``extract()``/``extractTo()`` (:517,:529),
``getDimension()`` (:156) and ``memoryFootprint()`` (:555).

The TPU-native framework is functional (solver/cg.py: one ``cg_solve`` call),
but users migrating from the reference get this drop-in shaped wrapper.  It
validates the same preconditions (missing matrix/target raise, CG.hpp:266-272),
defaults x0 to zero (CG.hpp:291-297), treats ``improvement`` as an absolute
tolerance on ‖r‖₂ (CG.hpp:401-402), and caps iterations at N+1 like the
reference's do-while (CG.hpp:436).  Extras that the reference kept device-side
or didn't expose are available after ``solve``: ``iterations``, ``converged``,
``residual_history``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .solver.cg import accuracy as _accuracy
from .solver.cg import cg_solve, expected_step_count, memory_footprint
from .types import CSRMatrix, LinearOperator, as_linear_operator


class CG:
    """Stateful wrapper over :func:`conjugategradient_tpu.cg_solve`.

    Mirrors the reference's usage pattern (test/Tester.cpp:36-53)::

        cg = CG.createCG()
        cg.setMatrix(data, cols, rows)      # host CSR arrays
        cg.setTarget(b)
        cg.solve(1e-24)
        x = cg.extract()
        err = cg.accuracy()
    """

    def __init__(self, dtype=jnp.float64, verbose: bool = False):
        """``verbose`` plays the role of the reference's compile-time
        ``Debuglevel`` template parameter (LinearAlgebraTypes.hpp:26-30)."""
        # The reference's DT is double (test/Tester.cpp:10); honoring a
        # float64 default requires x64 mode, which JAX disables by default —
        # without this the wrapper would silently solve in float32.
        if jnp.dtype(dtype) == jnp.dtype("float64"):
            jax.config.update("jax_enable_x64", True)
        self._dtype = jnp.dtype(dtype)
        self._A: Optional[LinearOperator] = None
        self._b: Optional[jax.Array] = None
        self._x0: Optional[jax.Array] = None
        self._x: Optional[jax.Array] = None
        self._info = None
        self._nnz = 0
        if verbose:
            from .utils.logging import set_verbosity

            set_verbosity("verbose")

    # -- construction (CG.hpp:70-77) --------------------------------------
    @staticmethod
    def createCG(dtype=jnp.float64, verbose: bool = False) -> "CG":
        """Factory mirroring the reference's ``createCG()`` (the queue it
        hides there is the implicit JAX default device here)."""
        return CG(dtype=dtype, verbose=verbose)

    # -- system ingestion ---------------------------------------------------
    def setMatrix(self, data, columns=None, rows=None) -> None:
        """Set the operator.

        Either ``setMatrix(data, columns, rows)`` with host CSR arrays
        (values / column indices / row offsets — the reference's signature,
        CG.hpp:87-93), or ``setMatrix(operator)`` with any LinearOperator /
        scipy.sparse matrix / dense array (generalizing the reference's
        device-move and external-framework adapter overloads, CG.hpp:102-151
        — the HiFlow overload's TPU-era equivalent is scipy.sparse ingest).
        """
        if columns is None and rows is None:
            self._A = as_linear_operator(data, dtype=self._dtype)
            self._nnz = getattr(self._A, "nnz", 0)
            return
        csr = CSRMatrix.from_arrays(
            np.asarray(data), np.asarray(columns), np.asarray(rows),
            dtype=self._dtype,
        )
        self._A = csr
        self._nnz = csr.nnz

    def setTarget(self, target: Sequence) -> None:
        """Right-hand side b (CG.hpp:164-170)."""
        self._b = jnp.asarray(np.asarray(target), dtype=self._dtype)

    def setInitial(self, x0: Sequence) -> None:
        """Initial guess (CG.hpp:244-253; defaults to zero if never called,
        CG.hpp:291-297)."""
        self._x0 = jnp.asarray(np.asarray(x0), dtype=self._dtype)

    # The reference has a typo'd spelling too (``setInital``, CG.hpp:215);
    # keep it as an alias so migrated call sites compile unchanged.
    setInital = setInitial

    # -- solve (CG.hpp:255-454) -------------------------------------------
    def solve(self, improvement: float = 0.0, maxiter: Optional[int] = None):
        """Run CG with ``improvement`` as the absolute tolerance on ‖r‖₂.

        Raises if the matrix or target is missing (CG.hpp:266-272).
        Returns self for chaining.
        """
        if self._b is None:
            raise RuntimeError("No b vector specified")
        if self._A is None:
            raise RuntimeError("No Matrix specified")
        # The reference persists the solution across solve() calls — a
        # second solve warm-starts from the previous x (CG.hpp:291-297
        # zero-inits only when x was never allocated); reproduce that.
        x0 = self._x if self._x is not None else self._x0
        self._x, self._info = cg_solve(
            self._A, self._b, x0, tol=improvement, maxiter=maxiter
        )
        return self

    # -- inspection ----------------------------------------------------------
    def accuracy(self) -> float:
        """|Σ(b−Ax)² / Σx²| — squared-norm ratio (CG.hpp:463-515)."""
        if self._x is None:
            raise RuntimeError("solve() has not been run")
        return float(_accuracy(self._A, self._b, self._x))

    def extract(self) -> np.ndarray:
        """Copy the solution to host (CG.hpp:517-523)."""
        if self._x is None:
            raise RuntimeError("solve() has not been run")
        return np.asarray(self._x)

    def extractTo(self, out) -> None:
        """Copy the solution into a caller buffer (CG.hpp:529-532)."""
        x = self.extract()
        if isinstance(out, list):
            out[:] = x.tolist()
        else:
            out[...] = x

    def getDimension(self) -> int:
        """System dimension N (CG.hpp:156-162)."""
        if self._A is None:
            raise RuntimeError("No Matrix specified")
        return self._A.shape[0]

    def memoryFootprint(self) -> int:
        """The reference's analytic estimate (CG.hpp:555-558)."""
        if self._A is None:
            raise RuntimeError("No Matrix specified")
        return memory_footprint(
            self._A.shape[0], self._nnz or self._A.shape[0], dtype=self._dtype
        )

    def calculateExpectedStepCount(self, accuracy: float) -> int:
        """Predicted iterations to an A-norm error reduction of ``accuracy``.

        The reference declares this with an EMPTY body (CG.hpp:235) — the API
        exists but does nothing; here it is implemented via a Lanczos
        condition-number estimate and the CG convergence bound
        (solver/cg.expected_step_count).  Returns the count instead of the
        reference's void.
        """
        if self._A is None:
            raise RuntimeError("No Matrix specified")
        return expected_step_count(self._A, accuracy)

    # -- extras the reference kept device-side ------------------------------
    @property
    def iterations(self) -> int:
        return int(self._info.iterations) if self._info is not None else 0

    @property
    def converged(self) -> bool:
        return bool(self._info.converged) if self._info is not None else False

    @property
    def residual_history(self) -> np.ndarray:
        """‖r_k‖² per iteration (the device scalar ``rxr`` the reference
        never exposed; SURVEY §2.3(8))."""
        if self._info is None:
            raise RuntimeError("solve() has not been run")
        k = self.iterations
        return np.asarray(self._info.rho_history)[: k + 1]
