"""Matrix-free 3-D 7-point stencil operator (north-star extension — the
reference has no matrix-free path)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import LinearOperator, _cdiv



@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StencilOperator(LinearOperator):
    """Matrix-free 3-D 7-point stencil (north-star config 4).

    ``y = center * x + off * (sum of 6 axis neighbors)`` on a ``grid_shape``
    box with homogeneous Dirichlet (zero) boundaries.  For the standard
    Poisson operator use ``center=6, off=-1`` (SPD).  The reference has no
    matrix-free path; this is the extension mandated by BASELINE.json.
    Vectors are flat ``(nx*ny*nz,)``; ``matvec`` reshapes internally.
    """

    center: jax.Array  # scalar
    off: jax.Array  # scalar
    grid_shape: Tuple[int, int, int]

    def tree_flatten(self):
        return (self.center, self.off), self.grid_shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @staticmethod
    def poisson(grid_shape: Tuple[int, int, int], dtype=jnp.float32) -> "StencilOperator":
        return StencilOperator(
            jnp.asarray(6.0, dtype=dtype), jnp.asarray(-1.0, dtype=dtype), tuple(grid_shape)
        )

    @property
    def shape(self):
        n = int(np.prod(self.grid_shape))
        return (n, n)

    @property
    def dtype(self):
        return self.center.dtype

    @property
    def nnz(self) -> int:
        """LOGICAL nonzero count of the never-formed matrix: 7 per interior
        point, minus the Dirichlet-truncated couplings on each face."""
        nx, ny, nz = self.grid_shape
        n = nx * ny * nz
        return 7 * n - 2 * (ny * nz + nx * nz + nx * ny)

    def matvec(self, x: jax.Array) -> jax.Array:
        from ..ops.stencil import stencil7_matvec

        return stencil7_matvec(self, x)

    def diagonal(self) -> jax.Array:
        n = int(np.prod(self.grid_shape))
        return jnp.full((n,), self.center, dtype=self.dtype)

    def astype(self, dtype) -> "StencilOperator":
        return StencilOperator(
            self.center.astype(dtype), self.off.astype(dtype), self.grid_shape
        )
