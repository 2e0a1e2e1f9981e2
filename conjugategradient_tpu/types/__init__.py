"""Operator containers: the TPU-native rebuild of the reference's device types.

The reference (``src/LinearAlgebraTypes.hpp``) holds a CSR matrix as three raw
USM device arrays (``Matrix<DT>``, LinearAlgebraTypes.hpp:57-132) plus
``Vector``/``Scalar`` containers.  On TPU all of that collapses into JAX device
arrays living in HBM; what remains worth designing is the *layout*:

* :class:`CSRMatrix` — faithful CSR (data/indices/indptr), with a
  precomputed ``row_ids`` array so SpMV is a single gather + segment-sum.
  This is the portable / oracle layout.
* :class:`BlockedEllMatrix` — the TPU-fast layout: rows padded to blocks of
  ``bm``, columns grouped into blocks of ``bn``; each row-block stores a fixed
  number ``kmax`` of dense ``(bm, bn)`` tiles plus the column-block index of
  each tile.  SpMV becomes dense tile × vector products that the MXU/VPU can
  stream at HBM bandwidth (see ``ops/pallas/ell_spmv.py``).
* :class:`DenseOperator` — dense SPD systems ride the MXU directly.
* :class:`StencilOperator` — matrix-free 3-D 7-point stencil (no matrix in
  memory at all; the reference has no equivalent, it is a north-star
  extension).
* :class:`MatrixFreeOperator` — wraps any ``x -> Ax`` callable.

All containers are registered pytrees, so they pass through ``jit``,
``lax.while_loop`` carries, and ``shard_map`` untouched.

Round 5: ``types`` is now a package (base / csr / bell / dia / sell /
stencil) with this unchanged public import surface.
"""

from .base import (
    DenseOperator,
    LinearOperator,
    MatrixFreeOperator,
    as_linear_operator,
    _cdiv,
)
from .bell import BlockedEllMatrix, SymBellMatrix
from .csr import CSRMatrix
from .dia import DIAMatrix, SymDIAMatrix
from .sell import SellMatrix, _sell_ladder, _sell_pack_rows
from .stencil import StencilOperator

__all__ = [
    "LinearOperator",
    "CSRMatrix",
    "BlockedEllMatrix",
    "SymBellMatrix",
    "DIAMatrix",
    "SymDIAMatrix",
    "SellMatrix",
    "DenseOperator",
    "StencilOperator",
    "MatrixFreeOperator",
    "as_linear_operator",
]
