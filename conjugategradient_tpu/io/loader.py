"""High-level matrix ingest: file → device operator.

Chooses the native C++ parser when available (io/native.py), falls back to
the pure-Python reader, optionally RCM-reorders (reorder.py), and converts
to the requested device layout — or picks one automatically:

* ``dia``  — diagonal storage; best when the matrix is banded (low distinct
  diagonal count): zero index traffic, pure streaming.
* ``bell`` — blocked-ELL dense tiles; best for block-structured matrices.
* ``sell`` — degree-bucketed ELL; the fast path for SCATTERED patterns
  (power-law graphs, circuits) where DIA/bell padding explodes: it pays the
  irreducible per-nnz gather exactly once instead of CSR's gather +
  scalar segment-sum (measured 2.2x on v5e, docs/performance.md).
* ``csr``  — gather + segment-sum; always correct, kept as the semantic
  reference / parity-oracle layout.

The "auto" policy compares the *bandwidth overhead* (stored slots / true
nnz) each fast layout would pay and picks the cheapest, falling back to
SELL when both banded/blocked layouts pad too much.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..reorder import count_diagonals, permute_csr, rcm_permutation
from ..types import BlockedEllMatrix, CSRMatrix, DIAMatrix, SellMatrix


def read_csr_host(path, dtype=np.float64):
    """Parse a .mtx file to host CSR, preferring the native C++ reader."""
    from . import native

    if native.available():
        return native.read_mtx_csr_native(path, dtype=dtype)
    from .mtx import read_mtx_csr

    return read_mtx_csr(path, dtype=dtype)


# auto-policy thresholds: a fast layout is admissible while its padding
# (stored slots / nnz) stays under this; DIA additionally capped on diagonal
# count so the unrolled matvec stays compilable.
_DIA_MAX_PADDING = 5.0
_DIA_MAX_DIAGS = 512
_BELL_MAX_PADDING = 16.0


def choose_layout(
    indices: np.ndarray,
    indptr: np.ndarray,
    shape: Tuple[int, int],
    bm: int = 8,
    bn: int = 128,
) -> str:
    """Pick 'dia' / 'bell' / 'sell' from the sparsity pattern (see module doc)."""
    n = shape[0]
    nnz = max(int(len(indices)), 1)

    ndiag = count_diagonals(indices, indptr)
    dia_padding = ndiag * n / nnz
    if ndiag <= _DIA_MAX_DIAGS and dia_padding <= _DIA_MAX_PADDING:
        return "dia"

    # blocked-ELL padding estimate: kmax from a cheap host pass
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    rb = row_ids // bm
    cb = np.asarray(indices, dtype=np.int64) // bn
    pairs = np.unique(rb * (2**32) + cb)
    kmax_counts = np.bincount((pairs // (2**32)).astype(np.int64))
    kmax = int(kmax_counts.max()) if len(kmax_counts) else 1
    nrb = -(-n // bm)
    bell_padding = nrb * kmax * bm * bn / nnz
    if bell_padding <= _BELL_MAX_PADDING:
        return "bell"
    # scattered pattern: no streaming layout exists — bucketed ELL pays the
    # irreducible gather once per nnz vs CSR's gather + scalar segment-sum
    return "sell"


def load_matrix(
    path,
    layout: str = "auto",
    dtype=np.float32,
    bm: int = 8,
    bn: int = 128,
    reorder: bool = False,
):
    """Load a MatrixMarket file as a device operator.

    layout: "auto" (pattern-based choice), "csr", "bell", "sell", or "dia".
    reorder: apply the layout-enabling permutation first.  RCM (bandwidth
      reduction) for the streaming layouts; when the layout resolves to
      ``sell`` a stable degree sort is composed on top so the packed
      ``pos`` is the identity and the matvec skips its order-restore
      gather.  When True the return value is ``(operator, perm)`` with
      ``perm[new] = old``; solve ``A' y = b[perm]`` and map back with
      ``x[perm] = y`` (reorder.unpermute_vector).  When False returns just
      the operator.
    """
    data, indices, indptr, shape = read_csr_host(path, dtype=np.float64)

    perm = None
    if reorder:
        perm = rcm_permutation(indices, indptr, shape[0])
        data, indices, indptr = permute_csr(data, indices, indptr, shape, perm)

    if layout == "auto":
        layout = choose_layout(indices, indptr, shape, bm=bm, bn=bn)

    if layout == "sell" and reorder:
        from ..reorder import degree_sort_permutation

        dperm = degree_sort_permutation(indices, indptr, shape[0])
        data, indices, indptr = permute_csr(data, indices, indptr, shape, dperm)
        perm = perm[dperm]  # compose: total[new] = rcm[degree_sort[new]]

    if layout == "csr":
        op = CSRMatrix.from_arrays(data, indices, indptr, shape, dtype=dtype)
    elif layout == "sell":
        op = SellMatrix.from_csr_host(
            data.astype(dtype), indices, indptr, shape
        )
    elif layout == "bell":
        op = BlockedEllMatrix.from_csr_host(
            data.astype(dtype), indices, indptr, shape, bm=bm, bn=bn
        )
    elif layout == "symbell":
        # symmetric storage needs square tiles (the transpose application
        # swaps tile axes); use bn x bn.  Packs host-side end-to-end
        # (from_csr_host) — no device round-trip — with the symmetry check
        # ON so a non-symmetric general file fails loudly here
        from ..types import SymBellMatrix

        op = SymBellMatrix.from_csr_host(
            data.astype(dtype), indices, indptr, shape, bn=bn, check=True
        )
    elif layout == "dia":
        op = DIAMatrix.from_csr_host(
            data.astype(dtype), indices, indptr, shape
        )
    elif layout == "symdia":
        from ..types import SymDIAMatrix

        full = DIAMatrix.from_csr_host(
            data.astype(dtype), indices, indptr, shape
        )
        op = SymDIAMatrix.from_dia(full, check=True)
    else:
        raise ValueError(
            f"unknown layout {layout!r} "
            "(want 'auto', 'csr', 'sell', 'bell', 'symbell', 'dia' or 'symdia')"
        )
    return (op, perm) if reorder else op
