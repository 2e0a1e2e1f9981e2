"""High-level matrix ingest: file → device operator.

Chooses the native C++ parser when available (io/native.py), falls back to
the pure-Python reader, and converts to the requested device layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..types import BlockedEllMatrix, CSRMatrix


def read_csr_host(path, dtype=np.float64):
    """Parse a .mtx file to host CSR, preferring the native C++ reader."""
    from . import native

    if native.available():
        return native.read_mtx_csr_native(path, dtype=dtype)
    from .mtx import read_mtx_csr

    return read_mtx_csr(path, dtype=dtype)


def load_matrix(
    path,
    layout: str = "csr",
    dtype=np.float32,
    bm: int = 128,
    bn: int = 128,
):
    """Load a MatrixMarket file as a device operator.

    layout: "csr" (portable) or "bell" (blocked-ELL, the TPU fast path).
    """
    data, indices, indptr, shape = read_csr_host(path, dtype=np.float64)
    if layout == "csr":
        return CSRMatrix.from_arrays(data, indices, indptr, shape, dtype=dtype)
    if layout == "bell":
        return BlockedEllMatrix.from_csr_host(
            data.astype(dtype), indices, indptr, shape, bm=bm, bn=bn
        )
    raise ValueError(f"unknown layout {layout!r} (want 'csr' or 'bell')")
