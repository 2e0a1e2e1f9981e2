"""MatrixMarket I/O — rebuild of ``test/mm_reader.cpp`` (:13-171), minus its bugs.

The reference parses the full MatrixMarket header grammar
(mm_reader.cpp:109-144) but only implements real/coordinate/symmetric bodies
(:45), mirrors off-diagonal entries to expand symmetric storage (:68-74), and
builds CSR after a row-major sort (:76-104).  Known reference bugs we fix:

* non-strict ``<=`` sort comparator (UB for std::sort on duplicate keys) →
  numpy lexsort is stable and total;
* the extra line swallowed between header and comments (mm_reader.cpp:163-167)
  → we just stream lines.

We additionally support general / skew-symmetric symmetry, integer / pattern
fields, and the ``array`` (dense) format — superset of the reference.

A native C++ fast path for huge files lives in ``native/mm_reader.cpp`` and
is picked automatically when its shared library is built (io/native.py).
"""

from __future__ import annotations

import dataclasses
import os
from typing import TextIO, Tuple

import numpy as np


@dataclasses.dataclass
class MTXHeader:
    """Parsed ``%%MatrixMarket`` banner (ref ``Matrixinfo``, mm_reader.cpp:13-31)."""

    obj: str  # matrix
    fmt: str  # coordinate | array
    field: str  # real | integer | complex | pattern
    symmetry: str  # general | symmetric | skew-symmetric | hermitian


@dataclasses.dataclass
class COOMatrix:
    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    shape: Tuple[int, int]
    symmetric: bool = False  # was stored symmetric (already expanded here)


def parse_header(line: str) -> MTXHeader:
    parts = line.strip().split()
    if len(parts) < 5 or parts[0] != "%%MatrixMarket":
        raise ValueError(f"not a MatrixMarket banner: {line!r}")
    obj, fmt, field, symmetry = (p.lower() for p in parts[1:5])
    if obj != "matrix":
        raise ValueError(f"unsupported MatrixMarket object: {obj}")
    if fmt not in ("coordinate", "array"):
        raise ValueError(f"unsupported format: {fmt}")
    if field not in ("real", "integer", "pattern", "complex"):
        raise ValueError(f"unsupported field: {field}")
    if symmetry not in ("general", "symmetric", "skew-symmetric", "hermitian"):
        raise ValueError(f"unsupported symmetry: {symmetry}")
    return MTXHeader(obj, fmt, field, symmetry)


def read_mtx_coo(path_or_file, dtype=np.float64) -> COOMatrix:
    """Read a MatrixMarket file into (expanded) COO triplets."""
    close = False
    if isinstance(path_or_file, (str, os.PathLike)):
        f: TextIO = open(path_or_file, "r")
        close = True
    else:
        f = path_or_file
    try:
        header = parse_header(f.readline())
        if header.field == "complex":
            raise NotImplementedError("complex matrices are not supported")

        # skip comments / blank lines (ref skip_comments, mm_reader.cpp:146-152)
        line = f.readline()
        while line and (line.startswith("%") or not line.strip()):
            line = f.readline()
        if not line:
            raise ValueError("missing size line")

        size_parts = line.split()
        if header.fmt == "coordinate":
            nrows, ncols, nnz = (int(s) for s in size_parts[:3])
            rows = np.empty(nnz, dtype=np.int64)
            cols = np.empty(nnz, dtype=np.int64)
            vals = np.empty(nnz, dtype=dtype)
            pattern = header.field == "pattern"
            i = 0
            for line in f:
                s = line.split()
                if not s or line.startswith("%"):
                    continue
                if len(s) < (2 if pattern else 3):
                    raise ValueError(f"malformed entry line: {line!r}")
                r_i = int(s[0]) - 1  # 1-based -> 0-based (mm_reader.cpp:62-66)
                c_i = int(s[1]) - 1
                if not (0 <= r_i < nrows and 0 <= c_i < ncols):
                    raise ValueError(
                        f"entry index out of range: {line.strip()!r} for a "
                        f"{nrows}x{ncols} matrix (indices are 1-based)"
                    )
                rows[i] = r_i
                cols[i] = c_i
                vals[i] = 1.0 if pattern else float(s[2])
                i += 1
                if i == nnz:
                    break
            if i != nnz:
                raise ValueError(f"expected {nnz} entries, got {i}")
        else:  # array (dense column-major)
            nrows, ncols = (int(s) for s in size_parts[:2])
            data = []
            for line in f:
                if line.startswith("%") or not line.strip():
                    continue
                data.extend(float(tok) for tok in line.split())
            if header.symmetry in ("symmetric", "skew-symmetric"):
                # column-major lower triangle; skew-symmetric stores only the
                # STRICTLY lower triangle (the diagonal is implicitly zero)
                skew = header.symmetry == "skew-symmetric"
                rows_l, cols_l, vals_l = [], [], []
                it = iter(data)
                try:
                    for j in range(ncols):
                        for i in range(j + 1 if skew else j, nrows):
                            rows_l.append(i)
                            cols_l.append(j)
                            vals_l.append(next(it))
                except StopIteration:
                    raise ValueError(
                        "dense array body ends early for the declared "
                        f"{header.symmetry} {nrows}x{ncols} matrix"
                    ) from None
                rows = np.array(rows_l, dtype=np.int64)
                cols = np.array(cols_l, dtype=np.int64)
                vals = np.array(vals_l, dtype=dtype)
            else:
                vals = np.array(data, dtype=dtype)
                if vals.size != nrows * ncols:
                    raise ValueError("dense array size mismatch")
                cols, rows = np.meshgrid(
                    np.arange(ncols, dtype=np.int64),
                    np.arange(nrows, dtype=np.int64),
                )
                rows, cols = rows.T.reshape(-1), cols.T.reshape(-1)  # column-major
            nnz = len(vals)

        # symmetric expansion: mirror off-diagonals (mm_reader.cpp:68-74)
        expanded = False
        if header.symmetry in ("symmetric", "hermitian", "skew-symmetric"):
            off = rows != cols
            sign = -1.0 if header.symmetry == "skew-symmetric" else 1.0
            rows, cols, vals = (
                np.concatenate([rows, cols[off]]),
                np.concatenate([cols, rows[off]]),
                np.concatenate([vals, sign * vals[off]]),
            )
            expanded = True

        # drop explicit zeros only for pattern-expanded? Keep all (ref keeps all).
        return COOMatrix(rows, cols, vals, (nrows, ncols), symmetric=expanded)
    finally:
        if close:
            f.close()


def read_mtx_csr(path_or_file, dtype=np.float64):
    """MatrixMarket → host CSR arrays (data, indices, indptr, shape).

    Equivalent of the reference's ``read_file`` (mm_reader.cpp:154-171) which
    returns the three CSR vectors consumed by ``setMatrix``.
    """
    coo = read_mtx_coo(path_or_file, dtype=dtype)
    order = np.lexsort((coo.cols, coo.rows))  # stable row-major sort (:76-86 fixed)
    rows, cols, vals = coo.rows[order], coo.cols[order], coo.vals[order]
    if len(rows):
        # sum duplicate (row, col) entries so this path matches the native
        # reader (native/mm_reader.cpp) and CSRMatrix.from_coo: same CSR, same
        # nnz, regardless of which ingest path ran
        first = np.ones(len(rows), dtype=bool)
        first[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
        if not first.all():
            group = np.cumsum(first) - 1
            vals = np.bincount(group, weights=vals).astype(vals.dtype)
            rows, cols = rows[first], cols[first]
    indptr = np.zeros(coo.shape[0] + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    return vals, cols.astype(np.int32), indptr, coo.shape


def write_mtx(path, rows, cols, vals, shape, symmetric: bool = False, comment: str = ""):
    """Write COO triplets as a MatrixMarket coordinate/real file.

    When ``symmetric=True`` only entries with row >= col are written and the
    banner says ``symmetric`` (SuiteSparse convention: lower triangle).
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    if symmetric:
        keep = rows >= cols
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    with open(path, "w") as f:
        sym = "symmetric" if symmetric else "general"
        f.write(f"%%MatrixMarket matrix coordinate real {sym}\n")
        f.write(f"% {comment or 'written by conjugategradient_tpu'}\n")
        f.write(f"{shape[0]} {shape[1]} {len(vals)}\n")
        for r, c, v in zip(rows, cols, vals):
            f.write(f"{int(r) + 1} {int(c) + 1} {v:.17g}\n")
