"""SPD problem generators for tests and benchmarks.

The reference vendors no matrices (users supply SuiteSparse .mtx files,
test/Tester.cpp:14-21); with zero egress in this environment we generate
equivalent SPD problems deterministically instead, and tools/fetch_suitesparse.py
downloads the real ones when a network exists.
"""

from __future__ import annotations

import numpy as np


def poisson2d_coo(nx: int, ny: int = None):
    """5-point 2-D Poisson (Dirichlet) — the classic SPD test matrix."""
    ny = ny or nx
    n = nx * ny

    def idx(i, j):
        return i * ny + j

    rows, cols, vals = [], [], []
    for i in range(nx):
        for j in range(ny):
            r = idx(i, j)
            rows.append(r)
            cols.append(r)
            vals.append(4.0)
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < nx and 0 <= jj < ny:
                    rows.append(r)
                    cols.append(idx(ii, jj))
                    vals.append(-1.0)
    return (
        np.array(rows, dtype=np.int64),
        np.array(cols, dtype=np.int64),
        np.array(vals, dtype=np.float64),
        (n, n),
    )


def random_spd_dense(n: int, seed: int = 0, cond: float = 100.0) -> np.ndarray:
    """Dense SPD with controlled condition number (for dense-CG config 1)."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.geomspace(1.0, cond, n)
    return (q * eigs) @ q.T


def banded_spd_coo(n: int, bandwidth: int = 4, seed: int = 0):
    """Random banded diagonally-dominant SPD matrix (synthetic SuiteSparse
    stand-in; band structure keeps blocked-ELL padding low, like 1138_bus)."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    offdiag = {}
    for i in range(n):
        for d in range(1, bandwidth + 1):
            j = i + d
            if j < n and rng.random() < 0.6:
                v = -rng.random()
                offdiag[(i, j)] = v
    for (i, j), v in offdiag.items():
        rows += [i, j]
        cols += [j, i]
        vals += [v, v]
    # diagonal dominance => SPD
    diag = np.full(n, 1.0)
    for (i, j), v in offdiag.items():
        diag[i] += abs(v)
        diag[j] += abs(v)
    rows += list(range(n))
    cols += list(range(n))
    vals += list(diag)
    return (
        np.array(rows, dtype=np.int64),
        np.array(cols, dtype=np.int64),
        np.array(vals, dtype=np.float64),
        (n, n),
    )


def reference_rhs(n: int, dtype=np.float64) -> np.ndarray:
    """The harness RHS: b[i] = i + 1 (test/Tester.cpp:27-30)."""
    return np.arange(1, n + 1, dtype=dtype)
