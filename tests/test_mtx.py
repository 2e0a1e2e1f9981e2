"""MatrixMarket I/O tests (rebuild of test/mm_reader.cpp behavior, SURVEY §2.2 T2)."""

import io

import numpy as np
import pytest

from conjugategradient_tpu.io import native
from conjugategradient_tpu.io.mtx import parse_header, read_mtx_coo, read_mtx_csr, write_mtx


def _dense_from_csr(data, indices, indptr, shape):
    a = np.zeros(shape)
    for r in range(shape[0]):
        for j in range(indptr[r], indptr[r + 1]):
            a[r, indices[j]] += data[j]
    return a


SYM_MTX = """%%MatrixMarket matrix coordinate real symmetric
% 3x3 SPD, lower triangle (SuiteSparse convention)
3 3 5
1 1 4.0
2 1 -1.0
2 2 4.0
3 2 -1.0
3 3 4.0
"""

GENERAL_MTX = """%%MatrixMarket matrix coordinate real general
2 2 3
1 1 2.0
1 2 -1.0
2 2 2.0
"""

PATTERN_MTX = """%%MatrixMarket matrix coordinate pattern symmetric
3 3 3
1 1
2 1
3 3
"""

SKEW_MTX = """%%MatrixMarket matrix coordinate real skew-symmetric
3 3 2
2 1 5.0
3 2 -2.0
"""

ARRAY_MTX = """%%MatrixMarket matrix array real general
2 2
1.0
3.0
2.0
4.0
"""


def test_parse_header():
    h = parse_header("%%MatrixMarket matrix coordinate real symmetric")
    assert (h.fmt, h.field, h.symmetry) == ("coordinate", "real", "symmetric")
    with pytest.raises(ValueError):
        parse_header("%%NotMM matrix coordinate real general")
    with pytest.raises(ValueError):
        parse_header("%%MatrixMarket tensor coordinate real general")


def test_complex_recognized_then_rejected():
    """The reference's header grammar RECOGNIZES complex/hermitian
    (mm_reader.cpp:109-144) without implementing their bodies; we match
    that surface: the banner parses, the body read raises a precise
    NotImplementedError naming the supported fields (VERDICT r3 #8)."""
    # grammar level: complex field and hermitian symmetry both parse
    h = parse_header("%%MatrixMarket matrix coordinate complex hermitian")
    assert (h.field, h.symmetry) == ("complex", "hermitian")
    h = parse_header("%%MatrixMarket matrix array complex general")
    assert (h.fmt, h.field) == ("array", "complex")

    # body level: every complex variant is rejected with the field list
    for banner in (
        "%%MatrixMarket matrix coordinate complex general",
        "%%MatrixMarket matrix coordinate complex symmetric",
        "%%MatrixMarket matrix coordinate complex hermitian",
        "%%MatrixMarket matrix array complex general",
    ):
        src = io.StringIO(f"{banner}\n2 2 1\n1 1 1.0 0.0\n")
        with pytest.raises(NotImplementedError) as exc:
            read_mtx_coo(src)
        msg = str(exc.value)
        assert "complex" in msg
        assert "real" in msg and "integer" in msg and "pattern" in msg


def test_real_hermitian_tolerated_as_symmetric():
    """A real+hermitian banner is malformed per the MM spec (hermitian
    implies complex) but unambiguous; tolerate it as symmetric."""
    src = SYM_MTX.replace("real symmetric", "real hermitian")
    data, indices, indptr, shape = read_mtx_csr(io.StringIO(src))
    a = _dense_from_csr(data, indices, indptr, shape)
    np.testing.assert_array_equal(
        a, np.array([[4, -1, 0], [-1, 4, -1], [0, -1, 4]], dtype=float)
    )


def test_symmetric_expansion():
    """Off-diagonals are mirrored (ref mm_reader.cpp:68-74)."""
    data, indices, indptr, shape = read_mtx_csr(io.StringIO(SYM_MTX))
    a = _dense_from_csr(data, indices, indptr, shape)
    expected = np.array([[4, -1, 0], [-1, 4, -1], [0, -1, 4]], dtype=float)
    np.testing.assert_array_equal(a, expected)


def test_general():
    data, indices, indptr, shape = read_mtx_csr(io.StringIO(GENERAL_MTX))
    a = _dense_from_csr(data, indices, indptr, shape)
    np.testing.assert_array_equal(a, [[2, -1], [0, 2]])


def test_pattern():
    data, indices, indptr, shape = read_mtx_csr(io.StringIO(PATTERN_MTX))
    a = _dense_from_csr(data, indices, indptr, shape)
    np.testing.assert_array_equal(a, [[1, 1, 0], [1, 0, 0], [0, 0, 1]])


def test_skew_symmetric():
    data, indices, indptr, shape = read_mtx_csr(io.StringIO(SKEW_MTX))
    a = _dense_from_csr(data, indices, indptr, shape)
    assert a[1, 0] == 5.0 and a[0, 1] == -5.0
    assert a[2, 1] == -2.0 and a[1, 2] == 2.0


def test_dense_array_format():
    coo = read_mtx_coo(io.StringIO(ARRAY_MTX))
    a = np.zeros(coo.shape)
    a[coo.rows, coo.cols] = coo.vals
    np.testing.assert_array_equal(a, [[1, 2], [3, 4]])  # column-major storage


def test_roundtrip(tmp_path, rng):
    n = 40
    a = rng.standard_normal((n, n))
    a = a + a.T + n * np.eye(n)
    a[np.abs(a) < 1.0] = 0.0
    rows, cols = np.nonzero(a)
    path = tmp_path / "rt.mtx"
    write_mtx(path, rows, cols, a[rows, cols], a.shape, symmetric=True)
    data, indices, indptr, shape = read_mtx_csr(path)
    got = _dense_from_csr(data, indices, indptr, shape)
    np.testing.assert_allclose(got, a, atol=1e-12)


def test_csr_is_sorted_and_deduped():
    txt = """%%MatrixMarket matrix coordinate real general
2 2 3
1 2 1.0
1 1 2.0
1 2 3.0
"""
    data, indices, indptr, shape = read_mtx_csr(io.StringIO(txt))
    a = _dense_from_csr(data, indices, indptr, shape)
    np.testing.assert_array_equal(a, [[2, 4], [0, 0]])
    # within-row column order must be ascending
    for r in range(shape[0]):
        seg = indices[indptr[r]:indptr[r + 1]]
        assert np.all(np.diff(seg) >= 0)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_reader_matches_python(tmp_path, rng):
    n = 60
    a = rng.standard_normal((n, n))
    a = a + a.T + n * np.eye(n)
    a[np.abs(a) < 1.2] = 0.0
    rows, cols = np.nonzero(a)
    path = tmp_path / "nat.mtx"
    write_mtx(path, rows, cols, a[rows, cols], a.shape, symmetric=True)
    d1, i1, p1, s1 = native.read_mtx_csr_native(path)
    d2, i2, p2, s2 = read_mtx_csr(path)
    assert tuple(s1) == tuple(s2)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(i1, np.asarray(i2, np.int32))
    np.testing.assert_allclose(d1, d2)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_reader_errors(tmp_path):
    bad = tmp_path / "bad.mtx"
    bad.write_text("%%MatrixMarket matrix coordinate real general\n2 2 1\n5 5 1.0\n")
    with pytest.raises(ValueError, match="out of range"):
        native.read_mtx_csr_native(bad)
    with pytest.raises(ValueError):
        native.read_mtx_csr_native(tmp_path / "missing.mtx")


SKEW_ARRAY_MTX = """%%MatrixMarket matrix array real skew-symmetric
3 3
5.0
-2.0
7.0
"""


def test_skew_symmetric_array_strictly_lower():
    """Skew-symmetric array files store only the STRICTLY lower triangle."""
    data, indices, indptr, shape = read_mtx_csr(io.StringIO(SKEW_ARRAY_MTX))
    a = _dense_from_csr(data, indices, indptr, shape)
    expected = np.array([[0, -5, 2], [5, 0, -7], [-2, 7, 0]], dtype=float)
    np.testing.assert_array_equal(a, expected)


def test_truncated_array_body_raises_value_error():
    bad = """%%MatrixMarket matrix array real symmetric
3 3
1.0
2.0
"""
    with pytest.raises(ValueError, match="ends early"):
        read_mtx_csr(io.StringIO(bad))


def test_malformed_coordinate_entry_raises_value_error():
    bad = """%%MatrixMarket matrix coordinate real general
2 2 2
1 1 2.0
1 2
"""
    with pytest.raises(ValueError, match="malformed"):
        read_mtx_csr(io.StringIO(bad))
