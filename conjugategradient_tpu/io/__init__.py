from .mtx import MTXHeader, COOMatrix, parse_header, read_mtx_coo, read_mtx_csr, write_mtx
from .loader import load_matrix

__all__ = [
    "MTXHeader",
    "COOMatrix",
    "parse_header",
    "read_mtx_coo",
    "read_mtx_csr",
    "write_mtx",
    "load_matrix",
]
