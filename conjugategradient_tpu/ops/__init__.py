from .blas import dot, norm_sq, norm, saxpby, sapbx, sambx
from .spmv import (
    csr_spmv,
    bell_spmv,
    bell_spmv_multi,
    dense_spmv,
    dia_spmv,
    dia_spmv_multi,
    sell_spmv,
    sell_spmv_multi,
)
from .stencil import stencil7_matvec

__all__ = [
    "dot",
    "norm_sq",
    "norm",
    "saxpby",
    "sapbx",
    "sambx",
    "csr_spmv",
    "bell_spmv",
    "dense_spmv",
    "bell_spmv_multi",
    "dia_spmv",
    "dia_spmv_multi",
    "sell_spmv",
    "sell_spmv_multi",
    "stencil7_matvec",
]
