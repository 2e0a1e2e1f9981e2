from .sharded_cg import (
    make_row_mesh,
    partition_csr_rows,
    partition_dia_rows,
    partition_sell_rows,
    ring_halo,
    sharded_cg_solve,
    sharded_cg_solve_batched,
    sharded_dia_cg_solve,
    sharded_dia_cg_solve_batched,
    sharded_sell_cg_solve,
    sharded_sell_cg_solve_batched,
)
from .sharded_stencil import sharded_stencil_cg_solve

__all__ = [
    "sharded_stencil_cg_solve",
    "sharded_cg_solve",
    "sharded_cg_solve_batched",
    "sharded_dia_cg_solve",
    "sharded_dia_cg_solve_batched",
    "sharded_sell_cg_solve",
    "sharded_sell_cg_solve_batched",
    "make_row_mesh",
    "partition_csr_rows",
    "partition_dia_rows",
    "partition_sell_rows",
    "ring_halo",
]
