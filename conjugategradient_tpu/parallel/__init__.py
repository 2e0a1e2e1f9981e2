from .sharded_cg import sharded_cg_solve, make_row_mesh, partition_csr_rows

__all__ = ["sharded_cg_solve", "make_row_mesh", "partition_csr_rows"]
