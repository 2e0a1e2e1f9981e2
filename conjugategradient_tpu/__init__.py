"""conjugategradient_tpu — a TPU-native conjugate-gradient framework.

Brand-new JAX/XLA/Pallas rebuild of the capabilities of
XeniaHerr/ConjugateGradient (a header-only C++17/SYCL CG solver for SPD CSR
systems), redesigned TPU-first:

* operators: CSR, blocked-ELL (HBM-tiled), dense, matrix-free 7-point stencil
  (``types``);
* kernels: segment-sum / einsum / Pallas SpMV, fused BLAS-1 (``ops``);
* solver: one jitted ``lax.while_loop`` per solve — zero host syncs
  (``solver.cg``), Jacobi PCG (``solver.precond``);
* multi-chip: row-sharded CG over a 1-D mesh, psum'd dot products
  (``parallel``);
* I/O: MatrixMarket (Python + native C++), problem generators (``io``);
* oracle: pure-NumPy float64 replica of the reference semantics for
  iteration-for-iteration parity testing (``oracle``).
"""

from .types import (
    BlockedEllMatrix,
    CSRMatrix,
    DIAMatrix,
    DenseOperator,
    LinearOperator,
    MatrixFreeOperator,
    SellMatrix,
    StencilOperator,
    SymBellMatrix,
    SymDIAMatrix,
    as_linear_operator,
)
from .solver import (
    CGInfo,
    CGState,
    accuracy,
    block_cg_solve,
    minres_solve,
    MinresInfo,
    bicgstab_solve,
    bicgstab_solve_batched,
    BicgstabInfo,
    gmres_solve,
    gmres_solve_batched,
    minres_solve_batched,
    GmresInfo,
    refined_cg_solve,
    RefineInfo,
    cg_init,
    cg_solve,
    cg_solve_batched,
    cg_step,
    expected_step_count,
    implicit_cg_solve,
    implicit_gmres_solve,
    DeflationBasis,
    deflated_cg_solve,
    make_deflation_basis,
    harvest_deflation_basis,
    EigsResult,
    lanczos_eigs,
    lobpcg_eigs,
    condition_estimate,
    block_jacobi_preconditioner,
    fsai_preconditioner,
    jacobi_preconditioner,
    multigrid_preconditioner,
    rigid_body_modes,
    smoothed_aggregation_preconditioner,
    memory_footprint,
    sstep_cg_solve,
)
from .compat import CG
from .io import load_matrix, read_mtx_csr, write_mtx

__version__ = "0.1.0"

__all__ = [
    "BlockedEllMatrix",
    "CSRMatrix",
    "DIAMatrix",
    "DenseOperator",
    "LinearOperator",
    "MatrixFreeOperator",
    "SellMatrix",
    "StencilOperator",
    "SymBellMatrix",
    "SymDIAMatrix",
    "as_linear_operator",
    "CGInfo",
    "CGState",
    "accuracy",
    "cg_init",
    "cg_solve",
    "cg_solve_batched",
    "block_cg_solve",
    "sstep_cg_solve",
    "minres_solve",
    "bicgstab_solve",
    "bicgstab_solve_batched",
    "gmres_solve",
    "gmres_solve_batched",
    "minres_solve_batched",
    "BicgstabInfo",
    "GmresInfo",
    "MinresInfo",
    "refined_cg_solve",
    "RefineInfo",
    "cg_step",
    "expected_step_count",
    "implicit_cg_solve",
    "implicit_gmres_solve",
    "DeflationBasis",
    "deflated_cg_solve",
    "make_deflation_basis",
    "harvest_deflation_basis",
    "EigsResult",
    "lanczos_eigs",
    "lobpcg_eigs",
    "condition_estimate",
    "block_jacobi_preconditioner",
    "jacobi_preconditioner",
    "fsai_preconditioner",
    "multigrid_preconditioner",
    "rigid_body_modes",
    "smoothed_aggregation_preconditioner",
    "memory_footprint",
    "CG",
    "load_matrix",
    "read_mtx_csr",
    "write_mtx",
    "__version__",
]
