from .batched import (
    BatchedCGState,
    batched_cg_init,
    batched_state_result,
    cg_solve_batched,
    run_batched_cg,
)
from .autodiff import implicit_cg_solve, implicit_gmres_solve
from .blockcg import BlockCGState, block_cg_solve
from .cg import (
    CGInfo,
    CGState,
    accuracy,
    cg_init,
    cg_solve,
    cg_step,
    expected_step_count,
    memory_footprint,
)
from .checkpoint import load_state, run_cg, save_state
from .deflated import (
    DeflationBasis,
    basis_quality,
    deflated_cg_solve,
    deflation_basis_from_vectors,
    harvest_deflation_basis,
    make_deflation_basis,
)
from .eigs import EigsResult, condition_estimate, lanczos_eigs
from .lobpcg import lobpcg_eigs
from .fused import fused_bell_cg_solve, fused_bell_pcg_solve, fused_supported
from .fused_bicgstab import fused_bicgstab_solve, fused_bicgstab_supported
from .fused_minres import fused_minres_solve, fused_minres_supported
from .fused_stencil import fused_stencil_cg_solve, fused_stencil_supported
from .minres import MinresInfo, minres_solve
from .batched_nonsym import (
    bicgstab_solve_batched,
    gmres_solve_batched,
    minres_solve_batched,
)
from .bicgstab import BicgstabInfo, bicgstab_solve
from .gmres import GmresInfo, gmres_solve
from .pipelined import pipelined_cg_solve
from .sstep import sstep_cg_solve
from .refine import RefineInfo, refined_cg_solve
from .precond import (
    block_jacobi_preconditioner,
    chebyshev_preconditioner,
    estimate_spectral_bounds,
    identity_preconditioner,
    jacobi_preconditioner,
)
from .multigrid import multigrid_preconditioner
from .amg import rigid_body_modes, smoothed_aggregation_preconditioner
from .fsai import fsai_preconditioner

__all__ = [
    "BatchedCGState",
    "batched_cg_init",
    "batched_state_result",
    "run_batched_cg",
    "cg_solve_batched",
    "BlockCGState",
    "block_cg_solve",
    "implicit_cg_solve",
    "implicit_gmres_solve",
    "DeflationBasis",
    "deflated_cg_solve",
    "deflation_basis_from_vectors",
    "make_deflation_basis",
    "harvest_deflation_basis",
    "basis_quality",
    "EigsResult",
    "lanczos_eigs",
    "lobpcg_eigs",
    "condition_estimate",
    "load_state",
    "run_cg",
    "save_state",
    "CGInfo",
    "CGState",
    "accuracy",
    "cg_init",
    "cg_solve",
    "cg_step",
    "expected_step_count",
    "memory_footprint",
    "fused_bell_cg_solve",
    "fused_bell_pcg_solve",
    "fused_supported",
    "fused_bicgstab_solve",
    "fused_bicgstab_supported",
    "fused_minres_solve",
    "fused_minres_supported",
    "fused_stencil_cg_solve",
    "fused_stencil_supported",
    "MinresInfo",
    "minres_solve",
    "bicgstab_solve",
    "bicgstab_solve_batched",
    "gmres_solve",
    "gmres_solve_batched",
    "minres_solve_batched",
    "GmresInfo",
    "BicgstabInfo",
    "pipelined_cg_solve",
    "sstep_cg_solve",
    "RefineInfo",
    "refined_cg_solve",
    "jacobi_preconditioner",
    "fsai_preconditioner",
    "block_jacobi_preconditioner",
    "chebyshev_preconditioner",
    "estimate_spectral_bounds",
    "identity_preconditioner",
    "multigrid_preconditioner",
    "rigid_body_modes",
    "smoothed_aggregation_preconditioner",
]
