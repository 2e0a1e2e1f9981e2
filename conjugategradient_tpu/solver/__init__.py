from .cg import CGInfo, CGState, accuracy, cg_init, cg_solve, cg_step, memory_footprint
from .precond import identity_preconditioner, jacobi_preconditioner

__all__ = [
    "CGInfo",
    "CGState",
    "accuracy",
    "cg_init",
    "cg_solve",
    "cg_step",
    "memory_footprint",
    "jacobi_preconditioner",
    "identity_preconditioner",
]
