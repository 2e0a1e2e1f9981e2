import time
import numpy as np, jax, jax.numpy as jnp
import bench
from conjugategradient_tpu import cg_solve
from conjugategradient_tpu.problems import elasticity3d_coo
from conjugategradient_tpu.solver.precond import block_jacobi_preconditioner, jacobi_preconditioner
from conjugategradient_tpu.types import CSRMatrix, DIAMatrix
from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

rows, cols, vals, shape = elasticity3d_coo(48, seed=0)
csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
a = DIAMatrix.from_csr(csr)
n = shape[0]
b = a.matvec(jnp.ones((n,), jnp.float32))
tol = 1e-6 * float(jnp.linalg.norm(b))
ovh = rpc_overhead_s()

def run(M, label):
    x, info = cg_solve(a, b, tol=tol, maxiter=4000, M=M)   # warm-up
    float(info.rnorm_sq)
    t0 = time.perf_counter()
    x, info = cg_solve(a, b, tol=tol, maxiter=4000, M=M)
    float(info.rnorm_sq)
    t = time.perf_counter() - t0 - ovh
    k = int(info.iterations)
    print(f"{label}: {k} iters, {t*1e3:.1f} ms, {t/k*1e3:.3f} ms/iter")

run(None, "plain")
run(jacobi_preconditioner(a), "jacobi")
run(block_jacobi_preconditioner(csr, block_size=3), "bj3")
