import time
import numpy as np, jax, jax.numpy as jnp
import bench
from conjugategradient_tpu.problems import elasticity3d_coo
from conjugategradient_tpu.types import CSRMatrix, DIAMatrix
from conjugategradient_tpu.ops.pallas.dia_spmv import dia_spmv_pallas
from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

rows, cols, vals, shape = elasticity3d_coo(48, seed=0)
csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
a = DIAMatrix.from_csr(csr)
n = shape[0]
b = jnp.ones((n,), jnp.float32)
ovh = rpc_overhead_s()
K = 200
ndiag = len(a.offsets)
offs = a.offsets

def timeit(fn, arg, label):
    g = jax.jit(fn)
    np.asarray(g(b, arg).ravel()[:1])
    t0 = time.perf_counter(); np.asarray(g(b, arg).ravel()[:1])
    t = time.perf_counter() - t0 - ovh
    print(f"{label}: {t/K*1e3:.3f} ms/matvec")

# 2-D arg (current solve behavior)
def chain2d(v, diags):
    def body(i, v):
        return dia_spmv_pallas(diags, offs, v) * 1e-6 + b
    return jax.lax.fori_loop(0, K, body, v)
timeit(chain2d, a.diags, "2-D diags arg")

# flat 1-D arg, reshape inside jit
def chain1d(v, flat):
    diags = flat.reshape(ndiag, -1)
    def body(i, v):
        return dia_spmv_pallas(diags, offs, v) * 1e-6 + b
    return jax.lax.fori_loop(0, K, body, v)
timeit(chain1d, a.diags.reshape(-1), "flat diags arg")
