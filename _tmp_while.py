import time
import numpy as np, jax, jax.numpy as jnp
import bench
from conjugategradient_tpu.problems import elasticity3d_coo
from conjugategradient_tpu.types import CSRMatrix, DIAMatrix
from conjugategradient_tpu.utils.benchmarking import rpc_overhead_s

rows, cols, vals, shape = elasticity3d_coo(48, seed=0)
csr = CSRMatrix.from_coo(rows, cols, vals, shape, dtype=np.float32)
a = DIAMatrix.from_csr(csr)
n = shape[0]
b = jnp.ones((n,), jnp.float32)
ovh = rpc_overhead_s()
K = 200

def time_it(f, label):
    g = jax.jit(f)
    np.asarray(g(b).ravel()[:1])
    t0 = time.perf_counter(); np.asarray(g(b).ravel()[:1])
    t = time.perf_counter() - t0 - ovh
    print(f"{label}: {t/K*1e3:.3f} ms/matvec")

# fori chain, operator closed over (the benchmark context)
def chain_const(v):
    def body(i, v):
        return a.matvec(v) * 1e-6 + b
    return jax.lax.fori_loop(0, K, body, v)
time_it(chain_const, "fori, op constant")

# fori chain, operator as traced arg (the solve context)
arrs, treedef = jax.tree_util.tree_flatten(a)
def chain_arg(v):
    op = jax.tree_util.tree_unflatten(treedef, [jnp.asarray(x) for x in arrs])
    def body(i, v):
        return op.matvec(v) * 1e-6 + b
    return jax.lax.fori_loop(0, K, body, v)
g = jax.jit(lambda v, *arrs2: chain_arg_impl(v, arrs2))
def chain_arg_impl(v, arrs2):
    op = jax.tree_util.tree_unflatten(treedef, arrs2)
    def body(i, v):
        return op.matvec(v) * 1e-6 + b
    return jax.lax.fori_loop(0, K, body, v)
gg = jax.jit(chain_arg_impl)
np.asarray(gg(b, tuple(arrs)).ravel()[:1])
t0 = time.perf_counter(); np.asarray(gg(b, tuple(arrs)).ravel()[:1])
t = time.perf_counter() - t0 - ovh
print(f"fori, op as ARG: {t/K*1e3:.3f} ms/matvec")

# while loop, op as arg (full solve context)
def chain_while(v, arrs2):
    op = jax.tree_util.tree_unflatten(treedef, arrs2)
    def cond(c): return c[0] < K
    def body(c):
        k, v = c
        return (k + 1, op.matvec(v) * 1e-6 + b)
    return jax.lax.while_loop(cond, body, (jnp.asarray(0), v))[1]
gw = jax.jit(chain_while)
np.asarray(gw(b, tuple(arrs)).ravel()[:1])
t0 = time.perf_counter(); np.asarray(gw(b, tuple(arrs)).ravel()[:1])
t = time.perf_counter() - t0 - ovh
print(f"while, op as ARG: {t/K*1e3:.3f} ms/matvec")
