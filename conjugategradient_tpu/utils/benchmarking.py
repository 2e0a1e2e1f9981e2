"""Measurement helpers that stay honest on remote-dispatch backends.

Two gotchas this module works around (both observed on tunneled TPU
runtimes):

1. ``jax.block_until_ready`` can return before the computation actually
   finished — only a value readback (device→host copy of a result element)
   proves completion.  Every timer here forces one.
2. Each dispatched execution carries a fixed RPC overhead (tens of ms), so
   per-kernel times are measured by running K chained iterations *inside one
   jitted fori_loop* and subtracting the measured empty-call overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def rpc_overhead_s(iters: int = 5) -> float:
    """Fixed cost of one dispatch+readback round trip (seconds)."""
    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda v: v[:1] + 1.0)
    float(f(x)[0])  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_loop_s(
    body: Callable, x0, K: int = 64, iters: int = 3, overhead_s: float | None = None
) -> float:
    """Seconds per iteration of ``body`` (a -> a), chained K times in-jit.

    ``body`` must return something with the same pytree/shape as its input so
    it can carry the fori_loop.  The readback touches one element of the
    (flattened) result to force completion.
    """
    if overhead_s is None:
        overhead_s = rpc_overhead_s()

    def loop(v):
        out = jax.lax.fori_loop(0, K, lambda i, v: body(v), v)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.reshape(-1)[:1]

    f = jax.jit(loop)
    float(f(x0)[0])  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x0)[0])
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - overhead_s, 1e-12) / K


def stream_roofline_gbps(nbytes: int = 1 << 28, K: int = 64) -> float:
    """Achieved streaming bandwidth of a fused read+write elementwise pass.

    An affine update ``v*c + 1`` is used so the loop cannot be folded; the
    reported figure counts read + write traffic.
    """
    n = nbytes // 4
    x = jnp.ones((n,), jnp.float32)
    t = time_loop_s(lambda v: v * 0.999999 + 1.0, x, K=K)
    return 2 * nbytes / t / 1e9
