"""Vector primitives — the rebuild of ``src/VectorOperations.hpp``.

The reference implements these as hand-written SYCL kernels returning events
(dot_product_trivial VectorOperations.hpp:287-309, saxpby :349-367,
sambx :380-397, sapbx :410-428, norm :311-331).  On TPU they are expressed as
pure ``jnp`` ops: inside a jitted CG iteration XLA fuses every elementwise op
into its producers/consumers and lowers the reductions onto the VPU, so the
whole axpy/dot chain runs at HBM streaming speed without hand scheduling.
The reference's event-DAG ordering becomes ordinary data flow.

Accumulation note: dots accumulate in float32 at minimum (``preferred
accumulation dtype``) — on TPU, f32 inputs accumulate in f32; for bf16 inputs
we upcast the products, mirroring the reference's "all scalars stay in DT"
contract (its DT is double).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _acc_dtype(dtype) -> jnp.dtype:
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.bfloat16) or d == jnp.dtype(jnp.float16):
        return jnp.dtype(jnp.float32)
    return d


def dot(x: jax.Array, y: jax.Array) -> jax.Array:
    """<x, y> with widened accumulation (ref: dot_product_trivial,
    VectorOperations.hpp:287-309 — the variant the solver actually uses)."""
    acc = _acc_dtype(x.dtype)
    return jnp.sum(x.astype(acc) * y.astype(acc))


def norm_sq(x: jax.Array) -> jax.Array:
    """Σ x² (ref ``norm``, VectorOperations.hpp:311-331 — note: no sqrt)."""
    return dot(x, x)


def norm(x: jax.Array) -> jax.Array:
    """‖x‖₂ (the reference never takes the sqrt device-side except in the
    termination test, CG.hpp:401)."""
    return jnp.sqrt(norm_sq(x))


def saxpby(a: jax.Array, x: jax.Array, b: jax.Array, y: jax.Array) -> jax.Array:
    """a·x + b·y (ref VectorOperations.hpp:349-367; scalars stay on device)."""
    return a * x + b * y


def sapbx(x: jax.Array, b: jax.Array, y: jax.Array) -> jax.Array:
    """x + b·y (ref VectorOperations.hpp:410-428; used for the x and p updates,
    CG.hpp:390,418)."""
    return x + b * y


def sambx(x: jax.Array, b: jax.Array, y: jax.Array) -> jax.Array:
    """x − b·y (ref VectorOperations.hpp:380-397; used for the residual update,
    CG.hpp:392)."""
    return x - b * y
