"""Periodic-restart while_loop without a lax.cond in the hot body.

Residual-replacement restarts (van der Vorst; ``recompute_r_every``) were
originally implemented as a ``jax.lax.cond`` at the tail of each iteration
body.  Measured on TPU v5e (n=1.5M, R=8, SELL lockstep loop, f32):

=====================================  ============
formulation                            ms/iteration
=====================================  ============
plain body, no restart support          52.4
body + lax.cond, restart NEVER taken    73-79
(any predicate form / branch masking)
nested form below, restarts EXECUTING   55.8
every 16 iterations                     (= 52.4 + SpMV/16)
=====================================  ============

A conditional whose branch holds the restart SpMV costs ~40% of the
iteration even when never taken — XLA hoists computations out of branches
it deems safe, and no predicate/masking formulation reliably prevents it.
(Curiously the block-CG loop's identical-shaped cond measured free — the
hoisting decision depends on the surrounding body, i.e. it is not something
a library can rely on either way.)  A while_loop boundary is the only
reliable fence, and it makes the restart cadence STRUCTURAL: run the inner
loop to the next multiple-of-``every`` boundary, then apply one
unconditional-but-masked replacement.
"""

from __future__ import annotations

from typing import Callable, TypeVar

import jax

T = TypeVar("T")


def while_with_periodic_restart(
    cond: Callable[[T], jax.Array],
    body: Callable[[T], T],
    replace: Callable[[T], T],
    every: int,
    k_of: Callable[[T], jax.Array],
    state: T,
) -> T:
    """``while_loop(cond, body-with-restart-every-k, state)``, restart-free
    hot body.

    Args:
      cond: loop predicate (may embed a chunk ``limit`` tighter than the
        restart period — the structure composes; see run_batched_cg).
      body: ONE plain iteration, no restart logic.
      replace: the restart step.  Called once per period/chunk boundary,
        UNCONDITIONALLY — it must mask itself (select old values wherever
        its restart condition, e.g. ``active & (k % every == 0)``, is
        false) so a boundary that is not a restart point is a bit-identical
        no-op.  This is what lets chunked drivers stop mid-period and
        resume bit-identically.
      every: the restart period (> 0; callers branch to a plain while_loop
        for 0 themselves when they want no replace overhead at all).
      k_of: extracts the scalar iteration count from the carry (for lane
        carries, the max over lanes — active lanes advance together, so the
        max IS the active lanes' count).
      state: initial carry.
    """
    if every <= 0:
        return jax.lax.while_loop(cond, body, state)

    def outer(s: T) -> T:
        k_stop = (k_of(s) // every + 1) * every
        s = jax.lax.while_loop(
            lambda t: cond(t) & (k_of(t) < k_stop), body, s
        )
        return replace(s)

    return jax.lax.while_loop(cond, outer, state)
