"""Profiler tracing (SURVEY §5: the reference has only a wall-clock stopwatch
in its harness, test/utils.hpp:24-51; the rebuild exposes real device traces).

Thin wrappers over ``jax.profiler`` so harness code can do::

    with trace("/tmp/cg_trace"):
        x, info = cg_solve(A, b, tol=1e-8)

and inspect the on-device timeline (per-fusion timings, DMA overlap) with
TensorBoard or xprof, plus named sub-spans via :func:`annotate`.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile for the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up on the trace timeline (context manager)."""
    return jax.profiler.TraceAnnotation(name)


def memory_stats(device=None) -> dict:
    """Current device memory stats (bytes), when the backend reports them."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
