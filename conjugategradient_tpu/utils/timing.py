"""Wall-clock timer — rebuild of the harness Timer (test/utils.hpp:24-51).

Same contract: steady-clock stopwatch reporting milliseconds as float.  Adds
a context-manager form and a ``block_until_ready`` hook because JAX dispatch
is async (the reference's SYCL queue is too — it calls ``queue.wait`` before
stopping; we do the JAX equivalent).
"""

from __future__ import annotations

import time
from typing import Optional

import jax


class Timer:
    def __init__(self):
        self._t0: Optional[float] = None
        self._t1: Optional[float] = None

    def start_measure(self):
        self._t0 = time.perf_counter()
        return self

    def stop_measure(self, sync: Optional[object] = None):
        if sync is not None:
            # block_until_ready can return before completion on remote-
            # dispatch backends (see utils/benchmarking.py); only a host
            # readback of a result element proves the work finished.
            import numpy as _np

            leaves = jax.tree_util.tree_leaves(sync)
            if leaves:
                # copy back a single element, not the whole array: the sync
                # cost must be O(1), not O(n), or it inflates the measured
                # time for large results over remote-dispatch relays
                leaf = leaves[0]
                _np.asarray(leaf.ravel()[0:1] if hasattr(leaf, "ravel") else leaf)
        self._t1 = time.perf_counter()
        return self

    def get_duration(self) -> float:
        """Milliseconds, like the reference (test/utils.hpp:38-43)."""
        if self._t0 is None or self._t1 is None:
            raise RuntimeError("Timer not started/stopped")
        return (self._t1 - self._t0) * 1e3

    def __enter__(self):
        return self.start_measure()

    def __exit__(self, *exc):
        # NOTE: the context-manager form cannot sync device work (it has no
        # handle on the result); pass the result to stop_measure(sync=...)
        # when timing asynchronous dispatch.
        self.stop_measure()
        return False
