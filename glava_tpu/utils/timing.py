"""Honest device timing on the axon TPU runtime.

`jax.block_until_ready` can return before execution (or even
compilation) completes on this runtime, scan benchmarks hoist
loop-invariant work, and discarded per-iteration outputs are dead code
— see CLAUDE.md "Measurement protocol". This module centralizes the
load-bearing pieces so bench.py, the autotuner and validate_tpu.py
cannot drift apart:

* the jitted function under test must RETURN a scalar probe that
  depends on every iteration's work;
* ``run(k)`` executes k calls and forces completion by fetching the
  probe (``float(probe)``) before returning its wall time;
* :func:`slope_time` reports the marginal per-call cost from two run
  lengths, cancelling the constant probe-fetch RTT and enqueue
  overheads.
"""

from __future__ import annotations

import time
from typing import Callable


def slope_time(run: Callable[[int], float], n1: int = 5, n2: int = 15,
               repeats: int = 2) -> float:
    """Marginal seconds per call: best-of-``repeats`` two-point slope.

    ``run(k)`` must perform k calls of the function under test and
    force completion (scalar-probe fetch) before returning elapsed
    wall seconds.
    """
    best = float("inf")
    for _ in range(repeats):
        t1 = run(n1)
        t2 = run(n2)
        best = min(best, (t2 - t1) / (n2 - n1))
    return max(best, 1e-9)


def timed(fn: Callable[[], object]) -> float:
    """Wall seconds for one call (the caller must force completion)."""
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
