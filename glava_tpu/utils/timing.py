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


def _slope_or_avg(t1: float, t2: float, n1: int, n2: int) -> float:
    """Marginal per-call time; when scheduler jitter makes the slope
    non-positive (t2 <= t1), fall back to the conservative average so
    callers never see absurd rates."""
    s = (t2 - t1) / (n2 - n1)
    return s if s > 0 else t2 / n2


def _env_target_delta() -> float:
    """Target slope delta (seconds) from GLAVA_TPU_SLOPE_DELTA_MS.

    0 (the default) keeps the fixed-length protocol; bench entry
    points opt in (bench.py, scripts/bench_interpreted.py) so CPU
    test runs and the autotuner are unaffected."""
    import os

    try:
        return max(
            0.0,
            float(os.environ.get("GLAVA_TPU_SLOPE_DELTA_MS", "0"))) / 1e3
    except ValueError:
        return 0.0


_SLOPE_SCALE_CAP = 64


def slope_time(run: Callable[[int], float], n1: int = 5, n2: int = 15,
               repeats: int = 2,
               target_delta: float | None = None) -> float:
    """Marginal seconds per call: MEDIAN-of-``repeats`` two-point slope.

    ``run(k)`` must perform k calls of the function under test and
    force completion (scalar-probe fetch) before returning elapsed
    wall seconds. Median (not min): a slope is the difference of two
    noisy wall times, so min-combining selects jitter-collapsed
    samples and reports absurd rates on a drifting link (observed: an
    interpreted 1080p raster "measured" 870k fps when one t(n2) ran
    short; the median of repeats discards such samples).

    ``target_delta`` (seconds; None reads GLAVA_TPU_SLOPE_DELTA_MS,
    0 disables): scale both run lengths until the measured wall-time
    delta t2 - t1 reaches the target, so the slope's signal dominates
    link jitter. The tunnel's probe-fetch RTT varies by tens of ms
    while a sub-ms raster contributes only (n2-n1) * ~1 ms of signal
    at the default lengths — the infamous "±2-3x fusion lottery"
    across fresh builds of identical code was EXACTLY this noise:
    fingerprinting two fresh builds showed byte-identical StableHLO
    AND byte-identical optimized HLO (scripts note in docs/STATUS.md),
    so the spread could never have been compile nondeterminism."""
    if target_delta is None:
        target_delta = _env_target_delta()
    if target_delta and target_delta > 0:
        s = 1
        while True:
            t1, t2 = run(n1 * s), run(n2 * s)
            if t2 - t1 >= target_delta or s >= _SLOPE_SCALE_CAP:
                break
            # jump to the estimated scale (x2 floor so progress is
            # guaranteed even when the delta reads ~0 under jitter)
            need = target_delta / max(t2 - t1, 1e-9)
            s = min(_SLOPE_SCALE_CAP, max(s * 2, int(s * need) + 1))
        slopes = [_slope_or_avg(t1, t2, n1 * s, n2 * s)]
        slopes += [
            _slope_or_avg(run(n1 * s), run(n2 * s), n1 * s, n2 * s)
            for _ in range(repeats - 1)
        ]
        slopes.sort()
    else:
        slopes = sorted(
            _slope_or_avg(run(n1), run(n2), n1, n2)
            for _ in range(repeats)
        )
    m = len(slopes) // 2
    if len(slopes) % 2:
        return slopes[m]
    return 0.5 * (slopes[m - 1] + slopes[m])


def probed_slope(step_once: Callable[[], object], n1: int = 5,
                 n2: int = 15, repeats: int = 2,
                 target_delta: float | None = None) -> float:
    """Marginal seconds per call of ``step_once``.

    ``step_once()`` enqueues ONE call of the jitted function under test
    (threading its own state in a closure) and returns the scalar
    probe; this helper applies the completion fence (``float(probe)``)
    and the two-point slope. Callers remain responsible for making the
    probe depend on every piece of per-iteration work and for feeding
    fresh inputs per scan iteration (see the module docstring).
    """
    def run(k: int) -> float:
        t0 = time.perf_counter()
        probe = None
        for _ in range(k):
            probe = step_once()
        float(probe)
        return time.perf_counter() - t0

    return slope_time(run, n1, n2, repeats, target_delta)


