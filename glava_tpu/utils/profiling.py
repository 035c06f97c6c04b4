"""Profiling and debug instrumentation.

Reference counterparts (SURVEY.md section 5): the per-second FPS/UPS
line (render.c:2376-2399) lives in the engine loop; here we add what
the reference lacks — real tracing (``jax.profiler`` spans viewable in
TensorBoard/XProf, replacing GLFFT's ad-hoc ``bench()`` GPU timers,
glfft/glfft.hpp:94-112) and a NaN guard playing the role of the debug
GL error-on-every-call hook (render.c:598-640).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block.

    View with TensorBoard's profile plugin / xprof. Usage:

        with profiling.trace("/tmp/glava-trace"):
            engine.run(max_seconds=5)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for async dispatches (shows up in traces)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def enable_nan_guard() -> None:
    """Fail fast on NaNs escaping any jitted computation (the
    sanitizer analogue of the reference's per-call GL error hook)."""
    import jax

    jax.config.update("jax_debug_nans", True)


@dataclass
class RateCounter:
    """FPS/UPS-style rolling per-second rate accounting."""

    window: float = 1.0
    _mark: float = field(default_factory=time.monotonic)
    _count: int = 0
    rate: float = 0.0

    def tick(self, n: int = 1) -> bool:
        """Count an event; returns True when a window completed."""
        self._count += n
        now = time.monotonic()
        span = now - self._mark
        if span >= self.window:
            self.rate = self._count / span
            self._count = 0
            self._mark = now
            return True
        return False


@dataclass
class LatencyTracker:
    """Rolling latency percentiles (p50 PCM->frame, BASELINE.md)."""

    capacity: int = 240
    samples: list = field(default_factory=list)

    def record(self, seconds: float) -> None:
        self.samples.append(seconds)
        if len(self.samples) > self.capacity:
            self.samples.pop(0)

    def percentile(self, q: float) -> float:
        if not self.samples:
            return 0.0
        s = sorted(self.samples)
        i = min(int(len(s) * q / 100.0), len(s) - 1)
        return s[i]
