"""Tracing / profiling hooks (SURVEY.md section 5: the reference has none
in-tree; its only observability is BulkIO port statistics it never touches).

* :func:`trace` -- context manager around ``jax.profiler.trace`` writing a
  TensorBoard/Perfetto trace directory.
* :class:`StepTimer` -- lightweight per-block wall-time stats (EWMA + max)
  for the streaming engines; cheap enough to leave on in production.
* :func:`annotate` -- named trace region for host-side phases.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device+host profile into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EWMA / max / count wall-clock stats for repeated steps."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.ewma_s = None
        self.max_s = 0.0
        self.count = 0
        self._t0 = None

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.ewma_s = dt if self.ewma_s is None else (
            self.alpha * dt + (1 - self.alpha) * self.ewma_s)
        self.max_s = max(self.max_s, dt)
        self.count += 1

    def summary(self) -> dict:
        return {"count": self.count, "ewma_s": self.ewma_s,
                "max_s": self.max_s}
