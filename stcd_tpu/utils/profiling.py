"""Profiling helpers (SURVEY.md §5: the reference has no tracing; the TPU
build exposes jax.profiler traces + step timing)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock accumulator for steps/sec + pairs/sec counters."""

    def __init__(self):
        self.times = []
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t)

    def steps_per_sec(self):
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)
