"""Tracing / profiling hooks (the reference has none — SURVEY.md §5 notes
only tqdm progress bars; we add first-class XLA profiling).

Usage:
    with trace("/tmp/trace"):        # XLA/TPU profile, view in xprof/tensorboard
        train_step(...)

    timer = StepTimer()
    with timer:                       # wall-time + steps/sec accounting
        train_step(...)
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "StepTimer", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """jax.profiler trace around a code region (device + host timelines)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-time stats for train steps."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)
        return False

    @property
    def last(self):
        return self.times[-1] if self.times else float("nan")

    @property
    def mean(self):
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def steps_per_sec(self):
        m = self.mean
        return 1.0 / m if m and m == m and m > 0 else float("nan")

    def summary(self):
        return {"step_time_s": round(self.mean, 4),
                "steps_per_sec": round(self.steps_per_sec, 3)}
