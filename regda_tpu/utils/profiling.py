"""Profiling and step-timing hooks.

The reference has no tracing/profiling at all (SURVEY.md §5) — only a
wall-clock total at run end (tools/train_src.py:166). This module is the
TPU-native upgrade: `jax.profiler` trace capture around a chosen step
window (viewable in XProf/TensorBoard/Perfetto) plus a cheap per-step
timer with EMA'd step time and throughput.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """EMA'd wall-clock step timing + tiles/sec throughput."""

    def __init__(self, items_per_step: int = 0, decay: float = 0.9):
        self.items = items_per_step
        self.decay = decay
        self.ema = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            self.decay * self.ema + (1 - self.decay) * dt)
        return dt

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.ema if self.ema else 0.0

    @property
    def items_per_sec(self) -> float:
        return self.items * self.steps_per_sec

    def summary(self) -> str:
        return (f'{(self.ema or 0) * 1e3:.1f} ms/step, '
                f'{self.items_per_sec:.2f} items/s')


@contextlib.contextmanager
def trace_window(log_dir: str | None):
    """Capture a jax.profiler trace for the enclosed steps when `log_dir`
    is set; no-op otherwise. Open the result with XProf or
    tensorboard --logdir."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the trace timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
