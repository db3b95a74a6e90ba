"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference).

Two tools:
  * ``trace(logdir)`` — context manager around `jax.profiler` producing a
    TensorBoard-viewable device trace of whatever runs inside it.
  * ``Throughput`` — steps/s meter with exponential smoothing; the train
    loop feeds it env-step counts per iteration.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "./exp/trace"):
    """Capture a device trace: `with trace(): ts, _ = trainer.train_iter(ts)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Exponentially-smoothed env-steps/s meter."""

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self.rate = None
        self._last_t = None
        self._last_steps = None

    def update(self, total_steps: int) -> float | None:
        now = time.perf_counter()
        if self._last_t is not None and total_steps > self._last_steps:
            inst = (total_steps - self._last_steps) / (now - self._last_t)
            self.rate = inst if self.rate is None else (
                self.alpha * inst + (1 - self.alpha) * self.rate
            )
        self._last_t = now
        self._last_steps = total_steps
        return self.rate
