"""Tracing / profiling hooks (SURVEY.md §5: the reference has none; nearest
artifacts are a torchsummary dump and PNG side effects in the forward pass).

- ``trace_context``: wrap a region in a ``jax.profiler`` trace, producing a
  TensorBoard-viewable xplane dump.
- ``StepTimer``: wall-clock step timing with explicit ``block_until_ready``
  sync, EWMA smoothing and images/sec derivation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """jax.profiler trace over the enclosed region; no-op if log_dir falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ewma: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Sync on ``result`` (pytree ok) and record the elapsed step time."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.ewma = dt if self.ewma is None else (1 - self.alpha) * self.ewma + self.alpha * dt
        return dt

    def images_per_sec(self, batch_size: int) -> float:
        return batch_size / self.ewma if self.ewma else 0.0
