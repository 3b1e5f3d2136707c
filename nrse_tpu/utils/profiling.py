"""Throughput accounting + JAX profiler hooks.

The reference has no tracing beyond tqdm and the baseline evaluator's
``perf_counter`` inference-time-per-audio-second metric
(``baseline/eval_cat_ser_weighted_with_list.py:267-270,383-385``).  Rebuild
additions (SURVEY.md §5): a per-step ``audio-sec/sec/chip`` counter (the
BASELINE.json north-star metric) and ``jax.profiler`` trace dumps behind a
context manager.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class ThroughputMeter:
    """Tracks audio-seconds ingested per wall-second per chip."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = max(1, n_chips)
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._audio_seconds = 0.0
        self._steps = 0

    def update(self, batch_size: int, clip_seconds: float):
        self._audio_seconds += batch_size * clip_seconds
        self._steps += 1

    @property
    def steps(self) -> int:
        return self._steps

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def audio_sec_per_sec_per_chip(self) -> float:
        dt = self.elapsed
        if dt <= 0:
            return 0.0
        return self._audio_seconds / dt / self.n_chips

    @property
    def step_time(self) -> float:
        return self.elapsed / max(1, self._steps)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """``jax.profiler.trace`` context (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Simple per-step wall-clock timer with exponential smoothing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.smoothed = None
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.smoothed = (
                dt if self.smoothed is None
                else self.alpha * dt + (1 - self.alpha) * self.smoothed
            )
        self._last = now
        return dt
