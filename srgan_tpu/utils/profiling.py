"""Profiling / tracing hooks (SURVEY.md §5: the reference has none beyond
tqdm; the rebuild provides ``jax.profiler`` traces + step timers).

Usage:
    with trace("results/trace"):           # opens a profiler trace dir
        ... training steps ...

    timer = StepTimer()
    with timer.step():
        state, m = train_step(...)
    timer.summary()  # {"mean_ms": ..., "p50_ms": ..., "p95_ms": ...}

NaN debugging is opt-in via ``TrainConfig.debug_nans`` (see loop.py),
replacing the reference's always-on ``set_detect_anomaly(True)``
(``src/train.py:177,207``).
"""

from __future__ import annotations

import contextlib
import time
from typing import List

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    def __init__(self):
        self.durations_ms: List[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.durations_ms.append((time.perf_counter() - t0) * 1e3)

    def summary(self) -> dict:
        if not self.durations_ms:
            return {"mean_ms": 0.0, "p50_ms": 0.0, "p95_ms": 0.0, "steps": 0}
        xs = sorted(self.durations_ms)
        n = len(xs)
        return {
            "mean_ms": sum(xs) / n,
            "p50_ms": xs[n // 2],
            "p95_ms": xs[min(n - 1, int(n * 0.95))],
            "steps": n,
        }
