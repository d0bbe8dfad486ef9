"""Lightweight tracing/profiling hooks (the reference has none —
SURVEY.md §5.1 — beyond wall-clock epoch timing).

``trace(dir)`` context manager wraps ``jax.profiler`` so a training run
can be captured for TensorBoard/xprof with ``--profile_dir``; ``StepTimer``
gives cheap per-step host-side timings with one sync at the end.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing (dispatch-side; pair with a terminal sync)."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> dict:
        import numpy as np

        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "median_s": float(np.median(arr)),
            "p95_s": float(np.percentile(arr, 95)),
        }
