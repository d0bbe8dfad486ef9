"""Lightweight tracing/profiling hooks (the reference has none —
SURVEY.md §5.1 — beyond wall-clock epoch timing).

``trace(dir)`` context manager wraps ``jax.profiler`` so a training run
can be captured for TensorBoard/xprof with ``--profile_dir``.
"""
from __future__ import annotations

import contextlib
from typing import Optional

__all__ = ["trace"]


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
