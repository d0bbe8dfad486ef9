"""Reduce-on-plateau learning-rate schedule as explicit state.

optax schedules are step-indexed; plateau scheduling is *metric*-driven, so
it is implemented as a small pure-Python state machine driven once per
validation epoch (reference uses torch ReduceLROnPlateau with mode='max',
factor=0.7, patience=1, min_lr=1e-6 — exp.py:92-98, step at exp.py:453).
The new LR is injected into the optimizer via
``optax.inject_hyperparams`` (see sparch_tpu.train.state).

Semantics match torch's ReduceLROnPlateau defaults exactly: relative
threshold 1e-4, `mode='max'` comparison ``metric > best * (1 + threshold)``
and `mode='min'` comparison ``metric < best * (1 - threshold)`` —
regardless of the sign of ``best``, as in torch — LR reduced when the
number of bad epochs exceeds ``patience``, floored at ``min_lr``.
"""
from __future__ import annotations

import dataclasses

__all__ = ["ReduceLROnPlateau"]


@dataclasses.dataclass
class ReduceLROnPlateau:
    lr: float
    mode: str = "max"
    factor: float = 0.7
    patience: int = 1
    threshold: float = 1e-4
    min_lr: float = 1e-6
    best: float = None  # type: ignore[assignment]
    num_bad_epochs: int = 0

    def __post_init__(self):
        if self.best is None:
            self.best = float("-inf") if self.mode == "max" else float("inf")

    def _is_better(self, metric: float) -> bool:
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        """Update with this epoch's metric; returns the (possibly reduced) LR."""
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_state_dict(cls, d: dict) -> "ReduceLROnPlateau":
        return cls(**d)
