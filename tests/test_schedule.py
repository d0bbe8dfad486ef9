"""Plateau LR schedule: semantics cross-checked against
torch.optim.lr_scheduler.ReduceLROnPlateau on random metric traces."""
import numpy as np
import pytest

from sparch_tpu.train.schedule import ReduceLROnPlateau

torch = pytest.importorskip("torch")


def _torch_trace(metrics, lr, factor, patience, min_lr):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=factor, patience=patience, min_lr=min_lr
    )
    lrs = []
    for m in metrics:
        sched.step(m)
        lrs.append(opt.param_groups[0]["lr"])
    return lrs


def _ours_trace(metrics, lr, factor, patience, min_lr):
    sched = ReduceLROnPlateau(
        lr=lr, mode="max", factor=factor, patience=patience, min_lr=min_lr
    )
    return [sched.step(m) for m in metrics]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_torch_reduce_on_plateau(seed):
    rng = np.random.default_rng(seed)
    # accuracy-like traces in [0, 1] with plateaus
    metrics = np.round(rng.uniform(0.2, 0.9, 30), 2)
    metrics[10:14] = metrics[9]  # force a plateau
    ours = _ours_trace(metrics, 1e-2, 0.7, 1, 1e-6)
    ref = _torch_trace(metrics, 1e-2, 0.7, 1, 1e-6)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


@pytest.mark.parametrize("mode", ["max", "min"])
@pytest.mark.parametrize("seed", [3, 4, 5])
def test_matches_torch_on_signed_metrics(mode, seed):
    """Negative/zero/positive metric traces (e.g. losses, signed scores):
    torch applies the same relative-threshold formula regardless of the
    sign of best, and so do we."""
    rng = np.random.default_rng(seed)
    metrics = np.round(rng.uniform(-1.0, 1.0, 40), 2)
    metrics[5] = 0.0
    metrics[12:16] = metrics[11]  # plateau
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-2)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode=mode, factor=0.7, patience=1, min_lr=1e-6
    )
    ours = ReduceLROnPlateau(
        lr=1e-2, mode=mode, factor=0.7, patience=1, min_lr=1e-6
    )
    for m in metrics:
        tsched.step(m)
        np.testing.assert_allclose(
            ours.step(m), opt.param_groups[0]["lr"], rtol=1e-12
        )


def test_reduces_after_patience_exceeded():
    sched = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=1)
    assert sched.step(0.5) == 1.0  # new best
    assert sched.step(0.5) == 1.0  # bad 1 (not > best*(1+eps))
    assert sched.step(0.5) == 0.5  # bad 2 > patience -> reduce
    assert sched.step(0.9) == 0.5  # new best, no reduce


def test_min_lr_floor():
    sched = ReduceLROnPlateau(lr=1e-5, factor=0.1, patience=0, min_lr=1e-6)
    sched.step(0.5)
    for _ in range(5):
        lr = sched.step(0.1)
    assert lr == 1e-6


def test_state_roundtrip():
    sched = ReduceLROnPlateau(lr=0.3, factor=0.7, patience=1)
    sched.step(0.5)
    sched.step(0.4)
    clone = ReduceLROnPlateau.from_state_dict(sched.state_dict())
    metrics = [0.41, 0.42, 0.43, 0.9, 0.1, 0.1]
    assert [sched.step(m) for m in metrics] == [clone.step(m) for m in metrics]
