"""End-to-end training-dynamics parity vs the PyTorch reference.

Trains the reference SNN (imported from /root/reference as an oracle) and
our model on the SAME synthetic SHD-schema dataset with the same
architecture, optimizer (Adam, lr 1e-2), CE loss, and epoch count, then
checks both learn the task to comparable accuracy. This validates the
whole stack — init distributions, clamped dynamics, surrogate gradients,
normalisation semantics, optimizer settings — at the level that matters
(training behaviour), where bit-parity is impossible.

Layernorm is used because the reference's train-mode-vs-eval-mode
BatchNorm gap makes IT fail on this tiny synthetic set (eval-mode
running stats silence the spiking layer entirely — observed with the
reference code itself); layernorm has no such gap.
"""
import os
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from sparch.models.snns import SNN as RefSNN  # noqa: E402

from sparch_tpu.data.spiking import load_shd_or_ssc  # noqa: E402
from sparch_tpu.models import build_model  # noqa: E402
from sparch_tpu.train.state import create_train_state  # noqa: E402
from sparch_tpu.train.steps import make_eval_step, make_train_step  # noqa: E402

from .fixtures import make_shd_h5  # noqa: E402

B, T, F, H, C = 16, 100, 700, 32, 3
EPOCHS = 4


@pytest.fixture
def shd_folder(tmp_path):
    folder = str(tmp_path / "shd")
    os.makedirs(folder)
    make_shd_h5(f"{folder}/shd_train.h5", n=96, nb_classes=C, seed=0)
    make_shd_h5(f"{folder}/shd_test.h5", n=24, nb_classes=C, seed=1)
    return folder


def _batches(folder, split, shuffle, seed=0):
    loader = load_shd_or_ssc(
        "shd", folder, split, batch_size=B, shuffle=shuffle, seed=seed
    )
    return loader


def _train_reference(folder, monkeypatch):
    # deterministic zero hidden-state init, matching state_init='zeros'
    monkeypatch.setattr(torch, "rand", lambda *s, **k: torch.zeros(*s, **k))
    torch.manual_seed(0)
    net = RefSNN(
        input_shape=(B, T, F),
        layer_sizes=[H, C],
        neuron_type="LIF",
        dropout=0.0,
        normalization="layernorm",
        use_readout_layer=True,
    )
    opt = torch.optim.Adam(net.parameters(), 1e-2)
    loss_fn = torch.nn.CrossEntropyLoss()
    for e in range(EPOCHS):
        net.train()
        for x, _, y in _batches(folder, "train", True, seed=e):
            xb = torch.from_numpy(np.asarray(x))
            yb = torch.from_numpy(np.asarray(y))
            out, _ = net(xb)
            loss = loss_fn(out, yb)
            opt.zero_grad()
            loss.backward()
            opt.step()
    net.eval()
    accs = []
    with torch.no_grad():
        for x, _, y in _batches(folder, "test", False):
            out, _ = net(torch.from_numpy(np.asarray(x)))
            accs.append((out.argmax(1).numpy() == np.asarray(y)).mean())
    return float(np.mean(accs))


def _train_ours(folder):
    model = build_model(
        "LIF", (B, T, F), [H, C], dropout=0.0, normalization="layernorm",
        state_init="zeros",
    )
    sample = np.zeros((2, 8, F), np.float32)
    state = create_train_state(
        model, sample, lr=1e-2, rng=jax.random.PRNGKey(0)
    )
    train_step = make_train_step(model, donate=False)
    eval_step = make_eval_step(model)
    for e in range(EPOCHS):
        for x, _, y in _batches(folder, "train", True, seed=e):
            state, _ = train_step(state, x, y)
    accs = []
    for x, _, y in _batches(folder, "test", False):
        m = eval_step(state, x, y, jax.random.PRNGKey(0))
        accs.append(float(m["acc"]))
    return float(np.mean(accs))


def test_training_dynamics_parity(shd_folder, monkeypatch):
    acc_ref = _train_reference(shd_folder, monkeypatch)
    acc_ours = _train_ours(shd_folder)
    # both must learn the (easy, separable) task...
    assert acc_ref >= 0.8, f"reference failed to learn: {acc_ref}"
    assert acc_ours >= 0.8, f"ours failed to learn: {acc_ours}"
    # ...to comparable accuracy
    assert abs(acc_ref - acc_ours) <= 0.2, (acc_ref, acc_ours)
