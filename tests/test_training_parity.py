"""End-to-end training-dynamics parity vs the PyTorch reference.

Trains the reference SNN (imported from /root/reference as an oracle) and
our model on the SAME synthetic SHD-schema dataset with the same
architecture, optimizer (Adam, lr 1e-2), CE loss, and epoch count, then
compares mean test accuracy over multiple seeds. The task is made
deliberately NOISY (40% of events land on random units) so accuracies sit
mid-range, where the +-0.05 parity band is informative — on a trivially
separable task both implementations saturate and the comparison proves
nothing. This validates the whole stack — init distributions, clamped
dynamics, surrogate gradients, normalisation semantics, optimizer
settings — at the level that matters (training behaviour), where
bit-parity is impossible.

The BatchNorm case is evaluated in TRAIN mode on both sides: the
reference's eval-mode running stats silence the spiking layer entirely on
tiny synthetic sets (observed with the reference code itself), so
batch-stat normalisation is the only comparable regime at this scale.
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

B, T, F, H, C = 16, 100, 700, 32, 4
EPOCHS = 4


@pytest.fixture(scope="module")
def shd_folder(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("shd"))
    make_shd_h5(
        f"{folder}/shd_train.h5", n=96, nb_classes=C, seed=0,
        noise_frac=0.35, n_events_range=(30, 90),
    )
    make_shd_h5(
        f"{folder}/shd_test.h5", n=96, nb_classes=C, seed=1,
        noise_frac=0.35, n_events_range=(30, 90),
    )
    return folder


def _batches(folder, split, shuffle, seed=0):
    return load_shd_or_ssc(
        "shd", folder, split, batch_size=B, shuffle=shuffle, seed=seed
    )


def _train_reference(folder, neuron_type, norm, seed, eval_train_mode):
    # deterministic zero hidden-state init, matching state_init='zeros'
    orig_rand = torch.rand
    torch.rand = lambda *s, **k: torch.zeros(*s, **k)
    try:
        torch.manual_seed(seed)
        net = RefSNN(
            input_shape=(B, T, F),
            layer_sizes=[H, C],
            neuron_type=neuron_type,
            dropout=0.0,
            normalization=norm,
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
        net.train() if eval_train_mode else net.eval()
        accs = []
        with torch.no_grad():
            for x, _, y in _batches(folder, "test", False):
                out, _ = net(torch.from_numpy(np.asarray(x)))
                accs.append((out.argmax(1).numpy() == np.asarray(y)).mean())
        return float(np.mean(accs))
    finally:
        torch.rand = orig_rand


def _train_ours(folder, neuron_type, norm, seed, eval_train_mode):
    model = build_model(
        neuron_type, (B, T, F), [H, C], dropout=0.0, normalization=norm,
        state_init="zeros",
    )
    sample = np.zeros((2, 8, F), np.float32)
    state = create_train_state(
        model, sample, lr=1e-2, rng=jax.random.PRNGKey(seed)
    )
    train_step = make_train_step(model, donate=False)
    eval_step = make_eval_step(model)
    for e in range(EPOCHS):
        for x, _, y in _batches(folder, "train", True, seed=e):
            state, _ = train_step(state, x, y)
    accs = []
    for x, _, y in _batches(folder, "test", False):
        if eval_train_mode:
            # batch-stat (train-mode) normalisation, updates discarded
            (out, _), _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                np.asarray(x), train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            accs.append(
                float((np.asarray(out).argmax(1) == np.asarray(y)).mean())
            )
        else:
            m = eval_step(state, x, y, jax.random.PRNGKey(0))
            accs.append(float(m["acc"]))
    return float(np.mean(accs))


@pytest.mark.parametrize(
    "neuron_type,norm,eval_train_mode,seeds",
    [
        ("LIF", "layernorm", False, (0, 1, 2)),
        ("adLIF", "layernorm", False, (0, 1, 2, 3)),
        # RadLIF training is the most trajectory-chaotic (per-seed accuracy
        # std ~0.05 for the reference itself); 6 seeds keep the +-0.05
        # mean band meaningful. The exact per-batch gradient parity lives
        # in test_reference_parity.py::test_snn_gradient_parity.
        ("RadLIF", "layernorm", False, (0, 1, 2, 3, 4, 5)),
        ("LIF", "batchnorm", True, (0, 1)),
    ],
    ids=["LIF-ln", "adLIF-ln", "RadLIF-ln", "LIF-bn-trainstats"],
)
def test_training_dynamics_parity(
    shd_folder, neuron_type, norm, eval_train_mode, seeds
):
    ref = [
        _train_reference(shd_folder, neuron_type, norm, s, eval_train_mode)
        for s in seeds
    ]
    ours = [
        _train_ours(shd_folder, neuron_type, norm, s, eval_train_mode)
        for s in seeds
    ]
    acc_ref = float(np.mean(ref))
    acc_ours = float(np.mean(ours))
    # both must beat chance solidly (noisy 4-class task, chance 0.25)...
    assert acc_ref >= 0.5, f"reference failed to learn: {ref}"
    assert acc_ours >= 0.5, f"ours failed to learn: {ours}"
    # ...and train to the same accuracy within a tight band
    assert abs(acc_ref - acc_ours) <= 0.05, (ref, ours)


# ---------------------------------------------------------------------------
# Lockstep trajectory parity (ANN types)
#
# Transplant the reference's EXACT initial weights into our model, train
# both on the identical batch sequence, and require the per-batch CE
# losses to agree to float noise over the first steps. This pins the
# whole TRAIN-mode step — forward, loss, backward, Adam — as one
# deterministic unit (the accuracy-band tests above tolerate seed
# chaos; this tolerates nothing). ANN-only: the spiking models'
# discontinuous dynamics flip spikes on 1-ulp matmul reduction-order
# differences between torch and XLA, which cascades within one batch —
# their step math is pinned by test_reference_parity instead.
# At-scale version: tools/parity_lockstep.py.
# ---------------------------------------------------------------------------

N_LOCKSTEP = 10


@pytest.mark.parametrize("ann_type", ["MLP", "RNN", "LiGRU", "GRU"])
def test_ann_lockstep_trajectory_parity(shd_folder, ann_type):
    from sparch.models.anns import ANN as RefANN

    from .test_reference_parity import _ann_params_from_ref

    torch.manual_seed(1)
    ref = RefANN(
        input_shape=(B, T, F), layer_sizes=[H, C], ann_type=ann_type,
        dropout=0.0, normalization="layernorm", use_readout_layer=True,
    )
    variables = _ann_params_from_ref(ref, ann_type, "layernorm", False)
    # deep-copy: jnp.asarray zero-copies aligned contiguous CPU arrays,
    # and torch's Adam mutates the originals in place
    variables = jax.tree.map(lambda a: np.array(a, copy=True), variables)

    batches = [
        (np.asarray(x), np.asarray(y))
        for x, _, y in _batches(shd_folder, "train", True, seed=0)
    ][:N_LOCKSTEP]

    opt = torch.optim.Adam(ref.parameters(), 1e-2)
    loss_fn = torch.nn.CrossEntropyLoss()
    ref.train()
    ref_losses = []
    for x, y in batches:
        out, _ = ref(torch.from_numpy(x))
        loss = loss_fn(out, torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    model = build_model(
        ann_type, (B, T, F), [H, C], dropout=0.0,
        normalization="layernorm", state_init="zeros",
    )
    state = create_train_state(
        model, np.zeros((2, 8, F), np.float32), lr=1e-2,
        rng=jax.random.PRNGKey(0),
    )
    state = state.replace(params=variables["params"])
    train_step = make_train_step(model, donate=False)
    our_losses = []
    for x, y in batches:
        state, m = train_step(state, x, y)
        our_losses.append(float(m["loss"]))

    diffs = [abs(a - b) for a, b in zip(ref_losses, our_losses)]
    assert max(diffs[:5]) <= 1e-4, (ref_losses, our_losses)
    assert max(diffs) <= 1e-2, (ref_losses, our_losses)
