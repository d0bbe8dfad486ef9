"""End-to-end CLI on the non-spiking (hd/sc) datasets: waveform -> fbank
pipeline, augmentation flag, pad_multiple bucketing, ANN models."""
import os

import pytest

import run_exp

from .fixtures import make_hd_tree, make_sc_tree


@pytest.fixture
def hd_folder(tmp_path):
    folder = str(tmp_path / "hd")
    make_hd_tree(folder, n_per_digit=3, digits=(0, 1))
    return folder


@pytest.fixture
def sc_folder(tmp_path):
    folder = str(tmp_path / "sc")
    make_sc_tree(folder, labels=("go", "stop"), n_per_label=4)
    return folder


def test_hd_training_run(hd_folder, tmp_path):
    e = run_exp.main(
        [
            "--dataset_name", "hd",
            "--data_folder", hd_folder,
            "--new_exp_folder", str(tmp_path / "exp_hd"),
            "--model_type", "adLIF",
            "--nb_layers", "2",
            "--nb_hiddens", "16",
            "--batch_size", "4",
            "--nb_epochs", "1",
            "--state_init", "zeros",
            "--pdrop", "0.0",
            "--pad_multiple", "20",
        ]
    )
    assert 0.0 <= e.test_acc <= 1.0
    assert e.nb_inputs == 40  # fbank bins


def test_sc_training_run_with_augmentation(sc_folder, tmp_path):
    e = run_exp.main(
        [
            "--dataset_name", "sc",
            "--data_folder", sc_folder,
            "--new_exp_folder", str(tmp_path / "exp_sc"),
            "--model_type", "GRU",
            "--nb_layers", "2",
            "--nb_hiddens", "16",
            "--batch_size", "4",
            "--nb_epochs", "1",
            "--pdrop", "0.0",
            "--use_augm", "true",
            "--pad_multiple", "20",
        ]
    )
    assert 0.0 <= e.test_acc <= 1.0
    assert e.nb_outputs == 35  # sc class count is fixed by the reference


def test_sc_training_run_device_frontend(sc_folder, tmp_path):
    """--frontend device: raw waveforms ship to the step, fbank runs
    inside the compiled program (masked back to the host path's
    zero-padded-features semantics)."""
    e = run_exp.main(
        [
            "--dataset_name", "sc",
            "--data_folder", sc_folder,
            "--new_exp_folder", str(tmp_path / "exp_sc_dev"),
            "--model_type", "LIF",
            "--nb_layers", "2",
            "--nb_hiddens", "16",
            "--batch_size", "4",
            "--nb_epochs", "1",
            "--state_init", "zeros",
            "--pdrop", "0.0",
            "--pad_multiple", "20",
            "--frontend", "device",
        ]
    )
    assert 0.0 <= e.test_acc <= 1.0


def test_device_frontend_serving(sc_folder, tmp_path):
    """Predictor.from_experiment on a --frontend device experiment: raw
    waveforms in, probabilities out, and the serving path reproduces the
    training eval path's outputs exactly (same collate policy: frame
    counts T(L) = 1 + (L-400)//160, bucketed padding, masked tails)."""
    import jax.numpy as jnp
    import numpy as np

    from sparch_tpu.data.audio import load_hd_or_sc
    from sparch_tpu.serve import Predictor

    exp = str(tmp_path / "exp_sc_serve")
    run_exp.main(
        [
            "--dataset_name", "sc",
            "--data_folder", sc_folder,
            "--new_exp_folder", exp,
            # adLIF learns where plain LIF collapses at this class count
            # (docs/parity_synthetic_r3.json), and the best-model
            # checkpoint only writes once valid acc improves past 0
            "--model_type", "adLIF",
            "--nb_layers", "2",
            "--nb_hiddens", "16",
            "--batch_size", "4",
            "--nb_epochs", "4",
            "--state_init", "zeros",
            "--pdrop", "0.0",
            "--pad_multiple", "20",
            "--frontend", "device",
        ]
    )
    # pad_multiple deliberately NOT passed: from_experiment reads the
    # training run's --pad_multiple 20 from the meta record
    predictor = Predictor.from_experiment(exp, batch_size=4)
    assert predictor.pad_multiple == 20

    # the training loader's device-mode batch is the ground truth the
    # serving path must reproduce
    wav, xlens, ys = next(iter(load_hd_or_sc(
        dataset_name="sc", data_folder=sc_folder, split="valid",
        batch_size=4, shuffle=False, pad_multiple=20, frontend="device",
    )))
    # jitted like the serving path — the un-jitted op-by-op schedule
    # drifts ~4e-3 in the T=100 recurrence (fusion reassociation), which
    # would mask real collate/mask bugs behind a loose tolerance
    import jax

    @jax.jit
    def ref_fwd(variables, xw, xl):
        out, _ = predictor.model.apply(variables, (xw, xl), train=False)
        return out / out.sum(-1, keepdims=True)

    ref_probs = np.asarray(ref_fwd(
        predictor.variables, jnp.asarray(wav), jnp.asarray(xlens)
    ))

    # serve the SAME utterances as a ragged list of true-length waveforms
    n = wav.shape[0]
    ragged = [wav[i, : 400 + (int(xlens[i]) - 1) * 160] for i in range(n)]
    labels, probs = predictor(ragged)
    np.testing.assert_allclose(probs, ref_probs, rtol=1e-5, atol=1e-7)
    assert labels.shape == (n,)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    # pre-padded 2-D input + explicit sample lengths is the same thing
    labels2, probs2 = predictor(wav, lengths=[len(r) for r in ragged])
    np.testing.assert_allclose(probs2, probs, rtol=1e-6)

    # a sub-frame-length clip (L < 400 samples) serves without error
    labels3, probs3 = predictor([np.zeros(150, np.float32)] + ragged[:1])
    assert labels3.shape == (2,)


def test_device_frontend_matches_host_pipeline(sc_folder):
    """Same model applied via the host fbank pipeline and the on-device
    frontend produces matching logits (fbank twins agree to float
    tolerance; padded frames are masked identically)."""
    import jax
    import numpy as np

    from sparch_tpu.data.audio import load_hd_or_sc
    from sparch_tpu.models import build_model
    from sparch_tpu.models.frontend import FbankFrontend

    kw = dict(
        dataset_name="sc", data_folder=sc_folder, batch_size=4,
        shuffle=False, pad_multiple=20,
    )
    host_batch = next(iter(load_hd_or_sc(split="valid", **kw)))
    dev_batch = next(iter(
        load_hd_or_sc(split="valid", frontend="device", **kw)
    ))
    x_host, xlens_h, y_h = host_batch
    x_wave, xlens_d, y_d = dev_batch
    np.testing.assert_array_equal(xlens_h, xlens_d)
    np.testing.assert_array_equal(y_h, y_d)
    assert x_wave.ndim == 2 and x_host.ndim == 3
    assert x_host.shape[1] == 1 + (x_wave.shape[1] - 400) // 160

    inner = build_model(
        "LIF", (4, x_host.shape[1], 40), [16, 35],
        dropout=0.0, normalization="batchnorm", state_init="zeros",
    )
    variables = inner.init({"params": jax.random.PRNGKey(0)}, x_host)
    out_host, _ = inner.apply(variables, x_host, train=False)

    wrapped = FbankFrontend(inner=inner)
    wrapped_vars = {"params": {"inner": variables["params"]},
                    "batch_stats": {"inner": variables["batch_stats"]}}
    out_dev, _ = wrapped.apply(
        wrapped_vars, (x_wave, xlens_d.astype(np.int32)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(out_dev), np.asarray(out_host), atol=2e-2, rtol=1e-3
    )


def test_sc_bidirectional_device_frontend(sc_folder, tmp_path):
    """The SC flagship shape: bidirectional RadLIF with the on-device
    fbank frontend and augmentation — full train/valid/test flow."""
    e = run_exp.main(
        [
            "--dataset_name", "sc",
            "--data_folder", sc_folder,
            "--new_exp_folder", str(tmp_path / "exp_sc_bdir_dev"),
            "--model_type", "RadLIF",
            "--nb_layers", "2",
            "--nb_hiddens", "12",
            "--batch_size", "4",
            "--nb_epochs", "1",
            "--bidirectional", "true",
            "--use_augm", "true",
            "--pdrop", "0.1",
            "--pad_multiple", "20",
            "--frontend", "device",
        ]
    )
    assert 0.0 <= e.test_acc <= 1.0
