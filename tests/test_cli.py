"""End-to-end CLI: train on synthetic SHD data through run_exp.py's main(),
checking exp-folder conventions, checkpointing, resume, and test-only mode
(reference call stacks SURVEY.md §3.1, §3.4, §3.5)."""
import os

import numpy as np
import pytest

import run_exp

from .fixtures import make_shd_h5


@pytest.fixture
def shd_folder(tmp_path):
    folder = str(tmp_path / "shd")
    os.makedirs(folder)
    make_shd_h5(f"{folder}/shd_train.h5", n=16, nb_classes=3)
    make_shd_h5(f"{folder}/shd_test.h5", n=8, nb_classes=3, seed=1)
    return folder


def _base_args(shd_folder, exp_folder, extra=()):
    return [
        "--dataset_name", "shd",
        "--data_folder", shd_folder,
        "--new_exp_folder", exp_folder,
        "--model_type", "LIF",
        "--nb_layers", "2",
        "--nb_hiddens", "16",
        "--batch_size", "8",
        "--nb_epochs", "2",
        "--state_init", "zeros",
        "--pdrop", "0.0",
        *extra,
    ]


def test_full_training_run(shd_folder, tmp_path):
    exp = str(tmp_path / "exp1")
    e = run_exp.main(_base_args(shd_folder, exp))
    assert os.path.isdir(os.path.join(exp, "log"))
    assert os.path.isdir(os.path.join(exp, "checkpoints", "best_model"))
    assert os.path.isfile(os.path.join(exp, "checkpoints", "meta.json"))
    assert 0.0 <= e.test_acc <= 1.0


def test_new_exp_folder_must_not_exist(shd_folder, tmp_path):
    exp = str(tmp_path / "exp2")
    os.makedirs(exp)
    with pytest.raises(FileExistsError):
        run_exp.main(_base_args(shd_folder, exp))


def test_auto_generated_folder_name(shd_folder, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = _base_args(shd_folder, "ignored")
    # drop --new_exp_folder to trigger the config-derived naming
    i = args.index("--new_exp_folder")
    del args[i : i + 2]
    run_exp.main(args)
    expected = "exp/test_exps/shd_LIF_2lay16_drop0_0_batchnorm_nobias_udir_noreg_lr0_01"
    assert os.path.isdir(expected), os.listdir("exp/test_exps")


def test_resume_from_pretrained(shd_folder, tmp_path):
    exp = str(tmp_path / "exp3")
    run_exp.main(_base_args(shd_folder, exp))
    # resume: re-validates to re-derive best acc, then trains 1 more epoch
    e = run_exp.main(
        [
            "--dataset_name", "shd",
            "--data_folder", shd_folder,
            "--model_type", "LIF",
            "--nb_layers", "2",
            "--nb_hiddens", "16",
            "--batch_size", "8",
            "--nb_epochs", "1",
            "--state_init", "zeros",
            "--pdrop", "0.0",
            "--use_pretrained_model", "true",
            "--load_exp_folder", exp,
            "--start_epoch", "2",
        ]
    )
    assert 0.0 <= e.test_acc <= 1.0


def test_missing_checkpoint_raises(shd_folder, tmp_path):
    empty = str(tmp_path / "nockpt")
    os.makedirs(os.path.join(empty, "checkpoints"))
    with pytest.raises(FileNotFoundError):
        run_exp.main(
            [
                "--dataset_name", "shd",
                "--data_folder", shd_folder,
                "--use_pretrained_model", "true",
                "--load_exp_folder", empty,
            ]
        )


def test_only_do_testing(shd_folder, tmp_path):
    exp = str(tmp_path / "exp4")
    run_exp.main(_base_args(shd_folder, exp))
    e = run_exp.main(
        [
            "--dataset_name", "shd",
            "--data_folder", shd_folder,
            "--model_type", "LIF",
            "--nb_layers", "2",
            "--nb_hiddens", "16",
            "--batch_size", "8",
            "--state_init", "zeros",
            "--only_do_testing", "true",
            "--use_pretrained_model", "true",
            "--load_exp_folder", exp,
        ]
    )
    assert 0.0 <= e.test_acc <= 1.0


def test_input_dtype_bf16_via_cli(shd_folder, tmp_path):
    """--input_dtype bfloat16 ships bf16 batches; spiking rasters are
    integer counts so the run is numerically the float32 run (see
    test_dtype.py for the bit-exactness pin)."""
    exp = str(tmp_path / "exp_bf16in")
    e = run_exp.main(
        _base_args(shd_folder, exp, extra=("--input_dtype", "bfloat16"))
    )
    assert 0.0 <= e.test_acc <= 1.0
    import json

    meta = json.load(open(os.path.join(exp, "checkpoints", "meta.json")))
    assert meta["model"]["input_dtype"] == "bfloat16"


def test_ann_model_via_cli(shd_folder, tmp_path):
    exp = str(tmp_path / "exp5")
    args = _base_args(shd_folder, exp)
    args[args.index("--model_type") + 1] = "GRU"
    e = run_exp.main(args)
    assert 0.0 <= e.test_acc <= 1.0


def test_auto_resume(shd_folder, tmp_path):
    exp = str(tmp_path / "exp6")
    run_exp.main(_base_args(shd_folder, exp))
    # relaunch same folder with --auto_resume: continues instead of failing
    e = run_exp.main(
        _base_args(shd_folder, exp, extra=["--auto_resume", "true",
                                           "--nb_epochs", "1"])
    )
    assert 0.0 <= e.test_acc <= 1.0
    # without the flag it still fails (reference semantics preserved)
    with pytest.raises(FileExistsError):
        run_exp.main(_base_args(shd_folder, exp))


def test_nb_steps_and_threshold_flags(shd_folder, tmp_path):
    exp = str(tmp_path / "exp7")
    e = run_exp.main(
        _base_args(
            shd_folder, exp,
            extra=["--nb_steps", "50", "--threshold", "0.7",
                   "--nb_epochs", "1"],
        )
    )
    assert e.net.threshold == 0.7
    xs, _, _ = next(iter(e.train_loader))
    assert xs.shape[1] == 50


def test_log_tofile(shd_folder, tmp_path):
    exp = str(tmp_path / "exp8")
    run_exp.main(
        _base_args(shd_folder, exp, extra=["--log_tofile", "true",
                                           "--nb_epochs", "1"])
    )
    log = os.path.join(exp, "log", "exp.log")
    assert os.path.isfile(log)
    content = open(log).read()
    assert "train loss=" in content
    assert "Test acc=" in content


def test_seq_parallel_training(shd_folder, tmp_path):
    """--seq_parallel routes divisible batches through the time-pipelined
    steps (dp x sp mesh on the 8-device CPU backend) with the DEFAULT
    recipe (dropout + uniform state init -> the global-shape noise seam);
    training, eval and checkpointing must all complete."""
    exp = str(tmp_path / "exp_sp")
    e = run_exp.main([
        "--dataset_name", "shd",
        "--data_folder", shd_folder,
        "--new_exp_folder", exp,
        "--model_type", "LIF",
        "--nb_layers", "2",
        "--nb_hiddens", "16",
        "--batch_size", "8",
        "--nb_epochs", "2",
        "--pdrop", "0.1",
        "--state_init", "uniform",
        "--seq_parallel", "2",
        "--seq_microbatches", "2",
    ])
    assert e.seq_mesh is not None
    assert dict(zip(e.seq_mesh.axis_names, e.seq_mesh.devices.shape)) == {
        "data": 4, "seq": 2,
    }
    # the default batch shapes divide the mesh: the pipe path engaged
    assert e._seq_ok(np.zeros((8, 100, 700), np.float32))
    assert not e._seq_ok(np.zeros((7, 100, 700), np.float32))  # ragged
    assert os.path.isdir(os.path.join(exp, "checkpoints", "best_model"))
    assert 0.0 <= e.test_acc <= 1.0


def test_seq_parallel_bidirectional_training(shd_folder, tmp_path):
    """--seq_parallel + --bidirectional: the batch trick runs across the
    sharded time axis (time-reversal ppermutes inside the pipeline)."""
    exp = str(tmp_path / "exp_sp_bidir")
    e = run_exp.main(_base_args(
        shd_folder, exp,
        extra=["--seq_parallel", "2", "--bidirectional", "true",
               "--seq_microbatches", "2", "--nb_epochs", "1"],
    ))
    assert e.seq_mesh is not None
    assert 0.0 <= e.test_acc <= 1.0


def test_remat_training(shd_folder, tmp_path):
    """--remat trains end-to-end: hidden layers recompute in the backward
    pass (jax.checkpoint); dropout + uniform state init exercise the
    RNG-replay path the gradients depend on."""
    exp = str(tmp_path / "exp_remat")
    e = run_exp.main(_base_args(
        shd_folder, exp,
        extra=["--remat", "true", "--pdrop", "0.1",
               "--state_init", "uniform", "--nb_epochs", "1"],
    ))
    assert e.remat
    assert 0.0 <= e.test_acc <= 1.0


def test_remat_rejected_under_seq_parallel(shd_folder, tmp_path):
    """--remat is meaningless under --seq_parallel (the pipelined step
    already bounds activation memory per microbatch) — explicit error,
    not a silent no-op."""
    exp = str(tmp_path / "exp_remat_sp")
    with pytest.raises(ValueError, match="remat"):
        run_exp.main(_base_args(
            shd_folder, exp,
            extra=["--remat", "true", "--seq_parallel", "2"],
        ))


def test_seq_parallel_amp_training(shd_folder, tmp_path):
    """--seq_parallel composed with --compute_dtype bfloat16 (AMP): the
    pipelined steps mirror the single-device dtype flow (bf16
    projections via cells.rec_dot, f32 weight-grad accumulation);
    training, eval and checkpointing must all complete e2e."""
    exp = str(tmp_path / "exp_sp_amp")
    e = run_exp.main(_base_args(
        shd_folder, exp,
        extra=["--seq_parallel", "2", "--seq_microbatches", "2",
               "--compute_dtype", "bfloat16", "--use_bias", "true"],
    ))
    assert e.seq_mesh is not None
    assert np.isfinite(e.test_acc)
    assert 0.0 <= e.test_acc <= 1.0
    # no best_model assertion: the best checkpoint only saves when the
    # valid acc improves over 0, which the tiny fixture can't guarantee
    # at bf16 (checkpointing is pinned by test_full_training_run)


def test_predictor_from_experiment(shd_folder, tmp_path):
    """Train via the CLI, then serve from the experiment folder alone:
    the checkpoint meta records the architecture, so
    Predictor.from_experiment needs no model code from the caller."""
    import jax
    import numpy as np

    from sparch_tpu.serve import Predictor
    from sparch_tpu.train.checkpoint import restore_checkpoint
    from sparch_tpu.train.state import create_train_state

    exp = str(tmp_path / "exp_pred")
    e = run_exp.main(_base_args(shd_folder, exp))
    pred = Predictor.from_experiment(exp, batch_size=4)
    x = (np.random.default_rng(0).random((5, 100, 700)) < 0.02).astype(
        np.float32
    )
    labels, probs = pred(x)
    # nb_outputs follows the dataset (shd -> 20), not the fixture's labels
    assert labels.shape == (5,) and probs.shape == (5, 20)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    labels2, probs2 = pred(x)
    np.testing.assert_array_equal(labels, labels2)  # deterministic

    # identical to the hand-assembled path (model rebuild + restore)
    template = create_train_state(
        e.net, np.zeros((2, 8, 700), np.float32), lr=1e-2,
        rng=jax.random.PRNGKey(0),
    )
    state, meta = restore_checkpoint(f"{exp}/checkpoints", template)
    assert meta["model"]["model_type"] == "LIF"
    manual = Predictor(
        e.net,
        {"params": state.params, "batch_stats": state.batch_stats},
        batch_size=4,
    )
    _, probs_manual = manual(x)
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(probs_manual), atol=1e-6
    )


def test_streaming_from_experiment(shd_folder, tmp_path):
    """load_experiment + streaming_init: frame-by-frame serving of a
    CLI-trained model matches the batch Predictor's posteriors."""
    import numpy as np

    from sparch_tpu.serve import (
        Predictor, load_experiment, streaming_init, streaming_step,
    )

    exp = str(tmp_path / "exp_stream")
    run_exp.main(_base_args(shd_folder, exp))
    model, variables = load_experiment(exp)
    x = (np.random.default_rng(1).random((2, 30, 700)) < 0.02).astype(
        np.float32
    )
    state = streaming_init(model, variables, batch_size=2)
    for t in range(30):
        state, out = streaming_step(model, variables, state, x[:, t])
    probs_stream = np.asarray(out / out.sum(axis=-1, keepdims=True))
    # the batch path must agree (zeros-init model: deterministic)
    _, probs_batch = Predictor(model, variables, batch_size=2)(x)
    np.testing.assert_allclose(
        probs_stream, np.asarray(probs_batch), atol=1e-5
    )


def test_compile_cache_flag_booleanish(shd_folder, tmp_path, monkeypatch):
    """--compile_cache 'true' must mean 'default cache dir', not a
    directory literally named ./true (every reference-schema flag is a
    true/false string, so that is what users type)."""
    from sparch_tpu.utils.cache import resolve_cache_arg

    assert resolve_cache_arg("true") is None
    assert resolve_cache_arg("TRUE") is None
    assert resolve_cache_arg("1") is None
    assert resolve_cache_arg(True) is None
    assert resolve_cache_arg("false") is False
    assert resolve_cache_arg(None) is False
    assert resolve_cache_arg("") is False
    cache = str(tmp_path / "xla_cache")
    assert resolve_cache_arg(cache) == cache

    # e2e: 'true' creates no ./true directory and the run completes
    monkeypatch.chdir(tmp_path)
    exp = str(tmp_path / "exp_cc")
    run_exp.main(
        _base_args(shd_folder, exp, extra=("--compile_cache", "true"))
    )
    assert not (tmp_path / "true").exists()
