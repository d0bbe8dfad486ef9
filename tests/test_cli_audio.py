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
