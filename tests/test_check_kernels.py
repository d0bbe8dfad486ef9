"""Smoke-test the on-TPU kernel-correctness harness (tools/check_kernels.py)
in interpret mode on the CPU mesh: the case plumbing (arg wiring, mask
extraction, metric judging) must stay runnable so the tool is trustworthy
when pointed at the real chip."""
import importlib.util
import os

import pytest


@pytest.fixture(scope="module")
def ck():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "check_kernels.py",
    )
    spec = importlib.util.spec_from_file_location("check_kernels", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spiking_case_passes_interpret(ck):
    m, fails = ck.spiking_case("radlif", B=4, T=7, H=16)
    assert not fails, (m, fails)
    assert m["spike_agree"] == 1.0


def test_dropout_case_passes_interpret(ck):
    m, fails = ck.spiking_dropout_case("lif", B=8, T=11, H=16)
    assert not fails, (m, fails)
    assert m["deterministic"] == 1.0 and m["seed_sensitive"] == 1.0


def test_ann_case_passes_interpret(ck):
    m, fails = ck.ann_case("ligru", B=4, T=9, H=16, drop=0.3)
    assert not fails, (m, fails)


def test_case_list_covers_every_fused_op(ck):
    names = {n.split("/")[0] for n, _ in ck.build_cases()}
    assert names == {
        "lif", "adlif", "rlif", "radlif", "readout", "rnn", "ligru", "gru"
    }
