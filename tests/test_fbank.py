"""fbank frontend: framing math, Kaldi mel filterbank properties, host/device
agreement, tone-peak localisation, DC invariance, and agreement with an
independent clean-room float64 oracle (tests/kaldi_fbank_oracle.py) on a
panel of golden signals. If true torchaudio goldens have been generated
(tools/gen_fbank_goldens.py, wherever torchaudio is installed — it cannot
be installed in this zero-egress image) they are pinned too."""
import os

import numpy as np
import pytest

from sparch_tpu.ops import fbank as fb

from .kaldi_fbank_oracle import golden_signals, oracle_fbank




@pytest.mark.parametrize("name", sorted(golden_signals()))
def test_matches_cleanroom_oracle(name):
    x = golden_signals()[name]
    got = fb.fbank_np(x, 40)
    want = oracle_fbank(x, 40)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_matches_torchaudio_goldens_if_generated():
    path = os.path.join(os.path.dirname(__file__), "data", "fbank_golden.npz")
    if not os.path.exists(path):
        pytest.skip(
            "torchaudio goldens not generated (torchaudio is not installable "
            "in this zero-egress image; run tools/gen_fbank_goldens.py on a "
            "machine with torchaudio and commit tests/data/fbank_golden.npz)"
        )
    goldens = np.load(path)
    for name, x in golden_signals().items():
        got = fb.fbank_np(x, 40)
        np.testing.assert_allclose(
            got, goldens[name], atol=1e-3, err_msg=name
        )


def test_num_frames_snip_edges():
    assert fb.num_frames(399) == 0
    assert fb.num_frames(400) == 1
    assert fb.num_frames(559) == 1
    assert fb.num_frames(560) == 2
    assert fb.num_frames(16000) == 98  # 1 s at 16 kHz -> 98 frames


def test_output_shape_and_finite():
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
    feats = fb.fbank_np(x, 40)
    assert feats.shape == (98, 40)
    assert np.isfinite(feats).all()


def test_mel_filterbank_properties():
    W = fb.mel_filterbank(40)
    assert W.shape == (256, 40)
    assert (W >= 0).all()
    # every filter has support, and peak fft bins increase with filter index
    peaks = W.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    assert W.sum(axis=0).min() > 0


def test_tone_peaks_in_correct_mel_bin():
    sr = 16000
    for freq in (300.0, 1000.0, 3000.0):
        t = np.arange(sr) / sr
        x = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
        feats = fb.fbank_np(x, 40)
        got_bin = int(np.median(feats.argmax(axis=1)))
        # expected: mel bin whose center is nearest mel(freq)
        mel_low = fb.mel_scale(fb.LOW_FREQ)
        mel_high = fb.mel_scale(sr / 2)
        delta = (mel_high - mel_low) / 41
        centers = mel_low + (np.arange(40) + 1) * delta
        want_bin = int(np.argmin(np.abs(centers - fb.mel_scale(freq))))
        assert abs(got_bin - want_bin) <= 1, (freq, got_bin, want_bin)


def test_dc_offset_removed():
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.3, 0.3, 8000).astype(np.float32)
    a = fb.fbank_np(x)
    b = fb.fbank_np(x + 0.25)
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_host_and_device_agree():
    import jax

    rng = np.random.default_rng(2)
    x = rng.uniform(-0.5, 0.5, 6400).astype(np.float32)
    host = fb.fbank_np(x)
    dev = np.asarray(jax.jit(fb.fbank_jnp)(x))
    np.testing.assert_allclose(host, dev, atol=2e-3)


