"""Kaldi-compatible log-mel filterbank frontend.

Re-implements the feature extraction the reference obtains from
``torchaudio.compliance.kaldi.fbank(x, num_mel_bins=40)``
(reference nonspiking_datasets.py:96,194) with torchaudio's default
parameters:

    sample rate 16 kHz, frame length 25 ms (400 samples), frame shift
    10 ms (160 samples), snip_edges=True, round_to_power_of_two=True
    (512-point FFT), dither=0.0, remove_dc_offset=True, preemphasis 0.97,
    'povey' window ((0.5 - 0.5 cos)^0.85), power spectrum, Kaldi mel scale
    1127*ln(1+f/700) with low=20 Hz / high=Nyquist, log(max(e, EPS)).

The same function body runs in two modes:

- **host**: plain NumPy, used by the data loaders for per-utterance
  feature extraction (the reference computes fbank per item on the CPU
  dataloader path);
- **device**: ``jax.numpy``, fully jittable, used to fuse the frontend
  into the TPU training step for the on-the-fly pipeline (the binned
  matmul-heavy part of the model then consumes features straight from
  HBM with no host round-trip).

Waveforms are expected in float [-1, 1] (torchaudio.load convention; the
resulting features differ from int16-scale Kaldi by a constant log offset
per frame, which normalisation absorbs — same as the reference).
"""
from __future__ import annotations

import math

import numpy as np

SAMPLE_RATE = 16000
FRAME_LENGTH = 400  # 25 ms
FRAME_SHIFT = 160  # 10 ms
FFT_SIZE = 512  # next pow2 of 400 (round_to_power_of_two)
LOW_FREQ = 20.0
PREEMPH = 0.97
LOG_EPS = 1.1920928955078125e-07  # float32 machine epsilon (Kaldi EPSILON)

__all__ = [
    "mel_scale",
    "mel_filterbank",
    "povey_window",
    "fbank_np",
    "fbank_jnp",
    "num_frames",
]


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, np.float64) / 700.0)


def povey_window(length: int = FRAME_LENGTH) -> np.ndarray:
    n = np.arange(length, dtype=np.float64)
    return ((0.5 - 0.5 * np.cos(2.0 * math.pi * n / (length - 1))) ** 0.85).astype(
        np.float32
    )


def mel_filterbank(
    num_bins: int = 40,
    fft_size: int = FFT_SIZE,
    sample_rate: int = SAMPLE_RATE,
    low_freq: float = LOW_FREQ,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank, shape (fft_size//2, num_bins).

    ``high_freq <= 0`` means Nyquist + high_freq. The Nyquist fft bin is
    excluded (Kaldi uses bins 0..fft_size//2 - 1).
    """
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    num_fft_bins = fft_size // 2
    fft_bin_width = sample_rate / fft_size
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_freqs = mel_scale(np.arange(num_fft_bins) * fft_bin_width)  # (F,)
    left = mel_low + np.arange(num_bins) * mel_delta  # (M,)
    center = left + mel_delta
    right = center + mel_delta

    up = (bin_freqs[:, None] - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - bin_freqs[:, None]) / (right - center)[None, :]
    weights = np.maximum(0.0, np.minimum(up, down))
    return weights.astype(np.float32)


def num_frames(num_samples: int) -> int:
    """snip_edges frame count."""
    if num_samples < FRAME_LENGTH:
        return 0
    return 1 + (num_samples - FRAME_LENGTH) // FRAME_SHIFT


def _fbank(x, xp, window, mel_weights, num_mel_bins):
    """Shared fbank body; ``xp`` is numpy or jax.numpy."""
    n = x.shape[-1]
    nf = num_frames(n)
    idx = np.arange(nf)[:, None] * FRAME_SHIFT + np.arange(FRAME_LENGTH)[None, :]
    frames = x[..., idx]  # (..., nf, 400)

    # remove DC offset per frame
    frames = frames - xp.mean(frames, axis=-1, keepdims=True)
    # preemphasis with reflected first sample: x[i] - 0.97 * x[max(i-1, 0)]
    prev = xp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - PREEMPH * prev
    frames = frames * window

    spec = xp.fft.rfft(frames, n=FFT_SIZE, axis=-1)
    power = xp.abs(spec[..., : FFT_SIZE // 2]) ** 2  # drop Nyquist bin
    mel = power @ mel_weights
    return xp.log(xp.maximum(mel, LOG_EPS)).astype(xp.float32)


_MEL_CACHE: dict = {}


def _weights(num_mel_bins: int) -> np.ndarray:
    if num_mel_bins not in _MEL_CACHE:
        _MEL_CACHE[num_mel_bins] = mel_filterbank(num_mel_bins)
    return _MEL_CACHE[num_mel_bins]


def fbank_np(waveform: np.ndarray, num_mel_bins: int = 40) -> np.ndarray:
    """Host-side fbank: float waveform (..., n_samples) -> (..., frames, bins)."""
    w = np.asarray(waveform, np.float32)
    return _fbank(w, np, povey_window(), _weights(num_mel_bins), num_mel_bins)


def fbank_jnp(waveform, num_mel_bins: int = 40):
    """Device-side, jittable fbank (static input length)."""
    import jax.numpy as jnp

    return _fbank(
        waveform.astype(jnp.float32),
        jnp,
        jnp.asarray(povey_window()),
        jnp.asarray(_weights(num_mel_bins)),
        num_mel_bins,
    )
