"""Waveform augmentation chain for the non-spiking datasets.

Mirrors the reference's train-split chain
(reference nonspiking_datasets.py:71-80):

    RandomApply([PolarityInversion()], p=0.8)
    RandomApply([Noise(min_snr, max_snr)], p=p_noise)
    RandomApply([Gain()], p=0.3)
    RandomApply([Reverb(16 kHz)], p=0.6)

Implemented in NumPy (the reference uses the ``torchaudio_augmentations``
package, which is a thin wrapper over these same operations):

- PolarityInversion: exact (multiply by -1).
- Noise: additive white Gaussian noise with std drawn uniformly from
  ``[min_snr*std(x), max_snr*std(x)]`` (same parameterisation as
  torchaudio_augmentations.Noise).
- Gain: uniform gain in dB from [-20, -1] (the package's defaults).
- Reverb: the package shells out to sox; unavailable here, so this uses a
  synthetic exponentially-decaying noise RIR convolution with a comparable
  T60 (~0.3 s). Documented approximation; augmentation is off by default
  (reference training_config.py:140-146).
"""
from __future__ import annotations

import numpy as np

__all__ = ["AugmentChain"]


def _polarity(x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    return -x


def _noise(x, rng, min_snr, max_snr):
    std = float(np.std(x))
    noise_std = rng.uniform(min_snr * std, max_snr * std)
    return x + rng.normal(0.0, noise_std, size=x.shape).astype(np.float32)


def _gain(x, rng, min_db=-20.0, max_db=-1.0):
    db = rng.uniform(min_db, max_db)
    return x * np.float32(10.0 ** (db / 20.0))


def _reverb(x, rng, sample_rate=16000, t60=0.3, rir_len=0.25):
    n = int(rir_len * sample_rate)
    t = np.arange(n, dtype=np.float32) / sample_rate
    decay = np.exp(-6.908 * t / t60)  # -60 dB at t60
    rir = rng.normal(0.0, 1.0, size=n).astype(np.float32) * decay
    rir[0] = 1.0
    rir /= np.sqrt(np.sum(rir**2))
    wet = np.convolve(x, rir)[: len(x)].astype(np.float32)
    return 0.7 * x + 0.3 * wet


class AugmentChain:
    """Randomly-applied augmentation chain with the reference's
    probabilities."""

    def __init__(
        self,
        min_snr: float = 1e-4,
        max_snr: float = 0.9,
        p_noise: float = 0.1,
        seed: int = 0,
    ):
        self.min_snr = min_snr
        self.max_snr = max_snr
        self.p_noise = p_noise
        self.rng = np.random.default_rng(seed)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        rng = self.rng
        if rng.random() < 0.8:
            x = _polarity(x, rng)
        if rng.random() < self.p_noise:
            x = _noise(x, rng, self.min_snr, self.max_snr)
        if rng.random() < 0.3:
            x = _gain(x, rng)
        if rng.random() < 0.6:
            x = _reverb(x, rng)
        return x.astype(np.float32)
