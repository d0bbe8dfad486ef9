"""On-device audio frontend: fuse the fbank DSP into the jitted step.

The reference computes torchaudio kaldi fbanks per item on the host
(reference nonspiking_datasets.py:96,194), which makes loader CPU cores
the throughput ceiling for the hd/sc configs. ``FbankFrontend`` wraps any
sparch model so raw (B, num_samples) waveform batches are featurised
INSIDE the compiled train/eval program — the framing/FFT/mel work is a
handful of batched matmuls and elementwise ops that disappear into the
step's XLA schedule, and the host pipeline only decodes + augments.

The device fbank (``ops.fbank.fbank_jnp``) and the host fbank
(``fbank_np``) are the same implementation instantiated on two array
namespaces and agree to float tolerance (tests/test_fbank.py), so the two
frontends are numerically interchangeable; select with ``--frontend``.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax

from sparch_tpu.ops.fbank import fbank_jnp

__all__ = ["FbankFrontend"]


class FbankFrontend(nn.Module):
    """Wraps ``inner`` so its input is a raw waveform batch (B, samples);
    computes the 40-bin log-mel fbank on device and forwards (B, T, mel).

    Exposes the attributes the training stack reads off a model
    (``is_snn``, ``state_init``, layer metadata) by delegation.
    """

    inner: nn.Module
    num_mel_bins: int = 40

    @property
    def is_snn(self) -> bool:
        return self.inner.is_snn

    @property
    def state_init(self) -> Optional[str]:
        return getattr(self.inner, "state_init", None)

    @property
    def num_layers(self) -> int:
        return self.inner.num_layers

    @property
    def num_outputs(self) -> int:
        return self.inner.num_outputs

    @property
    def use_readout_layer(self) -> bool:
        return self.inner.use_readout_layer

    @nn.compact
    def __call__(self, x, train: bool = False):
        xlens = None
        if isinstance(x, (tuple, list)):
            x, xlens = x
        if x.ndim != 2:
            raise ValueError(
                f"FbankFrontend expects (batch, samples) waveforms, got "
                f"rank {x.ndim}"
            )
        feats = jax.vmap(
            lambda w: fbank_jnp(w, self.num_mel_bins)
        )(x)
        if xlens is not None:
            # match the host pipeline exactly: it pads FEATURES with
            # zeros, whereas the fbank of a zero-padded waveform tail is
            # the log-energy floor — mask the padded frames back to zero
            import jax.numpy as jnp

            t = jnp.arange(feats.shape[1])[None, :]
            feats = jnp.where(
                (t < xlens[:, None])[..., None], feats, 0.0
            )
        return self.inner(feats, train=train)
