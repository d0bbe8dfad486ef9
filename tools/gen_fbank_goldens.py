#!/usr/bin/env python
"""Generate torchaudio-kaldi fbank golden fixtures into tests/data/.

Run this wherever torchaudio IS installed (it cannot be installed in the
zero-egress build image) — only numpy + torch/torchaudio are needed (the
signal table lives in the dependency-light tests/kaldi_fbank_oracle.py,
not the pytest/jax-importing test module) — and commit the resulting
``tests/data/fbank_golden.npz``; ``tests/test_fbank.py`` picks it up
automatically and pins ``fbank_np`` against the true oracle. Until then
the suite validates against the independent clean-room float64 oracle
(tests/kaldi_fbank_oracle.py).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.kaldi_fbank_oracle import golden_signals  # noqa: E402


def main():
    import torch
    import torchaudio

    out = {}
    for name, x in golden_signals().items():
        feats = torchaudio.compliance.kaldi.fbank(
            torch.from_numpy(x)[None, :], num_mel_bins=40
        ).numpy()
        out[name] = feats
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "fbank_golden.npz",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {sorted(out)}")


if __name__ == "__main__":
    main()
