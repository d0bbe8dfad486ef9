#!/usr/bin/env python
"""Generate torchaudio_augmentations golden fixtures into tests/data/.

Run this wherever ``torchaudio_augmentations`` IS installed (it cannot be
installed in the zero-egress build image; its Reverb additionally needs a
torchaudio built with sox support) and commit the resulting
``tests/data/augment_golden.npz``; ``tests/test_augment.py`` picks it up
automatically and pins ``sparch_tpu.data.augment`` against the actual
package (reference chain: sparch/dataloaders/nonspiking_datasets.py:71-80).
Until then the suite validates the clean-room implementation against sox's
published parameter curves and the Jezar Freeverb tuning only.

What each fixture pins (and the discrepancy it would expose):

- polarity_*            exact sign flip.
- gain_*                Gain(min_gain=db, max_gain=db) is deterministic;
                        pins the dB->linear map AND whether the package
                        clamps to [-1, 1] (gain_loud_* has amplitude 1.5,
                        so a clamp shows as a flat top).
- noise_*               Noise(min_snr=s, max_snr=s) makes the noise std
                        deterministic (= s * std(x)); pooled residual
                        variance over many draws pins the std definition
                        (torch.std is Bessel-corrected; np.std is not —
                        at n=8 the variances differ by 14%, far above the
                        ~0.5% sampling error of the pooled estimate).
- ra_*                  RandomApply([...], p) applied-frequency over N
                        calls; pins that p is the APPLY probability.
- reverb_*              Reverb with min==max parameter ranges drives sox
                        ``reverb r d s`` deterministically; pins the
                        clean-room Freeverb (filter lengths, feedback and
                        damping curves, wet gain, stereo offsets, downmix)
                        against real sox output sample-by-sample.

Each section is independent: whatever the installed package version
supports gets recorded, the rest is skipped with a note, and the auto-pin
test only asserts on the keys present.
"""
import inspect
import os
import sys

import numpy as np

OUT_KEYS = {}


def _record(**kw):
    OUT_KEYS.update(kw)


def _signal(seed, n, amp=0.5):
    rng = np.random.default_rng(seed)
    return (amp * rng.uniform(-1.0, 1.0, n)).astype(np.float32)


def gen_polarity():
    from torchaudio_augmentations import PolarityInversion
    import torch

    x = _signal(0, 256)
    out = PolarityInversion()(torch.from_numpy(x)[None, :])
    _record(polarity_in=x, polarity_out=out.numpy()[0])


def gen_gain():
    from torchaudio_augmentations import Gain
    import torch

    x = _signal(1, 256)
    _record(gain_in=x)
    for db in (-20.0, -10.0, -1.0):
        t = Gain(min_gain=db, max_gain=db)(torch.from_numpy(x)[None, :])
        _record(**{f"gain_db_m{int(-db)}_out": t.numpy()[0]})
    loud = _signal(2, 256, amp=1.5)
    t = Gain(min_gain=-1.0, max_gain=-1.0)(torch.from_numpy(loud)[None, :])
    _record(gain_loud_in=loud, gain_loud_db_m1_out=t.numpy()[0])


def gen_noise(n=8, draws=20000, snr=0.5):
    from torchaudio_augmentations import Noise
    import torch

    x = _signal(3, n)
    tx = torch.from_numpy(x)[None, :]
    tr = Noise(min_snr=snr, max_snr=snr)
    resid = np.empty((draws, n), np.float64)
    torch.manual_seed(0)
    np.random.seed(0)  # some versions draw with np.random
    import random

    random.seed(0)
    for i in range(draws):
        resid[i] = tr(tx).numpy()[0].astype(np.float64) - x
    _record(
        noise_in=x,
        noise_snr=np.float64(snr),
        noise_draws=np.int64(draws),
        noise_resid_mean=np.float64(resid.mean()),
        noise_resid_var=np.float64(resid.var()),
        noise_resid_sample=resid[:50].astype(np.float32),
    )


def gen_randomapply(draws=5000):
    from torchaudio_augmentations import PolarityInversion, RandomApply
    import torch

    x = torch.ones(1, 16)
    import random

    for p, key in ((0.8, "ra_p08"), (0.3, "ra_p03")):
        tr = RandomApply([PolarityInversion()], p)
        torch.manual_seed(0)
        random.seed(0)
        applied = 0
        for _ in range(draws):
            applied += int(tr(x)[0, 0].item() < 0)
        _record(
            **{f"{key}_freq": np.float64(applied / draws),
               f"{key}_n": np.int64(draws)}
        )


def _reverb_fixed_transform(Reverb, r, d, s):
    """Build Reverb with min==max ranges whatever this version calls them."""
    params = inspect.signature(Reverb.__init__).parameters
    kw = {}
    for name in params:
        low = name.lower()
        if "reverberance" in low:
            kw[name] = r
        elif "damp" in low or "dump" in low:  # some versions say "dumping"
            kw[name] = d
        elif "room" in low:
            kw[name] = s
    if not kw:
        raise RuntimeError(
            f"cannot fix Reverb params; signature: {list(params)}"
        )
    return Reverb(sample_rate=16000, **kw)


def gen_reverb():
    from torchaudio_augmentations import Reverb
    import torch

    x = _signal(4, 2000, amp=0.4)
    x[0] = 0.9  # strong direct-sound onset so comb delays are visible
    _record(reverb_in=x)
    for r, d, s in ((50, 50, 50), (0, 0, 0), (100, 100, 100), (75, 20, 90)):
        tr = _reverb_fixed_transform(Reverb, r, d, s)
        out = tr(torch.from_numpy(x)[None, :])
        _record(**{f"reverb_out_r{r}_d{d}_s{s}": out.numpy()[0]})


def main():
    sections = [gen_polarity, gen_gain, gen_noise, gen_randomapply,
                gen_reverb]
    for fn in sections:
        try:
            fn()
            print(f"ok   {fn.__name__}")
        except Exception as e:  # record what we can, report the rest
            print(f"SKIP {fn.__name__}: {type(e).__name__}: {e}")
    if not OUT_KEYS:
        print("nothing generated — is torchaudio_augmentations installed?")
        sys.exit(1)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "augment_golden.npz",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **OUT_KEYS)
    print(f"wrote {path}: {sorted(OUT_KEYS)}")


if __name__ == "__main__":
    main()
