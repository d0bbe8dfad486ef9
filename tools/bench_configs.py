#!/usr/bin/env python
"""Full train-step benchmark across every BASELINE.json config.

One line per config: step time + utterances/sec/chip on the current
device. Shapes follow BASELINE.json: SHD/SSC spike inputs are
(B, 100, 700); SC runs on 40-bin fbank features (B, 100, 40) — the
waveform->fbank frontend itself runs on the host loader (see
tools/bench_loader.py for its throughput).
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CONFIGS = [
    # name, model_type, layer_sizes, B, T, F, bidirectional
    ("LIF 2x128 SHD b8", "LIF", [128, 20], 8, 100, 700, False),
    ("adLIF 2x128 SHD", "adLIF", [128, 20], 128, 100, 700, False),
    ("RLIF 2x512 SSC", "RLIF", [512, 35], 128, 100, 700, False),
    ("RadLIF 3x512 SSC", "RadLIF", [512, 512, 35], 128, 100, 700, False),
    ("RadLIF 3x1024 bidir SC", "RadLIF", [1024, 1024, 35], 128, 100, 40, True),
    ("LiGRU 2x512 SC", "LiGRU", [512, 35], 128, 100, 40, False),
    ("GRU 2x512 SC", "GRU", [512, 35], 128, 100, 40, False),
]


def bench_one(model_type, layer_sizes, B, T, F, bidirectional):
    import jax

    from sparch_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    from sparch_tpu.models import build_model
    from sparch_tpu.train.state import create_train_state
    from sparch_tpu.train.steps import make_train_step
    from sparch_tpu.utils.timing import time_fn

    model = build_model(
        model_type,
        (B, T, F),
        layer_sizes,
        dropout=0.1,
        normalization="batchnorm",
        bidirectional=bidirectional,
        state_init="uniform",
    )
    rng = np.random.default_rng(0)
    if F == 700:  # spike raster input
        x = (rng.random((B, T, F)) < 0.02).astype(np.float32)
    else:  # fbank features
        x = rng.normal(0, 1, (B, T, F)).astype(np.float32)
    y = (np.arange(B) % layer_sizes[-1]).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, donate=False)

    def fn(x):
        s2, m = step(state, x, y)
        return (s2.params, m["loss"])

    # numerics guard: a compiled-kernel bug (e.g. a garbage tail read
    # poisoning the adjoints) would otherwise be invisible to a pure
    # timing harness
    _, loss0 = jax.jit(fn)(x)
    loss0 = float(loss0)
    assert np.isfinite(loss0), f"non-finite loss {loss0} for {model_type}"

    t = time_fn(fn, x, iters=32, repeats=3)
    return t


def main():
    rows = []
    for name, mt, sizes, B, T, F, bidir in CONFIGS:
        t = bench_one(mt, sizes, B, T, F, bidir)
        rows.append(
            {
                "config": name,
                "step_ms": round(t * 1e3, 3),
                "utt_per_s": round(B / t, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
