#!/usr/bin/env python
"""Sequence-length scaling of the full RadLIF training step (real TPU).

The BASELINE configs all run at T=100 (SHD/SSC bin count —
`/root/reference/sparch/dataloaders/spiking_datasets.py:46`), but the
time-major kernel layout is supposed to make the step cost linear in T.
This tool measures the full train step (forward + BPTT + Adam) at
growing T and reports each row's per-sample-step rate normalised to the
T=100/B=128 row: 1.0 = perfectly linear scaling.

Longer rows shrink B to keep the activation footprint bounded; the
normalised rate folds B back in, but note small-B rows (B=32) pay MXU
batch-tile underutilisation (sub-128 sublane tiles), which is a batch
effect, not a sequence-length effect.

Found with this tool (round 3): scaling is linear — T=1000/B=128 runs
at 1.06x the T=100 per-element rate; an earlier 13x reading was a
timing-harness artifact (the 358 MB input re-crossing the tunnel every
call — see utils/timing.py `device_put` note).
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

H, F, C = 512, 700, 35

ROWS = [
    # (T, B)
    (100, 128),
    (250, 128),
    (500, 128),
    (1000, 128),
    (2000, 64),
    (4000, 32),
]


def bench_row(T, B):
    import jax

    from sparch_tpu.utils.cache import enable_compile_cache
    from sparch_tpu.utils.timing import time_fn

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    from sparch_tpu.models import build_model
    from sparch_tpu.train.state import create_train_state
    from sparch_tpu.train.steps import make_train_step

    model = build_model(
        "RadLIF",
        (B, T, F),
        [H, H, C],
        dropout=0.1,
        normalization="batchnorm",
        state_init="uniform",
    )
    rng = np.random.default_rng(0)
    x = (rng.random((B, T, F)) < 0.02).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, donate=False)

    def fn(x):
        s2, m = step(state, x, y)
        return (s2.params, m["loss"])

    loss0 = float(jax.jit(fn)(x)[1])
    assert np.isfinite(loss0), f"non-finite loss {loss0} at T={T}"
    return time_fn(fn, x, iters=32, repeats=3)


def main():
    base_rate = None  # sample-steps per second of the (100, 128) row
    for T, B in ROWS:
        t = bench_row(T, B)
        rate = T * B / t
        if base_rate is None:
            base_rate = rate
        print(
            json.dumps(
                {
                    "T": T,
                    "B": B,
                    "step_ms": round(t * 1e3, 3),
                    "norm_cost_vs_T100": round(base_rate / rate, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
