#!/usr/bin/env python
"""Train-step cost with components toggled off, to locate overheads."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparch_tpu.models import build_model
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_train_step
from sparch_tpu.utils.timing import time_fn

B, T, F, H, C = 128, 100, 700, 512, 35


def step_time(model_type="RadLIF", **kw):
    defaults = dict(dropout=0.1, normalization="batchnorm",
                    state_init="uniform", use_readout_layer=True)
    defaults.update(kw)
    model = build_model(model_type, (B, T, F), [H, H, C], **defaults)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = (jax.random.uniform(ks[0], (B, T, F)) < 0.02).astype(jnp.float32)
    y = jnp.arange(B) % C
    state = create_train_state(model, x, lr=1e-2, rng=ks[1])
    step = make_train_step(model, donate=False)

    def fn(x):
        s2, m = step(state, x, y)
        return (s2.params, m["loss"])

    return time_fn(fn, x, iters=32, repeats=4)


def main():
    base = step_time()
    print(f"{'base (full step)':28s}: {base*1e3:8.3f} ms", flush=True)
    for name, kw in [
        ("no dropout", dict(dropout=0.0)),
        ("no norm", dict(normalization="none")),
        ("zeros state init", dict(state_init="zeros")),
        # parameterized through the SAME harness as every other row
        # (a copy-pasted variant here once timed only the loss, letting
        # XLA dead-code-eliminate the whole backward pass)
        ("LIF instead of RadLIF", dict(model_type="LIF")),
    ]:
        t = step_time(**kw)
        print(f"{name:28s}: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
