#!/usr/bin/env python
"""Serving-path benchmarks on the real TPU: batch predictor throughput
and streaming per-frame latency for the flagship RadLIF config."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sparch_tpu.models import build_model
from sparch_tpu.serve import streaming_init, streaming_step
from sparch_tpu.utils.timing import time_fn

T, F, H, C = 100, 700, 512, 35


def main():
    from sparch_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    rng = np.random.default_rng(0)

    for B in (1, 8, 128):
        model = build_model(
            "RadLIF", (B, T, F), [H, H, C], dropout=0.0,
            normalization="batchnorm", state_init="zeros",
        )
        x = jnp.asarray((rng.random((B, T, F)) < 0.02).astype(np.float32))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)

        def fwd(x):
            out, _ = model.apply(variables, x, train=False)
            return jax.nn.softmax(out, -1)

        t = time_fn(fwd, x)
        print(
            f"batch eval  B={B:3d}: {t*1e3:7.3f} ms/utterance-batch "
            f"({B/t:9.0f} utt/s)",
            flush=True,
        )

        state = streaming_init(model, variables, batch_size=B)
        frame = x[:, 0, :]

        def stream_step(state, frame):
            s2, out = streaming_step(model, variables, state, frame)
            return out.sum() + s2["readout"]["u"].sum()

        t = time_fn(stream_step, state, frame)
        print(f"stream step B={B:3d}: {t*1e3:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
