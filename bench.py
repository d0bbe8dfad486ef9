#!/usr/bin/env python
"""Benchmark: RadLIF training-step throughput on SSC-shaped data, one chip.

Metric (north star, BASELINE.md): SSC utterances/sec/chip for a full
training step (forward + surrogate-gradient backward + Adam) of a
RadLIF 3-layer x 512 network on (B=128, T=100, F=700) -> 35 classes.

``vs_baseline`` is the ratio of achieved throughput to the *time-batched
matmul roofline* measured on the same chip: a jitted program running only
the matmul skeleton of the same fwd+bwd computation (hoisted input/readout
projections + the T sequential recurrent (B,H)x(H,H) matmuls per hidden
layer, and their gradients). 1.0 = the full training step costs no more
than its matmuls; the BASELINE target is >= 1/1.2 = 0.833.

Timing: steps are chained through their outputs and timed as a block with
one final host fetch (``block_until_ready`` does not synchronise on the
axon tunnel platform).

Prints exactly one JSON line.
"""
import json
import time

import numpy as np

B, T, F, H, C = 128, 100, 700, 512, 35
WARMUP, ITERS = 3, 20


def bench_train_step():
    import jax

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
    x = (rng.random((B, T, F)) < 0.02).astype(np.float32)  # spike-raster-like
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, donate=False)

    x = jax.device_put(x)
    y = jax.device_put(y)

    # warmup / compile
    s = state
    for _ in range(WARMUP):
        s, m = step(s, x, y)
    float(m["loss"])

    t0 = time.perf_counter()
    s = state
    for _ in range(ITERS):
        s, m = step(s, x, y)  # chained: each step consumes the previous state
    _ = float(m["loss"])  # one sync for the whole chain
    return (time.perf_counter() - t0) / ITERS


def bench_matmul_roofline():
    """Matmul skeleton of the same fwd+bwd: hoisted projections + per-layer
    sequential linear recurrences, differentiated w.r.t. all weights."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    W0 = jax.random.normal(ks[0], (F, H)) * 0.02
    W1 = jax.random.normal(ks[1], (H, H)) * 0.02
    Wr = jax.random.normal(ks[2], (H, C)) * 0.02
    V0 = jax.random.normal(ks[3], (H, H)) * 0.02
    V1 = jax.random.normal(ks[4], (H, H)) * 0.02
    x = jax.random.normal(ks[5], (B, T, F))

    def skeleton(params, x):
        W0, W1, Wr, V0, V1 = params

        def layer(Wx, V):
            def step(h, wx_t):
                h = jnp.dot(h, V) * 0.9 + wx_t  # linear carry, same matmuls
                return h, h

            h0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), Wx.dtype)
            _, hs = jax.lax.scan(step, h0, jnp.swapaxes(Wx, 0, 1))
            return jnp.swapaxes(hs, 0, 1)

        h0 = layer(jnp.dot(x, W0), V0)
        h1 = layer(jnp.dot(h0, W1), V1)
        out = jnp.dot(h1, Wr)
        return out.sum()

    grad_fn = jax.jit(jax.grad(skeleton))
    params = (W0, W1, Wr, V0, V1)

    g = grad_fn(params, x)
    float(g[0][0, 0])
    t0 = time.perf_counter()
    xi = x
    for _ in range(ITERS):
        g = grad_fn(params, xi)
        # chain: next input depends on this step's result
        xi = xi + g[0][0, 0] * 0.0
    _ = float(g[0][0, 0])
    return (time.perf_counter() - t0) / ITERS


def main():
    step_time = bench_train_step()
    roofline_time = bench_matmul_roofline()
    utt_per_sec = B / step_time
    roofline_utt_per_sec = B / roofline_time
    print(
        json.dumps(
            {
                "metric": "ssc_radlif_train_utterances_per_sec_per_chip",
                "value": round(utt_per_sec, 2),
                "unit": "utt/s",
                "vs_baseline": round(utt_per_sec / roofline_utt_per_sec, 4),
                "detail": {
                    "step_time_ms": round(step_time * 1e3, 3),
                    "matmul_roofline_ms": round(roofline_time * 1e3, 3),
                    "config": f"RadLIF 3x{H} B{B} T{T} F{F} C{C}",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
