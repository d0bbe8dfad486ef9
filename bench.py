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

Timing: iterations run inside one jitted ``fori_loop`` (state threaded
through the carry, so steps serialise), with a single host fetch; two
iteration counts are differenced to cancel dispatch/fetch overhead
(``block_until_ready`` does not synchronise on the axon tunnel platform
and each un-jitted dispatch pays tunnel latency).

Prints exactly one JSON line.
"""
import json
import time

import numpy as np

B, T, F, H, C = 128, 100, 700, 512, 35
ITERS = 64
REPEATS = 3


def _diff_time(run):
    """min-of-repeats time for n=1 and n=1+ITERS, differenced."""
    run(1)
    run(1 + ITERS)  # compile both
    lo = min(run(1) for _ in range(REPEATS))
    hi = min(run(1 + ITERS) for _ in range(REPEATS))
    return max((hi - lo) / ITERS, 1e-9)


def bench_train_step(cell_impl="scan", compute_dtype=None):
    import jax

    from sparch_tpu.utils.cache import enable_compile_cache

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
        cell_impl=cell_impl,
        compute_dtype=compute_dtype,
    )
    rng = np.random.default_rng(0)
    x = (rng.random((B, T, F)) < 0.02).astype(np.float32)  # spike-raster-like
    y = (np.arange(B) % C).astype(np.int64)
    state0 = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, donate=False)

    x = jax.device_put(x)
    y = jax.device_put(y)

    def loop(state, n):
        def body(i, s):
            s2, _ = step(s, x, y)
            return s2

        return jax.lax.fori_loop(0, n, body, state)

    jitted = {}

    def run(n):
        if n not in jitted:
            jitted[n] = jax.jit(lambda s: loop(s, n))
        t0 = time.perf_counter()
        out = jitted[n](state0)
        float(out.step)  # host fetch = sync
        return time.perf_counter() - t0

    return _diff_time(run)


def bench_train_step_stream(cell_impl="auto", copies=2):
    """Input-stream-sensitive channel: identical training step, but each
    iteration dynamic-slices a different raster out of a stacked device
    buffer, so the input read cannot be cached/folded across iterations.
    ``time_fn``'s perturbation formulation is nearly blind to input-path
    costs (adLIF moves <2% where the device trace shows 2.11x — see
    docs/STATUS.md "Input-raster compression"); this channel makes a
    layout/stream regression on the input path visible in BENCH_r*.json.
    Recorded as detail.stream_step_ms, not the headline (historical
    comparability)."""
    import jax

    from sparch_tpu.utils.cache import enable_compile_cache

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
        cell_impl=cell_impl,
    )
    rng = np.random.default_rng(0)
    xs = (rng.random((copies, B, T, F)) < 0.02).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state0 = create_train_state(
        model, xs[0], lr=1e-2, rng=jax.random.PRNGKey(0)
    )
    step = make_train_step(model, donate=False)

    xs = jax.device_put(xs)
    y = jax.device_put(y)

    def loop(state, n):
        def body(i, s):
            xb = jax.lax.dynamic_index_in_dim(
                xs, i % copies, 0, keepdims=False
            )
            s2, _ = step(s, xb, y)
            return s2

        return jax.lax.fori_loop(0, n, body, state)

    jitted = {}

    def run(n):
        if n not in jitted:
            jitted[n] = jax.jit(lambda s: loop(s, n))
        t0 = time.perf_counter()
        out = jitted[n](state0)
        float(out.step)  # host fetch = sync
        return time.perf_counter() - t0

    return _diff_time(run)


def bench_matmul_roofline():
    """Matmul skeleton of the same fwd+bwd: hoisted projections + per-layer
    sequential linear recurrences, differentiated w.r.t. all weights."""
    import jax
    import jax.numpy as jnp

    from sparch_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
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
        # quadratic loss -> data-dependent cotangents; a sum loss makes the
        # adjoints of this all-linear skeleton data-independent and XLA
        # collapses the backward pass (implied FLOP/s beyond hardware peak)
        return 0.5 * jnp.sum(out * out)

    from sparch_tpu.utils.timing import time_fn

    grad_fn = jax.grad(skeleton)
    params = (W0, W1, Wr, V0, V1)
    return time_fn(grad_fn, params, x, iters=ITERS, repeats=REPEATS)


def _init_watchdog(seconds=240):
    """Fail fast (one JSON error line, exit 3) if backend init hangs.

    The axon tunnel can go fully down (observed: 6+ h outage, backend
    init UNAVAILABLE / blocking forever); without this the driver's
    end-of-round bench run would hang at the first dispatch. A blocked
    PJRT init can't be interrupted from Python, so a daemon watchdog
    + os._exit is the only reliable escape."""
    import os
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(
                json.dumps({
                    "metric": "ssc_radlif_train_utterances_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "utt/s",
                    "vs_baseline": 0.0,
                    "error": f"TPU backend init timed out after "
                             f"{seconds}s (tunnel down?)",
                }),
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    probe_ok = _init_watchdog()
    import jax

    jax.devices()  # blocks here if the tunnel is down
    float(jax.numpy.ones(()) + 1)  # and a real dispatch round-trip
    probe_ok.set()

    # Tunnel-anomaly guard (observed: a wedged-tunnel window during the
    # lo probes once produced an impossible 0.577 ms / vs_baseline 1.61
    # reading): measure three times and keep the MEDIAN for both step
    # and roofline — a single anomalous window (fast or slow) cannot
    # move the median, and unlike max-of-2/min-of-2 the estimator is
    # unbiased under ordinary ~3% tunnel jitter (the earlier guard
    # systematically cost ~8% of the reported ratio).
    def median3(measure):
        return sorted(measure() for _ in range(3))[1]

    step_pallas = median3(lambda: bench_train_step("auto"))  # default
    step_scan = bench_train_step("scan")
    step_time = min(step_pallas, step_scan)
    step_stream = median3(lambda: bench_train_step_stream("auto"))
    # mixed-precision channel (--compute_dtype bfloat16): recorded, not
    # the headline — the roofline comparison stays f32 apples-to-apples
    import jax.numpy as jnp

    step_amp = median3(
        lambda: bench_train_step("auto", compute_dtype=jnp.bfloat16)
    )
    roofline_time = median3(bench_matmul_roofline)
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
                    "pallas_step_ms": round(step_pallas * 1e3, 3),
                    "scan_step_ms": round(step_scan * 1e3, 3),
                    "stream_step_ms": round(step_stream * 1e3, 3),
                    "amp_step_ms": round(step_amp * 1e3, 3),
                    "matmul_roofline_ms": round(roofline_time * 1e3, 3),
                    "config": f"RadLIF 3x{H} B{B} T{T} F{F} C{C}",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
