#!/usr/bin/env python
"""Full train-step benchmark across every BASELINE.json config, each with
its own matmul-roofline ratio.

One line per config: step time + utterances/sec/chip on the current
device, plus ``roofline_ms``/``vs_roofline`` — the same differentiated
matmul-skeleton recipe as bench.py (hoisted per-gate projections + the T
sequential recurrent (B_eff,H)x(H,H) matmuls + readout, under jax.grad
with a quadratic loss), generalised per config: gate counts (LiGRU 2,
GRU 3), non-recurrent cells (LIF/adLIF skeletons have no in-scan
matmul), and the bidirectional batch trick (2B batch through every
layer, 2H features between layers). vs_roofline = roofline_time /
step_time: 1.0 means the full train step costs no more than its matmul
skeleton; BASELINE.md targets >= 1/1.2.

Shapes follow BASELINE.json: SHD/SSC spike inputs are (B, 100, 700); SC
runs on 40-bin fbank features (B, 100, 40) — the waveform->fbank
frontend itself runs on the host loader (see tools/bench_loader.py for
its throughput).

With ``--input_bf16`` the spike-raster configs (F=700) feed bfloat16
input batches — the ``--input_dtype bfloat16`` training path, lossless
for integer rasters — to BOTH the step and its roofline skeleton (the
skeleton's dominant stream is the same raster, so an f32 skeleton would
flatter the bf16 step). fbank configs are unaffected (bf16 would round
real features, and their input stream is ~2 MB — noise).
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


def bench_one(model_type, layer_sizes, B, T, F, bidirectional,
              input_bf16=False):
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
    if input_bf16 and F == 700:
        import ml_dtypes

        x = x.astype(ml_dtypes.bfloat16)
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


# (projection gates, recurrent matmuls) per hidden layer
_GATES = {
    "LIF": (1, 0), "adLIF": (1, 0), "RLIF": (1, 1), "RadLIF": (1, 1),
    "MLP": (1, 0), "RNN": (1, 1), "LiGRU": (2, 2), "GRU": (3, 3),
}


def bench_roofline(model_type, layer_sizes, B, T, F, bidirectional,
                   input_bf16=False):
    """Differentiated matmul skeleton of this config (bench.py recipe)."""
    import jax
    import jax.numpy as jnp

    from sparch_tpu.utils.cache import enable_compile_cache
    from sparch_tpu.utils.timing import time_fn

    enable_compile_cache()
    n_proj, n_rec = _GATES[model_type]
    hidden, C = list(layer_sizes[:-1]), layer_sizes[-1]
    mult = 2 if bidirectional else 1

    key = jax.random.PRNGKey(0)
    params = []
    fin = F
    for h in hidden:
        key, kw, kv = jax.random.split(key, 3)
        Ws = jax.random.normal(kw, (n_proj, fin, h)) * 0.02
        Vs = jax.random.normal(kv, (n_rec, h, h)) * 0.02
        params.append((Ws, Vs))
        fin = h * mult
    key, kr, kx = jax.random.split(key, 3)
    Wr = jax.random.normal(kr, (fin, C)) * 0.02
    x = jax.random.normal(kx, (B, T, F))
    if input_bf16 and F == 700:
        x = x.astype(jnp.bfloat16)

    def skeleton(params, x):
        layers, Wr = params
        h = x
        for Ws, Vs in layers:
            if bidirectional:
                h = jnp.concatenate([h, jnp.flip(h, axis=1)], axis=0)
            # hoisted per-gate projections (one big time-batched matmul each)
            wxs = jnp.stack([jnp.dot(h, Ws[g]) for g in range(n_proj)])
            if n_rec:
                def step(c, wts):
                    c = 0.9 * sum(
                        jnp.dot(c, Vs[r]) for r in range(n_rec)
                    ) + sum(wts)
                    return c, c

                c0 = jnp.zeros(wxs.shape[1:2] + wxs.shape[3:], wxs.dtype)
                _, hs = jax.lax.scan(
                    step, c0,
                    tuple(jnp.swapaxes(wxs[g], 0, 1) for g in range(n_proj)),
                )
                h = jnp.swapaxes(hs, 0, 1)
            else:
                h = sum(wxs[g] for g in range(n_proj))
            if bidirectional:
                b = h.shape[0] // 2
                h = jnp.concatenate(
                    [h[:b], jnp.flip(h[b:], axis=1)], axis=-1
                )
        out = jnp.dot(h, Wr)
        # quadratic loss -> data-dependent cotangents (see bench.py)
        return 0.5 * jnp.sum(out * out)

    grad_fn = jax.grad(skeleton)
    return time_fn(grad_fn, (params, Wr), x, iters=32, repeats=3)


def main():
    input_bf16 = "--input_bf16" in sys.argv
    rows = []
    for name, mt, sizes, B, T, F, bidir in CONFIGS:
        t = bench_one(mt, sizes, B, T, F, bidir, input_bf16)
        r = bench_roofline(mt, sizes, B, T, F, bidir, input_bf16)
        # sub-20us skeletons (non-recurrent cells, tiny batches) sit at
        # the differenced-measurement noise floor: the ratio would
        # compare a real step against timing noise, so report null
        ratio = round(r / t, 4) if r >= 2e-5 else None
        rows.append(
            {
                "config": name,
                "step_ms": round(t * 1e3, 3),
                "utt_per_s": round(B / t, 1),
                "roofline_ms": round(r * 1e3, 3),
                "vs_roofline": ratio,
            }
        )
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
