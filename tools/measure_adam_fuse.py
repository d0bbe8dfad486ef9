#!/usr/bin/env python
"""A/B the RLIF/RadLIF tail hypothesis: per-leaf Adam update fusions.

The RLIF 2x512 trace attributes ~150 us/step to a BN/readout/Adam/
small-fusion tail (docs/STATUS.md config table). One named suspect is
the optimizer: every param leaf (W, V, alpha, beta, a, b, BN scale/
shift, biases — ~15-20 leaves) gets its own mu/nu/update fusion. Adam
is elementwise, so ``optax.flatten`` (ravel+concat all leaves into ONE
vector, run Adam once, unflatten) computes bit-identical updates while
collapsing the per-leaf kernels; the extra ravel/concat traffic is the
full param size (~3 MB here — ~7 us of HBM at v5e bandwidth).

Prints one JSON line with both step times. If the flat variant wins
materially, wire it into train/state.adam_with_injectable_lr; if not,
record the number in STATUS as part of the tail bound.

Usage: python tools/measure_adam_fuse.py [MODEL] [H] [LAYERS]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    model_type = sys.argv[1] if len(sys.argv) > 1 else "RLIF"
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    layers = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import jax
    import optax

    from sparch_tpu.utils.cache import enable_compile_cache
    from sparch_tpu.utils.timing import time_fn

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from sparch_tpu.models import build_model
    from sparch_tpu.train.state import TrainState, create_train_state
    from sparch_tpu.train.steps import make_train_step

    B, T, F, C = 128, 100, 700, 35
    sizes = [H] * (layers - 1) + [C]
    model = build_model(
        model_type, (B, T, F), sizes, dropout=0.1,
        normalization="batchnorm", state_init="uniform",
    )
    rng = np.random.default_rng(0)
    x = (rng.random((B, T, F)) < 0.02).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)

    def flat_adam_tx(lr):
        def make(learning_rate, b1, b2, eps):
            return optax.flatten(
                optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
            )

        return optax.inject_hyperparams(make)(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8
        )

    results = {}
    for name, tx in (
        ("per_leaf", None),  # the shipped default
        ("flat", flat_adam_tx(1e-2)),
    ):
        state = create_train_state(
            model, x, lr=1e-2, rng=jax.random.PRNGKey(0)
        )
        if tx is not None:
            state = TrainState(
                step=state.step, params=state.params,
                batch_stats=state.batch_stats,
                opt_state=tx.init(state.params), rng=state.rng, tx=tx,
            )
        step = make_train_step(model, donate=False)

        def fn(x, state=state, step=step):
            s2, m = step(state, x, y)
            return (s2.params, m["loss"])

        loss0 = float(jax.jit(fn)(x)[1])
        assert np.isfinite(loss0), loss0
        ts = sorted(time_fn(fn, x, iters=32, repeats=3) for _ in range(3))
        results[f"{name}_ms"] = round(ts[1] * 1e3, 3)
        results[f"{name}_all"] = [round(t * 1e3, 3) for t in ts]
        results[f"{name}_loss0"] = loss0

    # same-update sanity: one step under each optimizer from the same
    # init must produce identical losses (Adam is elementwise; flatten
    # reorders nothing)
    results["loss_match"] = bool(
        abs(results["per_leaf_loss0"] - results["flat_loss0"]) < 1e-6
    )
    results["config"] = f"{model_type} {layers}x{H} B{B} T{T} F{F}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
