#!/usr/bin/env python
"""Fine-grained timing of the train-step pieces in their exact train-path
configuration (BN-affine fold + fused dropout), to locate non-roofline
time. Run on the real TPU."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparch_tpu.models import build_model
from sparch_tpu.ops import cells, pallas_cells
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_train_step
from sparch_tpu.utils.timing import time_fn

B, T, F, H, C = 128, 100, 700, 512, 35


def report(name, t):
    print(f"{name:36s}: {t*1e3:8.3f} ms", flush=True)


def main():
    from sparch_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    Wx = jax.random.normal(ks[0], (B, T, H))
    alpha = jax.random.uniform(ks[1], (H,), minval=0.85, maxval=0.95)
    beta = jax.random.uniform(ks[2], (H,), minval=0.97, maxval=0.99)
    a = jax.random.uniform(ks[3], (H,), minval=-1, maxval=1)
    b = jax.random.uniform(ks[4], (H,), minval=0, maxval=2)
    V = jax.random.orthogonal(ks[5], H)
    z = jnp.zeros((B, H))
    scale = jnp.full((H,), 1.1)
    shift = jnp.full((H,), -0.05)
    seed = jnp.array([3, 5], jnp.int32)

    def fb(fn, *args):  # fwd+bwd wrt Wx and V
        return time_fn(
            jax.grad(
                lambda Wx, V: fn(Wx, V).sum() ** 2, argnums=(0, 1)
            ),
            *args,
        )

    report("cell fwd+bwd plain", fb(
        lambda Wx, V: pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z, mxu_bf16=True),
        Wx, V))
    report("cell fwd+bwd +affine", fb(
        lambda Wx, V: pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z, mxu_bf16=True,
            scale=scale, shift=shift),
        Wx, V))
    report("cell fwd+bwd +affine+dropout", fb(
        lambda Wx, V: pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z, mxu_bf16=True,
            scale=scale, shift=shift, drop_rate=0.1, drop_seed=seed),
        Wx, V))
    report("cell fwd only +affine+dropout", time_fn(
        lambda Wx: pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z, mxu_bf16=True,
            scale=scale, shift=shift, drop_rate=0.1, drop_seed=seed).sum(),
        Wx))

    # readout path fwd+bwd (leaky_cumsum closed form), C classes
    WxC = jax.random.normal(ks[6], (B, T, C))
    zc = jnp.zeros((B, C))
    ac = jax.random.uniform(ks[7], (C,), minval=0.85, maxval=0.95)
    report("readout_sum fwd+bwd", time_fn(
        jax.grad(lambda WxC: cells.readout_sum(WxC, ac, zc).sum() ** 2),
        WxC))

    # BN-affine stats alone: mean/mean2 over flat (B*T, H)
    def stats(Wx):
        flat = Wx.reshape(-1, H)
        m = jnp.mean(flat, axis=0)
        m2 = jnp.mean(jax.lax.square(flat), axis=0)
        return (m + m2).sum()

    report("BN stats (fwd only)", time_fn(stats, Wx))

    # full train step, exact bench config
    model = build_model("RadLIF", (B, T, F), [H, H, C], dropout=0.1,
                        normalization="batchnorm", state_init="uniform")
    xs = (jax.random.uniform(ks[8], (B, T, F)) < 0.02).astype(jnp.float32)
    y = jnp.arange(B) % C
    state = create_train_state(model, xs, lr=1e-2, rng=ks[9])
    step = make_train_step(model, donate=False)
    # return the updated params too: returning only the loss would let
    # XLA dead-code-eliminate the whole backward pass
    report("full train step", time_fn(
        lambda x: (step(state, x, y)[0].params, ), xs))
    # no-dropout variant isolates the in-kernel PRNG cost
    model0 = build_model("RadLIF", (B, T, F), [H, H, C], dropout=0.0,
                         normalization="batchnorm", state_init="uniform")
    state0 = create_train_state(model0, xs, lr=1e-2, rng=ks[9])
    step0 = make_train_step(model0, donate=False)
    report("full train step (no dropout)", time_fn(
        lambda x: (step0(state0, x, y)[0].params, ), xs))
    # zeros state init isolates the per-step uniform state draws
    model_z = build_model("RadLIF", (B, T, F), [H, H, C], dropout=0.1,
                          normalization="batchnorm", state_init="zeros")
    state_z = create_train_state(model_z, xs, lr=1e-2, rng=ks[9])
    step_z = make_train_step(model_z, donate=False)
    report("full train step (zeros init)", time_fn(
        lambda x: (step_z(state_z, x, y)[0].params, ), xs))


if __name__ == "__main__":
    main()
