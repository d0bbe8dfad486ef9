#!/usr/bin/env python
"""Decompose the ~0.2 ms per-step non-roofline floor (real TPU).

Every BASELINE config's full train step sits a near-constant ~0.2 ms
above its matmul-skeleton roofline at B=128 (STATUS per-config table).
This tool times the train-step pieces of the cheapest such config
(adLIF 2x128 SHD — floor is ~70% of the whole step) in isolation and
compares their sum against the whole, so the floor attributes to either
a nameable component (cell kernel, BN train path, readout, Adam, loss)
or to program-level fusion/dispatch residue.

Usage: python tools/profile_gap.py [MODEL H] (default adLIF 128)
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from sparch_tpu.models import build_model
from sparch_tpu.ops import cells
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_train_step
from sparch_tpu.utils.timing import time_fn

MODEL = sys.argv[1] if len(sys.argv) > 1 else "adLIF"
H = int(sys.argv[2]) if len(sys.argv) > 2 else 128
B, T, F, C = 128, 100, 700, 20


def report(name, t):
    print(f"{name:40s}: {t*1e3:8.3f} ms", flush=True)
    return t


def main():
    from sparch_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = (jax.random.uniform(ks[0], (B, T, F)) < 0.02).astype(jnp.float32)
    y = jnp.arange(B) % C

    model = build_model(MODEL, (B, T, F), [H, C], dropout=0.1,
                        normalization="batchnorm", state_init="uniform")
    state = create_train_state(model, x, lr=1e-2, rng=ks[1])
    step = make_train_step(model, donate=False)
    t_full = report("full train step", time_fn(
        lambda x: (step(state, x, y)[0].params,), x))

    # ---- pieces, each fwd+bwd in its train-path form ----
    p0 = state.params["layer_0"]
    W0 = p0["W"]["kernel"]

    # 1. input projection (the whole matmul roofline for adLIF)
    t_proj = report("projection x@W0 fwd+bwd", time_fn(
        jax.grad(lambda W0, x: jnp.sum(jnp.dot(x, W0)) ** 2), W0, x))

    # 2. BN train path ON TOP of the projection: stats + normalize +
    #    backward stats-correction (c1 + c2*Wx) — measured as the delta
    def proj_bn(W0, x):
        wx = jnp.dot(x, W0)
        flat = wx.reshape(-1, H)
        m = flat.mean(0)
        v = (flat * flat).mean(0) - m * m
        wxn = (wx - m) * jax.lax.rsqrt(v + 1e-5) * 1.1 - 0.05
        return jnp.sum(wxn) ** 2

    t_projbn = report("projection + train BN fwd+bwd", time_fn(
        jax.grad(proj_bn), W0, x))

    # 3. the cell recurrence alone (scan or fused kernel, model default)
    Wx = jax.random.normal(ks[2], (B, T, H))
    alpha = jax.random.uniform(ks[3], (H,), minval=0.85, maxval=0.95)
    beta = jax.random.uniform(ks[4], (H,), minval=0.97, maxval=0.99)
    a = jax.random.uniform(ks[5], (H,), minval=-1, maxval=1)
    b = jax.random.uniform(ks[6], (H,), minval=0, maxval=2)
    z = jnp.zeros((B, H))
    if MODEL == "adLIF":
        from sparch_tpu.ops import pallas_cells

        t_cell = report("adLIF fused kernel fwd+bwd", time_fn(
            jax.grad(lambda Wx: pallas_cells.adlif_pallas(
                Wx, alpha, beta, a, b, 1.0, z, z, z).sum() ** 2), Wx))
        report("adLIF scan fwd+bwd", time_fn(
            jax.grad(lambda Wx: cells.adlif_scan(
                Wx, alpha, beta, a, b, 1.0, z, z, z).sum() ** 2), Wx))
    else:
        t_cell = 0.0

    # 4. readout path: project H->C + train BN + leaky closed form
    s = (jax.random.uniform(ks[7], (B, T, H)) < 0.1).astype(jnp.float32)
    Wr = jax.random.normal(ks[8], (H, C)) * 0.05
    ac = jax.random.uniform(ks[9], (C,), minval=0.85, maxval=0.95)
    zc = jnp.zeros((B, C))

    def readout(Wr, s):
        wx = jnp.dot(s, Wr)
        flat = wx.reshape(-1, C)
        m = flat.mean(0)
        v = (flat * flat).mean(0) - m * m
        wxn = (wx - m) * jax.lax.rsqrt(v + 1e-5)
        return jnp.sum(cells.readout_sum(wxn, ac, zc)) ** 2

    t_read = report("readout proj+BN+leaky fwd+bwd", time_fn(
        jax.grad(readout), Wr, s))

    # 5. loss + metrics on the (B, C) output
    out = jax.random.normal(ks[10], (B, C))

    def loss_fn(out):
        ce = optax.softmax_cross_entropy_with_integer_labels(out, y)
        return ce.mean() ** 2

    t_loss = report("CE loss fwd+bwd", time_fn(jax.grad(loss_fn), out))

    # 6. Adam update alone on this model's param tree
    tx = optax.adam(1e-2)
    opt_state = tx.init(state.params)

    def adam(params, g0):
        grads = jax.tree.map(lambda p: p * 0 + g0.sum(), params)
        upd, _ = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd)

    t_adam = report("Adam update (whole tree)", time_fn(
        adam, state.params, jnp.ones((4,))))

    # 7. dropout mask + uniform state draws (rbg PRNG)
    def draws(k):
        kk = jax.random.split(jax.random.PRNGKey(0) + k.astype(
            jnp.uint32)[0], 4)
        mask = jax.random.bernoulli(kk[0], 0.9, (B, T, H))
        u = jax.random.uniform(kk[1], (B, H))
        return mask.sum() + u.sum()

    t_rng = report("dropout mask + state draws", time_fn(
        draws, jnp.ones((2,), jnp.float32)))

    parts = t_projbn + t_cell + t_read + t_loss + t_adam + t_rng
    print(f"{'sum of pieces':40s}: {parts*1e3:8.3f} ms", flush=True)
    print(f"{'unattributed residue':40s}: "
          f"{(t_full - parts)*1e3:8.3f} ms", flush=True)
    print(f"{'BN train-path cost (projbn - proj)':40s}: "
          f"{(t_projbn - t_proj)*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
