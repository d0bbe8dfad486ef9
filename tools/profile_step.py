#!/usr/bin/env python
"""Breakdown of the RadLIF train step cost on TPU (reliable timing)."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparch_tpu.models import build_model
from sparch_tpu.ops import cells, pallas_cells
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_eval_step, make_train_step
from sparch_tpu.utils.timing import time_fn

B, T, F, H, C = 128, 100, 700, 512, 35


def report(name, t):
    print(f"{name:28s}: {t*1e3:8.3f} ms", flush=True)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    Wx = jax.random.normal(ks[0], (B, T, H))
    alpha = jax.random.uniform(ks[1], (H,), minval=0.85, maxval=0.95)
    beta = jax.random.uniform(ks[2], (H,), minval=0.97, maxval=0.99)
    a = jax.random.uniform(ks[3], (H,), minval=-1, maxval=1)
    b = jax.random.uniform(ks[4], (H,), minval=0, maxval=2)
    V = jax.random.orthogonal(ks[5], H)
    z = jnp.zeros((B, H))

    report("pallas fwd (1 layer)", time_fn(
        lambda Wx: pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z),
        Wx))
    report("pallas fwd+bwd (1 layer)", time_fn(
        jax.grad(lambda Wx, V: pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z).sum() ** 2, argnums=(0, 1)),
        Wx, V))
    report("scan fwd (1 layer)", time_fn(
        lambda Wx: cells.radlif_scan(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z),
        Wx))

    # hoisted projections fwd (default precision vs highest)
    W0 = jax.random.normal(ks[6], (F, H)) * 0.02
    x = jax.random.normal(ks[7], (B, T, F))
    report("proj fwd default-prec", time_fn(lambda x: jnp.dot(x, W0), x))
    report("proj fwd f32-highest", time_fn(
        lambda x: jnp.dot(x, W0, precision=jax.lax.Precision.HIGHEST), x))

    # full model pieces
    model = build_model("RadLIF", (B, T, F), [H, H, C], dropout=0.1,
                        normalization="batchnorm", state_init="uniform")
    xs = (jax.random.uniform(ks[8], (B, T, F)) < 0.02).astype(jnp.float32)
    y = jnp.arange(B) % C
    state = create_train_state(model, xs, lr=1e-2, rng=ks[9])
    eval_step = make_eval_step(model)
    report("full eval step", time_fn(
        lambda xs: eval_step(state, xs, y, ks[0]), xs))


if __name__ == "__main__":
    main()
