#!/usr/bin/env python
"""Component-level TPU timing for the RadLIF training path."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sparch_tpu.ops import cells, pallas_cells
from sparch_tpu.utils.timing import time_fn

B, T, F, H, C = 128, 100, 700, 512, 35


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    Wx = jax.random.normal(ks[0], (B, T, H))
    alpha = jax.random.uniform(ks[1], (H,), minval=0.85, maxval=0.95)
    beta = jax.random.uniform(ks[2], (H,), minval=0.97, maxval=0.99)
    a = jax.random.uniform(ks[3], (H,), minval=-1, maxval=1)
    b = jax.random.uniform(ks[4], (H,), minval=0, maxval=2)
    V = jax.random.orthogonal(ks[5], H)
    u0 = jnp.zeros((B, H))
    w0 = jnp.zeros((B, H))
    s0 = jnp.zeros((B, H))

    def report(name, fn, *args):
        t = time_fn(fn, *args) * 1e3
        print(f"{name:22s}: {t:8.3f} ms")
        return t

    report(
        "radlif fwd scan",
        lambda Wx: cells.radlif_scan(Wx, alpha, beta, a, b, V, 1.0, u0, w0, s0),
        Wx,
    )
    report(
        "radlif fwd pallas",
        lambda Wx: pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, u0, w0, s0
        ),
        Wx,
    )
    report(
        "radlif fwd+bwd scan",
        jax.grad(
            lambda Wx, V: cells.radlif_scan(
                Wx, alpha, beta, a, b, V, 1.0, u0, w0, s0
            ).sum(),
            argnums=0,
        ),
        Wx,
        V,
    )
    report(
        "radlif fwd+bwd pallas",
        jax.grad(
            lambda Wx, V: pallas_cells.radlif_pallas(
                Wx, alpha, beta, a, b, V, 1.0, u0, w0, s0
            ).sum(),
            argnums=0,
        ),
        Wx,
        V,
    )

    W0 = jax.random.normal(ks[6], (F, H)) * 0.02
    x = jax.random.normal(ks[7], (B, T, F))
    W1 = jax.random.normal(ks[6], (H, H)) * 0.02
    Wr = jax.random.normal(ks[6], (H, C)) * 0.02
    report(
        "hoisted matmuls fwd",
        lambda x: jnp.dot(jnp.dot(jnp.dot(x, W0), W1), Wr),
        x,
    )

    def seq(Wx):
        def step(h, wx_t):
            h = jnp.dot(h, V) + wx_t
            return h, h

        _, hs = jax.lax.scan(
            step, jnp.zeros((B, H)), jnp.swapaxes(Wx, 0, 1)
        )
        return hs

    report("linear scan fwd", seq, Wx)
    report(
        "linear scan fwd+bwd",
        jax.grad(lambda Wx: seq(Wx).sum(), argnums=0),
        Wx,
    )

    # single recurrent-step matmul, amortised: 100 sequential dots
    def chain_dots(h):
        def body(i, h):
            return jnp.dot(h, V)

        return jax.lax.fori_loop(0, T, body, h)

    t = time_fn(chain_dots, u0 + 1.0) * 1e3
    print(f"{'T seq (B,H)x(H,H) dots':22s}: {t:8.3f} ms  ({t/T*1e3:.1f} us/step)")


if __name__ == "__main__":
    main()
