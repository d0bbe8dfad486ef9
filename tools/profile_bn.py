#!/usr/bin/env python
"""Decompose BatchNorm's residual cost on the north-star config.

The fused kernels already absorb the normalization APPLY (affine fold)
and emit dscale/dshift; what remains on the XLA side is (1) the batch
statistics forward (mean / mean-of-squares reductions over the (B*T, H)
projection output) and (2) the statistics VJP — pulling dscale/dshift
back through scale=gamma*rsqrt(var+eps), shift=beta-mean*scale gives the
`dWx += c1 + c2*Wx` elementwise correction pass per layer.

Four ladder rungs around the real fused RadLIF kernel (two hidden
layers, north-star shapes, full value_and_grad timed):

  full      — differentiable stats (complete train-mode BN)
  stopgrad  — stats computed but stop_gradient'ed (no stats VJP)
  const     — constant scale/shift (no stats forward either)
  none      — kernel without the affine operands at all

full-stopgrad = the correction's cost; stopgrad-const = the stats
forward; const-none = the in-kernel affine (expected ~0).
"""
import sys

sys.path.insert(0, "/root/repo")

from sparch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sparch_tpu.ops import pallas_cells  # noqa: E402
from sparch_tpu.utils.timing import time_fn  # noqa: E402

B, T, F, H = 128, 100, 700, 512
EPS = 1e-5


def build(mode):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = (jax.random.uniform(ks[0], (B, T, F)) < 0.02).astype(jnp.float32)
    params = {
        "W0": jax.random.normal(ks[1], (F, H)) * 0.04,
        "W1": jax.random.normal(ks[2], (H, H)) * 0.04,
        "g0": jnp.ones((H,)), "b0": jnp.zeros((H,)),
        "g1": jnp.ones((H,)), "b1": jnp.zeros((H,)),
        "alpha": jax.random.uniform(ks[3], (H,), minval=0.82, maxval=0.95),
        "beta": jax.random.uniform(ks[4], (H,), minval=0.97, maxval=0.99),
        "a": jax.random.uniform(ks[5], (H,), minval=-1, maxval=1),
        "b": jax.random.uniform(ks[6], (H,), minval=0, maxval=2),
        "V": jax.random.normal(ks[7], (H, H)) * 0.04,
    }
    z = jnp.zeros((B, H))
    wgt = jnp.arange(H, dtype=jnp.float32)

    def affine(wx, gamma, bias):
        if mode == "none":
            return None, None
        if mode == "const":
            return gamma, bias
        flat = wx.reshape(-1, H)
        mean = flat.mean(0)
        var = (flat * flat).mean(0) - mean * mean
        if mode == "stopgrad":
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
        scale = gamma * jax.lax.rsqrt(var + EPS)
        return scale, bias - mean * scale

    def loss(p, x):
        h = x
        for i in range(2):
            wx = jnp.dot(h, p[f"W{i}"])
            sc, sh = affine(wx, p[f"g{i}"], p[f"b{i}"])
            h = pallas_cells.radlif_pallas(
                wx, p["alpha"], p["beta"], p["a"], p["b"], p["V"], 1.0,
                z, z, z, mxu_bf16=True, scale=sc, shift=sh,
            )
        return (h.astype(jnp.float32) * wgt).sum()

    grad_fn = jax.jit(jax.value_and_grad(loss))
    return grad_fn, params, x


def main():
    times = {}
    for mode in ("full", "stopgrad", "const", "none"):
        grad_fn, params, x = build(mode)
        times[mode] = time_fn(grad_fn, params, x, iters=32, repeats=4)
        print(f"{mode:9s}: {times[mode]*1e3:7.3f} ms", flush=True)
    print(
        f"stats VJP (correction) : "
        f"{(times['full'] - times['stopgrad'])*1e3:7.3f} ms"
    )
    print(
        f"stats forward          : "
        f"{(times['stopgrad'] - times['const'])*1e3:7.3f} ms"
    )
    print(
        f"in-kernel affine       : "
        f"{(times['const'] - times['none'])*1e3:7.3f} ms"
    )


if __name__ == "__main__":
    main()
