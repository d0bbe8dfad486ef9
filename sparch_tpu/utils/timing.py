"""Reliable device timing through the tunneled TPU platform.

Measurement hazards handled here:

- ``block_until_ready`` does not synchronise on the axon platform; a host
  value fetch does.
- Every un-jitted dispatch pays tens of ms of tunnel latency, so the N
  iterations run inside ONE jitted ``lax.fori_loop``.
- XLA dead-code-eliminates loop-body work whose outputs are unused — the
  loop token therefore consumes the full sum of every output leaf, and
  iterations serialise through a real-but-negligible ``+ tok * 1e-30``
  perturbation of an input (``tok * 0`` would be constant-folded and the
  body hoisted).
- jit re-tracing would hit the remote compile cache with variable latency;
  the compiled loops are built once per iteration count and reused.

The reported time is the difference between a 1-iteration and an
(1+iters)-iteration loop (min over repeats), which cancels the constant
dispatch + fetch overhead.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["time_fn"]


def _build_loop(fn, args, iters):
    float_idx = [
        i
        for i, a in enumerate(args)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
    ]
    target = min(float_idx, key=lambda i: args[i].size) if float_idx else None

    def body(i, tok):
        perturbed = [
            a + tok * 1e-30 if j == target else a for j, a in enumerate(args)
        ]
        out = fn(*perturbed)
        acc = tok
        for leaf in jax.tree.leaves(out):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc

    return jax.jit(
        lambda _token: jax.lax.fori_loop(0, iters, body, _token)
    )


def time_fn(
    fn: Callable,
    *args,
    iters: int = 64,
    repeats: int = 5,
) -> float:
    """Per-iteration seconds of ``fn(*args)`` on device."""
    loops = {
        n: _build_loop(fn, args, n) for n in (1, 1 + iters)
    }

    def run(n):
        t0 = time.perf_counter()
        out = loops[n](jnp.float32(0.0))
        float(out)  # host fetch = true sync
        return time.perf_counter() - t0

    run(1)
    run(1 + iters)  # compile + warm both
    lo = min(run(1) for _ in range(repeats))
    hi = min(run(1 + iters) for _ in range(repeats))
    return max((hi - lo) / iters, 1e-9)
