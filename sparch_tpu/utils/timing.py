"""Reliable device timing through the tunneled TPU platform.

Two issues make naive timing wrong here: ``block_until_ready`` does not
synchronise on the axon platform, and every un-jitted dispatch pays
tens of ms of tunnel latency. So: run N iterations of the target
function inside ONE jitted ``lax.fori_loop`` (iterations chained through
a scalar token so they serialise), fetch a scalar once, and difference
two iteration counts to cancel the constant dispatch/fetch overhead.
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["time_fn"]


def _loop(fn, args, iters):
    """One jitted program running `iters` serialised calls of fn(*args)."""

    # choose the smallest float arg to perturb (cheapest dependency edge)
    float_idx = [
        i
        for i, a in enumerate(args)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
    ]
    target = min(float_idx, key=lambda i: args[i].size) if float_idx else None

    def body(i, tok):
        # Perturb by tok * 1e-30: numerically negligible but NOT provably
        # zero, so XLA cannot hoist the body out of the loop (tok * 0.0
        # gets constant-folded and the whole loop collapses to one call).
        perturbed = [
            a + tok * 1e-30 if j == target else a for j, a in enumerate(args)
        ]
        out = fn(*perturbed)
        # consume EVERY output element: summing only a single element lets
        # XLA dead-code-eliminate the rest of the iteration's work
        acc = tok
        for leaf in jax.tree.leaves(out):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc

    return jax.jit(
        lambda args: jax.lax.fori_loop(0, iters, body, jnp.float32(0.0)),
        static_argnums=(),
    )(args)


def time_fn(
    fn: Callable,
    *args,
    iters: int = 64,
    repeats: int = 5,
) -> float:
    """Per-iteration seconds of ``fn(*args)`` on device.

    ``iters`` must be large enough that iters * t dominates the tunnel's
    per-call latency jitter (tens of ms); min-of-repeats on both loop
    lengths suppresses the rest.
    """

    def run(n):
        t0 = time.perf_counter()
        out = _loop(fn, args, n)
        float(out)  # host fetch = true sync
        return time.perf_counter() - t0

    # compile both loop lengths
    run(1)
    run(1 + iters)
    lo = min(run(1) for _ in range(repeats))
    hi = min(run(1 + iters) for _ in range(repeats))
    return max((hi - lo) / iters, 1e-9)
