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


def _tiny_for(dtype):
    # below any real value's ULP (no value change) but not flushed to
    # zero in the target dtype (f16's min normal is ~6e-8; 1e-30 there
    # would constant-fold the perturbation away)
    return 1e-7 if dtype == jnp.float16 else 1e-30


def _build_loop(fn, args, iters):
    # Serialise iterations by perturbing the smallest TOP-LEVEL floating
    # array argument (usually the data input, which the whole computation
    # is downstream of). Callers must pass that array as a direct
    # positional arg — inputs hidden inside pytrees are not threaded.
    # (A variant that perturbed every pytree leaf was tried and measurably
    # CHANGED what the compiled loop measures — the bench roofline dropped
    # ~30% — so the exact known-good formulation is kept.)
    float_idx = [
        i
        for i, a in enumerate(args)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
    ]
    if not float_idx:
        raise ValueError(
            "time_fn needs at least one floating-point array as a direct "
            "positional argument to thread the loop token through "
            "(otherwise XLA hoists the body out of the timing loop)"
        )
    target = min(float_idx, key=lambda i: args[i].size)

    # args are REAL jit parameters, not closure constants: closed-over
    # host arrays are serialised as dense literals in the compile payload
    # (a (128,1000,700) input once blew the remote-compile HTTP body
    # limit at 358 MB; even 36 MB inputs slowed every compile)
    def loop(_token, *a):
        def body(i, tok):
            perturbed = [
                x + (tok * _tiny_for(x.dtype)).astype(x.dtype)
                if j == target else x
                for j, x in enumerate(a)
            ]
            out = fn(*perturbed)
            acc = tok
            for leaf in jax.tree.leaves(out):
                acc = acc + jnp.sum(leaf).astype(jnp.float32)
            return acc

        return jax.lax.fori_loop(0, iters, body, _token)

    return jax.jit(loop)


def time_fn(
    fn: Callable,
    *args,
    iters: int = 64,
    repeats: int = 5,
) -> float:
    """Per-iteration seconds of ``fn(*args)`` on device."""
    # place inputs on device ONCE: args are real jit parameters (not
    # closure constants — see _build_loop), so host arrays would
    # otherwise re-cross the tunnel on every timed call, and a 358 MB
    # input's transfer variance once swamped the differenced measurement
    # 12x (T=1000 read 129 ms/step vs the true 10.5 ms device time)
    args = jax.device_put(args)
    loops = {
        n: _build_loop(fn, args, n) for n in (1, 1 + iters)
    }

    def run(n):
        t0 = time.perf_counter()
        out = loops[n](jnp.float32(0.0), *args)
        float(out)  # host fetch = true sync
        return time.perf_counter() - t0

    run(1)
    run(1 + iters)  # compile + warm both
    lo = min(run(1) for _ in range(repeats))
    hi = min(run(1 + iters) for _ in range(repeats))
    return max((hi - lo) / iters, 1e-9)
