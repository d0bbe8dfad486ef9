"""Surrogate-gradient spike functions.

The forward pass is the Heaviside step ``x > 0``; the backward pass replaces
the (zero a.e.) derivative with a surrogate. The default surrogate is the
boxcar window used by the reference implementation
(cf. /root/reference/sparch/models/snns.py:20-36, after DECOLLE,
Kaiser et al. 2020): the incoming gradient passes through unchanged on the
half-open interval ``-0.5 < x <= 0.5`` and is zeroed outside it.

Implemented with :func:`jax.custom_vjp` so it composes with ``lax.scan``,
``jit``, ``vmap``, and sharded training.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["spike_boxcar", "boxcar_window"]


def boxcar_window(x: jax.Array) -> jax.Array:
    """Boxcar surrogate derivative: 1 on ``-0.5 < x <= 0.5``, else 0.

    Matches the reference backward exactly, including the half-open
    boundary behaviour (grad is zeroed where ``x <= -0.5`` or ``x > 0.5``,
    reference snns.py:33-36).
    """
    return ((x > -0.5) & (x <= 0.5)).astype(x.dtype)


@jax.custom_vjp
def spike_boxcar(x: jax.Array) -> jax.Array:
    """Heaviside spike with boxcar surrogate gradient.

    Forward: ``(x > 0)`` as floats (reference snns.py:29 ``x.gt(0).float()``).
    Backward: ``g * boxcar_window(x)``.
    """
    return (x > 0).astype(x.dtype)


def _spike_boxcar_fwd(x):
    return (x > 0).astype(x.dtype), x


def _spike_boxcar_bwd(x, g):
    return (g * boxcar_window(x),)


spike_boxcar.defvjp(_spike_boxcar_fwd, _spike_boxcar_bwd)
