"""Shared building blocks for the SNN/ANN layer stacks.

Initialisers reproduce the reference's parameter distributions so training
dynamics are comparable:

- feedforward weights/biases: U[-1/sqrt(fan_in), 1/sqrt(fan_in)], the
  distribution of ``torch.nn.Linear``'s default reset (reference
  snns.py:233 uses nn.Linear defaults);
- recurrent matrices: orthogonal (reference snns.py:507,649);
- neuron constants: uniform over their plausible range (snns.py:234-235).

Normalisation follows the reference's "flatten (B,T,H) to (B*T,H), then
normalise" semantics (snns.py:264-266) with BatchNorm1d(momentum=0.05)
== flax momentum 0.95, or LayerNorm; any other string means no norm.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "torch_linear_init",
    "uniform_range_init",
    "Dense",
    "SeqNorm",
    "bidir_concat",
    "bidir_split",
]


def torch_linear_init(fan_in: int):
    """U[-1/sqrt(fan_in), 1/sqrt(fan_in)] — torch.nn.Linear's default."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_range_init(lo: float, hi: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, lo, hi)

    return init


class Dense(nn.Module):
    """Linear layer with torch-default init (for parity with the reference)."""

    features: int
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_init(fan_in), (fan_in, self.features)
        )
        y = jnp.dot(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
        )
        if self.use_bias:
            bias = self.param("bias", torch_linear_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class SeqNorm(nn.Module):
    """Normalisation over flattened ``(B*T, H)`` as in the reference.

    ``kind`` in {"batchnorm", "layernorm"}; anything else is identity.
    BatchNorm runs per-device batch statistics; under data-parallel
    sharding the batch stats are synced across the mesh via
    ``axis_name='data'`` when present (an improvement over the
    single-device reference, documented in SURVEY.md §7.3).
    """

    kind: str
    use_running_average: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.kind == "batchnorm":
            shape = x.shape
            flat = x.reshape((-1, shape[-1]))
            flat = nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=0.95,  # == torch BatchNorm1d(momentum=0.05)
                epsilon=1e-5,
                axis_name=self.axis_name,
            )(flat)
            return flat.reshape(shape)
        if self.kind == "layernorm":
            return nn.LayerNorm(epsilon=1e-5)(x)
        return x


def bidir_concat(x: jax.Array) -> jax.Array:
    """Stack the time-flipped sequence on the batch dim (reference
    snns.py:252-254) so one scan handles both directions."""
    return jnp.concatenate([x, jnp.flip(x, axis=1)], axis=0)


def bidir_split(s: jax.Array) -> jax.Array:
    """Undo :func:`bidir_concat`: split batch halves, re-flip the backward
    half, concat on features (reference snns.py:272-275). Output width 2H."""
    b = s.shape[0] // 2
    s_f, s_b = s[:b], s[b:]
    return jnp.concatenate([s_f, jnp.flip(s_b, axis=1)], axis=-1)
