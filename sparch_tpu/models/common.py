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
    "SeqNormAffine",
    "FusedCellPolicy",
    "bidir_concat",
    "bidir_split",
]


# Normalization constants — the single source for every implementation
# that must agree numerically: the flax layers below AND the seq-pipeline
# step's hand-rolled stats (parallel/seqpipe.py). flax momentum 0.95 ==
# torch BatchNorm1d(momentum=0.05), the reference's setting (snns.py:239).
BN_MOMENTUM = 0.95
NORM_EPS = 1e-5


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
        if self.dtype is not None:
            from sparch_tpu.ops.cells import rec_dot

            # rec_dot casts the kernel to the stream dtype at point of
            # use (same forward as casting both operands) but computes
            # the kernel cotangent with preferred_element_type=f32 —
            # standard AMP weight-grad practice. Without it a bf16
            # dkernel's output rounding differs between a monolithic dot
            # and seq-sharded partial dots (parallel/seqpipe.py), turning
            # pipelined AMP training into a reduction-order lottery.
            y = rec_dot(x.astype(self.dtype), kernel)
        else:
            # dtype None: no casts — a bf16 input (fused-path spike
            # stream) against the f32 kernel promotes to an f32 output,
            # keeping the normalization statistics and the cell drive
            # in f32
            y = jnp.dot(x, kernel)
        if self.use_bias:
            from sparch_tpu.ops.cells import bias_add

            bias = self.param("bias", torch_linear_init(fan_in), (self.features,))
            # f32-accumulated bias cotangent (the bias counterpart of
            # the rec_dot wgrad guarantee above)
            y = bias_add(y, bias)
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
                momentum=BN_MOMENTUM,
                epsilon=NORM_EPS,
                axis_name=self.axis_name,
            )(flat)
            return flat.reshape(shape)
        if self.kind == "layernorm":
            return nn.LayerNorm(epsilon=NORM_EPS)(x)
        return x


class _BNAffine(nn.Module):
    """BatchNorm expressed as its per-feature affine: returns
    ``(scale, shift)`` with ``scale = gamma * rsqrt(var + eps)`` and
    ``shift = beta - mean * scale`` so a fused consumer can apply
    normalization on load (``y = scale*x + shift``) instead of paying a
    full read+write pass over the activations.

    Variable tree (params ``scale``/``bias``, batch_stats ``mean``/``var``,
    momentum semantics, cross-device stat sync) matches ``nn.BatchNorm``
    exactly, so checkpoints are interchangeable with the apply-mode path.
    """

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = NORM_EPS
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, flat):
        # stats accumulate in f32 even for bf16 activation streams (a
        # bf16 sum over B*T values would lose ~all mantissa); the convert
        # fuses into the reduction read, costing no extra HBM pass
        flat = flat.astype(jnp.float32)
        h = flat.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (h,))
        beta = self.param("bias", nn.initializers.zeros, (h,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((h,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((h,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(flat, axis=0)
            mean2 = jnp.mean(jax.lax.square(flat), axis=0)
            if self.axis_name is not None:
                stacked = jax.lax.pmean(
                    jnp.stack([mean, mean2]), axis_name=self.axis_name
                )
                mean, mean2 = stacked[0], stacked[1]
            var = mean2 - jax.lax.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        inv = jax.lax.rsqrt(var + self.epsilon)
        scale = gamma * inv
        shift = beta - mean * scale
        return scale, shift


class SeqNormAffine(nn.Module):
    """Affine form of :class:`SeqNorm` for the fused-kernel path.

    Returns ``(scale, shift)`` vectors for kinds expressible as a
    per-feature affine ('batchnorm' given its batch statistics), or
    ``(None, None)`` for identity. LayerNorm normalizes per (b, t) sample
    and cannot fold to a feature affine — callers must keep the apply-mode
    path for it. Same variable tree as ``SeqNorm``.
    """

    kind: str
    use_running_average: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.kind == "batchnorm":
            flat = x.reshape((-1, x.shape[-1]))
            return _BNAffine(
                use_running_average=self.use_running_average,
                momentum=BN_MOMENTUM,
                epsilon=NORM_EPS,
                axis_name=self.axis_name,
                name="BatchNorm_0",
            )(flat)
        if self.kind == "layernorm":
            raise ValueError("layernorm cannot fold to a feature affine")
        return None, None


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


class FusedCellPolicy:
    """Shared fused-Pallas-path policy for the SNN and ANN layer bases.

    A plain mixin (no dataclass fields): the inheriting flax module must
    define ``hidden_size``, ``dropout``, ``bidirectional``, ``cell_impl``,
    ``compute_dtype`` and ``mxu_precision`` fields, plus flax's
    ``make_rng``. Keeping the pallas cutoff, the bf16-MXU policy, the
    fused-dropout seed derivation, and the post-processing in ONE place
    prevents the two model families drifting apart.
    """

    def _tp(self):
        """Validated (mesh, axis, batch_axis) for the pallas_tp path.
        Normalization/dropout stay OUTSIDE the TP kernels (apply-mode
        norm, _post dropout): above the single-chip caps that is the
        measured-~free arrangement (STATUS 'Wide layers' fair A/B), and
        it keeps the distributed kernel surface small. Shared by the SNN
        and ANN layer bases (both declare tp_mesh/tp_axis/tp_batch_axis
        fields)."""
        if self.tp_mesh is None:
            raise ValueError(
                "cell_impl='pallas_tp' needs tp_mesh=<jax.sharding.Mesh "
                "with a '%s' axis>" % self.tp_axis
            )
        return self.tp_mesh, self.tp_axis, self.tp_batch_axis

    # Widest layer the fused kernels accept on the 'auto' path: they keep
    # every recurrent matrix AND its dV accumulator resident in VMEM
    # (2*H^2 f32 per gate = 33 MB at H=2048), so multi-gate ANN cells
    # override this with lower caps (LiGRU 1536, GRU 1024). Wide layers
    # unroll fewer steps per grid cell (_pick_tc caps tc at 4 for
    # H >= 1536) so Mosaic compiles stay in seconds; measured v5e RadLIF
    # fwd+bwd vs scan: 1.3x faster at H=1536, 1.5x at H=2048.
    # Round-4 wide-H measurement campaign (tools/probe_vmem.py, real
    # v5e): the caps are now DERIVED from compile+timing probes rather
    # than guessed — lifting them further is measured counterproductive
    # or impossible even with bf16-resident V (see each cell's note).
    _pallas_h_cap = 2048

    def _use_pallas(self) -> bool:
        """'auto' picks the fused Pallas kernels on TPU, lax.scan
        elsewhere (off-TPU the kernels would run interpreted — correct
        but slow). Layers wider than the per-cell VMEM cap fall back to
        scan (see ``_pallas_h_cap``), and so do multi-chip processes:
        a pallas_call is opaque to the GSPMD partitioner, so under a
        sharded jit it would force replication collectives around every
        kernel — the scan cells' plain matmuls partition cleanly instead
        (the seq-pipeline path likewise builds on the scan recurrences
        inside its shard_map). Explicit ``cell_impl='pallas'`` overrides
        for single-chip-style uses."""
        if self.cell_impl == "pallas":
            return True
        if self.cell_impl == "auto":
            import jax

            return (
                jax.default_backend() == "tpu"
                and jax.device_count() == 1
                and self.hidden_size <= self._pallas_h_cap
            )
        return False

    def _mxu_bf16(self) -> bool:
        """bf16 inputs for the MXU products inside the fused kernels
        (f32 accumulation via preferred_element_type).

        ``mxu_precision='default'`` matches XLA's default matmul
        precision on TPU — every ``jnp.dot`` in the scan path and the
        hoisted projections already feeds the MXU bf16-truncated inputs
        unless the user raises ``jax.default_matmul_precision`` — and
        the reference itself trains with torch's TF32-by-default CUDA
        matmuls. ``'highest'`` keeps full-f32 (multi-pass) products."""
        import jax

        if self.compute_dtype == jnp.bfloat16:
            return True
        return (
            self.mxu_precision == "default"
            and jax.default_backend() == "tpu"
        )

    def _fused_dropout(self, train):
        """(drop_rate, seed) for the in-kernel dropout on the fused path;
        (0.0, None) when XLA-side nn.Dropout should run instead. The mask
        is drawn per element before the bidirectional split — iid, so
        distributionally identical to the reference's split-then-dropout
        order."""
        if not (train and self.dropout > 0 and self._use_pallas()):
            return 0.0, None
        import jax

        key = self.make_rng("dropout")
        seed = jax.random.randint(
            key, (2,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
        )
        return float(self.dropout), seed

    def _post(self, out, train, fused_drop: bool = False):
        """Bidirectional re-merge + (unless fused in-kernel) dropout."""
        if self.bidirectional:
            out = bidir_split(out)
        if fused_drop:
            return out  # dropout already applied inside the kernel
        return nn.Dropout(self.dropout, deterministic=not train)(out)
