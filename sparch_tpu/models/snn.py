"""Spiking neural network models (surrogate-gradient SNNs).

TPU-native re-implementation of the reference SNN family
(/root/reference/sparch/models/snns.py): multi-layer stacks of
{LIF, adLIF, RLIF, RadLIF} neurons with a non-spiking cumulative-softmax
readout. Each layer hoists the input projection into one time-batched
matmul (MXU) and runs the state recurrence as a ``lax.scan``
(see sparch_tpu.ops.cells); an optional fused Pallas step kernel can be
selected with ``cell_impl='pallas'``.

Public API parity (reference snns.py:79-90):
    SNN(input_shape, layer_sizes, neuron_type, threshold, dropout,
        normalization, use_bias, bidirectional, use_readout_layer)
    out, firing_rates = model.apply(variables, x, train=..., rngs=...)

Differences from the reference (deliberate, documented):
- Hidden state init is RNG-keyed: ``state_init='uniform'`` reproduces the
  reference's per-forward U[0,1) states (snns.py:286-287) via the 'state'
  RNG stream; ``'zeros'`` gives deterministic eval.
- BatchNorm statistics live in the ``batch_stats`` collection and are
  synced across a data-parallel mesh when ``bn_axis_name`` is set.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparch_tpu.ops import cells
from sparch_tpu.models.common import (
    Dense,
    FusedCellPolicy,
    SeqNorm,
    SeqNormAffine,
    bidir_concat,
    uniform_range_init,
)

__all__ = [
    "SNN",
    "LIFLayer",
    "adLIFLayer",
    "RLIFLayer",
    "RadLIFLayer",
    "ReadoutLayer",
    "SNN_NEURON_TYPES",
]

SNN_NEURON_TYPES = ("LIF", "adLIF", "RLIF", "RadLIF")


class _SpikingLayerBase(FusedCellPolicy, nn.Module):
    """Shared scaffolding: bidir trick, hoisted matmul, norm, cell,
    dropout. The fused-path policy (_use_pallas/_mxu_bf16/_fused_dropout/
    _post) comes from FusedCellPolicy, shared with the ANN layers."""

    hidden_size: int
    threshold: float = 1.0
    dropout: float = 0.0
    normalization: str = "batchnorm"
    use_bias: bool = False
    bidirectional: bool = False
    state_init: str = "uniform"
    cell_impl: str = "auto"
    compute_dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None
    mxu_precision: str = "default"
    # tensor-parallel fused cells (cell_impl='pallas_tp'): the mesh whose
    # `tp_axis` shards the neurons; `tp_batch_axis` names the data axis
    # the batch is sharded over (None for an unsharded batch)
    tp_mesh: Optional[Any] = None
    tp_axis: str = "model"
    tp_batch_axis: Optional[str] = "data"

    def _fold_norm(self) -> bool:
        """On the fused-kernel path, batchnorm/none are folded into the
        kernel as a per-feature affine on the input drive; layernorm
        cannot fold (per-sample stats) and keeps the apply-mode norm."""
        return self._use_pallas() and self.normalization != "layernorm"

    def _pre(self, x, train):
        """Hoisted projection + norm. Returns (Wx, scale, shift): the
        apply-mode path normalizes Wx in place (scale/shift None); the
        fold path returns raw Wx plus the affine for the kernel."""
        if self.bidirectional:
            x = bidir_concat(x)
        Wx = Dense(self.hidden_size, use_bias=self.use_bias,
                   dtype=self.compute_dtype, name="W")(x)
        if self._fold_norm():
            scale, shift = SeqNormAffine(
                self.normalization, use_running_average=not train,
                axis_name=self.bn_axis_name, name="norm")(Wx)
            # Deliberately NOT cast to bf16 here (unlike the ANN gate
            # streams, ann.py _gate_projections): bf16 drive noise
            # (~4e-3) perturbs the membrane recurrence and flips spikes
            # at the threshold, which would break the default mode's
            # bit-exact spike-train property (check_kernels, parity
            # tests). Users opt into bf16 Wx streams via
            # compute_dtype=bfloat16 (the Dense then emits bf16, -20%
            # on the north star). A round-2 attempt also measured a
            # slowdown from an extra f32 stats materialisation; that
            # obstacle is gone now that _BNAffine upcasts internally,
            # so exactness is the one remaining reason.
            return Wx, scale, shift
        Wx = SeqNorm(self.normalization, use_running_average=not train,
                     axis_name=self.bn_axis_name, name="norm")(Wx)
        return Wx, None, None

    def _init_states(self, Wx, n):
        shape = (Wx.shape[0], Wx.shape[2])
        if self.state_init == "uniform":
            key = self.make_rng("state")
            keys = jax.random.split(key, n)
            return [jax.random.uniform(k, shape, Wx.dtype) for k in keys]
        return [jnp.zeros(shape, Wx.dtype) for _ in range(n)]

    def _alpha(self):
        return self.param(
            "alpha", uniform_range_init(*cells.ALPHA_LIM), (self.hidden_size,)
        )

    def _adaptation_params(self):
        beta = self.param(
            "beta", uniform_range_init(*cells.BETA_LIM), (self.hidden_size,)
        )
        a = self.param("a", uniform_range_init(*cells.A_LIM), (self.hidden_size,))
        b = self.param("b", uniform_range_init(*cells.B_LIM), (self.hidden_size,))
        return beta, a, b

    def _V(self):
        return self.param(
            "V",
            jax.nn.initializers.orthogonal(),
            (self.hidden_size, self.hidden_size),
        )


class LIFLayer(_SpikingLayerBase):
    """Feedforward leaky integrate-and-fire layer (reference snns.py:179-303)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        Wx, scale, shift = self._pre(x, train)
        u0, s0 = self._init_states(Wx, 2)
        if self.cell_impl == "pallas_tp":
            from sparch_tpu.ops import pallas_tp

            mesh, axis, baxis = self._tp()
            s = pallas_tp.lif_tp_sharded(
                mesh, Wx, self._alpha(), self.threshold, u0, s0,
                tp_axis=axis, batch_axis=baxis, mxu_bf16=self._mxu_bf16(),
            )
            return self._post(s, train)
        if self._use_pallas():
            from sparch_tpu.ops import pallas_cells

            drop_rate, drop_seed = self._fused_dropout(train)
            s = pallas_cells.lif_pallas(
                Wx, self._alpha(), self.threshold, u0, s0,
                scale=scale, shift=shift,
                drop_rate=drop_rate, drop_seed=drop_seed,
                mxu_bf16=self._mxu_bf16(),
            )
            return self._post(s, train, fused_drop=drop_rate > 0)
        s = cells.lif_scan(Wx, self._alpha(), self.threshold, u0, s0)
        return self._post(s, train)


class adLIFLayer(_SpikingLayerBase):
    """Adaptive LIF layer with adaptation current (reference snns.py:306-445)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        Wx, scale, shift = self._pre(x, train)
        u0, w0, s0 = self._init_states(Wx, 3)
        beta, a, b = self._adaptation_params()
        if self.cell_impl == "pallas_tp":
            from sparch_tpu.ops import pallas_tp

            mesh, axis, baxis = self._tp()
            s = pallas_tp.adlif_tp_sharded(
                mesh, Wx, self._alpha(), beta, a, b, self.threshold,
                u0, w0, s0,
                tp_axis=axis, batch_axis=baxis, mxu_bf16=self._mxu_bf16(),
            )
            return self._post(s, train)
        if self._use_pallas():
            from sparch_tpu.ops import pallas_cells

            drop_rate, drop_seed = self._fused_dropout(train)
            s = pallas_cells.adlif_pallas(
                Wx, self._alpha(), beta, a, b, self.threshold, u0, w0, s0,
                scale=scale, shift=shift,
                drop_rate=drop_rate, drop_seed=drop_seed,
                mxu_bf16=self._mxu_bf16(),
            )
            return self._post(s, train, fused_drop=drop_rate > 0)
        s = cells.adlif_scan(
            Wx, self._alpha(), beta, a, b, self.threshold, u0, w0, s0
        )
        return self._post(s, train)


class RLIFLayer(_SpikingLayerBase):
    """Recurrent LIF layer with zero-diagonal orthogonal V
    (reference snns.py:448-578)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        Wx, scale, shift = self._pre(x, train)
        u0, s0 = self._init_states(Wx, 2)
        if self.cell_impl == "pallas_tp":
            from sparch_tpu.ops import pallas_tp

            mesh, axis, baxis = self._tp()
            s = pallas_tp.rlif_tp_sharded(
                mesh, Wx, self._alpha(), self._V(), self.threshold, u0, s0,
                tp_axis=axis, batch_axis=baxis, mxu_bf16=self._mxu_bf16(),
            )
            return self._post(s, train)
        if self._use_pallas():
            from sparch_tpu.ops import pallas_cells

            drop_rate, drop_seed = self._fused_dropout(train)
            s = pallas_cells.rlif_pallas(
                Wx, self._alpha(), self._V(), self.threshold, u0, s0,
                mxu_bf16=self._mxu_bf16(), scale=scale, shift=shift,
                drop_rate=drop_rate, drop_seed=drop_seed,
            )
            return self._post(s, train, fused_drop=drop_rate > 0)
        s = cells.rlif_scan(
            Wx, self._alpha(), self._V(), self.threshold, u0, s0
        )
        return self._post(s, train)


class RadLIFLayer(_SpikingLayerBase):
    """Recurrent adaptive LIF layer — the reference's strongest spiking model
    (reference snns.py:581-727)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        Wx, scale, shift = self._pre(x, train)
        u0, w0, s0 = self._init_states(Wx, 3)
        beta, a, b = self._adaptation_params()
        if self.cell_impl == "pallas_tp":
            from sparch_tpu.ops import pallas_tp

            mesh, axis, baxis = self._tp()
            s = pallas_tp.radlif_tp_sharded(
                mesh, Wx, self._alpha(), beta, a, b, self._V(),
                self.threshold, u0, w0, s0,
                tp_axis=axis, batch_axis=baxis, mxu_bf16=self._mxu_bf16(),
            )
            return self._post(s, train)
        if self._use_pallas():
            from sparch_tpu.ops import pallas_cells

            drop_rate, drop_seed = self._fused_dropout(train)
            s = pallas_cells.radlif_pallas(
                Wx, self._alpha(), beta, a, b, self._V(),
                self.threshold, u0, w0, s0, mxu_bf16=self._mxu_bf16(),
                scale=scale, shift=shift,
                drop_rate=drop_rate, drop_seed=drop_seed,
            )
            return self._post(s, train, fused_drop=drop_rate > 0)
        s = cells.radlif_scan(
            Wx, self._alpha(), beta, a, b, self._V(),
            self.threshold, u0, w0, s0,
        )
        return self._post(s, train)


class ReadoutLayer(nn.Module):
    """Non-spiking, non-recurrent leaky readout producing ``(B, labels)``
    via a cumulative softmax of the membrane potential
    (reference snns.py:730-825).

    Note: the reference constructs a dropout member here but never applies
    it (snns.py:791 vs :793-806); we match by applying none.
    """

    hidden_size: int
    dropout: float = 0.0
    normalization: str = "batchnorm"
    use_bias: bool = False
    state_init: str = "uniform"
    cell_impl: str = "auto"
    compute_dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        Wx = Dense(self.hidden_size, use_bias=self.use_bias,
                   dtype=self.compute_dtype, name="W")(x)
        Wx = SeqNorm(self.normalization, use_running_average=not train,
                     axis_name=self.bn_axis_name, name="norm")(Wx)
        if Wx.dtype == jnp.bfloat16:
            # the readout membrane recurrence always runs f32: it is tiny
            # (B,T,classes — no MXU/stream win from bf16), feeds the loss
            # directly, and bf16 alpha^j terms in the parallel closed form
            # round differently from a chunked (seq-pipelined) evaluation
            # (mirrors cells.cumulative_softmax on the ANN side)
            Wx = Wx.astype(jnp.float32)
        shape = (Wx.shape[0], Wx.shape[2])
        if self.state_init == "uniform":
            u0 = jax.random.uniform(self.make_rng("state"), shape, Wx.dtype)
        else:
            u0 = jnp.zeros(shape, Wx.dtype)
        alpha = self.param(
            "alpha", uniform_range_init(*cells.ALPHA_LIM), (self.hidden_size,)
        )
        # A/B on v5e showed the scan readout is faster here: the class dim
        # (20-35) pads to 128 lanes in the kernel and the scan's small
        # while-loop is already efficient. The fused readout stays
        # available behind the explicit 'pallas' impl.
        if self.cell_impl == "pallas":
            from sparch_tpu.ops import pallas_cells

            return pallas_cells.readout_pallas(Wx, alpha, u0)
        return cells.readout_sum(Wx, alpha, u0)


_LAYER_CLASSES = {
    "LIF": LIFLayer,
    "adLIF": adLIFLayer,
    "RLIF": RLIFLayer,
    "RadLIF": RadLIFLayer,
}


class SNN(nn.Module):
    """A multi-layered spiking neural network (reference snns.py:39-176).

    Accepts ``(batch, time, feat)`` inputs; 4-D ``(batch, time, feat, chan)``
    inputs are flattened to 3-D. Returns ``(output, firing_rates)`` where
    ``firing_rates`` is the mean firing rate of every hidden neuron, shape
    ``(sum of hidden widths,)`` (width 2H per bidirectional layer).
    """

    input_shape: Tuple
    layer_sizes: Sequence[int]
    neuron_type: str = "LIF"
    threshold: float = 1.0
    dropout: float = 0.0
    normalization: str = "batchnorm"
    use_bias: bool = False
    bidirectional: bool = False
    use_readout_layer: bool = True
    state_init: str = "uniform"
    cell_impl: str = "auto"
    compute_dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None
    mxu_precision: str = "default"
    remat: bool = False
    tp_mesh: Optional[Any] = None
    tp_axis: str = "model"
    tp_batch_axis: Optional[str] = "data"

    @property
    def is_snn(self) -> bool:
        return True

    @property
    def num_layers(self) -> int:
        return len(self.layer_sizes)

    @property
    def num_outputs(self) -> int:
        return self.layer_sizes[-1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.neuron_type not in _LAYER_CLASSES:
            raise ValueError(f"Invalid neuron type {self.neuron_type}")
        if self.use_readout_layer and len(self.layer_sizes) < 2:
            # the reference crashes on torch.cat([]) here (snns.py:174);
            # fail with an actionable message instead
            raise ValueError(
                "use_readout_layer=True needs at least one hidden layer "
                "(nb_layers >= 2)"
            )

        # Flatten 4d (B,T,F,C) -> (B,T,F*C) (reference snns.py:160-164)
        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        elif x.ndim != 3:
            raise NotImplementedError(f"Unsupported input rank {x.ndim}")

        layer_cls = _LAYER_CLASSES[self.neuron_type]
        if self.remat:
            # Rematerialised layers: the backward pass recomputes each
            # hidden layer's forward (projection + norm + recurrence) from
            # its input instead of storing the per-layer residual streams
            # (Wx, membranes, gate activations — several (B,T,H) buffers
            # per layer). Trades one extra forward's FLOPs for a smaller
            # activation live set — realised by XLA's memory-aware TPU
            # scheduler (tools/measure_remat.py measures it). RNG
            # streams (dropout masks, uniform state init) are replayed
            # identically on recompute, so gradients match the un-rematted
            # model up to XLA fusion reassociation (~1e-7 rel, pinned in
            # test_models.py). ``train`` is arg 2 of
            # ``Layer.__call__`` (self is 0) and must stay static —
            # it selects Python-level branches.
            layer_cls = nn.remat(layer_cls, static_argnums=(2,))
        num_hidden = (
            self.num_layers - 1 if self.use_readout_layer else self.num_layers
        )

        all_spikes = []
        for i in range(num_hidden):
            x = layer_cls(
                hidden_size=self.layer_sizes[i],
                threshold=self.threshold,
                dropout=self.dropout,
                normalization=self.normalization,
                use_bias=self.use_bias,
                bidirectional=self.bidirectional,
                state_init=self.state_init,
                cell_impl=self.cell_impl,
                compute_dtype=self.compute_dtype,
                bn_axis_name=self.bn_axis_name,
                mxu_precision=self.mxu_precision,
                tp_mesh=self.tp_mesh,
                tp_axis=self.tp_axis,
                tp_batch_axis=self.tp_batch_axis,
                name=f"layer_{i}",
            )(x, train)  # positional: remat pins arg 2 (train) static
            all_spikes.append(x)

        if self.use_readout_layer:
            x = ReadoutLayer(
                hidden_size=self.layer_sizes[-1],
                dropout=self.dropout,
                normalization=self.normalization,
                use_bias=self.use_bias,
                state_init=self.state_init,
                cell_impl=self.cell_impl,
                compute_dtype=self.compute_dtype,
                bn_axis_name=self.bn_axis_name,
                name="readout",
            )(x, train=train)

        # Mean firing rate of each hidden neuron (reference snns.py:174).
        # Accumulate in f32: spike streams may be bf16 on the fused path,
        # and a bf16 mean over B*T values loses ~1e-2. Reduce per layer
        # BEFORE concatenating — concat-then-mean would materialise the
        # full (B,T,sum H) stack just to reduce it.
        firing_rates = jnp.concatenate(
            [s.astype(jnp.float32).mean(axis=(0, 1)) for s in all_spikes]
        )
        return x, firing_rates
