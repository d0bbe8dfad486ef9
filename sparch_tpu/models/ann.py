"""Non-spiking ANN baselines (MLP, RNN, LiGRU, GRU).

TPU-native re-implementation of the reference ANN family
(/root/reference/sparch/models/anns.py). Same layer scaffolding as the SNN
stack (hoisted time-batched matmuls, ``lax.scan`` recurrences, per-gate
normalisation for LiGRU/GRU) and the ANN readout variant, which collapses
time *first* (sum of per-step softmax) and then applies the linear layer —
the opposite op order of the SNN readout (reference anns.py:644-665).

API parity (reference anns.py:57-67):
    ANN(input_shape, layer_sizes, ann_type, dropout, normalization,
        use_bias, bidirectional, use_readout_layer)
    out, _ = model.apply(variables, x, ...)   # returns (x, None) like the SNN
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sparch_tpu.ops import cells
from sparch_tpu.models.common import (
    Dense,
    FusedCellPolicy,
    SeqNorm,
    bidir_concat,
)

__all__ = [
    "ANN",
    "MLPLayer",
    "RNNLayer",
    "LiGRULayer",
    "GRULayer",
    "ReadoutLayerANN",
    "ANN_TYPES",
]

ANN_TYPES = ("MLP", "RNN", "LiGRU", "GRU")


class _ANNLayerBase(FusedCellPolicy, nn.Module):
    """Fused-path policy (_use_pallas etc.) comes from FusedCellPolicy,
    shared with the SNN layers."""

    hidden_size: int
    dropout: float = 0.0
    normalization: str = "batchnorm"
    use_bias: bool = False
    bidirectional: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None
    cell_impl: str = "auto"
    mxu_precision: str = "default"
    # tensor-parallel fused cells (cell_impl='pallas_tp'): the mesh whose
    # `tp_axis` shards the neurons; `tp_batch_axis` names the data axis
    # the batch is sharded over (None for an unsharded batch). The _tp()
    # validator lives on FusedCellPolicy (shared with the SNN layers).
    tp_mesh: Optional[Any] = None
    tp_axis: str = "model"
    tp_batch_axis: Optional[str] = "data"

    def _proj(self, x, train, name):
        """Hoisted input projection + flattened-sequence norm for one gate."""
        Wx = Dense(self.hidden_size, use_bias=self.use_bias,
                   dtype=self.compute_dtype, name=name)(x)
        return SeqNorm(self.normalization, use_running_average=not train,
                       axis_name=self.bn_axis_name, name=f"norm_{name}")(Wx)

    def _gate_projections(self, x, train, names):
        """Per-gate projections for the fused path: returns
        ``(wxs, scales, shifts)`` with batchnorm folded to a per-gate
        affine the kernel applies on load (same trick as the SNN layers;
        the stats still come from the raw f32 projection output), or
        ``(normalized wxs, None, None)`` when folding isn't possible
        (layernorm / scan path)."""
        fold = self._use_pallas() and self.normalization != "layernorm"
        if not fold:
            return [self._proj(x, train, n) for n in names], None, None
        from sparch_tpu.models.common import SeqNormAffine

        # bf16 gate streams end-to-end in the bf16-MXU mode: the raw Wx
        # stream is materialised ONCE in bf16 and everything downstream
        # (BN stats in f32 accumulation, the kernel's on-load affine, the
        # custom_vjp's dscale residual, the dWx cotangent and both XLA
        # VJPs) consumes it — instead of an f32 Wx written by the
        # projection, read by the kernel fwd+bwd and the two XLA VJPs,
        # plus an f32 upcast of the bf16 dWx (4-5 extra f32 (B,T,H)
        # passes per gate). Gate pre-activations are BN-normalised and
        # sigmoid/tanh/relu-bounded, so the rounding is the same ~4e-3
        # relative noise as the existing bf16 residual streams.
        cast = jnp.bfloat16 if self._mxu_bf16() else None
        wxs, scales, shifts = [], [], []
        for n in names:
            Wx = Dense(self.hidden_size, use_bias=self.use_bias,
                       dtype=self.compute_dtype, name=n)(x)
            if cast is not None:
                Wx = Wx.astype(cast)
            sc, sh = SeqNormAffine(
                self.normalization, use_running_average=not train,
                axis_name=self.bn_axis_name, name=f"norm_{n}")(Wx)
            wxs.append(Wx)
            scales.append(sc)
            shifts.append(sh)
        if scales[0] is None:  # 'none': nothing to fold
            return wxs, None, None
        return wxs, scales, shifts

    def _V(self, name="V"):
        import jax

        return self.param(
            name,
            jax.nn.initializers.orthogonal(),
            (self.hidden_size, self.hidden_size),
        )


class MLPLayer(_ANNLayerBase):
    """Non-recurrent sigmoid MLP layer (reference anns.py:149-227)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        Wx = self._proj(x, train, "W")
        y = nn.sigmoid(Wx)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class RNNLayer(_ANNLayerBase):
    """Vanilla sigmoid RNN layer with orthogonal V (reference anns.py:230-339)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bidirectional:
            x = bidir_concat(x)
        if self.cell_impl == "pallas_tp":
            from sparch_tpu.ops import pallas_tp_ann

            mesh, axis, baxis = self._tp()
            Wx = self._proj(x, train, "W")
            y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), jnp.float32)
            y = pallas_tp_ann.rnn_tp_sharded(
                mesh, Wx, self._V(), y0,
                tp_axis=axis, batch_axis=baxis, mxu_bf16=self._mxu_bf16(),
            )
            return self._post(y, train)
        if self._use_pallas():
            from sparch_tpu.ops import pallas_ann

            (Wx,), scales, shifts = self._gate_projections(x, train, ["W"])
            y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), jnp.float32)
            drop_rate, drop_seed = self._fused_dropout(train)
            y = pallas_ann.rnn_pallas(
                Wx, self._V(), y0, mxu_bf16=self._mxu_bf16(),
                scales=scales, shifts=shifts,
                drop_rate=drop_rate, drop_seed=drop_seed,
            )
            return self._post(y, train, fused_drop=drop_rate > 0)
        Wx = self._proj(x, train, "W")
        y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), Wx.dtype)
        y = cells.rnn_scan(Wx, self._V(), y0)
        return self._post(y, train)


class LiGRULayer(_ANNLayerBase):
    """Light GRU layer (Ravanelli et al. 2018; reference anns.py:342-462).

    Separate normalisation per gate path (anns.py:400-407)."""

    # Two resident (V, dV) pairs. Measured on v5e (tools/probe_vmem.py,
    # bf16-MXU affine; FAIR A/B — the scan side pays the affine the real
    # fallback pays outside the kernel): H=1536 fused 2.84 ms vs scan
    # 4.53 (1.6x, batch tile 128 under the byte-accurate plan); H=2048
    # exceeds the 128M VMEM capacity by 3.76M at the smallest useful
    # tile — a hardware bound, not a planning artifact.
    _pallas_h_cap = 1536

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bidirectional:
            x = bidir_concat(x)
        if self.cell_impl == "pallas_tp":
            from sparch_tpu.ops import pallas_tp_ann

            mesh, axis, baxis = self._tp()
            Wx = self._proj(x, train, "W")
            Wzx = self._proj(x, train, "Wz")
            y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), jnp.float32)
            y = pallas_tp_ann.ligru_tp_sharded(
                mesh, Wx, Wzx, self._V("V"), self._V("Vz"), y0,
                tp_axis=axis, batch_axis=baxis, mxu_bf16=self._mxu_bf16(),
            )
            return self._post(y, train)
        if self._use_pallas():
            from sparch_tpu.ops import pallas_ann

            (Wx, Wzx), scales, shifts = self._gate_projections(
                x, train, ["W", "Wz"]
            )
            y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), jnp.float32)
            drop_rate, drop_seed = self._fused_dropout(train)
            y = pallas_ann.ligru_pallas(
                Wx, Wzx, self._V("V"), self._V("Vz"), y0,
                mxu_bf16=self._mxu_bf16(), scales=scales, shifts=shifts,
                drop_rate=drop_rate, drop_seed=drop_seed,
            )
            return self._post(y, train, fused_drop=drop_rate > 0)
        Wx = self._proj(x, train, "W")
        Wzx = self._proj(x, train, "Wz")
        y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), Wx.dtype)
        y = cells.ligru_scan(Wx, Wzx, self._V("V"), self._V("Vz"), y0)
        return self._post(y, train)


class GRULayer(_ANNLayerBase):
    """Full GRU layer (Cho et al. 2014; reference anns.py:465-595)."""

    # Three resident (V, dV) pairs. Measured on v5e (tools/probe_vmem.py,
    # FAIR A/B — the scan side pays the affine the real fallback pays
    # outside the kernel): H=1024 fused 2.27 ms vs scan 5.32 (2.3x,
    # batch tile 64); H=1280 bf16 COMPILES under the calibrated plan +
    # 120M scoped limit but the starved batch tile (32) makes it 4-5%
    # SLOWER than the scan fallback (5.78 vs 5.54 ms fair) — and the f32
    # mode demands 145.9M of the 128M capacity there. Scan is simply the
    # right program above 1024.
    _pallas_h_cap = 1024

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bidirectional:
            x = bidir_concat(x)
        if self.cell_impl == "pallas_tp":
            from sparch_tpu.ops import pallas_tp_ann

            mesh, axis, baxis = self._tp()
            Wx = self._proj(x, train, "W")
            Wzx = self._proj(x, train, "Wz")
            Wrx = self._proj(x, train, "Wr")
            y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), jnp.float32)
            y = pallas_tp_ann.gru_tp_sharded(
                mesh, Wx, Wzx, Wrx,
                self._V("V"), self._V("Vz"), self._V("Vr"), y0,
                tp_axis=axis, batch_axis=baxis, mxu_bf16=self._mxu_bf16(),
            )
            return self._post(y, train)
        if self._use_pallas():
            from sparch_tpu.ops import pallas_ann

            (Wx, Wzx, Wrx), scales, shifts = self._gate_projections(
                x, train, ["W", "Wz", "Wr"]
            )
            y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), jnp.float32)
            drop_rate, drop_seed = self._fused_dropout(train)
            y = pallas_ann.gru_pallas(
                Wx, Wzx, Wrx,
                self._V("V"), self._V("Vz"), self._V("Vr"), y0,
                mxu_bf16=self._mxu_bf16(), scales=scales, shifts=shifts,
                drop_rate=drop_rate, drop_seed=drop_seed,
            )
            return self._post(y, train, fused_drop=drop_rate > 0)
        Wx = self._proj(x, train, "W")
        Wzx = self._proj(x, train, "Wz")
        Wrx = self._proj(x, train, "Wr")
        y0 = jnp.zeros((Wx.shape[0], Wx.shape[2]), Wx.dtype)
        y = cells.gru_scan(
            Wx, Wzx, Wrx, self._V("V"), self._V("Vz"), self._V("Vr"), y0
        )
        return self._post(y, train)


class ReadoutLayerANN(nn.Module):
    """ANN readout: sum of per-step softmax, *then* linear + 2-D norm
    (reference anns.py:598-665 — inverse op order vs the SNN readout)."""

    output_size: int
    normalization: str = "batchnorm"
    use_bias: bool = False
    compute_dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = cells.cumulative_softmax(x)
        Wy = Dense(self.output_size, use_bias=self.use_bias,
                   dtype=self.compute_dtype, name="W")(y)
        # Norm applies to the 2-D (B, out) output directly (anns.py:653-654)
        return SeqNorm(self.normalization, use_running_average=not train,
                       axis_name=self.bn_axis_name, name="norm")(Wy)


_LAYER_CLASSES = {
    "MLP": MLPLayer,
    "RNN": RNNLayer,
    "LiGRU": LiGRULayer,
    "GRU": GRULayer,
}


class ANN(nn.Module):
    """A multi-layered non-spiking network (reference anns.py:19-146).

    Returns ``(output, None)`` so callers can treat SNNs and ANNs
    uniformly (reference anns.py:146).
    """

    input_shape: Tuple
    layer_sizes: Sequence[int]
    ann_type: str = "MLP"
    dropout: float = 0.0
    normalization: str = "batchnorm"
    use_bias: bool = False
    bidirectional: bool = False
    use_readout_layer: bool = True
    compute_dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None
    cell_impl: str = "auto"
    mxu_precision: str = "default"
    remat: bool = False
    tp_mesh: Optional[Any] = None
    tp_axis: str = "model"
    tp_batch_axis: Optional[str] = "data"

    @property
    def is_snn(self) -> bool:
        return False

    @property
    def num_layers(self) -> int:
        return len(self.layer_sizes)

    @property
    def num_outputs(self) -> int:
        return self.layer_sizes[-1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.ann_type not in _LAYER_CLASSES:
            raise ValueError(f"Invalid ann type {self.ann_type}")
        if self.bidirectional and self.ann_type == "MLP":
            raise ValueError("MLP cannot be bidirectional.")

        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        elif x.ndim != 3:
            raise NotImplementedError(f"Unsupported input rank {x.ndim}")

        layer_cls = _LAYER_CLASSES[self.ann_type]
        if self.remat:
            # Backward recomputes each hidden layer from its input instead
            # of storing its gate/activation streams; RNGs replay, so
            # gradients match the un-rematted model up to XLA fusion
            # reassociation (see SNN.__call__ for the full rationale).
            # ``train`` is arg 2 of ``Layer.__call__`` and must stay static.
            layer_cls = nn.remat(layer_cls, static_argnums=(2,))
        num_hidden = (
            self.num_layers - 1 if self.use_readout_layer else self.num_layers
        )

        for i in range(num_hidden):
            x = layer_cls(
                hidden_size=self.layer_sizes[i],
                dropout=self.dropout,
                normalization=self.normalization,
                use_bias=self.use_bias,
                bidirectional=self.bidirectional,
                compute_dtype=self.compute_dtype,
                bn_axis_name=self.bn_axis_name,
                cell_impl=self.cell_impl,
                mxu_precision=self.mxu_precision,
                tp_mesh=self.tp_mesh,
                tp_axis=self.tp_axis,
                tp_batch_axis=self.tp_batch_axis,
                name=f"layer_{i}",
            )(x, train)  # positional: remat pins arg 2 (train) static

        if self.use_readout_layer:
            x = ReadoutLayerANN(
                output_size=self.layer_sizes[-1],
                normalization=self.normalization,
                use_bias=self.use_bias,
                compute_dtype=self.compute_dtype,
                bn_axis_name=self.bn_axis_name,
                name="readout",
            )(x, train=train)

        return x, None
