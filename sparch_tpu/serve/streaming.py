"""Streaming (frame-by-frame) inference — SNN and ANN families.

Online serving needs to consume audio/spike frames as they arrive instead
of buffering whole utterances. Since every sparch model is a stack of
one-step recurrences, streaming falls out naturally: carry the per-layer
state (SNN: ``(u[, w], s)``; ANN: ``y``) and the readout accumulator
explicitly, and apply one fused step per incoming frame. This is a pure
function of (variables, state, frame) — jit it once and feed frames.

Semantics match the batch eval path exactly for unidirectional models
(SNN with ``state_init='zeros'``; ANN always — its scan init is zeros),
verified in tests/test_serve.py: feeding T frames one at a time produces
the same cumulative readout as one (B, T, F) batch call. Both readout
variants stream: the SNN's leaky membrane accumulates softmaxes; the
ANN's collapses time FIRST (``acc += softmax(h_t)``) and applies its
linear + 2-D norm to the running accumulator on demand. BatchNorm uses
the trained running statistics (eval mode), so per-frame normalisation is
a pure affine map. Bidirectional models cannot stream (they need the
reversed sequence) and are rejected.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sparch_tpu.ops import cells
from sparch_tpu.ops.surrogate import spike_boxcar

__all__ = ["streaming_init", "streaming_step"]

_EPS = 1e-5


def _layer_names(model):
    n_hidden = (
        model.num_layers - 1 if model.use_readout_layer else model.num_layers
    )
    return [f"layer_{i}" for i in range(n_hidden)]


def _unwrap_frontend(model, variables):
    """(inner model, inner variables) for FbankFrontend-wrapped models
    (``--frontend device`` experiments); identity otherwise."""
    from sparch_tpu.models.frontend import FbankFrontend

    if not isinstance(model, FbankFrontend):
        return model, variables
    inner_vars = {"params": variables["params"]["inner"]}
    if "batch_stats" in variables:
        inner_vars["batch_stats"] = variables["batch_stats"]["inner"]
    return model.inner, inner_vars


def streaming_init(model, variables, batch_size: int) -> Dict:
    """Zero-initialised streaming state for ``batch_size`` parallel streams.

    Device-frontend models (FbankFrontend wrappers) stream too: pass each
    frame's 400-sample waveform WINDOW as ``x_t`` (windows advance by the
    160-sample hop; the fbank DSP is frame-local, so per-window features
    equal the batch fbank's exactly — ops/fbank.py constants).
    """
    model, variables = _unwrap_frontend(model, variables)
    if model.bidirectional:
        raise ValueError("Bidirectional models cannot run in streaming mode.")
    params = variables["params"]
    state: Dict = {"layers": [], "t": jnp.zeros((), jnp.int32)}
    if not getattr(model, "is_snn", False):
        for name in _layer_names(model):
            h = params[name]["W"]["kernel"].shape[1]
            # MLP layers are stateless; carry y uniformly for simplicity
            state["layers"].append(
                {"y": jnp.zeros((batch_size, h), jnp.float32)}
            )
        if model.use_readout_layer:
            h_top = params[_layer_names(model)[-1]]["W"]["kernel"].shape[1]
            state["readout"] = {
                "acc": jnp.zeros((batch_size, h_top), jnp.float32),
            }
        return state
    for name in _layer_names(model):
        h = params[name]["alpha"].shape[0]
        layer_state = {
            "u": jnp.zeros((batch_size, h), jnp.float32),
            "s": jnp.zeros((batch_size, h), jnp.float32),
        }
        if model.neuron_type in ("adLIF", "RadLIF"):
            layer_state["w"] = jnp.zeros((batch_size, h), jnp.float32)
        state["layers"].append(layer_state)
    if model.use_readout_layer:
        c = params["readout"]["alpha"].shape[0]
        state["readout"] = {
            "u": jnp.zeros((batch_size, c), jnp.float32),
            "out": jnp.zeros((batch_size, c), jnp.float32),
        }
    return state


def _affine_norm(p, stats, normalization, y, norm_key="norm"):
    """Eval-mode normalisation of a (B, H) frame."""
    if normalization == "batchnorm":
        bn_p = p[norm_key]["BatchNorm_0"]
        bn_s = stats[norm_key]["BatchNorm_0"]
        inv = jax.lax.rsqrt(bn_s["var"] + _EPS)
        return (y - bn_s["mean"]) * inv * bn_p["scale"] + bn_p["bias"]
    if normalization == "layernorm":
        ln = p[norm_key]["LayerNorm_0"]
        mean = y.mean(axis=-1, keepdims=True)
        var = ((y - mean) ** 2).mean(axis=-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + _EPS) * ln["scale"] + ln["bias"]
    return y


def _project(p, stats, normalization, x_t, w_key="W", norm_key="norm"):
    y = jnp.dot(x_t, p[w_key]["kernel"])
    if "bias" in p[w_key]:
        y = y + p[w_key]["bias"]
    return _affine_norm(p, stats, normalization, y, norm_key)


def streaming_step(
    model, variables, state: Dict, x_t: jax.Array
) -> Tuple[Dict, jax.Array]:
    """Advance all layers by one frame.

    ``x_t``: (B, F) input frame — or, for FbankFrontend-wrapped models,
    the (B, 400) waveform window of this frame (advance the window by the
    160-sample hop between steps). Returns (new_state, readout) where
    ``readout`` is the cumulative-softmax class accumulator (B, classes) —
    argmax it at any time for the running decision. Without a readout
    layer, returns the top layer's spikes instead.
    """
    from sparch_tpu.models.frontend import FbankFrontend

    if isinstance(model, FbankFrontend):
        from sparch_tpu.ops.fbank import FRAME_LENGTH, FRAME_SHIFT, fbank_jnp

        if x_t.ndim != 2 or x_t.shape[-1] != FRAME_LENGTH:
            # a longer chunk would be silently truncated to its first
            # frame by the [:, 0, :] below — reject instead
            raise ValueError(
                f"device-frontend streaming takes ONE {FRAME_LENGTH}-"
                f"sample (B, window) per step, advanced by the "
                f"{FRAME_SHIFT}-sample hop; got shape {x_t.shape}"
            )
        mel = model.num_mel_bins
        model, variables = _unwrap_frontend(model, variables)
        x_t = fbank_jnp(x_t, mel)[:, 0, :]  # (B, 400) window -> (B, mel)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if not getattr(model, "is_snn", False):
        return _ann_streaming_step(model, params, batch_stats, state, x_t)
    neuron = model.neuron_type
    thr = model.threshold

    h = x_t
    new_layers = []
    for i, name in enumerate(_layer_names(model)):
        p = params[name]
        stats = batch_stats.get(name, {})
        st = state["layers"][i]
        wx = _project(p, stats, model.normalization, h)

        alpha = jnp.clip(p["alpha"], *cells.ALPHA_LIM)
        u, s = st["u"], st["s"]
        drive = wx
        if neuron in ("RLIF", "RadLIF"):
            V = cells.zero_diag(p["V"])
            drive = drive + jnp.dot(s, V)
        if neuron in ("adLIF", "RadLIF"):
            beta = jnp.clip(p["beta"], *cells.BETA_LIM)
            a = jnp.clip(p["a"], *cells.A_LIM)
            b = jnp.clip(p["b"], *cells.B_LIM)
            w = beta * st["w"] + a * u + b * s
            drive = drive - w
        u = alpha * (u - s) + (1.0 - alpha) * drive
        s = spike_boxcar(u - thr)

        new_st = {"u": u, "s": s}
        if neuron in ("adLIF", "RadLIF"):
            new_st["w"] = w
        new_layers.append(new_st)
        h = s  # layer output (no dropout at inference)

    new_state = {"layers": new_layers, "t": state["t"] + 1}

    if model.use_readout_layer:
        p = params["readout"]
        stats = batch_stats.get("readout", {})
        wx = _project(p, stats, model.normalization, h)
        alpha = jnp.clip(p["alpha"], *cells.ALPHA_LIM)
        u = alpha * state["readout"]["u"] + (1.0 - alpha) * wx
        out = state["readout"]["out"] + jax.nn.softmax(u, axis=-1)
        new_state["readout"] = {"u": u, "out": out}
        return new_state, out

    return new_state, h


def _ann_streaming_step(model, params, batch_stats, state, x_t):
    """One frame through the ANN stack (reference anns.py recurrences)."""
    kind = model.normalization
    h = x_t
    new_layers = []
    for i, name in enumerate(_layer_names(model)):
        p = params[name]
        stats = batch_stats.get(name, {})
        y = state["layers"][i]["y"]
        wx = _project(p, stats, kind, h, "W", "norm_W")
        ann_type = model.ann_type
        if ann_type == "MLP":
            y = jax.nn.sigmoid(wx)  # stateless
        elif ann_type == "RNN":
            y = jax.nn.sigmoid(wx + jnp.dot(y, p["V"]))
        elif ann_type == "LiGRU":
            wzx = _project(p, stats, kind, h, "Wz", "norm_Wz")
            z = jax.nn.sigmoid(wzx + jnp.dot(y, p["Vz"]))
            c = jax.nn.relu(wx + jnp.dot(y, p["V"]))
            y = z * y + (1.0 - z) * c
        elif ann_type == "GRU":
            wzx = _project(p, stats, kind, h, "Wz", "norm_Wz")
            wrx = _project(p, stats, kind, h, "Wr", "norm_Wr")
            z = jax.nn.sigmoid(wzx + jnp.dot(y, p["Vz"]))
            r = jax.nn.sigmoid(wrx + jnp.dot(y, p["Vr"]))
            c = jnp.tanh(wx + jnp.dot(r * y, p["V"]))
            y = z * y + (1.0 - z) * c
        else:
            raise ValueError(f"Invalid ann type {ann_type}")
        new_layers.append({"y": y})
        h = y  # no dropout at inference

    new_state = {"layers": new_layers, "t": state["t"] + 1}

    if model.use_readout_layer:
        # ANN readout collapses time FIRST (sum of per-step softmax), then
        # applies the linear + 2-D norm (reference anns.py:644-665): the
        # running accumulator streams; the tiny readout head reapplies on
        # demand each frame.
        acc = state["readout"]["acc"] + jax.nn.softmax(h, axis=-1)
        new_state["readout"] = {"acc": acc}
        p = params["readout"]
        stats = batch_stats.get("readout", {})
        out = _project(p, stats, model.normalization, acc, "W", "norm")
        return new_state, out

    return new_state, h
