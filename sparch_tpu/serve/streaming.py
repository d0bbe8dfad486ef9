"""Streaming (frame-by-frame) SNN inference.

Online serving needs to consume audio/spike frames as they arrive instead
of buffering whole utterances. Since every sparch model is a stack of
one-step recurrences, streaming falls out naturally: carry the per-layer
neuron state ``(u[, w], s)`` and the readout accumulator explicitly, and
apply one fused step per incoming frame. This is a pure function of
(variables, state, frame) — jit it once and feed frames.

Semantics match the batch eval path exactly for unidirectional models with
``state_init='zeros'`` (verified in tests/test_serve.py): feeding T frames
one at a time produces the same cumulative readout as one (B, T, F) batch
call. BatchNorm uses the trained running statistics (eval mode), so the
per-frame normalisation is a pure affine map. Bidirectional models cannot
stream (they need the reversed sequence) and are rejected.
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


def streaming_init(model, variables, batch_size: int) -> Dict:
    """Zero-initialised streaming state for ``batch_size`` parallel streams."""
    if model.bidirectional:
        raise ValueError("Bidirectional models cannot run in streaming mode.")
    if not getattr(model, "is_snn", False):
        raise ValueError("Streaming inference is implemented for SNN models.")
    params = variables["params"]
    state: Dict = {"layers": [], "t": jnp.zeros((), jnp.int32)}
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


def _affine_norm(p, stats, normalization, y):
    """Eval-mode normalisation of a (B, H) frame."""
    if normalization == "batchnorm":
        bn_p = p["norm"]["BatchNorm_0"]
        bn_s = stats["norm"]["BatchNorm_0"]
        inv = jax.lax.rsqrt(bn_s["var"] + _EPS)
        return (y - bn_s["mean"]) * inv * bn_p["scale"] + bn_p["bias"]
    if normalization == "layernorm":
        ln = p["norm"]["LayerNorm_0"]
        mean = y.mean(axis=-1, keepdims=True)
        var = ((y - mean) ** 2).mean(axis=-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + _EPS) * ln["scale"] + ln["bias"]
    return y


def _project(p, stats, normalization, x_t):
    y = jnp.dot(x_t, p["W"]["kernel"])
    if "bias" in p["W"]:
        y = y + p["W"]["bias"]
    return _affine_norm(p, stats, normalization, y)


def streaming_step(
    model, variables, state: Dict, x_t: jax.Array
) -> Tuple[Dict, jax.Array]:
    """Advance all layers by one frame.

    ``x_t``: (B, F) input frame. Returns (new_state, readout) where
    ``readout`` is the cumulative-softmax class accumulator (B, classes) —
    argmax it at any time for the running decision. Without a readout
    layer, returns the top layer's spikes instead.
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
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
