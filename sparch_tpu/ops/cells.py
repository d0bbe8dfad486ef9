"""Time-recurrent neuron cells as ``jax.lax.scan`` loops.

Design (TPU-first, not a translation):

- The per-timestep input projection ``W @ x_t`` is *hoisted* out of the
  recurrence by the calling layer into one large time-batched matmul
  (reference keeps this structure too: snns.py:261). The functions here
  receive the pre-activations ``Wx`` with shape ``(B, T, H)`` and run only
  the inherently-sequential state recurrence.
- The scan carries the neuron state ``(u[, w], s)`` and is time-major
  internally: ``Wx`` is transposed once to ``(T, B, H)`` so each scan step
  reads a contiguous ``(B, H)`` slab.
- Trainable neuron constants (alpha/beta/a/b) are clamped to their
  plausible ranges *before* the scan (one clip, reused every step), exactly
  matching the reference clamp ranges (snns.py:229,291,356-359,429-432).
- Recurrent matrices have their diagonal masked with ``V * (1 - I)`` so no
  gradient reaches the diagonal — equivalent to the reference's
  ``clone().fill_diagonal_(0)`` (snns.py:566,712).
- XLA compiles the scan to a single fused loop; the per-step work for the
  R-variants is a ``(B,H)x(H,H)`` MXU matmul plus VPU elementwise updates.
  A fused Pallas kernel (``sparch_tpu.ops.pallas_cells``) can replace the
  scan on TPU via the ``impl`` switch in the layers.

Reference dynamics reproduced (cf. /root/reference/sparch/models/snns.py):

- LIF    (snns.py:282-303):  u = a*(u - s) + (1-a)*Wx_t ; s = H(u - thr)
- adLIF  (snns.py:419-445):  w = b*w + a_*u + b_*s (prev-step u,s);
                             u = a*(u - s) + (1-a)*(Wx_t - w)
- RLIF   (snns.py:554-578):  u = a*(u - s) + (1-a)*(Wx_t + s @ V)
- RadLIF (snns.py:696-727):  w as adLIF; u = a*(u-s) + (1-a)*(Wx_t + s@V - w)
- Readout (snns.py:808-825): u = a*u + (1-a)*Wx_t ; out += softmax(u)

ANN cells (cf. /root/reference/sparch/models/anns.py):

- RNN   (anns.py:328-339):  y = sigmoid(Wx_t + y @ V)
- LiGRU (anns.py:449-462):  z = sigmoid(Wzx_t + y @ Vz); c = relu(Wx_t + y @ V);
                            y = z*y + (1-z)*c
- GRU   (anns.py:581-595):  z,r sigmoid gates; c = tanh(Wx_t + (r*y) @ V);
                            y = z*y + (1-z)*c
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from sparch_tpu.ops.surrogate import spike_boxcar

__all__ = [
    "ALPHA_LIM",
    "BETA_LIM",
    "A_LIM",
    "B_LIM",
    "init_state",
    "zero_diag",
    "rec_dot",
    "bias_add",
    "lif_scan",
    "adlif_scan",
    "rlif_scan",
    "radlif_scan",
    "leaky_cumsum",
    "readout_sum",
    "readout_sum_scan",
    "rnn_scan",
    "ligru_scan",
    "gru_scan",
    "cumulative_softmax",
]

# Plausible ranges for the trainable neuron time constants
# (reference snns.py:229,356-359).
ALPHA_LIM = (math.exp(-1 / 5), math.exp(-1 / 25))
BETA_LIM = (math.exp(-1 / 30), math.exp(-1 / 120))
A_LIM = (-1.0, 1.0)
B_LIM = (0.0, 2.0)


def init_state(
    key: Optional[jax.Array],
    shape: tuple,
    dtype,
    mode: str = "uniform",
) -> jax.Array:
    """Initial neuron state.

    ``mode='uniform'`` reproduces the reference's per-forward U[0,1) state
    initialisation (snns.py:286-287 — applied even in eval there); pass a
    fresh PRNG key per forward for that behaviour. ``mode='zeros'`` is the
    deterministic option for testing and inference.
    """
    if mode == "zeros" or key is None:
        return jnp.zeros(shape, dtype)
    if mode == "uniform":
        return jax.random.uniform(key, shape, dtype)
    raise ValueError(f"Invalid state init mode {mode}")


def zero_diag(V: jax.Array) -> jax.Array:
    """Mask the diagonal of a square matrix (no gradient to the diagonal)."""
    n = V.shape[-1]
    return V * (1.0 - jnp.eye(n, dtype=V.dtype))


def _clip(p: jax.Array, lim) -> jax.Array:
    return jnp.clip(p, lim[0], lim[1])


@jax.custom_vjp
def rec_dot(s: jax.Array, V: jax.Array) -> jax.Array:
    """Recurrent per-step product ``s @ V`` with AMP-correct gradients.

    Forward runs in the stream dtype (``s.dtype``) — ``V`` is cast at the
    point of use so a bf16 recurrence does a bf16 MXU dot. The backward
    computes the ``V`` cotangent with ``preferred_element_type=f32``:
    bf16xbf16 products are exact in f32, so the per-step ``dV``
    contribution carries no bf16 output rounding — matching the fused
    Pallas kernels, which accumulate ``dV`` in f32 VMEM scratch
    (pallas_ann.py dv_refs). Keeping the captured ``V`` f32 then makes
    ``lax.scan`` accumulate the per-step contributions in f32 too.
    For f32 streams this is numerically the default VJP.

    Note: as a ``jax.custom_vjp``, forward-mode AD (jvp/jacfwd) does not
    flow through this op — the spiking cells already lack jvp via
    ``spike_boxcar``; this extends that to the ANN cells and AMP Dense.
    """
    dt = s.dtype
    return jnp.dot(s, V.astype(dt), preferred_element_type=dt)


def _rec_dot_fwd(s, V):
    return rec_dot(s, V), (s, V)


def _rec_dot_bwd(res, g):
    s, V = res
    dt = g.dtype
    ds = jnp.dot(g, V.astype(dt).T, preferred_element_type=dt)
    # contract all leading axes of s/g (s may be (B,H) or (B,T,F))
    lead = tuple(range(s.ndim - 1))
    dV = jax.lax.dot_general(
        s, g, ((lead, lead), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(V.dtype)
    return ds, dV


rec_dot.defvjp(_rec_dot_fwd, _rec_dot_bwd)


@jax.custom_vjp
def bias_add(y: jax.Array, bias: jax.Array) -> jax.Array:
    """``y + bias`` in the stream dtype with an f32-accumulated bias
    cotangent (the reduction over all leading axes runs in f32 — the
    bias counterpart of :func:`rec_dot`; a bf16 sum over B*T rows is
    reduction-order-dependent between a monolithic step and seq-sharded
    partials). ``bias`` stays f32; for f32 streams this is numerically
    the default VJP."""
    return y + bias.astype(y.dtype)


def _bias_add_fwd(y, bias):
    return bias_add(y, bias), bias


def _bias_add_bwd(bias, g):
    dbias = jnp.sum(
        g.astype(jnp.float32), axis=tuple(range(g.ndim - 1))
    ).astype(bias.dtype)
    return g, dbias


bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)


def _time_major(Wx: jax.Array) -> jax.Array:
    return jnp.swapaxes(Wx, 0, 1)  # (B,T,H) -> (T,B,H)


def _batch_major(s: jax.Array) -> jax.Array:
    return jnp.swapaxes(s, 0, 1)  # (T,B,H) -> (B,T,H)


# ---------------------------------------------------------------------------
# Spiking cells
# ---------------------------------------------------------------------------


def lif_scan(
    Wx: jax.Array,
    alpha: jax.Array,
    threshold: float,
    u0: jax.Array,
    s0: jax.Array,
) -> jax.Array:
    """Feedforward LIF recurrence. ``Wx``: (B,T,H) -> spikes (B,T,H)."""
    dt = Wx.dtype
    alpha = _clip(alpha, ALPHA_LIM)

    def step(carry, wx_t):
        u, s = carry
        # cast at point of use: the captured constant stays f32, so its
        # scan-accumulated cotangent is f32 even when the stream is bf16
        # (matches the fused kernels' f32 VMEM grad scratches); XLA hoists
        # the loop-invariant cast, so the forward is bit-identical
        a_ = alpha.astype(dt)
        u = a_ * (u - s) + (1.0 - a_) * wx_t
        s = spike_boxcar(u - threshold)
        return (u, s), s

    _, spikes = jax.lax.scan(step, (u0, s0), _time_major(Wx))
    return _batch_major(spikes)


def adlif_scan(
    Wx: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    a: jax.Array,
    b: jax.Array,
    threshold: float,
    u0: jax.Array,
    w0: jax.Array,
    s0: jax.Array,
) -> jax.Array:
    """Adaptive LIF recurrence (adaptation current w)."""
    dt = Wx.dtype
    alpha = _clip(alpha, ALPHA_LIM)
    beta = _clip(beta, BETA_LIM)
    a = _clip(a, A_LIM)
    b = _clip(b, B_LIM)

    def step(carry, wx_t):
        u, w, s = carry
        # point-of-use casts keep the constants' cotangent accumulation
        # in f32 under AMP (see lif_scan)
        al, be = alpha.astype(dt), beta.astype(dt)
        # w uses the previous step's u and s (reference snns.py:438-439)
        w = be * w + a.astype(dt) * u + b.astype(dt) * s
        u = al * (u - s) + (1.0 - al) * (wx_t - w)
        s = spike_boxcar(u - threshold)
        return (u, w, s), s

    _, spikes = jax.lax.scan(step, (u0, w0, s0), _time_major(Wx))
    return _batch_major(spikes)


def rlif_scan(
    Wx: jax.Array,
    alpha: jax.Array,
    V: jax.Array,
    threshold: float,
    u0: jax.Array,
    s0: jax.Array,
) -> jax.Array:
    """Recurrent LIF: adds a per-step ``s @ V`` MXU matmul, V zero-diagonal."""
    dt = Wx.dtype
    alpha = _clip(alpha, ALPHA_LIM)
    V = zero_diag(V)

    def step(carry, wx_t):
        u, s = carry
        # point-of-use casts: f32 dV/dalpha accumulation under AMP
        # (see lif_scan)
        a_ = alpha.astype(dt)
        rec = rec_dot(s, V)
        u = a_ * (u - s) + (1.0 - a_) * (wx_t + rec)
        s = spike_boxcar(u - threshold)
        return (u, s), s

    _, spikes = jax.lax.scan(step, (u0, s0), _time_major(Wx))
    return _batch_major(spikes)


def radlif_scan(
    Wx: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    a: jax.Array,
    b: jax.Array,
    V: jax.Array,
    threshold: float,
    u0: jax.Array,
    w0: jax.Array,
    s0: jax.Array,
) -> jax.Array:
    """Recurrent adaptive LIF (flagship model)."""
    dt = Wx.dtype
    alpha = _clip(alpha, ALPHA_LIM)
    beta = _clip(beta, BETA_LIM)
    a = _clip(a, A_LIM)
    b = _clip(b, B_LIM)
    V = zero_diag(V)

    def step(carry, wx_t):
        u, w, s = carry
        # point-of-use casts: f32 grad accumulation under AMP (see lif_scan)
        al, be = alpha.astype(dt), beta.astype(dt)
        w = be * w + a.astype(dt) * u + b.astype(dt) * s
        rec = rec_dot(s, V)
        u = al * (u - s) + (1.0 - al) * (wx_t + rec - w)
        s = spike_boxcar(u - threshold)
        return (u, w, s), s

    _, spikes = jax.lax.scan(step, (u0, w0, s0), _time_major(Wx))
    return _batch_major(spikes)


def leaky_cumsum(
    Wx: jax.Array,
    alpha: jax.Array,
    u0: jax.Array,
    chunk: Optional[int] = None,
) -> jax.Array:
    """Membrane trajectory of the linear leak ``u_t = a*u_{t-1} + (1-a)*wx_t``
    computed WITHOUT a length-T sequential loop.

    The recurrence is linear, so inside a chunk of ``L`` steps it has the
    closed form ``u_j = a^{j+1} u_start + a^j * cumsum_j(a^{-i} v_i)`` with
    ``v = (1-a)*Wx`` — all parallel ops (one cumsum). Only the ``T/L`` chunk
    carries remain sequential, handled by a tiny ``lax.scan``. ``L`` is
    capped so the ``a^{-i}`` range stays ~e^8 (a >= exp(-1/5) after the
    clamp), keeping f32 rounding at the eps level: the largest cumsum term
    is always the most recent one, so the error scales with the *output*,
    not the range.

    Cuts the sequential depth from T to T/L; the VJP is the transpose of
    cumsum/scan — also parallel — so both directions beat the scan readout
    (measured ~0.5 ms fwd+bwd for (128,100,35) on v5e; this runs in tens
    of microseconds).

    ``Wx``: (B,T,H) -> (B,T,H) membrane series.
    """
    B, T, H = Wx.shape
    dt = Wx.dtype
    L = chunk or max(8, min(40, int(round(T**0.5))))
    n = -(-T // L)
    pad = n * L - T
    log_alpha = jnp.log(alpha)  # alpha > 0 after clamping
    v = (1.0 - alpha) * Wx
    if pad:
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    v = v.reshape(B, n, L, H)

    j = jnp.arange(L, dtype=dt)[None, None, :, None]
    a_pow_j = jnp.exp(j * log_alpha)  # alpha^j
    a_pow_mj = jnp.exp(-j * log_alpha)  # alpha^-j
    intra = a_pow_j * jnp.cumsum(v * a_pow_mj, axis=2)  # sum a^{j-i} v_i
    drive = intra[:, :, L - 1, :]  # (B, n, H) per-chunk drive
    a_pow_L = jnp.exp(L * log_alpha)

    def carry_step(u, d):
        return a_pow_L * u + d, u  # emit the state BEFORE the chunk

    _, starts = jax.lax.scan(carry_step, u0, jnp.moveaxis(drive, 1, 0))
    starts = jnp.moveaxis(starts, 0, 1)[:, :, None, :]  # (B, n, 1, H)

    us = (alpha * a_pow_j) * starts + intra  # alpha^{j+1} u_start + intra
    return us.reshape(B, n * L, H)[:, :T, :]


def readout_sum(
    Wx: jax.Array,
    alpha: jax.Array,
    u0: jax.Array,
) -> jax.Array:
    """Non-spiking leaky readout: cumulative softmax of the membrane.

    ``Wx``: (B,T,H) -> (B,H). Reference snns.py:808-825.

    The recurrence is linear (softmax is never fed back), so the membrane
    series comes from the chunked closed form (``leaky_cumsum`` — parallel
    in both directions under autodiff) and the softmax + time sum run
    fully parallel over the stacked trajectory.
    """
    alpha = _clip(alpha, ALPHA_LIM).astype(Wx.dtype)
    us = leaky_cumsum(Wx, alpha, u0)  # (B,T,H)
    return jnp.sum(jax.nn.softmax(us, axis=-1), axis=1)


def readout_sum_scan(
    Wx: jax.Array,
    alpha: jax.Array,
    u0: jax.Array,
) -> jax.Array:
    """Sequential-scan reference formulation of ``readout_sum`` (semantics
    oracle for the parallel closed form and the Pallas kernel)."""
    alpha = _clip(alpha, ALPHA_LIM).astype(Wx.dtype)

    def step(u, wx_t):
        u = alpha * u + (1.0 - alpha) * wx_t
        return u, u

    _, us = jax.lax.scan(step, u0, _time_major(Wx))  # (T,B,H)
    return jnp.sum(jax.nn.softmax(us, axis=-1), axis=0)


# ---------------------------------------------------------------------------
# Non-spiking (ANN) cells
# ---------------------------------------------------------------------------


def rnn_scan(Wx: jax.Array, V: jax.Array, y0: jax.Array) -> jax.Array:
    """Vanilla sigmoid RNN recurrence."""

    def step(y, wx_t):
        # V cast at point of use: f32 dV accumulation under AMP (see lif_scan)
        y = jax.nn.sigmoid(wx_t + rec_dot(y, V))
        return y, y

    _, ys = jax.lax.scan(step, y0, _time_major(Wx))
    return _batch_major(ys)


def ligru_scan(
    Wx: jax.Array,
    Wzx: jax.Array,
    V: jax.Array,
    Vz: jax.Array,
    y0: jax.Array,
) -> jax.Array:
    """Light GRU (Ravanelli et al. 2018) recurrence with ReLU candidate."""

    def step(y, xs):
        wx_t, wzx_t = xs
        # V/Vz cast at point of use: f32 dV accumulation under AMP
        z = jax.nn.sigmoid(wzx_t + rec_dot(y, Vz))
        c = jax.nn.relu(wx_t + rec_dot(y, V))
        y = z * y + (1.0 - z) * c
        return y, y

    _, ys = jax.lax.scan(step, y0, (_time_major(Wx), _time_major(Wzx)))
    return _batch_major(ys)


def gru_scan(
    Wx: jax.Array,
    Wzx: jax.Array,
    Wrx: jax.Array,
    V: jax.Array,
    Vz: jax.Array,
    Vr: jax.Array,
    y0: jax.Array,
) -> jax.Array:
    """Full GRU (Cho et al. 2014) recurrence with tanh candidate."""

    def step(y, xs):
        wx_t, wzx_t, wrx_t = xs
        # V/Vz/Vr cast at point of use: f32 dV accumulation under AMP
        z = jax.nn.sigmoid(wzx_t + rec_dot(y, Vz))
        r = jax.nn.sigmoid(wrx_t + rec_dot(y, Vr))
        c = jnp.tanh(wx_t + rec_dot(r * y, V))
        y = z * y + (1.0 - z) * c
        return y, y

    _, ys = jax.lax.scan(
        step, y0, (_time_major(Wx), _time_major(Wzx), _time_major(Wrx))
    )
    return _batch_major(ys)


def cumulative_softmax(x: jax.Array) -> jax.Array:
    """ANN readout time-collapse: sum_t softmax(x_t) — no recurrence, so it
    runs fully parallel over time on the VPU (reference anns.py:658-665 uses
    a Python loop; the sum is order-independent). Accumulates in f32: the
    fused ANN cells emit bf16 streams in the bf16-MXU mode, and a bf16 sum
    over T softmaxes loses ~1e-2."""
    x32 = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    return jnp.sum(jax.nn.softmax(x32, axis=-1), axis=1)
