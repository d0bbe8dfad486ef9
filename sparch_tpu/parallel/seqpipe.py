"""Sequence (time-axis) parallelism for the SNN training step.

The reference has no notion of sequence parallelism (SURVEY.md §5.7 — its
time loop is a serial Python loop on one device). This module supplies the
TPU-native scaling path for LONG sequences: shard the time axis over a
``seq`` mesh axis and run the inherently-sequential neuron recurrence as a
**state-passing pipeline** — device ``s`` owns time chunk ``s``; the
neuron state at each chunk boundary hops to the next device over ICI via
``lax.ppermute``, and the batch is split into microbatches so all devices
work concurrently (device ``s`` runs microbatch ``m`` at tick ``s + m``;
pipeline fill/drain is the usual ``(S-1)/(M+S-1)`` bubble).

Everything that is NOT sequential stays embarrassingly parallel in time:
input projections, BatchNorm statistics (one ``psum`` over the mesh),
firing-rate telemetry, and the leaky readout — whose linear recurrence
crosses chunk boundaries in closed form (an ``all_gather`` of one (B, C)
boundary drive per device plus a tiny S-step scan), so it needs no
pipelining at all.

Scope: the whole SNN family AND the ANN family (the ANN readout's time
collapse is a plain reduction, and MLP layers are stateless so only the
recurrent cells pipeline) with a readout layer. Bidirectional models run
the reference's batch trick (snns.py:252-254,272-275) across the sharded
time axis: the backward direction's data is pre-flipped, so BOTH halves
of the doubled batch run time-forward through the unchanged pipeline,
and a global time flip is just a local flip plus a shard-order reversal
(``ppermute`` ``i -> S-1-i`` — an involution, so it is its own autodiff
transpose): one reversal building each layer's doubled input, one
un-reversing the backward half before the feature concat.
The default training recipe is fully covered: dropout and the uniform
per-forward state init draw their stochastic inputs OUTSIDE the
``shard_map`` at global shape (:func:`draw_noise` — deterministic in the
key and independent of the mesh size, so any two shardings of the same
step agree bit-for-bit), and the pipeline consumes them as explicit
arrays: keep masks shard with the time axis, initial states feed device
0's inbox per microbatch. Gradients flow through the pipeline
(``ppermute``/``psum``/``all_gather`` are all differentiable), so the
full training step works; numerical agreement with the single-device
step and an explicit-noise scan oracle is pinned by
tests/test_seqpipe.py on an 8-device CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparch_tpu.models.common import BN_MOMENTUM, NORM_EPS
from sparch_tpu.ops import cells
from sparch_tpu.ops.surrogate import spike_boxcar

__all__ = [
    "make_seq_mesh",
    "seq_batch_sharding",
    "draw_noise",
    "make_seqpipe_train_step",
    "make_seqpipe_eval_step",
    "make_seqpipe_predict",
]

# normalization constants shared with the flax layers (models/common.py)
# so the two implementations cannot drift
_EPS = NORM_EPS
_MOM = BN_MOMENTUM


def make_seq_mesh(devices=None, data: int = 1, model: int = 1) -> Mesh:
    """Mesh with a time ('seq') axis, optionally composed with a batch
    ('data') axis and/or a hidden-dimension ('model') axis: ``data > 1``
    shards the batch and each data group runs its own time pipeline over
    'seq'; ``model > 1`` additionally tensor-shards every hidden layer's
    parameters/state inside the pipeline (dp x sp x tp)."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if devices.size % (data * model) != 0:
        raise ValueError(
            f"{devices.size} devices not divisible by data={data} x "
            f"model={model}"
        )
    seq = devices.size // (data * model)
    shape, names = [], []
    for n, name in ((data, "data"), (seq, "seq"), (model, "model")):
        if name == "seq" or n > 1:
            shape.append(n)
            names.append(name)
    return Mesh(devices.reshape(shape), axis_names=tuple(names))


def seq_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, F) batches shard on the TIME axis (and the batch axis when
    the mesh has one)."""
    if "data" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "seq", None))
    return NamedSharding(mesh, P(None, "seq", None))


def draw_noise(model, rng, batch_shape, train: bool = True):
    """Per-forward stochastic inputs for the seq-pipeline step, drawn at
    GLOBAL shape: per-hidden-layer scaled keep masks (train-mode dropout,
    reference snns.py:278) and, for 'uniform' SNN state init, the
    per-forward U[0,1) initial states (snns.py:286-287 — drawn even in
    eval) plus the readout membrane start. Deterministic in ``rng`` and
    independent of the mesh, so the same key yields bit-identical noise
    under any sharding; the steps shard the arrays via their in_specs
    (masks follow the time axis, states the batch axis).

    Returns a (possibly empty) dict:
    ``{"layer_i": {"mask": (B,T,H), "states": ((B,H),)*3}, "readout":
    {"u0": (B,C)}}`` with only the entries the model needs. For
    bidirectional models the mask covers the MERGED layer output —
    (B, T, 2H), matching the single-device split-then-dropout order —
    and each state slot is (2, B, H): per-direction rows of the doubled
    batch (reshaped to (2B, H) inside the layer; kept 3-D here so the
    batch axis stays sharddable on a 'data' mesh axis).
    """
    B, T = batch_shape[0], batch_shape[1]
    n_hidden = model.num_layers - 1
    uniform = (
        model.is_snn and getattr(model, "state_init", "zeros") == "uniform"
    )
    adaptive = model.is_snn and model.neuron_type in ("adLIF", "RadLIF")
    bidir = bool(getattr(model, "bidirectional", False))
    p = float(model.dropout) if train else 0.0
    noise = {}
    for i in range(n_hidden):
        h = model.layer_sizes[i]
        rng, k_m, k_s = jax.random.split(rng, 3)
        entry = {}
        if p > 0:
            h_out = 2 * h if bidir else h
            keep = jax.random.bernoulli(k_m, 1.0 - p, (B, T, h_out))
            entry["mask"] = keep.astype(jnp.float32) / (1.0 - p)
        if uniform:
            # state slot order matches the chunk scan carry (u, w, s);
            # non-adaptive cells have no w (slot stays zero), mirroring
            # the model's _init_states draw count
            ks = jax.random.split(k_s, 3)
            shape = (2, B, h) if bidir else (B, h)
            entry["states"] = (
                jax.random.uniform(ks[0], shape),
                jax.random.uniform(ks[1], shape) if adaptive
                else jnp.zeros(shape, jnp.float32),
                jax.random.uniform(ks[2], shape),
            )
        if entry:
            noise[f"layer_{i}"] = entry
    if uniform:
        rng, k_r = jax.random.split(rng)
        noise["readout"] = {
            "u0": jax.random.uniform(k_r, (B, model.layer_sizes[-1]))
        }
    return noise


def _clamped(p, neuron, model_axis=None, width=None):
    """Clamp the neuron constants (and slice each feature-full vector to
    this device's shard under TP — their gradients reassemble through
    the slice transpose)."""

    def cs(v, lim):
        return _shard_slice(jnp.clip(v, *lim), model_axis, width)

    out = {"alpha": cs(p["alpha"], cells.ALPHA_LIM)}
    if neuron in ("adLIF", "RadLIF"):
        out["beta"] = cs(p["beta"], cells.BETA_LIM)
        out["a"] = cs(p["a"], cells.A_LIM)
        out["b"] = cs(p["b"], cells.B_LIM)
    if neuron in ("RLIF", "RadLIF"):
        V = p["V"]
        if model_axis is None:
            out["V"] = cells.zero_diag(V)
        else:
            # V is a (Hg, Hl) column shard: its slice of the full
            # diagonal is row j*Hl + c for local column c
            j = jax.lax.axis_index(model_axis)
            Hg, Hl = V.shape
            rows = jnp.arange(Hg)[:, None]
            cols = jnp.arange(Hl)[None, :]
            out["V"] = V * (rows != cols + j * Hl).astype(V.dtype)
    return out


def _shard_slice(full, model_axis, width):
    """This device's feature shard of a feature-FULL (.., Hg) array."""
    if model_axis is None:
        return full
    j = jax.lax.axis_index(model_axis)
    return jax.lax.dynamic_slice_in_dim(full, j * width, width, full.ndim - 1)


def _feature_gather(shard, model_axis):
    """Feature-shard (.., Hl) -> full (.., Hg) across 'model' (identity
    without the axis)."""
    if model_axis is None:
        return shard
    return jax.lax.all_gather(
        shard, model_axis, axis=shard.ndim - 1, tiled=True
    )


def _time_reverse(h, axis):
    """Global flip of the sharded time axis: flip within the local chunk
    and reverse the shard order (``ppermute`` ``i -> S-1-i``). The permute
    is an involution, so the op is its own autodiff transpose; with one
    shard it degenerates to a plain local flip."""
    S = jax.lax.psum(1, axis)
    rev = jnp.flip(h, axis=1)
    if S == 1:
        return rev
    return jax.lax.ppermute(
        rev, axis, [(i, S - 1 - i) for i in range(S)]
    )


def _snn_chunk_scan(neuron, cp, threshold, wxs, state, model_axis=None):
    """One SNN (mb, Tl, .) chunk from ``state``; returns (state, spikes).

    Under tensor parallelism the membrane/adaptation states and every
    parameter are (mb, Hl) feature shards while the SPIKE vector is
    carried feature-FULL: the recurrent product needs all of s each step
    (``s_full @ V_colshard``), so the new local spikes all_gather over
    'model' once per step — the lone TP collective on the sequential
    chain. Outputs are therefore already feature-full.
    """
    Hl = wxs[0].shape[-1]
    adaptive = neuron in ("adLIF", "RadLIF")

    def stepf(carry, wx_t):
        # u/w: (mb, Hl) shards; sf: (mb, Hg) full. Non-adaptive cells
        # carry no w slot (cells.lif_scan/rlif_scan carry (u, s) only) —
        # a dead slot would ppermute an extra zeros array every tick.
        if adaptive:
            u, w, sf = carry
        else:
            u, sf = carry
        drive = wx_t[0]
        dt = drive.dtype
        # point-of-use casts mirror the scan cells (ops/cells.py): the
        # captured constants stay f32 so their cotangents accumulate in
        # f32 under AMP, bit-matching the single-device step
        if neuron in ("RLIF", "RadLIF"):
            drive = drive + cells.rec_dot(sf, cp["V"])
        sp = _shard_slice(sf, model_axis, Hl)
        if adaptive:
            w = (cp["beta"].astype(dt) * w + cp["a"].astype(dt) * u
                 + cp["b"].astype(dt) * sp)
            drive = drive - w
        a_ = cp["alpha"].astype(dt)
        u = a_ * (u - sp) + (1.0 - a_) * drive
        s_new = spike_boxcar(u - threshold)
        sf = _feature_gather(s_new, model_axis)
        return ((u, w, sf) if adaptive else (u, sf)), sf

    state, spikes = jax.lax.scan(
        stepf, state, tuple(jnp.swapaxes(w, 0, 1) for w in wxs)
    )
    return state, jnp.swapaxes(spikes, 0, 1)


def _ann_chunk_scan(ann_type, p, wxs, state, model_axis=None):
    """One ANN (mb, Tl, .) chunk; state is ``(y,)`` carried feature-FULL
    (reference anns.py:328-339,449-462,581-595 recurrences). Under TP
    the gates/candidate are computed as (mb, Hl) shards against
    column-sharded V matrices and the new y all_gathers per step (GRU
    additionally gathers r*y for its candidate product)."""
    Hl = wxs[0].shape[-1]

    def stepf(carry, wx_t):
        (yf,) = carry
        yl = _shard_slice(yf, model_axis, Hl)
        # V matrices cast at point of use in the stream dtype, mirroring
        # the scan cells' rec_dot (f32-exact dV accumulation under AMP)
        dot = lambda a, k: cells.rec_dot(a, p[k])  # noqa: E731
        if ann_type == "RNN":
            y = jax.nn.sigmoid(wx_t[0] + dot(yf, "V"))
        elif ann_type == "LiGRU":
            z = jax.nn.sigmoid(wx_t[1] + dot(yf, "Vz"))
            c = jax.nn.relu(wx_t[0] + dot(yf, "V"))
            y = z * yl + (1.0 - z) * c
        else:  # GRU
            z = jax.nn.sigmoid(wx_t[1] + dot(yf, "Vz"))
            r = jax.nn.sigmoid(wx_t[2] + dot(yf, "Vr"))
            ry = _feature_gather(r * yl, model_axis)
            c = jnp.tanh(wx_t[0] + dot(ry, "V"))
            y = z * yl + (1.0 - z) * c
        yf = _feature_gather(y, model_axis)
        return (yf,), yf

    state, ys = jax.lax.scan(
        stepf, state, tuple(jnp.swapaxes(w, 0, 1) for w in wxs)
    )
    return state, jnp.swapaxes(ys, 0, 1)


def _pipelined_recurrence(chunk_fn, state_widths, wxs, axis, n_micro,
                          init_state=None, out_width=None):
    """State-passing pipeline over the ``axis`` mesh dimension, generic
    over the cell (``chunk_fn(wxs_chunk, state) -> (state, outputs)``
    with per-slot ``state_widths`` (mb, w) state slots — under TP some
    slots are feature shards and some feature-full).

    ``wxs``: per-gate (B, Tl, H) local time chunks of the normalized
    drive; ``out_width`` is the chunk output's feature width when it
    differs from the drive's (TP outputs are feature-full). Device s
    runs microbatch ``m = tick - s``; boundary states hop right after
    every tick. ``ppermute`` delivers zeros to device 0 — the fresh
    initial state each new microbatch needs — unless ``init_state``
    (per-slot (B, w) arrays, e.g. the uniform per-forward draw) supplies
    device 0's inbox per microbatch instead.
    """
    S = jax.lax.psum(1, axis)
    s_idx = jax.lax.axis_index(axis)
    B, Tl, H = wxs[0].shape
    Ho = out_width or H
    M = n_micro
    if B % M:  # loud here: the reshape below fails opaquely otherwise
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    mb = B // M
    dtype = wxs[0].dtype
    Wxm = tuple(w.reshape(M, mb, Tl, H) for w in wxs)
    zeros_state = tuple(jnp.zeros((mb, w), dtype) for w in state_widths)
    init_m = None
    if init_state is not None:
        init_m = tuple(
            s.reshape(M, mb, s.shape[-1]) for s in init_state
        )
    results0 = jnp.zeros((M, mb, Tl, Ho), dtype)
    perm = [(i, i + 1) for i in range(S - 1)]

    def tick(carry, t):
        inbox, results = carry
        m = t - s_idx
        active = jnp.logical_and(m >= 0, m < M)
        m_c = jnp.clip(m, 0, M - 1)
        if init_m is not None:
            # device 0 starts microbatch m this tick: its inbox is the
            # drawn initial state, not the ppermute-delivered zeros
            inbox = tuple(
                jnp.where(s_idx == 0, im[m_c], ib)
                for im, ib in zip(init_m, inbox)
            )
        # zeroed drive on inactive ticks keeps the throwaway compute finite
        wx_m = tuple(jnp.where(active, W[m_c], 0.0) for W in Wxm)
        st_out, outs = chunk_fn(wx_m, inbox)
        cur = jax.lax.dynamic_slice(
            results, (m_c, 0, 0, 0), (1, mb, Tl, Ho)
        )
        results = jax.lax.dynamic_update_slice(
            results,
            jnp.where(active, outs[None], cur),
            (m_c, 0, 0, 0),
        )
        # the right neighbor consumes this state at tick t+1 for the same
        # microbatch; inactive-phase garbage is only ever received by a
        # neighbor that is itself inactive at that tick
        inbox_next = jax.tree.map(
            lambda v: jax.lax.ppermute(v, axis, perm), st_out
        )
        return (inbox_next, results), None

    (_, results), _ = jax.lax.scan(
        tick, (zeros_state, results0), jnp.arange(M + S - 1)
    )
    return results.reshape(B, Tl, Ho)


def _psum(v, axes):
    if not axes:
        return v
    return jax.lax.psum(v, axes)


def _norm(kind, p, stats, flat_n_global, wx, stat_axes, train,
          norm_key="norm", model_axis=None):
    """Normalization over the globally-flattened (B*T, H) sequence; batch
    statistics reduce with one psum over the mesh axes the sequence is
    sharded on ('seq', plus 'data' on a composite mesh — global-batch
    stats like the jit path). Under TP ``wx`` is a feature shard: BN is
    per-feature so shard statistics ARE the global statistics (running
    stats are stored feature-full — sliced on read, gathered on write);
    LayerNorm's per-sample moments span the full feature axis, so its
    sums additionally psum over 'model'. Returns (normalized wx, updated
    running stats or None).

    Statistics accumulate in f32 even when ``wx`` is a bf16 AMP stream
    (flax's norm layers promote the same way), and the normalized output
    is then f32 — under AMP only 'none' leaves the recurrence in bf16,
    matching the single-device layers."""
    Hl = wx.shape[-1]
    if kind == "batchnorm":
        bn_p = p[norm_key]["BatchNorm_0"]
        bn_s = stats[norm_key]["BatchNorm_0"]
        if train:
            flat = wx.reshape(-1, Hl).astype(jnp.float32)
            ssum = _psum(jnp.sum(flat, axis=0), stat_axes)
            ssum2 = _psum(
                jnp.sum(jax.lax.square(flat), axis=0), stat_axes
            )
            mean = ssum / flat_n_global
            var = ssum2 / flat_n_global - jax.lax.square(mean)
            old_mean = _shard_slice(bn_s["mean"], model_axis, Hl)
            old_var = _shard_slice(bn_s["var"], model_axis, Hl)
            new_stats = {
                "mean": _feature_gather(
                    _MOM * old_mean + (1 - _MOM) * mean, model_axis
                ),
                "var": _feature_gather(
                    _MOM * old_var + (1 - _MOM) * var, model_axis
                ),
            }
        else:
            mean = _shard_slice(bn_s["mean"], model_axis, Hl)
            var = _shard_slice(bn_s["var"], model_axis, Hl)
            new_stats = None
        inv = jax.lax.rsqrt(var + _EPS)
        gamma = _shard_slice(bn_p["scale"], model_axis, Hl)
        beta = _shard_slice(bn_p["bias"], model_axis, Hl)
        return (wx - mean) * inv * gamma + beta, new_stats
    if kind == "layernorm":
        ln = p[norm_key]["LayerNorm_0"]
        wx32 = wx.astype(jnp.float32)
        if model_axis is None:
            mean = wx32.mean(axis=-1, keepdims=True)
            var = ((wx32 - mean) ** 2).mean(axis=-1, keepdims=True)
        else:
            n_feat = Hl * jax.lax.psum(1, model_axis)
            mean = jax.lax.psum(
                wx32.sum(axis=-1, keepdims=True), model_axis
            ) / n_feat
            var = jax.lax.psum(
                ((wx32 - mean) ** 2).sum(axis=-1, keepdims=True), model_axis
            ) / n_feat
        return (
            (wx32 - mean) * jax.lax.rsqrt(var + _EPS)
            * _shard_slice(ln["scale"], model_axis, Hl)
            + _shard_slice(ln["bias"], model_axis, Hl),
            None,
        )
    return wx, None


def _project(p, h, w_key="W", model_axis=None, dtype=None):
    # kernel is column-sharded under TP (in_spec P(None, 'model')); the
    # feature-full bias is sliced to match. ``dtype`` mirrors the model's
    # compute_dtype: the single-device Dense casts both operands before
    # the dot (models/common.py Dense), so the AMP projection is bf16 in
    # and bf16 out here too.
    kernel = p[w_key]["kernel"]
    if dtype is not None:
        # rec_dot mirrors the single-device Dense AMP path: the kernel
        # stays f32 so its cotangent (here a per-shard partial, psum'd
        # in f32) carries no bf16 output rounding
        wx = cells.rec_dot(h.astype(dtype), kernel)
    else:
        wx = jnp.dot(h, kernel)
    if "bias" in p[w_key]:
        # bias_add keeps the bias f32 and accumulates its cotangent in
        # f32 (mirrors the single-device Dense; a bf16 row-sum would
        # round differently per time shard)
        wx = cells.bias_add(
            wx, _shard_slice(p[w_key]["bias"], model_axis, wx.shape[-1])
        )
    return wx


def _pipelined_readout(p, stats, kind, flat_n_global, h, axis, stat_axes,
                       train, u0=None, dtype=None):
    """Leaky readout across the sharded time axis in closed form: the
    membrane recurrence is linear, so each device only needs its chunk's
    start state — an S-step scan over all_gather'ed per-chunk boundary
    drives seeded with ``u0`` (the uniform per-forward membrane start, or
    zeros) — and the softmax time-sum reduces with one psum."""
    wx = _project(p, h, dtype=dtype)
    wx, new_stats = _norm(
        kind, p, stats, flat_n_global, wx, stat_axes, train
    )
    if wx.dtype == jnp.bfloat16:
        # the readout membrane recurrence always runs f32 (mirrors
        # models/snn.py ReadoutLayerSNN under AMP)
        wx = wx.astype(jnp.float32)
    alpha = jnp.clip(p["alpha"], *cells.ALPHA_LIM).astype(wx.dtype)
    B, Tl, C = wx.shape
    intra = cells.leaky_cumsum(wx, alpha, jnp.zeros((B, C), wx.dtype))
    drive = intra[:, -1, :]  # chunk-end membrane given a zero start
    a_pow_T = alpha ** Tl
    all_drive = jax.lax.all_gather(drive, axis)  # (S, B, C)

    def chain(u, d):
        return a_pow_T * u + d, u  # emit the state BEFORE the chunk

    if u0 is None:
        u0 = jnp.zeros((B, C), wx.dtype)
    else:
        u0 = u0.astype(wx.dtype)
    _, starts = jax.lax.scan(chain, u0, all_drive)
    u_start = starts[jax.lax.axis_index(axis)]
    j = jnp.arange(Tl, dtype=wx.dtype)[None, :, None]
    decay = jnp.exp((j + 1.0) * jnp.log(alpha)[None, None, :])
    us = decay * u_start[:, None, :] + intra
    return (
        jax.lax.psum(jnp.sum(jax.nn.softmax(us, axis=-1), axis=1), axis),
        new_stats,
    )


def _ann_readout(p, stats, kind, batch_n_global, h, axis, stat_axes,
                 train, dtype=None):
    """ANN readout across the sharded time axis: the time collapse
    (``sum_t softmax(h_t)``, reference anns.py:644-665) is a plain
    per-step reduction — local partial sums + one psum over 'seq' — and
    the linear + 2-D norm then run on the tiny (B, out) accumulator.
    The 2-D batchnorm statistics reduce over the batch shards only."""
    if h.dtype == jnp.bfloat16:
        h = h.astype(jnp.float32)  # mirrors cells.cumulative_softmax
    acc = jax.lax.psum(
        jnp.sum(jax.nn.softmax(h, axis=-1), axis=1), axis
    )
    out = _project(p, acc, dtype=dtype)
    batch_axes = tuple(a for a in (stat_axes if isinstance(
        stat_axes, tuple) else (stat_axes,)) if a != "seq")
    return _norm(kind, p, stats, batch_n_global, out, batch_axes, train)


def _build_seqpipe(
    model,
    mesh: Mesh,
    n_micro: int = 4,
    use_regularizers: bool = False,
    reg_factor: float = 0.5,
    reg_fmin: float = 0.01,
    reg_fmax: float = 0.5,
):
    """Build the (train, eval) step pair whose forwards run time-sharded
    over ``mesh``'s ``seq`` axis with pipelined recurrences.

    Same contract as ``train.steps.make_train_step`` (state, x, y) ->
    (state, metrics), with x placed via :func:`seq_batch_sharding`;
    dropout masks and uniform initial states are drawn from ``state.rng``
    per step (:func:`draw_noise` — the eval step takes the state key as
    an explicit ``rng`` argument like ``make_eval_step``). Restriction
    (asserted): readout layer on. Supports all eight model types (SNN
    and ANN families), unidirectional and bidirectional (the batch trick
    across the sharded time axis — see the module docstring).
    """
    if not model.use_readout_layer:
        raise ValueError("seq-pipeline step requires the readout layer")
    bidir = bool(model.bidirectional)
    is_snn = model.is_snn
    kind = model.normalization
    # AMP: mirror the model's compute_dtype exactly like the single-device
    # layers — bf16 projections everywhere; the recurrence runs in the
    # post-norm dtype (f32 under batch/layernorm, bf16 under 'none')
    cdt = getattr(model, "compute_dtype", None)
    n_hidden = model.num_layers - 1
    model_axis = "model" if "model" in mesh.axis_names else None
    n_model = mesh.shape["model"] if model_axis else 1
    if model_axis and any(
        h % n_model for h in model.layer_sizes[:-1]
    ):
        raise ValueError(
            f"hidden sizes {model.layer_sizes[:-1]} not divisible by the "
            f"'model' axis ({n_model})"
        )
    if is_snn:
        neuron = model.neuron_type
        threshold = model.threshold
    else:
        ann_type = model.ann_type
        gate_keys = {
            "MLP": ["W"], "RNN": ["W"], "LiGRU": ["W", "Wz"],
            "GRU": ["W", "Wz", "Wr"],
        }[ann_type]

    def _dedup(v):
        """Under TP the readout/rate computation is REDUNDANT across
        'model' (full inputs, replicated params). Rewriting the value as
        psum(v / n) leaves it unchanged but makes each device's AD
        contribution 1/n of the whole, so the replicated-param gradient
        transpose (a psum over every mesh axis) stays exact."""
        if model_axis is None:
            return v
        return jax.lax.psum(v / n_model, model_axis)

    def _snn_layer(p, stats, h, flat_n_global, stat_axes, train, new_stats,
                   name, states):
        wx, ns = _norm(
            kind, p, stats, flat_n_global,
            _project(p, h, model_axis=model_axis, dtype=cdt), stat_axes,
            train, model_axis=model_axis,
        )
        if ns is not None:
            new_stats[name] = {"norm": {"BatchNorm_0": ns}}
        Hl = wx.shape[-1]
        Hg = Hl * n_model
        # constants stay f32 here; the chunk scan casts them at point of
        # use so AMP grad accumulation matches the scan cells
        cp = _clamped(p, neuron, model_axis, Hl)
        adaptive = neuron in ("adLIF", "RadLIF")
        if states is not None:
            # membrane/adaptation slots live as feature shards; the spike
            # slot is carried feature-full (see _snn_chunk_scan). The
            # drawn noise always holds 3 slots (stable contract, zeros
            # w for non-adaptive cells); the pipeline carries only what
            # the cell reads.
            u0 = _shard_slice(states[0], model_axis, Hl).astype(wx.dtype)
            s0 = states[2].astype(wx.dtype)
            if adaptive:
                w0 = _shard_slice(
                    states[1], model_axis, Hl
                ).astype(wx.dtype)
                states = (u0, w0, s0)
            else:
                states = (u0, s0)
        widths = (Hl, Hl, Hg) if adaptive else (Hl, Hg)
        return _pipelined_recurrence(
            functools.partial(_snn_chunk_scan, neuron, cp, threshold,
                              model_axis=model_axis),
            widths, (wx,), "seq", n_micro, init_state=states,
            out_width=Hg,
        )

    def _ann_layer(p, stats, h, flat_n_global, stat_axes, train, new_stats,
                   name, states):
        wxs = []
        for gk in gate_keys:
            wx, ns = _norm(
                kind, p, stats, flat_n_global,
                _project(p, h, gk, model_axis=model_axis, dtype=cdt),
                stat_axes, train, norm_key=f"norm_{gk}",
                model_axis=model_axis,
            )
            if ns is not None:
                new_stats.setdefault(name, {})[f"norm_{gk}"] = {
                    "BatchNorm_0": ns
                }
            wxs.append(wx)
        Hl = wxs[0].shape[-1]
        Hg = Hl * n_model
        if ann_type == "MLP":
            # stateless: no pipeline needed; re-assemble the feature axis
            return _feature_gather(jax.nn.sigmoid(wxs[0]), model_axis)
        return _pipelined_recurrence(
            functools.partial(_ann_chunk_scan, ann_type, p,
                              model_axis=model_axis),
            (Hg,), tuple(wxs), "seq", n_micro, out_width=Hg,
        )

    def forward_local(params, batch_stats, x_local, noise, train,
                      flat_n_global, stat_axes, batch_n_global):
        h = x_local
        rate_sums = []
        new_stats = {}
        layer_fn = _snn_layer if is_snn else _ann_layer
        # bidirectional hidden layers see the doubled batch, so their BN
        # statistics average over 2*B*T rows (single-device semantics)
        flat_n_hidden = flat_n_global * (2.0 if bidir else 1.0)
        for i in range(n_hidden):
            name = f"layer_{i}"
            nz = noise.get(name, {})
            states = nz.get("states")
            if bidir:
                # reference batch trick (snns.py:252-254): the backward
                # half's data is globally time-flipped, so both halves
                # run time-FORWARD through the unchanged pipeline
                h = jnp.concatenate([h, _time_reverse(h, "seq")], axis=0)
                if states is not None:
                    # (2, B, w) per-direction slots -> (2B, w) rows in
                    # the doubled-batch order
                    states = tuple(
                        s.reshape(-1, s.shape[-1]) for s in states
                    )
            h = layer_fn(
                params[name], batch_stats.get(name, {}), h, flat_n_hidden,
                stat_axes, train, new_stats, name, states,
            )
            if bidir:
                # un-flip the backward half, concat on features
                # (snns.py:272-275); dropout then applies to the MERGED
                # (B, T, 2H) output like the single-device layer
                b = h.shape[0] // 2
                h = jnp.concatenate(
                    [h[:b], _time_reverse(h[b:], "seq")], axis=-1
                )
            if "mask" in nz:
                # layer-output dropout (scaled keep mask; the raw state
                # recurrence is never dropped — reference snns.py:278);
                # applied BEFORE the rate telemetry like the reference.
                # Keeps the stream dtype (flax Dropout semantics).
                h = (h * nz["mask"]).astype(h.dtype)
            if is_snn:
                # rates accumulate in f32 like the model (snn.py: a bf16
                # mean over B*T values loses ~1e-2)
                rate_sums.append(_dedup(
                    _psum(
                        jnp.sum(h.astype(jnp.float32), axis=(0, 1)),
                        stat_axes,
                    ) / flat_n_global
                ))
        # layer outputs are feature-full even under TP (the chunk scans
        # gather spikes/y per step), so the readout runs replicated
        # across 'model' with _dedup-corrected AD
        if is_snn:
            out, ns = _pipelined_readout(
                params["readout"], batch_stats.get("readout", {}), kind,
                flat_n_global, h, "seq", stat_axes, train,
                u0=noise.get("readout", {}).get("u0"), dtype=cdt,
            )
            rates = jnp.concatenate(rate_sums)
        else:
            out, ns = _ann_readout(
                params["readout"], batch_stats.get("readout", {}), kind,
                batch_n_global, h, "seq", stat_axes, train, dtype=cdt,
            )
            rates = jnp.zeros((1,), jnp.float32)
        if ns is not None:
            new_stats["readout"] = {"norm": {"BatchNorm_0": ns}}
        return _dedup(out), rates, new_stats

    from jax import shard_map

    has_data_axis = "data" in mesh.axis_names
    stat_axes = ("data", "seq") if has_data_axis else "seq"
    x_spec = (
        P("data", "seq", None) if has_data_axis else P(None, "seq", None)
    )
    b_spec = P("data", None) if has_data_axis else P(None, None)
    out_spec = P("data") if has_data_axis else P()
    uniform_init = (
        is_snn and getattr(model, "state_init", "zeros") == "uniform"
    )

    def _noise_specs(noise):
        # masks follow the time (and batch) axes like x; state arrays
        # follow the batch axis only (feature-full — the layers slice
        # their shards). Bidirectional state slots are (2, B, H) with the
        # batch on axis 1, so they need their own spec.
        state_spec = (
            P(None, "data", None) if has_data_axis else P(None, None, None)
        )

        def spec(path, v):
            names = [
                str(getattr(k, "key", getattr(k, "name", "")))
                for k in path
            ]
            if "mask" in names:
                return x_spec
            return state_spec if v.ndim == 3 else b_spec

        return jax.tree_util.tree_map_with_path(spec, noise)

    def _param_specs(params):
        """Per-leaf PartitionSpecs: hidden-layer weight matrices are
        column-sharded over 'model' (projection kernels on their output
        dim, V matrices on their column dim — both axis 1); everything
        else (per-feature vectors, readout, stats) stays replicated and
        is sliced inside. Without a 'model' axis: fully replicated."""
        if model_axis is None:
            return P()

        def spec(path, leaf):
            names = [
                str(getattr(k, "key", getattr(k, "name", "")))
                for k in path
            ]
            if names and names[0].startswith("layer_") and names[-1] in (
                "kernel", "V", "Vz", "Vr"
            ):
                return P(None, "model")
            return P()

        return jax.tree_util.tree_map_with_path(spec, params)

    def _fwd(params, batch_stats, x, noise, train):
        fwd = shard_map(
            functools.partial(
                forward_local,
                train=train,
                flat_n_global=float(x.shape[0] * x.shape[1]),
                stat_axes=stat_axes,
                batch_n_global=float(x.shape[0]),
            ),
            mesh=mesh,
            in_specs=(
                _param_specs(params), P(), x_spec, _noise_specs(noise)
            ),
            out_specs=(out_spec, P(), P()),
            check_vma=False,
        )
        return fwd(params, batch_stats, x, noise)

    def loss_and_metrics(params, batch_stats, x, y, noise):
        out, rates, new_stats = _fwd(params, batch_stats, x, noise, True)
        ce = optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
        loss = ce
        if use_regularizers and model.is_snn:
            loss = loss + reg_factor * (
                jax.nn.relu(reg_fmin - rates).sum()
                + jax.nn.relu(rates - reg_fmax).sum()
            )
        return loss, (ce, out, rates, new_stats)

    def train_step(state, x, y):
        # same key discipline as train.steps.make_train_step: one split of
        # state.rng per step; the noise sub-key feeds draw_noise, whose
        # global-shape draws make the step's numerics independent of the
        # mesh layout
        rng, noise_rng = jax.random.split(state.rng)
        noise = draw_noise(model, noise_rng, x.shape, train=True)

        def loss_fn(params):
            return loss_and_metrics(params, state.batch_stats, x, y, noise)

        grads, (ce, out, rates, new_stats) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        merged = (_merge_stats(state.batch_stats, new_stats)
                  if new_stats else state.batch_stats)
        new_state = state.apply_gradients(grads, merged).replace(rng=rng)
        pred = jnp.argmax(out, axis=-1)
        metrics = {
            "loss": ce,
            "acc": jnp.mean((pred == y).astype(jnp.float32)),
            "spike_rate": rates.mean() if model.is_snn else jnp.zeros(()),
        }
        return new_state, metrics

    def eval_step(state, x, y, rng=None):
        # 'uniform' state init draws even in eval (reference
        # snns.py:286-287); the key is explicit like make_eval_step's
        if uniform_init:
            if rng is None:
                raise ValueError(
                    "state_init='uniform' eval needs an rng argument"
                )
            noise = draw_noise(model, rng, x.shape, train=False)
        else:
            noise = {}
        out, rates, _ = _fwd(state.params, state.batch_stats, x, noise,
                             False)
        ce = optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
        pred = jnp.argmax(out, axis=-1)
        return {
            "loss": ce,
            "acc": jnp.mean((pred == y).astype(jnp.float32)),
            "spike_rate": rates.mean() if model.is_snn else jnp.zeros(()),
        }

    def predict(params, batch_stats, x, rng=None):
        # inference forward: the raw readout output (summed per-step
        # softmax posteriors for SNNs, logits for ANNs — exactly what the
        # single-chip Predictor normalizes), no labels/metrics
        if uniform_init:
            if rng is None:
                raise ValueError(
                    "state_init='uniform' inference needs an rng argument"
                )
            noise = draw_noise(model, rng, x.shape, train=False)
        else:
            noise = {}
        out, _, _ = _fwd(params, batch_stats, x, noise, False)
        return out

    # donate the input state like train.steps.make_train_step: without it
    # every step holds a second full copy of params + Adam moments on the
    # very path that exists for memory-constrained long sequences
    return (
        jax.jit(train_step, donate_argnums=(0,)),
        jax.jit(eval_step),
        jax.jit(predict),
    )


def make_seqpipe_train_step(model, mesh: Mesh, n_micro: int = 4, **kw):
    """Time-pipelined train step; see :func:`_build_seqpipe`."""
    return _build_seqpipe(model, mesh, n_micro, **kw)[0]


def make_seqpipe_eval_step(model, mesh: Mesh, n_micro: int = 4):
    """Time-pipelined eval step: ``(state, x, y) -> metrics`` with
    running BatchNorm statistics (the eval counterpart of
    :func:`make_seqpipe_train_step`)."""
    return _build_seqpipe(model, mesh, n_micro)[1]


def make_seqpipe_predict(model, mesh: Mesh, n_micro: int = 4):
    """Time-pipelined inference forward:
    ``(params, batch_stats, x[, rng]) -> readout output``.

    The serving counterpart of the step pair — long-sequence inference
    sharded over the mesh's ``seq`` (and optionally ``data``) axis with
    the same pipelined recurrence as training, so streaming-scale inputs
    that do not fit one chip's HBM serve across chips.
    ``sparch_tpu.serve.Predictor`` wraps this when given a mesh."""
    return _build_seqpipe(model, mesh, n_micro)[2]


def _merge_stats(old, new):
    """Overlay updated running stats onto the full batch_stats tree."""
    merged = jax.tree.map(lambda x: x, old)  # fresh dicts, same leaves

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                overlay(dst[k], v)
            else:
                dst[k] = v

    overlay(merged, new)
    return merged
