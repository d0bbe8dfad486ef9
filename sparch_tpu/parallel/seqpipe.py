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

Scope: unidirectional models (the whole SNN family AND the ANN family —
the ANN readout's time collapse is a plain reduction, and MLP layers are
stateless so only the recurrent cells pipeline) with a readout layer.
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

from sparch_tpu.ops import cells
from sparch_tpu.ops.surrogate import spike_boxcar

__all__ = [
    "make_seq_mesh",
    "seq_batch_sharding",
    "draw_noise",
    "make_seqpipe_train_step",
    "make_seqpipe_eval_step",
]

_EPS = 1e-5


def make_seq_mesh(devices=None, data: int = 1) -> Mesh:
    """Mesh with a time ('seq') axis, optionally composed with a batch
    ('data') axis: ``data > 1`` gives a ('data', 'seq') mesh where the
    batch shards over 'data' and each data group runs its own time
    pipeline over 'seq'."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if data == 1:
        return Mesh(devices, axis_names=("seq",))
    if devices.size % data != 0:
        raise ValueError(f"{devices.size} devices not divisible by {data}")
    return Mesh(
        devices.reshape(data, devices.size // data),
        axis_names=("data", "seq"),
    )


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
    {"u0": (B,C)}}`` with only the entries the model needs.
    """
    B, T = batch_shape[0], batch_shape[1]
    n_hidden = model.num_layers - 1
    uniform = (
        model.is_snn and getattr(model, "state_init", "zeros") == "uniform"
    )
    adaptive = model.is_snn and model.neuron_type in ("adLIF", "RadLIF")
    p = float(model.dropout) if train else 0.0
    noise = {}
    for i in range(n_hidden):
        h = model.layer_sizes[i]
        rng, k_m, k_s = jax.random.split(rng, 3)
        entry = {}
        if p > 0:
            keep = jax.random.bernoulli(k_m, 1.0 - p, (B, T, h))
            entry["mask"] = keep.astype(jnp.float32) / (1.0 - p)
        if uniform:
            # state slot order matches the chunk scan carry (u, w, s);
            # non-adaptive cells have no w (slot stays zero), mirroring
            # the model's _init_states draw count
            ks = jax.random.split(k_s, 3)
            entry["states"] = (
                jax.random.uniform(ks[0], (B, h)),
                jax.random.uniform(ks[1], (B, h)) if adaptive
                else jnp.zeros((B, h), jnp.float32),
                jax.random.uniform(ks[2], (B, h)),
            )
        if entry:
            noise[f"layer_{i}"] = entry
    if uniform:
        rng, k_r = jax.random.split(rng)
        noise["readout"] = {
            "u0": jax.random.uniform(k_r, (B, model.layer_sizes[-1]))
        }
    return noise


def _clamped(p, neuron):
    out = {"alpha": jnp.clip(p["alpha"], *cells.ALPHA_LIM)}
    if neuron in ("adLIF", "RadLIF"):
        out["beta"] = jnp.clip(p["beta"], *cells.BETA_LIM)
        out["a"] = jnp.clip(p["a"], *cells.A_LIM)
        out["b"] = jnp.clip(p["b"], *cells.B_LIM)
    if neuron in ("RLIF", "RadLIF"):
        out["V"] = cells.zero_diag(p["V"])
    return out


def _snn_chunk_scan(neuron, cp, threshold, wxs, state):
    """One SNN (mb, Tl, H) chunk from ``state``; returns (state, spikes)."""
    alpha = cp["alpha"]

    def stepf(carry, wx_t):
        u, w, sp = carry
        drive = wx_t[0]
        if neuron in ("RLIF", "RadLIF"):
            drive = drive + jnp.dot(sp, cp["V"])
        if neuron in ("adLIF", "RadLIF"):
            w = cp["beta"] * w + cp["a"] * u + cp["b"] * sp
            drive = drive - w
        u = alpha * (u - sp) + (1.0 - alpha) * drive
        sp = spike_boxcar(u - threshold)
        return (u, w, sp), sp

    state, spikes = jax.lax.scan(
        stepf, state, tuple(jnp.swapaxes(w, 0, 1) for w in wxs)
    )
    return state, jnp.swapaxes(spikes, 0, 1)


def _ann_chunk_scan(ann_type, p, wxs, state):
    """One ANN (mb, Tl, H) chunk; state is ``(y,)`` (reference
    anns.py:328-339,449-462,581-595 recurrences)."""

    def stepf(carry, wx_t):
        (y,) = carry
        if ann_type == "RNN":
            y = jax.nn.sigmoid(wx_t[0] + jnp.dot(y, p["V"]))
        elif ann_type == "LiGRU":
            z = jax.nn.sigmoid(wx_t[1] + jnp.dot(y, p["Vz"]))
            c = jax.nn.relu(wx_t[0] + jnp.dot(y, p["V"]))
            y = z * y + (1.0 - z) * c
        else:  # GRU
            z = jax.nn.sigmoid(wx_t[1] + jnp.dot(y, p["Vz"]))
            r = jax.nn.sigmoid(wx_t[2] + jnp.dot(y, p["Vr"]))
            c = jnp.tanh(wx_t[0] + jnp.dot(r * y, p["V"]))
            y = z * y + (1.0 - z) * c
        return (y,), y

    state, ys = jax.lax.scan(
        stepf, state, tuple(jnp.swapaxes(w, 0, 1) for w in wxs)
    )
    return state, jnp.swapaxes(ys, 0, 1)


def _pipelined_recurrence(chunk_fn, n_state, wxs, axis, n_micro,
                          init_state=None):
    """State-passing pipeline over the ``axis`` mesh dimension, generic
    over the cell (``chunk_fn(wxs_chunk, state) -> (state, outputs)``
    with ``n_state`` (mb, H) state slots).

    ``wxs``: per-gate (B, Tl, H) local time chunks of the normalized
    drive. Device s runs microbatch ``m = tick - s``; boundary states hop
    right after every tick. ``ppermute`` delivers zeros to device 0 —
    the fresh initial state each new microbatch needs — unless
    ``init_state`` (tuple of ``n_state`` (B, H) arrays, e.g. the uniform
    per-forward draw) supplies device 0's inbox per microbatch instead.
    """
    S = jax.lax.psum(1, axis)
    s_idx = jax.lax.axis_index(axis)
    B, Tl, H = wxs[0].shape
    M = n_micro
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"
    mb = B // M
    dtype = wxs[0].dtype
    Wxm = tuple(w.reshape(M, mb, Tl, H) for w in wxs)
    zeros_state = tuple(jnp.zeros((mb, H), dtype) for _ in range(n_state))
    init_m = None
    if init_state is not None:
        init_m = tuple(s.reshape(M, mb, H) for s in init_state)
    results0 = jnp.zeros((M, mb, Tl, H), dtype)
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
            results, (m_c, 0, 0, 0), (1, mb, Tl, H)
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
    return results.reshape(B, Tl, H)


def _psum(v, axes):
    if not axes:
        return v
    return jax.lax.psum(v, axes)


def _norm(kind, p, stats, flat_n_global, wx, stat_axes, train,
          norm_key="norm"):
    """Normalization over the globally-flattened (B*T, H) sequence; batch
    statistics reduce with one psum over the mesh axes the sequence is
    sharded on ('seq', plus 'data' on a composite mesh — global-batch
    stats like the jit path). Returns (normalized wx, updated running
    stats or None)."""
    if kind == "batchnorm":
        bn_p = p[norm_key]["BatchNorm_0"]
        bn_s = stats[norm_key]["BatchNorm_0"]
        if train:
            flat = wx.reshape(-1, wx.shape[-1])
            ssum = _psum(jnp.sum(flat, axis=0), stat_axes)
            ssum2 = _psum(
                jnp.sum(jax.lax.square(flat), axis=0), stat_axes
            )
            mean = ssum / flat_n_global
            var = ssum2 / flat_n_global - jax.lax.square(mean)
            new_stats = {
                "mean": 0.95 * bn_s["mean"] + 0.05 * mean,
                "var": 0.95 * bn_s["var"] + 0.05 * var,
            }
        else:
            mean, var = bn_s["mean"], bn_s["var"]
            new_stats = None
        inv = jax.lax.rsqrt(var + _EPS)
        return (wx - mean) * inv * bn_p["scale"] + bn_p["bias"], new_stats
    if kind == "layernorm":
        ln = p[norm_key]["LayerNorm_0"]
        mean = wx.mean(axis=-1, keepdims=True)
        var = ((wx - mean) ** 2).mean(axis=-1, keepdims=True)
        return (
            (wx - mean) * jax.lax.rsqrt(var + _EPS) * ln["scale"]
            + ln["bias"],
            None,
        )
    return wx, None


def _project(p, h, w_key="W"):
    wx = jnp.dot(h, p[w_key]["kernel"])
    if "bias" in p[w_key]:
        wx = wx + p[w_key]["bias"]
    return wx


def _pipelined_readout(p, stats, kind, flat_n_global, h, axis, stat_axes,
                       train, u0=None):
    """Leaky readout across the sharded time axis in closed form: the
    membrane recurrence is linear, so each device only needs its chunk's
    start state — an S-step scan over all_gather'ed per-chunk boundary
    drives seeded with ``u0`` (the uniform per-forward membrane start, or
    zeros) — and the softmax time-sum reduces with one psum."""
    wx = _project(p, h)
    wx, new_stats = _norm(
        kind, p, stats, flat_n_global, wx, stat_axes, train
    )
    alpha = jnp.clip(p["alpha"], *cells.ALPHA_LIM)
    B, Tl, C = wx.shape
    intra = cells.leaky_cumsum(wx, alpha, jnp.zeros((B, C), wx.dtype))
    drive = intra[:, -1, :]  # chunk-end membrane given a zero start
    a_pow_T = alpha ** Tl
    all_drive = jax.lax.all_gather(drive, axis)  # (S, B, C)

    def chain(u, d):
        return a_pow_T * u + d, u  # emit the state BEFORE the chunk

    if u0 is None:
        u0 = jnp.zeros((B, C), wx.dtype)
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
                 train):
    """ANN readout across the sharded time axis: the time collapse
    (``sum_t softmax(h_t)``, reference anns.py:644-665) is a plain
    per-step reduction — local partial sums + one psum over 'seq' — and
    the linear + 2-D norm then run on the tiny (B, out) accumulator.
    The 2-D batchnorm statistics reduce over the batch shards only."""
    acc = jax.lax.psum(
        jnp.sum(jax.nn.softmax(h, axis=-1), axis=1), axis
    )
    out = _project(p, acc)
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
    an explicit ``rng`` argument like ``make_eval_step``). Restrictions
    (asserted): unidirectional, readout layer on. Supports all eight
    model types (SNN and ANN families).
    """
    if model.bidirectional:
        raise ValueError("bidirectional models cannot shard the time axis")
    if not model.use_readout_layer:
        raise ValueError("seq-pipeline step requires the readout layer")
    is_snn = model.is_snn
    kind = model.normalization
    n_hidden = model.num_layers - 1
    if is_snn:
        neuron = model.neuron_type
        threshold = model.threshold
    else:
        ann_type = model.ann_type
        gate_keys = {
            "MLP": ["W"], "RNN": ["W"], "LiGRU": ["W", "Wz"],
            "GRU": ["W", "Wz", "Wr"],
        }[ann_type]

    def _snn_layer(p, stats, h, flat_n_global, stat_axes, train, new_stats,
                   name, states):
        wx, ns = _norm(
            kind, p, stats, flat_n_global, _project(p, h), stat_axes, train
        )
        if ns is not None:
            new_stats[name] = {"norm": {"BatchNorm_0": ns}}
        cp = _clamped(p, neuron)
        return _pipelined_recurrence(
            functools.partial(_snn_chunk_scan, neuron, cp, threshold),
            3, (wx,), "seq", n_micro, init_state=states,
        )

    def _ann_layer(p, stats, h, flat_n_global, stat_axes, train, new_stats,
                   name, states):
        wxs = []
        for gk in gate_keys:
            wx, ns = _norm(
                kind, p, stats, flat_n_global, _project(p, h, gk),
                stat_axes, train, norm_key=f"norm_{gk}",
            )
            if ns is not None:
                new_stats.setdefault(name, {})[f"norm_{gk}"] = {
                    "BatchNorm_0": ns
                }
            wxs.append(wx)
        if ann_type == "MLP":
            return jax.nn.sigmoid(wxs[0])  # stateless: no pipeline needed
        return _pipelined_recurrence(
            functools.partial(_ann_chunk_scan, ann_type, p),
            1, tuple(wxs), "seq", n_micro,
        )

    def forward_local(params, batch_stats, x_local, noise, train,
                      flat_n_global, stat_axes, batch_n_global):
        h = x_local
        rate_sums = []
        new_stats = {}
        layer_fn = _snn_layer if is_snn else _ann_layer
        for i in range(n_hidden):
            name = f"layer_{i}"
            nz = noise.get(name, {})
            h = layer_fn(
                params[name], batch_stats.get(name, {}), h, flat_n_global,
                stat_axes, train, new_stats, name, nz.get("states"),
            )
            if "mask" in nz:
                # layer-output dropout (scaled keep mask; the raw state
                # recurrence is never dropped — reference snns.py:278);
                # applied BEFORE the rate telemetry like the reference
                h = h * nz["mask"]
            if is_snn:
                rate_sums.append(
                    _psum(jnp.sum(h, axis=(0, 1)), stat_axes)
                    / flat_n_global
                )
        if is_snn:
            out, ns = _pipelined_readout(
                params["readout"], batch_stats.get("readout", {}), kind,
                flat_n_global, h, "seq", stat_axes, train,
                u0=noise.get("readout", {}).get("u0"),
            )
            rates = jnp.concatenate(rate_sums)
        else:
            out, ns = _ann_readout(
                params["readout"], batch_stats.get("readout", {}), kind,
                batch_n_global, h, "seq", stat_axes, train,
            )
            rates = jnp.zeros((1,), jnp.float32)
        if ns is not None:
            new_stats["readout"] = {"norm": {"BatchNorm_0": ns}}
        return out, rates, new_stats

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
        # masks follow the time (and batch) axes like x; (B, H) state
        # arrays follow the batch axis only
        return jax.tree.map(
            lambda v: x_spec if v.ndim == 3 else b_spec, noise
        )

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
            in_specs=(P(), P(), x_spec, _noise_specs(noise)),
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
        merged = jax.tree.map(lambda s: s, state.batch_stats)
        if new_stats:
            merged = _merge_stats(state.batch_stats, new_stats)
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

    # donate the input state like train.steps.make_train_step: without it
    # every step holds a second full copy of params + Adam moments on the
    # very path that exists for memory-constrained long sequences
    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


def make_seqpipe_train_step(model, mesh: Mesh, n_micro: int = 4, **kw):
    """Time-pipelined train step; see :func:`_build_seqpipe`."""
    return _build_seqpipe(model, mesh, n_micro, **kw)[0]


def make_seqpipe_eval_step(model, mesh: Mesh, n_micro: int = 4):
    """Time-pipelined eval step: ``(state, x, y) -> metrics`` with
    running BatchNorm statistics (the eval counterpart of
    :func:`make_seqpipe_train_step`)."""
    return _build_seqpipe(model, mesh, n_micro)[1]


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
