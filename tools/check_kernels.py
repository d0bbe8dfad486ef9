#!/usr/bin/env python
"""On-device kernel-correctness harness: compiled Pallas vs lax.scan.

The interpret-mode tests (tests/test_pallas.py, test_pallas_ann.py) pin
kernel==scan semantics on CPU, but two code paths exist ONLY in compiled
Mosaic on a real TPU: the hardware-PRNG fused dropout
(pltpu.prng_random_bits — the interpret path uses a hash fallback) and
the deliberate out-of-bounds tail reads (T not padded; the tail chunk
reads garbage that the kernels must sanitise). This tool runs every
fused op on the CURRENT backend (run it on the real chip) and asserts
forward values and ALL gradients against the scan cells:

- per spiking cell (LIF/adLIF/RLIF/RadLIF): plain; a stress case with
  the affine fold + prime T (tail chunk live) + B=136 (17 batch tiles,
  cross-tile accumulators); fused dropout (mask extracted on-device via
  an all-spiking drive, then checked against an explicit-mask scan
  oracle for values AND gradients — this is what catches a fwd/bwd
  hw-PRNG regeneration mismatch); bf16-MXU mode for the recurrent cells.
- readout: plain + prime-T stress vs the sequential scan oracle.
- ANN cells (RNN/LiGRU/GRU): plain; stress (per-gate affine + prime T +
  multi-tile); fused dropout (same extraction trick — sigmoid/tanh
  outputs are strictly positive under a positive drive); bf16 mode.

Recurrent spiking cases quantise V to multiples of 1/64 so s @ V (s is
0/1) is exact under ANY matmul precision — the forward must then match
the scan bit-for-bit in the spike train regardless of how Mosaic vs XLA
decompose f32 MXU passes; gradient comparisons tolerate backward-matmul
rounding only.

Usage:  python tools/check_kernels.py [--only SUBSTR] [--json out.json]
Exit status is non-zero if any case fails. Expect ~30-60 s of remote
compile per case cold; the persistent compile cache makes reruns fast.
"""
import argparse
import contextlib
import zlib
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sparch_tpu.utils.cache import enable_compile_cache  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sparch_tpu.ops import cells, pallas_ann, pallas_cells  # noqa: E402

EPS = 1e-12


def _rel(a, b):
    """max |a-b| / max|b| — scale-free gradient comparison."""
    return jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + EPS)


def _relmean(a, b):
    """sum |a-b| / sum|b| — insensitive to the handful of O(1) outliers a
    genuinely lower-precision mode produces when a tiny forward difference
    flips a discrete gate (relu kink, spike threshold)."""
    return jnp.sum(jnp.abs(a - b)) / (jnp.sum(jnp.abs(b)) + EPS)


def _oracle_precision(loose):
    """Scan-oracle matmul precision: full f32 normally; default when the
    highest-precision VJP itself would exceed VMEM (wide ANN layers)."""
    if loose:
        return contextlib.nullcontext()
    return jax.default_matmul_precision("highest")


def _weights(shape):
    """Non-uniform loss weights so every cotangent path is exercised."""
    if len(shape) == 1:
        w = np.linspace(0.5, 1.5, shape[0])
    else:
        T, H = shape
        w = np.linspace(1.0, 2.0, T)[:, None] * np.linspace(0.5, 1.5, H)
    return jnp.asarray(w, jnp.float32)


def _quantized(rng, n, m, scale=0.5, step=64):
    """Matrix of multiples of 1/step in [-scale, scale]: products with 0/1
    spikes and their f32 accumulation are exact in every MXU mode."""
    k = rng.integers(-int(scale * step), int(scale * step) + 1, (n, m))
    return jnp.asarray(k / step, jnp.float32)


def _spiking_data(rng, B, T, H):
    return dict(
        Wx=jnp.asarray(rng.uniform(-3, 3, (B, T, H)), jnp.float32),
        alpha=jnp.asarray(rng.uniform(0.82, 0.96, H), jnp.float32),
        beta=jnp.asarray(rng.uniform(0.97, 0.99, H), jnp.float32),
        a=jnp.asarray(rng.uniform(-1, 1, H), jnp.float32),
        b=jnp.asarray(rng.uniform(0, 2, H), jnp.float32),
        V=_quantized(rng, H, H),
        u0=jnp.asarray(rng.uniform(0, 1, (B, H)), jnp.float32),
        w0=jnp.asarray(rng.uniform(0, 1, (B, H)), jnp.float32),
        s0=jnp.asarray(rng.random((B, H)) < 0.3, jnp.float32),
        scale=jnp.asarray(rng.uniform(0.6, 1.4, H), jnp.float32),
        shift=jnp.asarray(rng.uniform(-0.3, 0.3, H), jnp.float32),
    )


_SPIKING = {
    # variant -> (diff arg names, recurrent, adaptive)
    "lif": (("Wx", "alpha", "u0", "s0"), False, False),
    "adlif": (("Wx", "alpha", "beta", "a", "b", "u0", "w0", "s0"),
              False, True),
    "rlif": (("Wx", "alpha", "V", "u0", "s0"), True, False),
    "radlif": (("Wx", "alpha", "beta", "a", "b", "V", "u0", "w0", "s0"),
               True, True),
}

THR = 1.0


def _spiking_fns(variant, *, affine, drop, seed, bf16):
    """(pallas_fn, scan_fn) over the variant's diff-arg tuple. The scan
    oracle applies the affine outside (scale*Wx + shift)."""
    names, recurrent, _ = _SPIKING[variant]

    def reorder(kw):
        if variant == "lif":
            return (kw["Wx"], kw["alpha"], THR, kw["u0"], kw["s0"])
        if variant == "adlif":
            return (kw["Wx"], kw["alpha"], kw["beta"], kw["a"], kw["b"],
                    THR, kw["u0"], kw["w0"], kw["s0"])
        if variant == "rlif":
            return (kw["Wx"], kw["alpha"], kw["V"], THR, kw["u0"], kw["s0"])
        return (kw["Wx"], kw["alpha"], kw["beta"], kw["a"], kw["b"],
                kw["V"], THR, kw["u0"], kw["w0"], kw["s0"])

    pall = getattr(pallas_cells, f"{variant}_pallas")
    scan = getattr(cells, f"{variant}_scan")

    def pallas_fn(kw, sc=None, sh=None):
        extra = {}
        if affine:
            extra = dict(scale=sc, shift=sh)
        if drop > 0:
            extra.update(drop_rate=drop, drop_seed=seed)
        if bf16:
            extra.update(mxu_bf16=True)
        return pall(*reorder(kw), **extra)

    def scan_fn(kw, sc=None, sh=None):
        kw = dict(kw)
        if affine:
            kw["Wx"] = sc * kw["Wx"] + sh
        return scan(*reorder(kw))

    return names, pallas_fn, scan_fn


def spiking_case(variant, *, B, T, H, affine=False, bf16=False):
    """plain/stress/bf16 spiking comparisons (no dropout)."""
    rng = np.random.default_rng(zlib.crc32(variant.encode()))
    d = _spiking_data(rng, B, T, H)
    names, pallas_fn, scan_fn = _spiking_fns(
        variant, affine=affine, drop=0.0, seed=None, bf16=bf16
    )
    wgt = _weights((T, H))

    @jax.jit
    def metrics():
        sc, sh = (d["scale"], d["shift"]) if affine else (None, None)

        def loss(fn):
            def inner(*args):
                kw = dict(zip(names, args))
                for k in d:
                    kw.setdefault(k, d[k])
                return (fn(kw, sc, sh) * wgt).sum()
            return inner

        args = tuple(d[n] for n in names)
        out_p = pallas_fn(dict(d), sc, sh)
        gp = jax.grad(loss(pallas_fn), argnums=tuple(range(len(args))))(*args)
        # scan oracle at full-f32 matmul precision to match the Mosaic
        # kernels (the TPU default truncates f32 matmul inputs to bf16);
        # scoped to the scan side only — a HIGHEST attr on the kernels'
        # own bf16 dots is rejected by Mosaic
        with jax.default_matmul_precision("highest"):
            out_s = scan_fn(dict(d), sc, sh)
            gs = jax.grad(loss(scan_fn),
                          argnums=tuple(range(len(args))))(*args)
        m = {
            "spike_agree": jnp.mean((out_p == out_s).astype(jnp.float32)),
            "fwd_finite": jnp.all(jnp.isfinite(out_p)).astype(jnp.float32),
        }
        for n, x, y in zip(names, gp, gs):
            m[f"g_{n}"] = _rel(x, y)
        m["grads_finite"] = functools.reduce(
            jnp.logical_and, [jnp.all(jnp.isfinite(x)) for x in gp]
        ).astype(jnp.float32)
        return m

    m = {k: float(v) for k, v in metrics().items()}
    fails = []
    agree_lim = 0.99 if bf16 else 0.99999
    grad_lim = 0.1 if bf16 else 1e-4
    if m["spike_agree"] < agree_lim:
        fails.append(f"spike_agree={m['spike_agree']:.6f}<{agree_lim}")
    if not m["fwd_finite"] or not m["grads_finite"]:
        fails.append("non-finite values")
    worst = max((v, k) for k, v in m.items() if k.startswith("g_"))
    if worst[0] > grad_lim:
        fails.append(f"grad {worst[1]}={worst[0]:.2e}>{grad_lim}")
    m["worst_grad"] = worst[0]
    return m, fails


def spiking_dropout_case(variant, *, B, T, H, p=0.3, bf16=False):
    """Fused dropout on the real hw-PRNG path. The keep mask depends only
    on (seed, batch tile, timestep, element) — never on the data — so it
    is extracted on-device from a second forward whose drive pins every
    neuron above threshold (out > 0 <=> kept), with identical shapes so
    the tile plan matches. Values and gradients must then equal the
    explicit-mask scan oracle; a fwd/bwd mask-regeneration mismatch shows
    up as a gradient error here."""
    rng = np.random.default_rng(zlib.crc32((variant + "drop").encode()))
    d = _spiking_data(rng, B, T, H)
    names, pallas_fn, scan_fn = _spiking_fns(
        variant, affine=False, drop=p, seed=jnp.array([5, 11], jnp.int32),
        bf16=bf16,
    )
    wgt = _weights((T, H))

    # extraction drive: u pinned at thr + 0.2 -> every neuron fires every
    # step (uses the LIF recurrence; the mask only keys on shapes/seed and
    # the batch-tile plan, which is common to all spiking cells)
    alpha_c = jnp.clip(d["alpha"], *cells.ALPHA_LIM)
    wx_row = (THR + 0.2) + alpha_c / (1.0 - alpha_c)
    wx_pin = jnp.broadcast_to(wx_row, (B, T, H)).astype(jnp.float32)
    u0_pin = jnp.full((B, H), THR + 0.2, jnp.float32)
    s0_pin = jnp.ones((B, H), jnp.float32)

    @jax.jit
    def metrics():
        ext = pallas_cells.lif_pallas(
            wx_pin, d["alpha"], THR, u0_pin, s0_pin,
            drop_rate=p, drop_seed=jnp.array([5, 11], jnp.int32),
        )
        ext2 = pallas_cells.lif_pallas(
            wx_pin, d["alpha"], THR, u0_pin, s0_pin,
            drop_rate=p, drop_seed=jnp.array([5, 11], jnp.int32),
        )
        ext_other = pallas_cells.lif_pallas(
            wx_pin, d["alpha"], THR, u0_pin, s0_pin,
            drop_rate=p, drop_seed=jnp.array([6, 11], jnp.int32),
        )
        mask = jax.lax.stop_gradient((ext > 0).astype(jnp.float32))

        def loss_fused(*args):
            kw = dict(zip(names, args))
            for k in d:
                kw.setdefault(k, d[k])
            return (pallas_fn(kw) * wgt).sum()

        def loss_oracle(*args):
            kw = dict(zip(names, args))
            for k in d:
                kw.setdefault(k, d[k])
            return (scan_fn(kw) * mask / (1.0 - p) * wgt).sum()

        args = tuple(d[n] for n in names)
        out_f = pallas_fn(dict(d)).astype(jnp.float32)
        gp = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
        with jax.default_matmul_precision("highest"):  # see spiking_case
            out_o = scan_fn(dict(d)) * mask / (1.0 - p)
            gs = jax.grad(loss_oracle,
                          argnums=tuple(range(len(args))))(*args)
        m = {
            "fwd_max_abs": jnp.max(jnp.abs(out_f - out_o)),
            "deterministic": jnp.all(ext == ext2).astype(jnp.float32),
            "seed_sensitive": jnp.any(ext != ext_other).astype(jnp.float32),
            "keep_frac": jnp.mean((ext > 0).astype(jnp.float32)),
            "fwd_finite": jnp.all(jnp.isfinite(out_f)).astype(jnp.float32),
        }
        for n, x, y in zip(names, gp, gs):
            m[f"g_{n}"] = _rel(x, y)
        m["grads_finite"] = functools.reduce(
            jnp.logical_and, [jnp.all(jnp.isfinite(x)) for x in gp]
        ).astype(jnp.float32)
        return m

    m = {k: float(v) for k, v in metrics().items()}
    fails = []
    # with bf16 streams the kept values s/(1-p) round to bf16 (one ulp of
    # ~1.4 at p=0.3); the dropout-free spikes stay exact
    fwd_lim = 5e-3 if bf16 else 1e-5
    grad_lim = 0.05 if bf16 else 1e-4
    if m["fwd_max_abs"] > fwd_lim:
        fails.append(f"fwd_max_abs={m['fwd_max_abs']:.2e}")
    if not m["deterministic"]:
        fails.append("dropout not deterministic per seed")
    if not m["seed_sensitive"]:
        fails.append("mask ignores the seed")
    if abs(m["keep_frac"] - (1 - p)) > 0.02:
        fails.append(f"keep_frac={m['keep_frac']:.3f} vs {1 - p}")
    if not m["fwd_finite"] or not m["grads_finite"]:
        fails.append("non-finite values")
    worst = max((v, k) for k, v in m.items() if k.startswith("g_"))
    if worst[0] > grad_lim:
        fails.append(f"grad {worst[1]}={worst[0]:.2e}>{grad_lim}")
    m["worst_grad"] = worst[0]
    return m, fails


def tp_case(variant, *, B, T, H, bf16=False):
    """P=1 tensor-parallel fused cells on the CURRENT backend: compiles
    the in-kernel collective machinery (the remote DMAs degenerate to
    self-copies at num_devices=1 — the only TP configuration a single
    chip can run) and checks the forward + ALL gradients against the
    scan cells. Multi-device semantics are pinned on the virtual CPU
    mesh (tests/test_pallas_tp.py); no multi-chip TPU exists in this
    environment (ops/pallas_tp.py module docstring)."""
    from jax.sharding import Mesh  # noqa: E402

    from sparch_tpu.ops import pallas_tp  # noqa: E402

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("model",))
    rng = np.random.default_rng(zlib.crc32(f"tp-{variant}".encode()))
    d = _spiking_data(rng, B, T, H)
    names = _SPIKING[variant][0]
    tp_fn = getattr(pallas_tp, f"{variant}_tp_sharded")
    scan = getattr(cells, f"{variant}_scan")

    def reorder(kw):
        if variant == "rlif":
            return (kw["Wx"], kw["alpha"], kw["V"], THR, kw["u0"], kw["s0"])
        return (kw["Wx"], kw["alpha"], kw["beta"], kw["a"], kw["b"],
                kw["V"], THR, kw["u0"], kw["w0"], kw["s0"])

    def pallas_fn(kw):
        return tp_fn(mesh, *reorder(kw), tp_axis="model", batch_axis=None,
                     mxu_bf16=bf16)

    def scan_fn(kw):
        return scan(*reorder(kw))

    wgt = _weights((T, H))

    @jax.jit
    def metrics():
        def loss(fn):
            def inner(*args):
                kw = dict(zip(names, args))
                for k in d:
                    kw.setdefault(k, d[k])
                return (fn(kw) * wgt).sum()
            return inner

        args = tuple(d[n] for n in names)
        out_p = pallas_fn(dict(d))
        gp = jax.grad(loss(pallas_fn), argnums=tuple(range(len(args))))(*args)
        with jax.default_matmul_precision("highest"):
            out_s = scan_fn(dict(d))
            gs = jax.grad(loss(scan_fn),
                          argnums=tuple(range(len(args))))(*args)
        m = {
            "spike_agree": jnp.mean((out_p == out_s).astype(jnp.float32)),
            "fwd_finite": jnp.all(jnp.isfinite(out_p)).astype(jnp.float32),
        }
        for n, x, y in zip(names, gp, gs):
            m[f"g_{n}"] = _rel(x, y)
        m["grads_finite"] = functools.reduce(
            jnp.logical_and, [jnp.all(jnp.isfinite(x)) for x in gp]
        ).astype(jnp.float32)
        return m

    m = {k: float(v) for k, v in metrics().items()}
    fails = []
    agree_lim = 0.99 if bf16 else 0.99999
    grad_lim = 0.1 if bf16 else 1e-4
    if m["spike_agree"] < agree_lim:
        fails.append(f"spike_agree={m['spike_agree']:.6f}<{agree_lim}")
    if not m["fwd_finite"] or not m["grads_finite"]:
        fails.append("non-finite values")
    worst = max((v, k) for k, v in m.items() if k.startswith("g_"))
    if worst[0] > grad_lim:
        fails.append(f"grad {worst[1]}={worst[0]:.2e}>{grad_lim}")
    m["worst_grad"] = worst[0]
    return m, fails


def ann_tp_case(mode, *, B, T, H, bf16=False):
    """P=1 tensor-parallel fused ANN cells (RNN/LiGRU/GRU) on the
    CURRENT backend: compiles the in-kernel collective machinery (the
    remote DMAs degenerate to self-copies at num_devices=1, incl. the
    GRU's two-exchange steps and the stacked backward exchange) and
    checks the forward + ALL gradients against the scan cells.
    Multi-device semantics are pinned on the virtual CPU mesh
    (tests/test_pallas_tp_ann.py)."""
    from jax.sharding import Mesh  # noqa: E402

    from sparch_tpu.ops import pallas_tp_ann  # noqa: E402

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("model",))
    rng = np.random.default_rng(zlib.crc32(f"anntp-{mode}".encode()))
    d = _ann_data(rng, mode, B, T, H)
    wx_names, v_names = _ANN[mode]
    names = wx_names + v_names + ("y0",)
    tp_fn = getattr(pallas_tp_ann, f"{mode}_tp_sharded")
    scan = getattr(cells, f"{mode}_scan")
    wgt = _weights((T, H))

    def pallas_fn(kw):
        a = [kw[n] for n in wx_names] + [kw[n] for n in v_names] + [
            kw["y0"]
        ]
        return tp_fn(mesh, *a, tp_axis="model", batch_axis=None,
                     mxu_bf16=bf16)

    def scan_fn(kw):
        return scan(*[kw[n] for n in names])

    @jax.jit
    def metrics():
        args = tuple(d[n] for n in names)

        def loss(fn):
            def inner(*a):
                kw = dict(zip(names, a))
                return (fn(kw).astype(jnp.float32) * wgt).sum()
            return inner

        out_p = pallas_fn(dict(d)).astype(jnp.float32)
        gp = jax.grad(loss(pallas_fn),
                      argnums=tuple(range(len(names))))(*args)
        with jax.default_matmul_precision("highest"):
            out_s = scan_fn(dict(d))
            gs = jax.grad(loss(scan_fn),
                          argnums=tuple(range(len(names))))(*args)
        m = {
            "fwd_rel": _rel(out_p, out_s),
            "fwd_finite": jnp.all(jnp.isfinite(out_p)).astype(jnp.float32),
        }
        gmetric = _relmean if bf16 else _rel
        for n, x, y in zip(names, gp, gs):
            m[f"g_{n}"] = gmetric(x.astype(jnp.float32), y)
        m["grads_finite"] = functools.reduce(
            jnp.logical_and,
            [jnp.all(jnp.isfinite(x.astype(jnp.float32))) for x in gp],
        ).astype(jnp.float32)
        return m

    m = {k: float(v) for k, v in metrics().items()}
    fails = []
    fwd_lim = 0.03 if bf16 else 1e-5
    grad_lim = 0.02 if bf16 else 1e-4
    if m["fwd_rel"] > fwd_lim:
        fails.append(f"fwd_rel={m['fwd_rel']:.2e}>{fwd_lim}")
    if not m["fwd_finite"] or not m["grads_finite"]:
        fails.append("non-finite values")
    worst = max((v, k) for k, v in m.items() if k.startswith("g_"))
    if worst[0] > grad_lim:
        fails.append(f"grad {worst[1]}={worst[0]:.2e}>{grad_lim}")
    m["worst_grad"] = worst[0]
    return m, fails


def readout_case(*, B, T, H):
    rng = np.random.default_rng(99)
    Wx = jnp.asarray(rng.uniform(-3, 3, (B, T, H)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.82, 0.96, H), jnp.float32)
    u0 = jnp.asarray(rng.uniform(0, 1, (B, H)), jnp.float32)
    wgt = _weights((H,))[None]

    @jax.jit
    def metrics():
        def loss(fn):
            return lambda *a: (fn(*a) * wgt).sum()

        out_p = pallas_cells.readout_pallas(Wx, alpha, u0)
        gp = jax.grad(loss(pallas_cells.readout_pallas), argnums=(0, 1, 2))(
            Wx, alpha, u0
        )
        with jax.default_matmul_precision("highest"):  # see spiking_case
            out_s = cells.readout_sum_scan(Wx, alpha, u0)
            gs = jax.grad(loss(cells.readout_sum_scan), argnums=(0, 1, 2))(
                Wx, alpha, u0
            )
        m = {
            "fwd_rel": _rel(out_p, out_s),
            "fwd_finite": jnp.all(jnp.isfinite(out_p)).astype(jnp.float32),
        }
        for n, x, y in zip(("Wx", "alpha", "u0"), gp, gs):
            m[f"g_{n}"] = _rel(x, y)
        m["grads_finite"] = functools.reduce(
            jnp.logical_and, [jnp.all(jnp.isfinite(x)) for x in gp]
        ).astype(jnp.float32)
        return m

    m = {k: float(v) for k, v in metrics().items()}
    fails = []
    if m["fwd_rel"] > 1e-5:
        fails.append(f"fwd_rel={m['fwd_rel']:.2e}")
    if not m["fwd_finite"] or not m["grads_finite"]:
        fails.append("non-finite values")
    worst = max((v, k) for k, v in m.items() if k.startswith("g_"))
    if worst[0] > 1e-4:
        fails.append(f"grad {worst[1]}={worst[0]:.2e}>1e-4")
    m["worst_grad"] = worst[0]
    return m, fails


_ANN = {
    # mode -> (wx stream names, V names)
    "rnn": (("Wx",), ("V",)),
    "ligru": (("Wx", "Wzx"), ("V", "Vz")),
    "gru": (("Wx", "Wzx", "Wrx"), ("V", "Vz", "Vr")),
}


def _ann_data(rng, mode, B, T, H):
    wx_names, v_names = _ANN[mode]
    d = {}
    for n in wx_names:
        d[n] = jnp.asarray(rng.uniform(-0.8, 0.8, (B, T, H)), jnp.float32)
    for n in v_names:
        d[n] = jnp.asarray(rng.uniform(-0.15, 0.15, (H, H)), jnp.float32)
    d["y0"] = jnp.asarray(rng.uniform(0, 1, (B, H)), jnp.float32)
    d["scales"] = [
        jnp.asarray(rng.uniform(0.8, 1.2, H), jnp.float32) for _ in wx_names
    ]
    d["shifts"] = [
        jnp.asarray(rng.uniform(-0.1, 0.1, H), jnp.float32) for _ in wx_names
    ]
    return d


def ann_case(mode, *, B, T, H, affine=False, bf16=False, drop=0.0,
             p_seed=17, loose=False, wx_bf16=False, v_scale=1.0):
    """``loose``: compare at default matmul precision with the mean-based
    grad metric — used at H >= 1536, where the highest-precision scan
    oracle's own VJP exceeds VMEM (f32 6-pass matmul windows).

    ``wx_bf16``: feed the kernel bf16 Wx input streams (the models'
    end-to-end bf16 gate streams, ann.py _gate_projections). The data is
    pre-rounded to bf16 so both sides see identical drive values; the
    pallas side exercises the bf16 loads and returns bf16 dWx
    cotangents (upcast through the in-test cast's VJP)."""
    rng = np.random.default_rng(zlib.crc32((mode + "ann").encode()))
    d = _ann_data(rng, mode, B, T, H)
    wx_names, v_names = _ANN[mode]
    if v_scale != 1.0:
        # keep the recurrence gain ~1 at wide H: U(-.15,.15) rows have
        # norm ~0.15*sqrt(H/3) (~1 at the H=128 baseline, ~3.4 at 1536);
        # an exploding relu recurrence amplifies bf16 input rounding to
        # O(1) trajectory divergence, which would measure conditioning,
        # not kernel correctness
        for n in v_names:
            d[n] = d[n] * v_scale
    if wx_bf16:
        for n in wx_names:
            d[n] = d[n].astype(jnp.bfloat16).astype(jnp.float32)
    names = wx_names + v_names + ("y0",)
    pall = getattr(pallas_ann, f"{mode}_pallas")
    scan = getattr(cells, f"{mode}_scan")
    wgt = _weights((T, H))
    seed = jnp.array([p_seed, 3], jnp.int32)

    def pallas_fn(kw):
        extra = {}
        if affine:
            extra = dict(scales=d["scales"], shifts=d["shifts"])
        if bf16:
            extra.update(mxu_bf16=True)
        if drop > 0:
            extra.update(drop_rate=drop, drop_seed=seed)
        a = [
            kw[n].astype(jnp.bfloat16) if wx_bf16 else kw[n]
            for n in wx_names
        ] + [kw[n] for n in v_names] + [kw["y0"]]
        return pall(*a, **extra)

    def scan_fn(kw):
        wxs = [kw[n] for n in wx_names]
        if affine:
            wxs = [s * w + h for s, w, h
                   in zip(d["scales"], wxs, d["shifts"])]
        return scan(*wxs, *[kw[n] for n in v_names], kw["y0"])

    if drop > 0:
        # mask extraction: zero V + strongly positive drive keeps every
        # output strictly positive, so out > 0 <=> kept
        ext_kw = {n: jnp.full_like(d[n], 3.0) for n in wx_names}
        ext_kw.update({n: jnp.zeros_like(d[n]) for n in v_names})
        ext_kw["y0"] = jnp.full_like(d["y0"], 0.5)

        def ext_call():
            a = ([ext_kw[n] for n in wx_names]
                 + [ext_kw[n] for n in v_names] + [ext_kw["y0"]])
            return pall(*a, drop_rate=drop, drop_seed=seed)

    @jax.jit
    def metrics():
        args = tuple(d[n] for n in names)
        if drop > 0:
            ext = ext_call()
            mask = jax.lax.stop_gradient((ext != 0).astype(jnp.float32))

            def loss_p(*a):
                kw = dict(zip(names, a))
                return (pallas_fn(kw) * wgt).sum()

            def loss_s(*a):
                kw = dict(zip(names, a))
                return (scan_fn(kw) * mask / (1.0 - drop) * wgt).sum()

            out_p = pallas_fn(dict(d))
            with _oracle_precision(loose):
                out_s = scan_fn(dict(d)) * mask / (1.0 - drop)
            keep_frac = jnp.mean(mask)
        else:
            def loss_p(*a):
                kw = dict(zip(names, a))
                return (pallas_fn(kw) * wgt).sum()

            def loss_s(*a):
                kw = dict(zip(names, a))
                return (scan_fn(kw) * wgt).sum()

            out_p = pallas_fn(dict(d))
            with _oracle_precision(loose):
                out_s = scan_fn(dict(d))
            keep_frac = jnp.asarray(1.0)

        gp = jax.grad(loss_p, argnums=tuple(range(len(names))))(*args)
        with _oracle_precision(loose):  # see spiking_case
            gs = jax.grad(loss_s, argnums=tuple(range(len(names))))(*args)
        m = {
            "fwd_rel": _rel(out_p.astype(jnp.float32), out_s),
            "keep_frac": keep_frac,
            "fwd_finite": jnp.all(jnp.isfinite(
                out_p.astype(jnp.float32))).astype(jnp.float32),
        }
        # bf16 genuinely flips relu/gate kinks where the forward sits
        # within one bf16 ulp of the cut — a mean-based metric judges the
        # gradient field instead of the worst flipped element
        gmetric = _relmean if (bf16 or loose) else _rel
        for n, x, y in zip(names, gp, gs):
            m[f"g_{n}"] = gmetric(x.astype(jnp.float32), y)
        m["grads_finite"] = functools.reduce(
            jnp.logical_and,
            [jnp.all(jnp.isfinite(x.astype(jnp.float32))) for x in gp],
        ).astype(jnp.float32)
        return m

    m = {k: float(v) for k, v in metrics().items()}
    fails = []
    fwd_lim = 0.03 if bf16 else (0.01 if loose else 1e-5)
    grad_lim = 0.02 if bf16 else (0.02 if loose else 1e-4)
    if m["fwd_rel"] > fwd_lim:
        fails.append(f"fwd_rel={m['fwd_rel']:.2e}>{fwd_lim}")
    if drop > 0 and abs(m["keep_frac"] - (1 - drop)) > 0.03:
        fails.append(f"keep_frac={m['keep_frac']:.3f} vs {1 - drop}")
    if not m["fwd_finite"] or not m["grads_finite"]:
        fails.append("non-finite values")
    worst = max((v, k) for k, v in m.items() if k.startswith("g_"))
    if worst[0] > grad_lim:
        fails.append(f"grad {worst[1]}={worst[0]:.2e}>{grad_lim}")
    m["worst_grad"] = worst[0]
    return m, fails


def build_cases():
    """(name, thunk) list. 'stress' = affine fold + prime T (live tail
    chunk) + B=136 (17 batch tiles)."""
    P = dict(B=16, T=20, H=128)  # tc | T: no tail
    S = dict(B=136, T=19, H=128)  # tail + multi-tile
    cases = []
    for v in ("lif", "adlif", "rlif", "radlif"):
        cases.append((f"{v}/plain", functools.partial(spiking_case, v, **P)))
        cases.append(
            (f"{v}/stress",
             functools.partial(spiking_case, v, affine=True, **S))
        )
    for v in ("lif", "radlif"):
        cases.append(
            (f"{v}/dropout",
             functools.partial(spiking_dropout_case, v, **S))
        )
        # the default TPU training path combines bf16 streams WITH the
        # fused hw-PRNG dropout — exercised together here
        cases.append(
            (f"{v}/bf16drop",
             functools.partial(spiking_dropout_case, v, bf16=True, **S))
        )
    for v in ("lif", "adlif", "rlif", "radlif"):
        cases.append(
            (f"{v}/bf16", functools.partial(spiking_case, v, bf16=True, **P))
        )
    cases.append(("readout/plain", functools.partial(readout_case, **P)))
    cases.append(("readout/stress", functools.partial(readout_case, **S)))
    for mode in ("rnn", "ligru", "gru"):
        cases.append(
            (f"{mode}/plain", functools.partial(ann_case, mode, **P))
        )
        cases.append(
            (f"{mode}/stress",
             functools.partial(ann_case, mode, affine=True, **S))
        )
    for mode in ("ligru", "gru"):
        cases.append(
            (f"{mode}/dropout",
             functools.partial(ann_case, mode, drop=0.3, **S))
        )
    cases.append(
        ("ligru/bf16", functools.partial(ann_case, "ligru", bf16=True, **P))
    )
    # end-to-end bf16 gate streams: bf16 Wx INPUTS (the models' default
    # TPU path after the _gate_projections cast), with the affine fold
    for mode in ("ligru", "gru"):
        cases.append(
            (f"{mode}/wx16",
             functools.partial(ann_case, mode, affine=True, bf16=True,
                               wx_bf16=True, **S))
        )
    # wide layers: the H >= 1536 short-unroll (_pick_tc cap) path, with a
    # live tail chunk (T=10, tc=4)
    W = dict(B=8, T=10, H=1536)
    cases.append(
        ("radlif/wide", functools.partial(spiking_case, "radlif", **W))
    )
    cases.append(
        ("ligru/wide",
         functools.partial(ann_case, "ligru", loose=True, **W))
    )
    # wide x bf16-MXU: exercises the bf16-RESIDENT V blocks (V stored
    # bf16 in VMEM when mxu_bf16 — the wide-H cap lift depends on it)
    cases.append(
        ("radlif/widebf16",
         functools.partial(spiking_case, "radlif", bf16=True, **W))
    )
    cases.append(
        ("ligru/widebf16",
         functools.partial(ann_case, "ligru", bf16=True, loose=True,
                           v_scale=(128 / W["H"]) ** 0.5, **W))
    )
    # wide-BATCH x wide-H: B=128 is where the byte-accurate tile plan
    # (pallas_ann._plan_vmem) raises the batch tiles (GRU 1024 -> bt 64,
    # LiGRU 1024 -> bt 128) — pins the raised-tile numerics on the chip.
    # TPU-only (the "/tpu" suffix): a B=128 x H=1024 case in interpret
    # mode takes >15 min of pure emulation, so the CPU fallback skips it.
    WB = dict(B=128, T=10, H=1024)
    cases.append(
        ("gru/b128bf16/tpu",
         functools.partial(ann_case, "gru", affine=True, bf16=True,
                           wx_bf16=True, loose=True,
                           v_scale=(128 / WB["H"]) ** 0.5, **WB))
    )
    # tensor-parallel fused cells at P=1: compiles the in-kernel
    # collective machinery (self-copy DMAs) on the current backend
    cases.append(
        ("rlif/tp1", functools.partial(tp_case, "rlif", B=16, T=20, H=128))
    )
    cases.append(
        ("radlif/tp1",
         functools.partial(tp_case, "radlif", B=16, T=20, H=128))
    )
    cases.append(
        ("radlif/tp1bf16",
         functools.partial(tp_case, "radlif", bf16=True, B=16, T=20, H=128))
    )
    cases.append(
        ("ligru/b128bf16/tpu",
         functools.partial(ann_case, "ligru", affine=True, bf16=True,
                           wx_bf16=True, loose=True,
                           v_scale=(128 / WB["H"]) ** 0.5, **WB))
    )
    # tensor-parallel fused ANN cells at P=1 (pallas_tp_ann): compiles
    # the in-kernel collective machinery incl. the GRU's two-exchange
    # steps and the stacked backward exchanges (self-copy DMAs)
    for mode in ("rnn", "ligru", "gru"):
        cases.append(
            (f"{mode}/tp1",
             functools.partial(ann_tp_case, mode, B=16, T=20, H=128))
        )
    cases.append(
        ("gru/tp1bf16",
         functools.partial(ann_tp_case, "gru", bf16=True,
                           B=16, T=20, H=128))
    )
    return cases


def main():
    # NOT at import time: tests import this module for the interpret-mode
    # smoke checks, and enabling the persistent compile cache inside the
    # pytest process is a measured SIGABRT — the shared cache dir mixes
    # axon-TPU and 8-device-CPU entries, and a later CPU shard_map
    # program aborts deserialising an incompatible cached executable
    # (reproduced: cache env + test_cli + test_seqpipe TP).
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="substring filter on case name")
    ap.add_argument("--json", default="", help="write results to this file")
    ap.add_argument(
        "--platform", default="",
        help="force a JAX platform (e.g. 'cpu' for an interpret-mode run "
        "of the same case matrix when the TPU tunnel is down); the "
        "persistent compile cache stays off for forced platforms",
    )
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        enable_compile_cache()

    backend = jax.default_backend()
    print(f"backend: {backend} "
          f"({'COMPILED Mosaic' if backend == 'tpu' else 'interpret mode'})",
          flush=True)

    results = []
    n_fail = 0
    for name, thunk in build_cases():
        if args.only and args.only not in name:
            continue
        if name.endswith("/tpu") and backend != "tpu":
            print(f"SKIP  {name:<16} (compiled-Mosaic only; interpret "
                  "mode would emulate B=128 x H=1024 for >15 min)",
                  flush=True)
            continue
        try:
            if "bf16" in name or "wx16" in name or name == "ligru/wide":
                # Mosaic rejects a HIGHEST attr on the kernels' bf16 dots;
                # only the scan oracle runs at highest (inner contexts)
                m, fails = thunk()
            else:
                # full f32 on BOTH sides: the kernels' own f32 dots and the
                # scan oracle's then agree bit-for-bit, so any residual is
                # kernel logic, not MXU pass rounding (the default-precision
                # deviation is documented in docs/STATUS.md instead)
                with jax.default_matmul_precision("highest"):
                    m, fails = thunk()
        except Exception as e:  # noqa: BLE001 — report, keep going
            m, fails = {}, [f"EXCEPTION: {type(e).__name__}: {e}"]
        status = "PASS" if not fails else "FAIL"
        n_fail += bool(fails)
        agree = m.get("spike_agree", m.get("fwd_rel", m.get("fwd_max_abs")))
        fwd_str = "n/a" if agree is None else f"{agree:.3e}"
        print(
            f"{status}  {name:<16} fwd={fwd_str}"
            f"  worst_grad={m.get('worst_grad', float('nan')):.3e}"
            + (f"  [{'; '.join(fails)}]" if fails else ""),
            flush=True,
        )
        results.append({"case": name, "status": status, **m,
                        "fails": fails})
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": backend, "results": results}, f, indent=1)
    print(f"{len(results)} cases, {n_fail} failed", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
