"""Fused Pallas TPU kernels for the recurrent spiking cells.

Why a kernel: the neuron recurrence is inherently sequential in T, and
under ``lax.scan`` XLA round-trips the carry through HBM every step. The
Pallas kernels keep the neuron state (u[, w], s) resident in VMEM for the
whole T-loop, stream ``Wx[:, t]`` tiles in, run the recurrent ``s @ V``
matmul on the MXU against a VMEM-resident V, and stream spikes out —
one kernel launch per layer per forward.

Grid: (batch tiles, time chunks), time fastest. Each grid cell advances
one batch tile by TC=8 unrolled timesteps; the state lives in VMEM
scratch across chunks and the Wx/spike blocks are double-buffered by the
Pallas pipeline. V is replicated into every program's VMEM (fine for
H <= ~1024: 4 MB f32); the batch tile shrinks automatically to fit the
VMEM budget.

Differentiation: the kernels are wrapped in ``jax.custom_vjp``. The
backward pass currently replays the mathematically-identical ``lax.scan``
cell (sparch_tpu.ops.cells) under ``jax.vjp`` — forward results are
bit-compatible modulo f32 accumulation order, so gradients are correct.
A fused Pallas backward (reverse T-loop with VMEM-resident residuals) is
the planned next step.

Shapes are padded to TPU tiling (H to a lane multiple of 128, B to the
sublane multiple, T to the chunk multiple) outside the kernel; padded
rows/neurons receive a -1e9 drive so they can never spike, and outputs
are sliced back to the caller's shape.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparch_tpu.ops import cells

__all__ = ["rlif_pallas", "radlif_pallas", "lif_pallas", "adlif_pallas"]

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_batch_tile(b: int) -> int:
    for cand in (128, 64, 32, 16, 8):
        if b % cand == 0:
            return cand
    return b


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _radlif_kernel(
    wx_ref,  # (BT, TC, H) VMEM — a chunk of timesteps, streamed by the grid
    alpha_ref,  # (1, H)
    beta_ref,  # (1, H)
    a_ref,  # (1, H)
    b_ref,  # (1, H)
    v_ref,  # (H, H)
    u0_ref,  # (BT, H)
    w0_ref,  # (BT, H)
    s0_ref,  # (BT, H)
    s_out_ref,  # (BT, TC, H)
    u_scr,  # (BT, H) VMEM scratch — persists across grid steps
    w_scr,  # (BT, H)
    s_scr,  # (BT, H)
    *,
    threshold: float,
    tc: int,
    recurrent: bool,
    adaptive: bool,
):
    """One (batch-tile, time-chunk) grid cell. The grid iterates time-chunks
    fastest, so for each batch tile the chunks run sequentially with the
    neuron state held in VMEM scratch across chunks; Pallas double-buffers
    the streamed Wx/out blocks automatically. The tc steps inside a chunk
    are unrolled."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        u_scr[:, :] = u0_ref[:, :]
        s_scr[:, :] = s0_ref[:, :]
        if adaptive:
            w_scr[:, :] = w0_ref[:, :]

    alpha = alpha_ref[0, :]
    u = u_scr[:, :]
    s = s_scr[:, :]
    w = w_scr[:, :] if adaptive else None

    for k in range(tc):  # static unroll
        drive = wx_ref[:, k, :]
        if recurrent:
            drive = drive + jnp.dot(
                s, v_ref[:, :], preferred_element_type=jnp.float32
            )
        if adaptive:
            w = beta_ref[0, :] * w + a_ref[0, :] * u + b_ref[0, :] * s
            drive = drive - w
        u = alpha * (u - s) + (1.0 - alpha) * drive
        s = (u > threshold).astype(u.dtype)
        s_out_ref[:, k, :] = s

    u_scr[:, :] = u
    s_scr[:, :] = s
    if adaptive:
        w_scr[:, :] = w


def _forward_pallas(
    Wx: jax.Array,
    alpha: jax.Array,
    beta,
    a,
    b,
    V,
    threshold: float,
    u0: jax.Array,
    w0,
    s0: jax.Array,
    *,
    recurrent: bool,
    adaptive: bool,
) -> jax.Array:
    B, T, H = Wx.shape
    dtype = jnp.float32
    Hp = _round_up(H, _LANE)
    Bp = _round_up(B, _SUBLANE)

    # Time-chunk size and batch tile chosen to fit the VMEM budget:
    # 2 double-buffered (bt, tc, Hp) blocks (Wx in + spikes out), V, and
    # 3 state buffers.
    TC = 8
    budget = 12 * 1024 * 1024
    bt = _pick_batch_tile(Bp)
    while bt > _SUBLANE and (
        4 * (2 * 2 * bt * TC * Hp + Hp * Hp + 3 * bt * Hp) > budget
    ):
        bt //= 2
    Tp = _round_up(T, TC)

    # Pad: drive of padded neurons/rows = -1e9 so they never spike.
    def pad_bh(x, fill=0.0):
        return jnp.pad(
            x.astype(dtype),
            ((0, Bp - B), (0, Hp - H)),
            constant_values=fill,
        )

    Wx_p = jnp.pad(
        Wx.astype(dtype),
        ((0, Bp - B), (0, Tp - T), (0, Hp - H)),
        constant_values=-1e9,
    )
    alpha_p = jnp.pad(alpha.astype(dtype), (0, Hp - H))[None, :]
    if adaptive:
        beta_p = jnp.pad(beta.astype(dtype), (0, Hp - H))[None, :]
        a_p = jnp.pad(a.astype(dtype), (0, Hp - H))[None, :]
        b_p = jnp.pad(b.astype(dtype), (0, Hp - H))[None, :]
    else:
        beta_p = a_p = b_p = jnp.zeros((1, Hp), dtype)
    if recurrent:
        V_p = jnp.pad(V.astype(dtype), ((0, Hp - H), (0, Hp - H)))
    else:
        V_p = jnp.zeros((Hp, Hp), dtype)
    u0_p = pad_bh(u0, fill=-1e9)
    s0_p = pad_bh(s0)
    w0_p = pad_bh(w0) if adaptive else jnp.zeros((Bp, Hp), dtype)

    # Grid: (batch tiles, time chunks). Chunks iterate fastest (sequential
    # recurrence); Wx and spikes stream through VMEM one chunk at a time.
    grid = (Bp // bt, Tp // TC)
    kernel = functools.partial(
        _radlif_kernel,
        threshold=float(threshold),
        tc=TC,
        recurrent=recurrent,
        adaptive=adaptive,
    )

    bh = lambda i, t: (i, 0)  # noqa: E731
    bth = lambda i, t: (i, t, 0)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, TC, Hp), bth, memory_space=pltpu.VMEM),  # Wx
            pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM),  # alpha
            pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM),  # beta
            pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM),  # a
            pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM),  # b
            pl.BlockSpec((Hp, Hp), rep2, memory_space=pltpu.VMEM),  # V
            pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM),  # u0
            pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM),  # s0
        ],
        out_specs=pl.BlockSpec((bt, TC, Hp), bth, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, Hp), dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, Hp), jnp.float32),  # u
            pltpu.VMEM((bt, Hp), jnp.float32),  # w
            pltpu.VMEM((bt, Hp), jnp.float32),  # s
        ],
        # run interpreted off-TPU so the CPU test mesh exercises the kernel
        interpret=jax.default_backend() != "tpu",
    )(Wx_p, alpha_p, beta_p, a_p, b_p, V_p, u0_p, w0_p, s0_p)

    return out[:B, :T, :H]


# ---------------------------------------------------------------------------
# custom_vjp wrappers: Pallas forward, scan-replay backward
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_op(recurrent: bool, adaptive: bool, threshold: float):
    """Build (and memoize) the custom_vjp op for a fixed static threshold —
    the kernel needs a concrete Python float, so threshold cannot be a
    traced operand."""
    scan_fn = _SCAN_ADAPTERS[(recurrent, adaptive)]

    @jax.custom_vjp
    def op(Wx, alpha, beta, a, b, V, u0, w0, s0):
        V_masked = cells.zero_diag(V) if recurrent else V
        alpha_c = jnp.clip(alpha, *cells.ALPHA_LIM)
        if adaptive:
            beta_c = jnp.clip(beta, *cells.BETA_LIM)
            a_c = jnp.clip(a, *cells.A_LIM)
            b_c = jnp.clip(b, *cells.B_LIM)
        else:
            beta_c, a_c, b_c = beta, a, b
        return _forward_pallas(
            Wx, alpha_c, beta_c, a_c, b_c, V_masked, threshold, u0, w0, s0,
            recurrent=recurrent, adaptive=adaptive,
        )

    def fwd(Wx, alpha, beta, a, b, V, u0, w0, s0):
        out = op(Wx, alpha, beta, a, b, V, u0, w0, s0)
        return out, (Wx, alpha, beta, a, b, V, u0, w0, s0)

    def bwd(res, g):
        Wx, alpha, beta, a, b, V, u0, w0, s0 = res

        # Replay the mathematically-identical scan cell for the VJP.
        def ref_fn(Wx, alpha, beta, a, b, V, u0, w0, s0):
            return scan_fn(Wx, alpha, beta, a, b, V, threshold, u0, w0, s0)

        _, vjp = jax.vjp(ref_fn, Wx, alpha, beta, a, b, V, u0, w0, s0)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def _radlif_scan_adapter(Wx, alpha, beta, a, b, V, threshold, u0, w0, s0):
    return cells.radlif_scan(Wx, alpha, beta, a, b, V, threshold, u0, w0, s0)


def _rlif_scan_adapter(Wx, alpha, beta, a, b, V, threshold, u0, w0, s0):
    return cells.rlif_scan(Wx, alpha, V, threshold, u0, s0)


def _adlif_scan_adapter(Wx, alpha, beta, a, b, V, threshold, u0, w0, s0):
    return cells.adlif_scan(Wx, alpha, beta, a, b, threshold, u0, w0, s0)


def _lif_scan_adapter(Wx, alpha, beta, a, b, V, threshold, u0, w0, s0):
    return cells.lif_scan(Wx, alpha, threshold, u0, s0)


_SCAN_ADAPTERS = {
    (True, True): _radlif_scan_adapter,
    (True, False): _rlif_scan_adapter,
    (False, True): _adlif_scan_adapter,
    (False, False): _lif_scan_adapter,
}


def radlif_pallas(Wx, alpha, beta, a, b, V, threshold, u0, w0, s0):
    """Fused RadLIF layer recurrence (drop-in for cells.radlif_scan)."""
    op = _make_op(True, True, float(threshold))
    return op(Wx, alpha, beta, a, b, V, u0, w0, s0)


def rlif_pallas(Wx, alpha, V, threshold, u0, s0):
    """Fused RLIF layer recurrence (drop-in for cells.rlif_scan)."""
    op = _make_op(True, False, float(threshold))
    z = jnp.zeros_like(alpha)
    zs = jnp.zeros_like(u0)
    return op(Wx, alpha, z, z, z, V, u0, zs, s0)


def adlif_pallas(Wx, alpha, beta, a, b, threshold, u0, w0, s0):
    """Fused adLIF layer recurrence (drop-in for cells.adlif_scan)."""
    op = _make_op(False, True, float(threshold))
    V = jnp.zeros((Wx.shape[-1], Wx.shape[-1]), Wx.dtype)
    return op(Wx, alpha, beta, a, b, V, u0, w0, s0)


def lif_pallas(Wx, alpha, threshold, u0, s0):
    """Fused LIF layer recurrence (drop-in for cells.lif_scan)."""
    op = _make_op(False, False, float(threshold))
    z = jnp.zeros_like(alpha)
    zs = jnp.zeros_like(u0)
    V = jnp.zeros((Wx.shape[-1], Wx.shape[-1]), Wx.dtype)
    return op(Wx, alpha, z, z, z, V, u0, zs, s0)
