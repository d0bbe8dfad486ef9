"""Fused Pallas TPU kernels for the non-spiking (ANN) recurrent cells —
forward AND backward — mirroring the SNN kernels in
``sparch_tpu.ops.pallas_cells`` (same grid/layout/tail strategy; read that
module's docstring for the design rationale).

Semantics match the ``lax.scan`` cells (``sparch_tpu.ops.cells``) that are
themselves pinned against the torch reference
(/root/reference/sparch/models/anns.py:328-339,449-462,581-595):

    RNN:    y_t = sigmoid(wx_t + y @ V)
    LiGRU:  z = sigmoid(wzx_t + y @ Vz); c = relu(wx_t + y @ V)
            y_t = z*y + (1-z)*c
    GRU:    z = sigmoid(wzx_t + y @ Vz); r = sigmoid(wrx_t + y @ Vr)
            c = tanh(wx_t + (r*y) @ V);  y_t = z*y + (1-z)*c

Why kernels: under ``lax.scan`` each step's recurrent matmul(s) sit on the
sequential carry chain with HBM round-trips between steps. Here the state
stays in VMEM, the carriable products (``y @ V``, ``y @ Vz``, ``y @ Vr``
forward; the adjoint products backward for RNN/LiGRU) are issued
immediately after the new state is known so their MXU latency hides behind
the remaining VPU work, and the per-step streams are double-buffered
time-major blocks. Only the GRU keeps one product per step on the critical
path in each direction (``(r*y) @ V`` forward, ``dcpre @ V^T`` backward) —
that serialisation is inherent to its gating structure.

Backward math (G_t = total adjoint dL/dy_t, walking t = T..1):

    RNN:   dpre = G * y_t * (1 - y_t)
           G_{t-1} += dpre @ V^T;  dV += y_{t-1}^T dpre;  dWx_t = dpre
    LiGRU: dz = G*(y_p - c); dc = G*(1-z)
           dcpre = dc * [c > 0];  dzpre = dz * z * (1-z)
           G_{t-1} += G*z + dcpre @ V^T + dzpre @ Vz^T
           dV += y_p^T dcpre; dVz += y_p^T dzpre
    GRU:   dcpre = G*(1-z)*(1-c^2); dzpre = G*(y_p - c)*z*(1-z)
           dry = dcpre @ V^T; drpre = dry*y_p*r*(1-r)
           G_{t-1} += G*z + dry*r + dzpre @ Vz^T + drpre @ Vr^T
           dV += (r*y_p)^T dcpre; dVz += y_p^T dzpre; dVr += y_p^T drpre

Residuals: the y stream (the forward output itself), the gate streams
(z[, r], c) and the per-chunk left-boundary y. Batch reductions for the
weight gradients ride the MXU as contractions.

Equivalence with the scan cells is pinned by tests/test_pallas_ann.py in
interpret mode on the CPU mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparch_tpu.ops.pallas_cells import (
    _compiler_params,
    _interpret,
    _keep_u32,
    _mxu_colsum,
    _pick_tc,
    _random_keep,
    _round_up,
    _tile_plan,
    _LANE,
    _SUBLANE,
    _VMEM_LIMIT_WIDE,
)

__all__ = ["rnn_pallas", "ligru_pallas", "gru_pallas"]

# The ANN kernels' tile-plan budget. Unlike the SNN kernels' conservative
# 4-bytes-per-element model (whose 64 MiB budget + known-good caps are
# left untouched), the byte-accurate _plan_vmem model is calibrated
# against a measured Mosaic breakdown: at GRU f32 Hp=1280 (tc=10, bt=32)
# the model predicts 116M and Mosaic demanded 145.9M of the 128M
# capacity — a 1.25x model-to-Mosaic factor, i.e. ~102M of effective
# model-units capacity. 96 MiB leaves margin while keeping every
# previously-compiling configuration's (tc, bt) choice.
_ANN_VMEM_BUDGET = 96 * 1024 * 1024

# per-mode static structure: (n_inputs, gate residual streams)
_MODES = {
    "rnn": dict(n_wx=1, n_v=1, gates=()),
    "ligru": dict(n_wx=2, n_v=2, gates=("z", "c")),
    "gru": dict(n_wx=3, n_v=3, gates=("z", "r", "c")),
}


def _plan_vmem(mode: str, affine: bool, mxu_bf16: bool,
               has_dropout: bool):
    """Byte-accurate ``_tile_plan`` inputs — ONE definition used by BOTH
    the forward and backward wrappers, because the kernels' batch tiles
    must match exactly: the fused-dropout mask regeneration keys on the
    batch-tile index (same invariant as the SNN kernels' streams=4).

    Returns ``(stream_bytes, mat_bytes)``:

    - streams: the max of the forward and backward double-buffered
      time-major compositions. Forward: n_wx Wx inputs (planned at f32 —
      worst incoming dtype) + the y/raw/gate residual outputs (bf16 in
      the bf16-MXU mode). Backward: g + raw y + gates in, dWx out (all
      the stream dtype) + the raw Wx streams again when affine.
    - mats: per gate, the resident V (double-buffered, bf16 in the
      bf16-MXU mode) + the f32 dV output window + its revisit copy.
      Calibrated against the measured GRU Hp=1280 Mosaic breakdown:
      f32 demanded 145.9M of 128M at (tc=10, bt=32) — the old
      one-f32-pair accounting predicted 50M — while the bf16 mode
      compiles there (tools/probe_vmem.py)."""
    m = _MODES[mode]
    n_wx, n_g = m["n_wx"], len(m["gates"])
    s = 2 if mxu_bf16 else 4  # residual/adjoint stream element bytes
    n_raw = 1 if has_dropout else 0
    fwd = 4 * n_wx + s * (1 + n_raw + n_g)
    bwd = s * (2 + n_g + n_wx) + (4 * n_wx if affine else 0)
    vb = 2 if mxu_bf16 else 4
    return max(fwd, bwd), m["n_v"] * (2 * vb + 8)


def _ann_scoped_limit(sb: int, mb: int, bt: int, tc: int, Hp: int) -> int:
    """Plan-derived Mosaic scoped-vmem limit for the ANN kernels.

    The limit is a Mosaic SCHEDULING input, not just a capacity guard —
    tight limits run markedly faster (see pallas_cells._scoped_limit and
    docs/probe_vmem_limit_*.json: 1.1-2.0x on the spiking kernels, ~15%
    on LiGRU/GRU H=512 bf16 measured on the real v5e). Unlike the SNN
    kernels' empirical width bands, the ANN kernels have a byte-accurate
    demand model (_plan_vmem, calibrated on the captured GRU f32 Hp=1280
    Mosaic OOM breakdown: Mosaic real = model x 1.25), so the limit is
    model x 1.25 calibration x ~1.16 margin, floored at 40 MiB and
    clamped to the old fixed 120 MiB. Cross-checks against measured
    bounds: LiGRU 1536 bt=128 -> 120M (Mosaic real 116M fits); GRU 512
    bf16 -> 54M (48M compiles on chip); LiGRU 512 bf16 -> 38->40M floor
    (40M compiles on chip). The on-chip check_kernels ANN matrix
    (plain/affine/dropout/bf16/wide/raised-tile) gates the formula."""
    model = 2 * sb * bt * tc * Hp + mb * Hp * Hp + 24 * bt * Hp
    limit = int(model * 1.45)
    return max(40 * 1024 * 1024, min(_VMEM_LIMIT_WIDE, limit))


def _dotT(x, v, mxu_bf16):
    """x @ v^T (contract v's second axis), f32 accumulation."""
    if mxu_bf16:
        x = x.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        x, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot(x, v, mxu_bf16):
    if mxu_bf16:
        x = x.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
    return jnp.dot(x, v, preferred_element_type=jnp.float32)


def _outer_acc(a, b, mxu_bf16):
    """a^T @ b contracted over the batch tile (for dV accumulations)."""
    if mxu_bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _ann_fwd_kernel(*refs, tc, T, mode, affine, drop_rate, use_hw_prng,
                    save_residuals, mxu_bf16):
    m = _MODES[mode]
    refs = list(refs)
    wx_refs = refs[: m["n_wx"]]
    del refs[: m["n_wx"]]
    scale_refs = shift_refs = None
    if affine:
        scale_refs = refs[: m["n_wx"]]
        del refs[: m["n_wx"]]
        shift_refs = refs[: m["n_wx"]]
        del refs[: m["n_wx"]]
    v_refs = refs[: m["n_v"]]
    del refs[: m["n_v"]]
    y0_ref = refs.pop(0)
    has_dropout = drop_rate > 0.0
    seed_ref = refs.pop(0) if has_dropout else None
    # with fused dropout the y OUTPUT stream is dropped, but the backward
    # needs the raw y history: an extra raw residual stream rides along
    n_raw = 1 if (save_residuals and has_dropout) else 0
    n_out = 1 + n_raw + (len(m["gates"]) + 1 if save_residuals else 0)
    outs = refs[:n_out]
    y_out_ref = outs[0]
    yraw_out_ref = outs[1] if n_raw else None
    gate_out_refs = (
        outs[1 + n_raw : 1 + n_raw + len(m["gates"])]
        if save_residuals else []
    )
    yb_out_ref = outs[-1] if save_residuals else None
    scrs = refs[n_out:]
    y_scr = scrs[0]
    # carried-product scratches: rnn/ligru carry y@V (and y@Vz); gru
    # carries y@Vz and y@Vr (its y-dependent candidate product can't be
    # hoisted: it needs the current step's r)
    carry_scrs = scrs[1:]

    t = pl.program_id(1)
    # (forward needs no tail sanitisation: dead tail steps only write
    # out-of-range rows, which Pallas discards, and the post-tail carry
    # is never consumed)

    v_mats = [v_ref[:, :] for v_ref in v_refs]

    @pl.when(t == 0)
    def _init():
        y0 = y0_ref[:, :]
        y_scr[:, :] = y0
        if mode == "rnn":
            carry_scrs[0][:, :] = _dot(y0, v_mats[0], mxu_bf16)
        elif mode == "ligru":
            carry_scrs[0][:, :] = _dot(y0, v_mats[0], mxu_bf16)  # y @ V
            carry_scrs[1][:, :] = _dot(y0, v_mats[1], mxu_bf16)  # y @ Vz
        else:  # gru
            carry_scrs[0][:, :] = _dot(y0, v_mats[1], mxu_bf16)  # y @ Vz
            carry_scrs[1][:, :] = _dot(y0, v_mats[2], mxu_bf16)  # y @ Vr

    y = y_scr[:, :]
    carries = [c[:, :] for c in carry_scrs]

    if save_residuals:
        yb_out_ref[:, :] = y

    def drive(i, k):
        """Gate i's input drive at step k, with the normalization affine
        applied on load (see the SNN kernels' fold)."""
        d = wx_refs[i][k, :, :]
        if affine:
            d = scale_refs[i][0, :] * d + shift_refs[i][0, :]
        return d

    for k in range(tc):
        if mode == "rnn":
            y = jax.nn.sigmoid(drive(0, k) + carries[0])
            carries[0] = _dot(y, v_mats[0], mxu_bf16)
            gate_vals = ()
        elif mode == "ligru":
            z = jax.nn.sigmoid(drive(1, k) + carries[1])
            c = jax.nn.relu(drive(0, k) + carries[0])
            y = z * y + (1.0 - z) * c
            carries[0] = _dot(y, v_mats[0], mxu_bf16)
            carries[1] = _dot(y, v_mats[1], mxu_bf16)
            gate_vals = (z, c)
        else:  # gru
            z = jax.nn.sigmoid(drive(1, k) + carries[0])
            r = jax.nn.sigmoid(drive(2, k) + carries[1])
            c = jnp.tanh(
                drive(0, k) + _dot(r * y, v_mats[0], mxu_bf16)
            )
            y = z * y + (1.0 - z) * c
            carries[0] = _dot(y, v_mats[1], mxu_bf16)
            carries[1] = _dot(y, v_mats[2], mxu_bf16)
            gate_vals = (z, r, c)
        if has_dropout:
            # raw y stays in the recurrence; only the OUTPUT is dropped
            keep = _random_keep(
                y.shape, seed_ref[0], seed_ref[1], pl.program_id(0),
                t * tc + k, _keep_u32(drop_rate), use_hw_prng,
            )
            y_out_ref[k, :, :] = jnp.where(
                keep, y * (1.0 / (1.0 - drop_rate)), 0.0
            ).astype(y_out_ref.dtype)
            if yraw_out_ref is not None:
                yraw_out_ref[k, :, :] = y.astype(yraw_out_ref.dtype)
        else:
            y_out_ref[k, :, :] = y.astype(y_out_ref.dtype)
        if save_residuals:
            for gref, gval in zip(gate_out_refs, gate_vals):
                gref[k, :, :] = gval.astype(gref.dtype)

    y_scr[:, :] = y
    for scr, val in zip(carry_scrs, carries):
        scr[:, :] = val


def _ann_forward(wxs, scales, shifts, vs, y0, seed, *, mode, drop_rate,
                 save_residuals, mxu_bf16):
    m = _MODES[mode]
    affine = scales is not None
    has_dropout = drop_rate > 0.0
    B, T, H = wxs[0].shape
    dtype = jnp.float32
    # bf16 output/gate residual streams in the bf16-MXU mode: y and the
    # gates are sigmoid/tanh/relu-bounded, so the rounding is a uniform
    # ~4e-3 relative noise on already-bf16 recurrent products
    rdt = jnp.bfloat16 if mxu_bf16 else dtype
    Hp = _round_up(H, _LANE)
    Bp = _round_up(B, _SUBLANE)
    tc = _pick_tc(T, Hp)
    sb, mb = _plan_vmem(mode, affine, mxu_bf16, has_dropout)
    bt = _tile_plan(Bp, Hp, tc=tc, stream_bytes=sb, mat_bytes=mb,
                    budget=_ANN_VMEM_BUDGET)
    n_chunks = (T + tc - 1) // tc

    def pad_stream(x):
        # Wx keeps its incoming dtype (the layers do not cast it)
        return jnp.swapaxes(
            jnp.pad(x, ((0, Bp - B), (0, 0), (0, Hp - H))), 0, 1
        )

    pad_h = lambda p: jnp.pad(p.astype(dtype), (0, Hp - H))[None, :]  # noqa: E731
    wxs_p = [pad_stream(w) for w in wxs]
    aff_ops = []
    if affine:
        aff_ops = [pad_h(s) for s in scales] + [pad_h(s) for s in shifts]
    # bf16-resident V in the bf16-MXU mode: the in-kernel dots already cast
    # V to bf16 per product, so the pre-pad cast is bit-identical and
    # halves each resident Hp x Hp block (n_v of them — the dominant fixed
    # VMEM tenant at wide H)
    vdt = jnp.bfloat16 if mxu_bf16 else dtype
    vs_p = [jnp.pad(v.astype(vdt), ((0, Hp - H), (0, Hp - H))) for v in vs]
    y0_p = jnp.pad(y0.astype(dtype), ((0, Bp - B), (0, Hp - H)))

    grid = (Bp // bt, n_chunks)
    kernel = functools.partial(
        _ann_fwd_kernel, tc=tc, T=T, mode=mode, affine=affine,
        drop_rate=drop_rate, use_hw_prng=not _interpret(),
        save_residuals=save_residuals, mxu_bf16=mxu_bf16,
    )
    seed_ops = ()
    seed_specs = []
    if has_dropout:
        seed_ops = (jnp.asarray(seed, jnp.int32),)
        seed_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    bh = lambda i, t: (i, 0)  # noqa: E731
    tbh = lambda i, t: (t, i, 0)  # noqa: E731
    bnd_map = lambda i, t: (i, t)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hp), tbh, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((Hp, Hp), rep2, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hp), bnd_map, memory_space=pltpu.VMEM)

    n_gates = len(m["gates"])
    n_raw = 1 if (save_residuals and has_dropout) else 0
    if save_residuals:
        out_specs = (tm_spec,) * (1 + n_raw + n_gates) + (bnd_spec,)
        out_shape = tuple(
            [jax.ShapeDtypeStruct((T, Bp, Hp), rdt)] * (1 + n_raw + n_gates)
            + [jax.ShapeDtypeStruct((Bp, n_chunks * Hp), dtype)]
        )
    else:
        out_specs = (tm_spec,)
        out_shape = (jax.ShapeDtypeStruct((T, Bp, Hp), rdt),)

    n_carry = 1 if mode == "rnn" else 2
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [tm_spec] * m["n_wx"]
            + [vec_spec] * (2 * m["n_wx"] if affine else 0)
            + [mat_spec] * m["n_v"]
            + [state_spec]
            + seed_specs
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, Hp), jnp.float32)] * (1 + n_carry),
        interpret=_interpret(),
        compiler_params=_compiler_params(
            _ann_scoped_limit(sb, mb, bt, tc, Hp)),
    )(*wxs_p, *aff_ops, *vs_p, y0_p, *seed_ops)

    y_logical = jnp.swapaxes(outs[0][:, :B, :H], 0, 1)
    if not save_residuals:
        return y_logical
    # residuals stay padded time-major for the backward kernel; slot 0 is
    # the RAW y history (the dropped output when no dropout is fused)
    residuals = tuple(outs[1:]) if n_raw else tuple(outs)
    return y_logical, residuals


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _ann_bwd_kernel(*refs, tc, T, mode, affine, drop_rate, use_hw_prng,
                    mxu_bf16):
    m = _MODES[mode]
    n_gates = len(m["gates"])
    n_wx = m["n_wx"]
    has_dropout = drop_rate > 0.0
    refs = list(refs)
    g_ref = refs.pop(0)
    seed_ref = refs.pop(0) if has_dropout else None
    y_ref = refs.pop(0)
    gate_refs = refs[:n_gates]
    del refs[:n_gates]
    yb_ref = refs.pop(0)
    wx_refs = scale_refs = None
    if affine:
        wx_refs = refs[:n_wx]  # raw per-gate projection streams
        del refs[:n_wx]
        scale_refs = refs[:n_wx]
        del refs[:n_wx]
    v_refs = refs[: m["n_v"]]
    del refs[: m["n_v"]]
    dwx_refs = refs[:n_wx]
    del refs[:n_wx]
    dv_refs = refs[: m["n_v"]]
    del refs[: m["n_v"]]
    dsc_refs = dsh_refs = ()
    if affine:
        dsc_refs = refs[:n_wx]
        del refs[:n_wx]
        dsh_refs = refs[:n_wx]
        del refs[:n_wx]
    dy0_ref = refs.pop(0)
    D_scr = refs.pop(0)  # carried adjoint dL/dy_{t} contribution from t+1

    kc = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    first = kc == 0
    last = kc == n_chunks - 1
    n_chunks_static = (T + tc - 1) // tc
    tail_len = T - (n_chunks_static - 1) * tc

    @pl.when(first)
    def _init():
        D_scr[:, :] = jnp.zeros_like(D_scr)

    @pl.when(first & (pl.program_id(0) == 0))
    def _init_acc():
        for dv_ref in dv_refs:
            dv_ref[:, :] = jnp.zeros_like(dv_ref)
        for ref in (*dsc_refs, *dsh_refs):
            ref[:, :] = jnp.zeros_like(ref)

    v_mats = [v_ref[:, :] for v_ref in v_refs]
    dv_accs = [jnp.zeros_like(dv_ref) for dv_ref in dv_refs]
    D = D_scr[:, :]
    ones_row = jnp.ones((1, D.shape[0]), jnp.float32)
    dsc_accs = [jnp.zeros((1, D.shape[1]), jnp.float32) for _ in dsc_refs]
    dsh_accs = [jnp.zeros((1, D.shape[1]), jnp.float32) for _ in dsh_refs]

    def emit_dwx(i, k, dpre):
        """Write gate i's drive cotangent; on the affine path also fold the
        scale into dWx and accumulate dscale/dshift (MXU reductions, as in
        the SNN backward)."""
        if affine:
            wx_t = wx_refs[i][k, :, :]
            if k >= tail_len:
                wx_t = jnp.where(kc != 0, wx_t, 0.0)
            dsc_accs[i] = dsc_accs[i] + _mxu_colsum(ones_row, dpre * wx_t)
            dsh_accs[i] = dsh_accs[i] + _mxu_colsum(ones_row, dpre)
            dwx_refs[i][k, :, :] = (dpre * scale_refs[i][0, :]).astype(
                dwx_refs[i].dtype
            )
        else:
            dwx_refs[i][k, :, :] = dpre.astype(dwx_refs[i].dtype)

    for k in range(tc - 1, -1, -1):
        g_t = g_ref[k, :, :].astype(jnp.float32)
        if has_dropout:
            # the cotangent arrives w.r.t. the DROPPED output: regenerate
            # the forward's keep mask from the same seeds
            keep = _random_keep(
                g_t.shape, seed_ref[0], seed_ref[1], pl.program_id(0),
                (n_chunks - 1 - kc) * tc + k, _keep_u32(drop_rate),
                use_hw_prng,
            )
            g_t = jnp.where(keep, g_t * (1.0 / (1.0 - drop_rate)), 0.0)
        y_t = y_ref[k, :, :].astype(jnp.float32)
        y_p = (
            y_ref[k - 1, :, :].astype(jnp.float32)
            if k > 0
            else yb_ref[:, :]
        )
        gates = [gr[k, :, :].astype(jnp.float32) for gr in gate_refs]
        if k >= tail_len:
            live = kc != 0
            g_t = jnp.where(live, g_t, 0.0)
            y_t = jnp.where(live, y_t, 0.0)
            y_p = jnp.where(live, y_p, 0.0)
            gates = [jnp.where(live, gv, 0.0) for gv in gates]

        G = g_t + D
        if mode == "rnn":
            dpre = G * y_t * (1.0 - y_t)
            # next step's adjoint product, issued immediately (carried)
            D = _dotT(dpre, v_mats[0], mxu_bf16)
            dv_accs[0] = dv_accs[0] + _outer_acc(y_p, dpre, mxu_bf16)
            emit_dwx(0, k, dpre)
        elif mode == "ligru":
            z, c = gates
            dcpre = jnp.where(c > 0, G * (1.0 - z), 0.0)
            dzpre = G * (y_p - c) * z * (1.0 - z)
            # both adjoint products are carriable: issued now, first
            # consumed at the top of the next iteration
            P1 = _dotT(dcpre, v_mats[0], mxu_bf16)
            P2 = _dotT(dzpre, v_mats[1], mxu_bf16)
            dv_accs[0] = dv_accs[0] + _outer_acc(y_p, dcpre, mxu_bf16)
            dv_accs[1] = dv_accs[1] + _outer_acc(y_p, dzpre, mxu_bf16)
            emit_dwx(0, k, dcpre)
            emit_dwx(1, k, dzpre)
            D = G * z + P1 + P2
        else:  # gru
            z, r, c = gates
            dcpre = G * (1.0 - z) * (1.0 - c * c)
            dzpre = G * (y_p - c) * z * (1.0 - z)
            # dry is needed within this step (for dr and the adjoint):
            # inherent critical-path product of the GRU structure
            dry = _dotT(dcpre, v_mats[0], mxu_bf16)
            drpre = dry * y_p * r * (1.0 - r)
            P1 = _dotT(dzpre, v_mats[1], mxu_bf16)
            P2 = _dotT(drpre, v_mats[2], mxu_bf16)
            dv_accs[0] = dv_accs[0] + _outer_acc(r * y_p, dcpre, mxu_bf16)
            dv_accs[1] = dv_accs[1] + _outer_acc(y_p, dzpre, mxu_bf16)
            dv_accs[2] = dv_accs[2] + _outer_acc(y_p, drpre, mxu_bf16)
            emit_dwx(0, k, dcpre)
            emit_dwx(1, k, dzpre)
            emit_dwx(2, k, drpre)
            D = G * z + dry * r + P1 + P2

    D_scr[:, :] = D
    for dv_ref, acc in zip(dv_refs, dv_accs):
        dv_ref[:, :] += acc
    for ref, acc in zip((*dsc_refs, *dsh_refs), (*dsc_accs, *dsh_accs)):
        ref[:, :] += acc

    @pl.when(last)
    def _dy0():
        dy0_ref[:, :] = D_scr[:, :]


def _ann_backward(g, wxs, residuals, scales, vs, seed, *, mode, drop_rate,
                  mxu_bf16):
    m = _MODES[mode]
    n_gates = len(m["gates"])
    n_wx = m["n_wx"]
    affine = scales is not None
    has_dropout = drop_rate > 0.0
    y_seq = residuals[0]
    gate_seqs = residuals[1 : 1 + n_gates]
    yb = residuals[-1]
    B, T, H = g.shape
    dtype = jnp.float32
    sdt = jnp.bfloat16 if mxu_bf16 else dtype  # g/dWx stream dtype
    _, Bp, Hp = y_seq.shape
    tc = _pick_tc(T, Hp)
    sb, mb = _plan_vmem(mode, affine, mxu_bf16, has_dropout)
    bt = _tile_plan(Bp, Hp, tc=tc, stream_bytes=sb, mat_bytes=mb,
                    budget=_ANN_VMEM_BUDGET)
    n_chunks = (T + tc - 1) // tc

    g_p = jnp.swapaxes(
        jnp.pad(g.astype(sdt), ((0, Bp - B), (0, 0), (0, Hp - H))), 0, 1
    )
    pad_h = lambda p: jnp.pad(p.astype(dtype), (0, Hp - H))[None, :]  # noqa: E731
    aff_ops = []
    if affine:
        aff_ops = [
            jnp.swapaxes(
                jnp.pad(w, ((0, Bp - B), (0, 0), (0, Hp - H))), 0, 1
            )
            for w in wxs
        ] + [pad_h(s) for s in scales]
    # bf16-resident V in the bf16-MXU mode (see the forward wrapper)
    vdt = jnp.bfloat16 if mxu_bf16 else dtype
    vs_p = [jnp.pad(v.astype(vdt), ((0, Hp - H), (0, Hp - H))) for v in vs]

    grid = (Bp // bt, n_chunks)
    kernel = functools.partial(
        _ann_bwd_kernel, tc=tc, T=T, mode=mode, affine=affine,
        drop_rate=drop_rate, use_hw_prng=not _interpret(),
        mxu_bf16=mxu_bf16,
    )
    seed_ops = ()
    seed_specs = []
    if has_dropout:
        seed_ops = (jnp.asarray(seed, jnp.int32),)
        seed_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    rev_tm = lambda i, t: (n_chunks - 1 - t, i, 0)  # noqa: E731
    rev_bnd = lambda i, t: (i, n_chunks - 1 - t)  # noqa: E731
    bh = lambda i, t: (i, 0)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hp), rev_tm, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((Hp, Hp), rep2, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hp), rev_bnd, memory_space=pltpu.VMEM)

    n_aff_out = 2 * n_wx if affine else 0
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [tm_spec]  # g
            + seed_specs  # dropout seed scalars (SMEM)
            + [tm_spec] * (1 + n_gates)  # raw y + gates
            + [bnd_spec]  # y left boundary
            + ([tm_spec] * n_wx + [vec_spec] * n_wx if affine else [])
            + [mat_spec] * m["n_v"]
        ),
        out_specs=(
            tuple([tm_spec] * n_wx)
            + tuple([mat_spec] * m["n_v"])
            + tuple([vec_spec] * n_aff_out)
            + (state_spec,)
        ),
        out_shape=(
            tuple(
                jax.ShapeDtypeStruct((T, Bp, Hp), sdt)
                for _ in range(n_wx)
            )
            + tuple(
                jax.ShapeDtypeStruct((Hp, Hp), dtype)
                for _ in range(m["n_v"])
            )
            + tuple(
                jax.ShapeDtypeStruct((1, Hp), dtype)
                for _ in range(n_aff_out)
            )
            + (jax.ShapeDtypeStruct((Bp, Hp), dtype),)
        ),
        scratch_shapes=[pltpu.VMEM((bt, Hp), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(
            _ann_scoped_limit(sb, mb, bt, tc, Hp)),
    )(g_p, *seed_ops, y_seq, *gate_seqs, yb, *aff_ops, *vs_p)

    dwxs = [jnp.swapaxes(o[:, :B, :H], 0, 1) for o in outs[:n_wx]]
    dvs = [o[:H, :H] for o in outs[n_wx : n_wx + m["n_v"]]]
    if affine:
        aff = outs[n_wx + m["n_v"] : n_wx + m["n_v"] + n_aff_out]
        dscales = [o[0, :H] for o in aff[:n_wx]]
        dshifts = [o[0, :H] for o in aff[n_wx:]]
    else:
        dscales = dshifts = None
    dy0 = outs[-1][:B, :H]
    return dwxs, dvs, dscales, dshifts, dy0


# ---------------------------------------------------------------------------
# custom_vjp wrappers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_ann_op(mode: str, affine: bool, drop_rate: float,
                 mxu_bf16: bool):
    m = _MODES[mode]
    n_wx, n_v = m["n_wx"], m["n_v"]

    def split(args):
        i = n_wx
        wxs = args[:n_wx]
        scales = shifts = None
        if affine:
            scales = args[i : i + n_wx]
            shifts = args[i + n_wx : i + 2 * n_wx]
            i += 2 * n_wx
        vs = args[i : i + n_v]
        return wxs, scales, shifts, vs, args[-2], args[-1]

    @jax.custom_vjp
    def op(*args):
        wxs, scales, shifts, vs, y0, seed = split(args)
        return _ann_forward(
            list(wxs), scales and list(scales), shifts and list(shifts),
            list(vs), y0, seed, mode=mode, drop_rate=drop_rate,
            save_residuals=False, mxu_bf16=mxu_bf16,
        )

    def fwd(*args):
        wxs, scales, shifts, vs, y0, seed = split(args)
        y, residuals = _ann_forward(
            list(wxs), scales and list(scales), shifts and list(shifts),
            list(vs), y0, seed, mode=mode, drop_rate=drop_rate,
            save_residuals=True, mxu_bf16=mxu_bf16,
        )
        # on the affine path the raw Wx streams feed dscale; otherwise a
        # zero-length token keeps the primal dtype reachable
        wx_saved = tuple(wxs) if affine else (args[0][:0],)
        return y, (wx_saved, scales, vs, residuals, y0[:0], seed)

    def bwd(res, g):
        wx_saved, scales, vs, residuals, y0_tok, seed = res
        dwxs, dvs, dscales, dshifts, dy0 = _ann_backward(
            g, list(wx_saved), residuals, scales and list(scales),
            list(vs), seed, mode=mode, drop_rate=drop_rate,
            mxu_bf16=mxu_bf16,
        )
        # tangent dtypes must match the primals (custom_vjp contract)
        dwxs = [d.astype(wx_saved[0].dtype) for d in dwxs]
        dvs = [d.astype(v.dtype) for d, v in zip(dvs, vs)]
        aff_grads = ()
        if affine:
            aff_grads = (*dscales, *dshifts)
        import numpy as _np

        dseed = _np.zeros(seed.shape, jax.dtypes.float0)
        return (*dwxs, *aff_grads, *dvs, dy0.astype(y0_tok.dtype), dseed)

    op.defvjp(fwd, bwd)
    return op


def _aff_args(scales, shifts):
    if scales is None:
        return False, ()
    return True, (*scales, *shifts)


def _drop_args(drop_rate, drop_seed):
    if drop_seed is None:
        drop_seed = jnp.zeros((2,), jnp.int32)
    return float(drop_rate), drop_seed


def rnn_pallas(Wx, V, y0, mxu_bf16: bool = False, scales=None, shifts=None,
               drop_rate: float = 0.0, drop_seed=None):
    """Fused sigmoid-RNN recurrence (drop-in for cells.rnn_scan). With
    ``scales``/``shifts`` (one (H,) pair per gate) the per-gate
    normalization affine is applied on load and their gradients are
    returned; with ``drop_rate``/``drop_seed`` the layer-output dropout
    is fused (masks regenerate from the seed in the backward)."""
    affine, aff = _aff_args(scales, shifts)
    drop_rate, seed = _drop_args(drop_rate, drop_seed)
    return _make_ann_op("rnn", affine, drop_rate, mxu_bf16)(
        Wx, *aff, V, y0, seed
    )


def ligru_pallas(Wx, Wzx, V, Vz, y0, mxu_bf16: bool = False,
                 scales=None, shifts=None, drop_rate: float = 0.0,
                 drop_seed=None):
    """Fused LiGRU recurrence (drop-in for cells.ligru_scan)."""
    affine, aff = _aff_args(scales, shifts)
    drop_rate, seed = _drop_args(drop_rate, drop_seed)
    return _make_ann_op("ligru", affine, drop_rate, mxu_bf16)(
        Wx, Wzx, *aff, V, Vz, y0, seed
    )


def gru_pallas(Wx, Wzx, Wrx, V, Vz, Vr, y0, mxu_bf16: bool = False,
               scales=None, shifts=None, drop_rate: float = 0.0,
               drop_seed=None):
    """Fused GRU recurrence (drop-in for cells.gru_scan)."""
    affine, aff = _aff_args(scales, shifts)
    drop_rate, seed = _drop_args(drop_rate, drop_seed)
    return _make_ann_op("gru", affine, drop_rate, mxu_bf16)(
        Wx, Wzx, Wrx, *aff, V, Vz, Vr, y0, seed
    )
