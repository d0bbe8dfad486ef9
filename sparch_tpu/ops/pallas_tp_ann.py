"""Tensor-parallel fused ANN recurrent cells (RNN / LiGRU / GRU) with
in-kernel ICI collectives — the TP extension of ``pallas_ann.py``.

Why this exists: the ANN cells have the LOWEST single-chip VMEM H-caps
of all the fused kernels (GRU 1024, LiGRU 1536 — three / two resident
(V, dV) pairs, measured bounds in docs/STATUS.md "Wide layers"), so they
are the FIRST to fall back to scan-GSPMD at wide H, where the fused
regime is a measured 1.6-2.3x faster. This module shards the neurons
over the TP mesh axis exactly like ``pallas_tp.py`` does for RLIF /
RadLIF and keeps the recurrence fused, exchanging hidden-state blocks
per step with the same double-buffered remote-DMA all-gather
(``pallas_tp._ag_exchange``; read that module's docstring for the
parity-slot / semaphore-lane discipline and its backpressure argument).

Sharding layout (per chip, P chips on the TP axis, Hl = H / P):
  Wx gate streams, y0, y/gate outputs:  neuron-sharded (…, Hl)
  V/Vz/Vr forward:  column shards V*[:, shard]  (Hg = P*Hl rows, Hl cols)
  V/Vz/Vr backward: row shards V*[shard, :] derived by one all_to_all,
      INTERLEAVED per peer into a single stacked matrix so one gathered
      adjoint plane serves every recurrent product in one MXU pass
  dV*: accumulated row-sharded / interleaved, de-interleaved and
      transposed back to the column sharding by one all_to_all

Per-step communication:
  RNN fwd:    all-gather the new y                 -> y_full @ V[:, sh]
  LiGRU fwd:  all-gather the new y                 -> y_full @ {V,Vz}[:, sh]
  GRU fwd:    all-gather r*y (the candidate needs (r*y)_full @ V[:, sh]),
              then all-gather the new y            -> y_full @ {Vz,Vr}[:, sh]
  RNN bwd:    all-gather dpre                      -> dpre_full @ Vrow^T
  LiGRU bwd:  ONE stacked all-gather [dcpre|dzpre] -> one dot with the
              interleaved [Vrow|Vzrow] stack gives dcpre@V^T + dzpre@Vz^T,
              and one batch-contraction gives both dV row accumulations
  GRU bwd:    all-gather dcpre (dry = dcpre_full @ Vrow^T is needed
              WITHIN the step — the GRU's inherent critical-path product,
              pallas_ann.py module docstring), then one stacked
              all-gather [dzpre|drpre] against the [Vzrow|Vrrow] stack

Backpressure: every exchange sits on the value-dependency chain that
makes two parity slots sufficient (pallas_tp.py docstring). For the
interleaved two-exchange steps (GRU) each exchange type lands on a fixed
parity lane and the OTHER exchange provides the round trip: a sender's
step-k+1 dcpre depends (through the carried adjoint / the gathered r*y)
on having received every peer's step-k second-exchange block, which each
peer only sends after its own first-exchange consumption.

Normalization and dropout stay OUTSIDE the TP kernels (apply-mode norm,
XLA dropout), matching the spiking TP policy: above the single-chip caps
that arrangement is measured ~free (docs/STATUS.md "Wide layers" fair
A/B) and keeps the distributed kernel surface auditable.

Semantics match ``cells.{rnn,ligru,gru}_scan`` on the gathered arrays —
themselves pinned against the torch reference
(/root/reference/sparch/models/anns.py:328-339,449-462,581-595).
Multi-device behavior is pinned on the virtual CPU mesh via the TPU
interpret mode's DMA/semaphore simulation (tests/test_pallas_tp_ann.py);
P=1 on-chip cases live in tools/check_kernels.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparch_tpu.ops.pallas_ann import _dot, _dotT, _outer_acc
from sparch_tpu.ops.pallas_cells import _pick_tc
from sparch_tpu.ops.pallas_tp import (
    _ag_exchange,
    _collective_barrier,
    _interpret,
    _mesh_interpret,
    _validate_tp,
    _LANE,
    _SUBLANE,
)

__all__ = [
    "rnn_tp_pallas",
    "ligru_tp_pallas",
    "gru_tp_pallas",
    "rnn_tp_sharded",
    "ligru_tp_sharded",
    "gru_tp_sharded",
]

# per-mode static structure (mirrors pallas_ann._MODES):
#   n_wx: input drive streams; n_v: recurrent matrices; gates: residual
#   streams the backward needs; fwd_x / bwd_x: exchanges per step
_MODES = {
    "rnn": dict(n_wx=1, n_v=1, gates=(), fwd_x=1, bwd_stack=1),
    "ligru": dict(n_wx=2, n_v=2, gates=("z", "c"), fwd_x=1, bwd_stack=2),
    "gru": dict(n_wx=3, n_v=3, gates=("z", "r", "c"), fwd_x=2, bwd_stack=2),
}

_TP_ANN_VMEM_BUDGET = 64 * 1024 * 1024


def _tp_ann_tile_plan(B, Hl, Hg, tc, *, streams_bytes, mat_bytes,
                      slot_cols, slot_bytes):
    """Batch tile under the TP-ANN VMEM model: double-buffered
    (tc, bt, Hl) streams + resident matrices (independent of bt) +
    the gather slot planes (2, bt, slot_cols) + a few (bt, *) states."""
    bt = B
    for cand in (128, 64, 32, 16, 8):
        if B % cand == 0:
            bt = cand
            break
    while bt > _SUBLANE and (
        2 * streams_bytes * tc * bt * Hl
        + mat_bytes
        + 2 * slot_bytes * bt * slot_cols
        + 48 * bt * Hl
    ) > _TP_ANN_VMEM_BUDGET:
        bt //= 2
    return bt


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _tp_ann_fwd_kernel(*refs, tc, T, mode, save_residuals, mxu_bf16,
                       axis_name, num_devices, hloc):
    m = _MODES[mode]
    refs = list(refs)
    wx_refs = refs[: m["n_wx"]]
    del refs[: m["n_wx"]]
    v_refs = refs[: m["n_v"]]
    del refs[: m["n_v"]]
    y0f_ref = refs.pop(0)  # pre-gathered (bt, Hg) initial state
    n_out = 1 + (len(m["gates"]) + 1 if save_residuals else 0)
    outs = refs[:n_out]
    y_out_ref = outs[0]
    gate_out_refs = outs[1:-1] if save_residuals else []
    yb_out_ref = outs[-1] if save_residuals else None
    scrs = refs[n_out:]
    y_scr = scrs[0]
    n_carry = 1 if mode == "rnn" else 2
    carry_scrs = scrs[1 : 1 + n_carry]
    stage, slots, send_sems, recv_sems = scrs[1 + n_carry :]

    i = pl.program_id(0)
    t = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when((i == 0) & (t == 0))
    def _enter():
        _collective_barrier(axis_name, num_devices)

    my = lax.axis_index(axis_name)
    v_mats = [v_ref[:, :] for v_ref in v_refs]

    @pl.when(t == 0)
    def _init():
        y0f = y0f_ref[:, :]
        # local block via a dynamic REF slice (Mosaic cannot lower
        # dynamic_slice on values)
        y_scr[:, :] = y0f_ref[:, pl.ds(my * hloc, hloc)]
        if mode == "rnn":
            carry_scrs[0][:, :] = _dot(y0f, v_mats[0], mxu_bf16)
        elif mode == "ligru":
            carry_scrs[0][:, :] = _dot(y0f, v_mats[0], mxu_bf16)  # y @ V
            carry_scrs[1][:, :] = _dot(y0f, v_mats[1], mxu_bf16)  # y @ Vz
        else:  # gru
            carry_scrs[0][:, :] = _dot(y0f, v_mats[1], mxu_bf16)  # y @ Vz
            carry_scrs[1][:, :] = _dot(y0f, v_mats[2], mxu_bf16)  # y @ Vr

    y = y_scr[:, :]
    carries = [c[:, :] for c in carry_scrs]

    if save_residuals:
        yb_out_ref[:, :] = y

    # global exchange counter: exchanges run EVERY step (incl. dead tail
    # steps, whose gathered garbage is only ever consumed by later dead
    # steps or re-initialised carries) so the sequence is SPMD-identical
    epstep = m["fwd_x"]
    base = (i * n_chunks + t) * tc * epstep

    def gather(val, parity):
        stage[:, :] = val.astype(stage.dtype)
        _ag_exchange(
            stage, slots, parity, send_sems, recv_sems,
            axis_name=axis_name, num_devices=num_devices, hloc=hloc,
        )
        return slots[parity, :, :]

    for k in range(tc):  # static unroll
        if mode == "rnn":
            y = jax.nn.sigmoid(wx_refs[0][k, :, :] + carries[0])
            gate_vals = ()
        elif mode == "ligru":
            z = jax.nn.sigmoid(wx_refs[1][k, :, :] + carries[1])
            c = jax.nn.relu(wx_refs[0][k, :, :] + carries[0])
            y = z * y + (1.0 - z) * c
            gate_vals = (z, c)
        else:  # gru
            z = jax.nn.sigmoid(wx_refs[1][k, :, :] + carries[0])
            r = jax.nn.sigmoid(wx_refs[2][k, :, :] + carries[1])
            ry_full = gather(r * y, lax.rem(base + epstep * k, 2))
            c = jnp.tanh(
                wx_refs[0][k, :, :] + _dot(ry_full, v_mats[0], mxu_bf16)
            )
            y = z * y + (1.0 - z) * c
            gate_vals = (z, r, c)
        y_full = gather(y, lax.rem(base + epstep * k + (epstep - 1), 2))
        if mode == "rnn":
            carries[0] = _dot(y_full, v_mats[0], mxu_bf16)
        elif mode == "ligru":
            carries[0] = _dot(y_full, v_mats[0], mxu_bf16)
            carries[1] = _dot(y_full, v_mats[1], mxu_bf16)
        else:
            carries[0] = _dot(y_full, v_mats[1], mxu_bf16)
            carries[1] = _dot(y_full, v_mats[2], mxu_bf16)
        y_out_ref[k, :, :] = y.astype(y_out_ref.dtype)
        if save_residuals:
            for gref, gval in zip(gate_out_refs, gate_vals):
                gref[k, :, :] = gval.astype(gref.dtype)

    y_scr[:, :] = y
    for scr, val in zip(carry_scrs, carries):
        scr[:, :] = val


def _tp_ann_forward(wxs, vs, y0, *, mode, save_residuals, mxu_bf16,
                    axis_name, num_devices, interpret=None):
    """Per-shard fused TP ANN forward (run under shard_map on the TP
    axis). Shapes: each Wx (B, T, Hl); each V column shard (P*Hl, Hl);
    y0 (B, Hl)."""
    m = _MODES[mode]
    B, T, Hl = wxs[0].shape
    Hg = Hl * num_devices
    if B % _SUBLANE or Hl % _LANE:
        raise ValueError(
            f"TP ANN kernel needs B%{_SUBLANE}==0 and Hl%{_LANE}==0, got "
            f"B={B} Hl={Hl} (use the scan cells / GSPMD otherwise)"
        )
    dtype = jnp.float32
    rdt = jnp.bfloat16 if mxu_bf16 else dtype  # stream + wire dtype
    vdt = jnp.bfloat16 if mxu_bf16 else dtype
    tc = _pick_tc(T, Hl)
    n_gates = len(m["gates"])
    s = 2 if mxu_bf16 else 4
    vb = 2 if mxu_bf16 else 4
    bt = _tp_ann_tile_plan(
        B, Hl, Hg, tc,
        streams_bytes=4 * m["n_wx"] + s * (1 + n_gates),
        mat_bytes=m["n_v"] * vb * Hg * Hl,
        slot_cols=Hg, slot_bytes=s,
    )
    n_chunks = (T + tc - 1) // tc

    # one XLA all-gather of the initial state (once per call, not per
    # step); tiled concat in axis order matches the kernel's slot order
    y0f = lax.all_gather(y0.astype(dtype), axis_name, axis=1, tiled=True)
    wxs_t = [jnp.swapaxes(w, 0, 1) for w in wxs]  # (T, B, Hl) time-major

    kernel = functools.partial(
        _tp_ann_fwd_kernel, tc=tc, T=T, mode=mode,
        save_residuals=save_residuals, mxu_bf16=mxu_bf16,
        axis_name=axis_name, num_devices=num_devices, hloc=Hl,
    )
    bh = lambda i, t: (i, 0)  # noqa: E731
    tbh = lambda i, t: (t, i, 0)  # noqa: E731
    bnd_map = lambda i, t: (i, t)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hl), tbh, memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((Hg, Hl), rep2, memory_space=pltpu.VMEM)
    full_state_spec = pl.BlockSpec((bt, Hg), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hl), bnd_map, memory_space=pltpu.VMEM)

    if save_residuals:
        out_specs = (tm_spec,) * (1 + n_gates) + (bnd_spec,)
        out_shape = tuple(
            [jax.ShapeDtypeStruct((T, B, Hl), rdt)] * (1 + n_gates)
            + [jax.ShapeDtypeStruct((B, n_chunks * Hl), dtype)]
        )
    else:
        out_specs = (tm_spec,)
        out_shape = (jax.ShapeDtypeStruct((T, B, Hl), rdt),)

    n_carry = 1 if mode == "rnn" else 2
    nd1 = max(num_devices - 1, 1)
    outs = pl.pallas_call(
        kernel,
        grid=(B // bt, n_chunks),
        in_specs=(
            [tm_spec] * m["n_wx"]
            + [mat_spec] * m["n_v"]
            + [full_state_spec]
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((bt, Hl), jnp.float32)] * (1 + n_carry)
            + [
                pltpu.VMEM((bt, Hl), rdt),  # exchange staging
                pltpu.VMEM((2, bt, Hg), rdt),  # gather slots (parity)
                pltpu.SemaphoreType.DMA((2, nd1)),
                pltpu.SemaphoreType.DMA((2, nd1)),
            ]
        ),
        interpret=_interpret(interpret),
        compiler_params=pltpu.CompilerParams(
            # Mosaic requires None when no barrier semaphore is used (P=1)
            collective_id=4 if num_devices > 1 else None,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*wxs_t, *[v.astype(vdt) for v in vs], y0f)

    y_logical = jnp.swapaxes(outs[0], 0, 1)
    if not save_residuals:
        return y_logical, None
    return y_logical, tuple(outs)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _tp_ann_bwd_kernel(*refs, tc, T, mode, mxu_bf16,
                       axis_name, num_devices, hloc):
    m = _MODES[mode]
    n_gates = len(m["gates"])
    n_wx = m["n_wx"]
    refs = list(refs)
    g_ref = refs.pop(0)
    y_ref = refs.pop(0)
    gate_refs = refs[:n_gates]
    del refs[:n_gates]
    yb_ref = refs.pop(0)
    # stacked row-shard matrices: rnn [Vrow]; ligru [stack(V,Vz)];
    # gru [Vrow (for dry), stack(Vz,Vr)]
    n_mats = 2 if mode == "gru" else 1
    vmat_refs = refs[:n_mats]
    del refs[:n_mats]
    dwx_refs = refs[:n_wx]
    del refs[:n_wx]
    dv_refs = refs[:n_mats]
    del refs[:n_mats]
    dy0_ref = refs.pop(0)
    D_scr = refs.pop(0)
    if mode == "gru":
        stage_a, slots_a, stage_b, slots_b, send_sems, recv_sems = refs
    else:
        stage_b, slots_b, send_sems, recv_sems = refs

    i = pl.program_id(0)
    kc = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    first = kc == 0
    last = kc == n_chunks - 1
    n_chunks_static = (T + tc - 1) // tc
    tail_len = T - (n_chunks_static - 1) * tc

    @pl.when((i == 0) & (kc == 0))
    def _enter():
        _collective_barrier(axis_name, num_devices)

    @pl.when(first)
    def _init_adjoint():
        D_scr[:, :] = jnp.zeros_like(D_scr)

    @pl.when(first & (i == 0))
    def _init_accumulators():
        for dv_ref in dv_refs:
            dv_ref[:, :] = jnp.zeros_like(dv_ref)

    v_mats = [v_ref[:, :] for v_ref in vmat_refs]
    if mxu_bf16:
        v_mats = [v.astype(jnp.bfloat16) for v in v_mats]
    dv_accs = [jnp.zeros_like(dv_ref) for dv_ref in dv_refs]
    D = D_scr[:, :]
    epstep = 2 if mode == "gru" else 1
    base = (i * n_chunks + kc) * tc * epstep

    def gather(stage, slots, vals, parity):
        for j, val in enumerate(vals):
            stage[:, j * hloc : (j + 1) * hloc] = val.astype(stage.dtype)
        _ag_exchange(
            stage, slots, parity, send_sems, recv_sems,
            axis_name=axis_name, num_devices=num_devices,
            hloc=hloc * len(vals),
        )
        return slots[parity, :, :]

    for k in range(tc - 1, -1, -1):  # reverse static unroll
        g_t = g_ref[k, :, :].astype(jnp.float32)
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
        xk = base + epstep * (tc - 1 - k)
        if mode == "rnn":
            dpre = G * y_t * (1.0 - y_t)
            dwx_refs[0][k, :, :] = dpre.astype(dwx_refs[0].dtype)
            D_full = gather(stage_b, slots_b, (dpre,), lax.rem(xk, 2))
            D = _dotT(D_full, v_mats[0], mxu_bf16)
            dv_accs[0] = dv_accs[0] + _outer_acc(y_p, D_full, mxu_bf16)
        elif mode == "ligru":
            z, c = gates
            dcpre = jnp.where(c > 0, G * (1.0 - z), 0.0)
            dzpre = G * (y_p - c) * z * (1.0 - z)
            dwx_refs[0][k, :, :] = dcpre.astype(dwx_refs[0].dtype)
            dwx_refs[1][k, :, :] = dzpre.astype(dwx_refs[1].dtype)
            # ONE stacked exchange: the gathered [dcpre_p|dzpre_p] plane
            # against the interleaved [Vrow|Vzrow] stack yields
            # dcpre@V^T + dzpre@Vz^T in one MXU pass, and one
            # batch-contraction accumulates BOTH dV row shards
            Dst = gather(stage_b, slots_b, (dcpre, dzpre), lax.rem(xk, 2))
            R = _dotT(Dst, v_mats[0], mxu_bf16)
            dv_accs[0] = dv_accs[0] + _outer_acc(y_p, Dst, mxu_bf16)
            D = G * z + R
        else:  # gru
            z, r, c = gates
            dcpre = G * (1.0 - z) * (1.0 - c * c)
            dwx_refs[0][k, :, :] = dcpre.astype(dwx_refs[0].dtype)
            # dry is needed within this step (for drpre and the adjoint):
            # the GRU's inherent critical-path product
            dc_full = gather(stage_a, slots_a, (dcpre,), lax.rem(xk, 2))
            dry = _dotT(dc_full, v_mats[0], mxu_bf16)
            dv_accs[0] = dv_accs[0] + _outer_acc(r * y_p, dc_full, mxu_bf16)
            dzpre = G * (y_p - c) * z * (1.0 - z)
            drpre = dry * y_p * r * (1.0 - r)
            dwx_refs[1][k, :, :] = dzpre.astype(dwx_refs[1].dtype)
            dwx_refs[2][k, :, :] = drpre.astype(dwx_refs[2].dtype)
            Dst = gather(stage_b, slots_b, (dzpre, drpre),
                         lax.rem(xk + 1, 2))
            P2 = _dotT(Dst, v_mats[1], mxu_bf16)
            dv_accs[1] = dv_accs[1] + _outer_acc(y_p, Dst, mxu_bf16)
            D = G * z + dry * r + P2

    D_scr[:, :] = D
    for dv_ref, acc in zip(dv_refs, dv_accs):
        dv_ref[:, :] += acc

    @pl.when(last)
    def _dy0():
        dy0_ref[:, :] = D_scr[:, :]


def _tp_ann_backward(g, residuals, vstacks, *, mode, mxu_bf16,
                     axis_name, num_devices, interpret=None):
    """Per-shard fused TP ANN backward. ``vstacks``: the row-shard
    matrices, interleaved per peer (see the caller). Returns dWx streams,
    the interleaved row-sharded dV stacks, and dy0."""
    m = _MODES[mode]
    n_gates = len(m["gates"])
    n_wx = m["n_wx"]
    y_seq = residuals[0]
    gate_seqs = residuals[1 : 1 + n_gates]
    yb = residuals[-1]
    B, T, Hl = g.shape
    Hg = Hl * num_devices
    dtype = jnp.float32
    sdt = jnp.bfloat16 if mxu_bf16 else dtype
    tc = _pick_tc(T, Hl)
    stack_w = m["bwd_stack"]
    s = 2 if mxu_bf16 else 4
    vb = 2 if mxu_bf16 else 4
    n_mats = 2 if mode == "gru" else 1
    tot_mat_cols = sum(vs.shape[1] for vs in vstacks)  # in units of Hg*Hl
    slot_cols = (Hg + stack_w * Hg) if mode == "gru" else stack_w * Hg
    bt = _tp_ann_tile_plan(
        B, Hl, Hg, tc,
        streams_bytes=s * (2 + n_gates + n_wx),
        mat_bytes=(vb + 8) * Hl * tot_mat_cols,
        slot_cols=slot_cols, slot_bytes=s,
    )
    n_chunks = (T + tc - 1) // tc

    g_t = jnp.swapaxes(g.astype(sdt), 0, 1)

    kernel = functools.partial(
        _tp_ann_bwd_kernel, tc=tc, T=T, mode=mode, mxu_bf16=mxu_bf16,
        axis_name=axis_name, num_devices=num_devices, hloc=Hl,
    )
    rev_tm = lambda i, t: (n_chunks - 1 - t, i, 0)  # noqa: E731
    rev_bnd = lambda i, t: (i, n_chunks - 1 - t)  # noqa: E731
    bh = lambda i, t: (i, 0)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hl), rev_tm, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, Hl), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hl), rev_bnd, memory_space=pltpu.VMEM)
    mat_specs = [
        pl.BlockSpec(vs.shape, rep2, memory_space=pltpu.VMEM)
        for vs in vstacks
    ]

    nd1 = max(num_devices - 1, 1)
    gru_scr = []
    if mode == "gru":
        gru_scr = [
            pltpu.VMEM((bt, Hl), sdt),  # dcpre staging
            pltpu.VMEM((2, bt, Hg), sdt),  # dcpre gather slots
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(B // bt, n_chunks),
        in_specs=(
            [tm_spec]  # g
            + [tm_spec] * (1 + n_gates)  # y + gates
            + [bnd_spec]  # y left boundary
            + mat_specs
        ),
        out_specs=(
            tuple([tm_spec] * n_wx)
            + tuple(mat_specs)
            + (state_spec,)
        ),
        out_shape=(
            tuple(
                jax.ShapeDtypeStruct((T, B, Hl), sdt) for _ in range(n_wx)
            )
            + tuple(
                jax.ShapeDtypeStruct(vs.shape, dtype) for vs in vstacks
            )
            + (jax.ShapeDtypeStruct((B, Hl), dtype),)
        ),
        scratch_shapes=(
            [pltpu.VMEM((bt, Hl), jnp.float32)]  # carried adjoint D
            + gru_scr
            + [
                pltpu.VMEM((bt, stack_w * Hl), sdt),  # stacked staging
                pltpu.VMEM((2, bt, stack_w * Hg), sdt),  # stacked slots
                pltpu.SemaphoreType.DMA((2, nd1)),
                pltpu.SemaphoreType.DMA((2, nd1)),
            ]
        ),
        interpret=_interpret(interpret),
        compiler_params=pltpu.CompilerParams(
            collective_id=5 if num_devices > 1 else None,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(g_t, y_seq, *gate_seqs, yb,
      *[vs.astype(jnp.bfloat16 if mxu_bf16 else dtype) for vs in vstacks])

    dwxs = [jnp.swapaxes(o, 0, 1).astype(g.dtype) for o in outs[:n_wx]]
    dvstacks = list(outs[n_wx : n_wx + n_mats])
    dy0 = outs[-1]
    return dwxs, dvstacks, dy0


# ---------------------------------------------------------------------------
# Row-shard (de)interleaving + custom_vjp wrappers
# ---------------------------------------------------------------------------


def _row_shard(Vcol, axis_name):
    """Column shard (Hg, Hl) -> row shard (Hl, Hg) by one all_to_all
    (block transpose of the sharding, NOT of the matrix)."""
    return lax.all_to_all(
        Vcol, axis_name, split_axis=0, concat_axis=1, tiled=True
    )


def _interleave(rows, num_devices):
    """Row shards [(Hl, Hg)] * k -> (Hl, k*Hg) with per-peer blocks
    [m0_p | m1_p | ...] — the layout a stacked gather produces, so ONE
    dot against this matrix sums every per-matrix product."""
    Hl, Hg = rows[0].shape
    stacked = jnp.stack(
        [r.reshape(Hl, num_devices, Hl) for r in rows], axis=2
    )  # (Hl, P, k, Hl)
    return stacked.reshape(Hl, len(rows) * Hg)


def _deinterleave(stack, k, num_devices):
    """Inverse of :func:`_interleave` for the accumulated dV stacks."""
    Hl = stack.shape[0]
    Hg = stack.shape[1] // k
    parts = stack.reshape(Hl, num_devices, k, Hl)
    return [parts[:, :, j, :].reshape(Hl, Hg) for j in range(k)]


def _col_shard(dv_rows, axis_name):
    """Row-sharded (Hl, Hg) gradient -> column-sharded (Hg, Hl)."""
    return lax.all_to_all(
        dv_rows, axis_name, split_axis=1, concat_axis=0, tiled=True
    )


@functools.lru_cache(maxsize=None)
def _get_tp_ann_op(mode: str, mxu_bf16: bool, axis_name: str,
                   num_devices: int, interpret=None):
    """custom_vjp'd per-shard TP ANN cell op (one cached instance per
    config, mirroring pallas_tp._get_tp_op). Args: (*wxs, *vs, y0)."""
    m = _MODES[mode]
    n_wx, n_v = m["n_wx"], m["n_v"]

    def split(args):
        return args[:n_wx], args[n_wx : n_wx + n_v], args[-1]

    @jax.custom_vjp
    def op(*args):
        wxs, vs, y0 = split(args)
        y, _ = _tp_ann_forward(
            list(wxs), list(vs), y0, mode=mode, save_residuals=False,
            mxu_bf16=mxu_bf16, axis_name=axis_name,
            num_devices=num_devices, interpret=interpret,
        )
        return y.astype(wxs[0].dtype)

    def fwd(*args):
        wxs, vs, y0 = split(args)
        y, res = _tp_ann_forward(
            list(wxs), list(vs), y0, mode=mode, save_residuals=True,
            mxu_bf16=mxu_bf16, axis_name=axis_name,
            num_devices=num_devices, interpret=interpret,
        )
        # zero-length dtype tokens: the cotangents must match the primal
        # dtypes (custom_vjp contract — mirrors pallas_cells._make_op)
        return y.astype(wxs[0].dtype), (
            res, vs, wxs[0][:0], y0[:0]
        )

    def bwd(pack, gcot):
        res, vs, wx_tok, y0_tok = pack
        if mode == "gru":
            vstacks = [
                _row_shard(vs[0], axis_name),
                _interleave(
                    [_row_shard(v, axis_name) for v in vs[1:]], num_devices
                ),
            ]
        else:
            vstacks = [
                _interleave(
                    [_row_shard(v, axis_name) for v in vs], num_devices
                )
            ]
        dwxs, dvstacks, dy0 = _tp_ann_backward(
            gcot, res, vstacks, mode=mode, mxu_bf16=mxu_bf16,
            axis_name=axis_name, num_devices=num_devices,
            interpret=interpret,
        )
        if mode == "gru":
            dv_rows = [dvstacks[0]] + _deinterleave(
                dvstacks[1], 2, num_devices
            )
        else:
            dv_rows = _deinterleave(dvstacks[0], n_v, num_devices)
        dvs = [
            _col_shard(dv, axis_name).astype(v.dtype)
            for dv, v in zip(dv_rows, vs)
        ]
        dwxs = [d.astype(wx_tok.dtype) for d in dwxs]
        return (*dwxs, *dvs, dy0.astype(y0_tok.dtype))

    op.defvjp(fwd, bwd)
    return op


def rnn_tp_pallas(Wx, V, y0, *, axis_name: str, num_devices: int,
                  mxu_bf16: bool = False, interpret=None):
    """Tensor-parallel fused sigmoid-RNN (per-shard; run under
    shard_map). Semantics: cells.rnn_scan on the gathered arrays
    (reference anns.py:328-339)."""
    op = _get_tp_ann_op("rnn", bool(mxu_bf16), axis_name,
                        int(num_devices), interpret=interpret)
    return op(Wx, V, y0)


def ligru_tp_pallas(Wx, Wzx, V, Vz, y0, *, axis_name: str,
                    num_devices: int, mxu_bf16: bool = False,
                    interpret=None):
    """Tensor-parallel fused LiGRU (per-shard; run under shard_map).
    Semantics: cells.ligru_scan on the gathered arrays
    (reference anns.py:449-462)."""
    op = _get_tp_ann_op("ligru", bool(mxu_bf16), axis_name,
                        int(num_devices), interpret=interpret)
    return op(Wx, Wzx, V, Vz, y0)


def gru_tp_pallas(Wx, Wzx, Wrx, V, Vz, Vr, y0, *, axis_name: str,
                  num_devices: int, mxu_bf16: bool = False,
                  interpret=None):
    """Tensor-parallel fused GRU (per-shard; run under shard_map).
    Semantics: cells.gru_scan on the gathered arrays
    (reference anns.py:581-595)."""
    op = _get_tp_ann_op("gru", bool(mxu_bf16), axis_name,
                        int(num_devices), interpret=interpret)
    return op(Wx, Wzx, Wrx, V, Vz, Vr, y0)


# ---------------------------------------------------------------------------
# Full-array sharded entry points (model-layer integration)
# ---------------------------------------------------------------------------
#
# Cached jitted shard_maps per (mesh, config), for the same reasons as
# pallas_tp's entry points: eager callers must not retrace per call, and
# an EAGER grad of a bare shard_map trips an XLA sharding-override
# assertion on 1-D parameter cotangents (jit-of-shard_map avoids it).


def _tp_mesh_args(mesh, tp_axis, batch_axis):
    nd = mesh.shape[tp_axis]
    b = (
        batch_axis
        if batch_axis is not None and batch_axis in mesh.shape
        else None
    )
    return nd, b


@functools.lru_cache(maxsize=None)
def _ann_tp_fn(mesh, mode, tp_axis, b, nd, mxu_bf16, interp):
    from jax.sharding import PartitionSpec as P

    m = _MODES[mode]
    fn = {"rnn": rnn_tp_pallas, "ligru": ligru_tp_pallas,
          "gru": gru_tp_pallas}[mode]

    def per_shard(*args):
        return fn(
            *args, axis_name=tp_axis, num_devices=nd, mxu_bf16=mxu_bf16,
            interpret=interp,
        ).astype(args[0].dtype)

    in_specs = (
        (P(b, None, tp_axis),) * m["n_wx"]
        + (P(None, tp_axis),) * m["n_v"]
        + (P(b, tp_axis),)
    )
    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=in_specs,
        out_specs=P(b, None, tp_axis), check_vma=False,
    ))


def rnn_tp_sharded(mesh, Wx, V, y0, *, tp_axis: str = "model",
                   batch_axis=None, mxu_bf16: bool = False):
    """Full-array RNN over a mesh: neuron-sharded fused kernel with the
    per-step in-kernel y all-gather. Drop-in for cells.rnn_scan."""
    nd, b = _tp_mesh_args(mesh, tp_axis, batch_axis)
    _validate_tp(Wx.shape[-1], nd)
    fn = _ann_tp_fn(mesh, "rnn", tp_axis, b, nd, bool(mxu_bf16),
                    _mesh_interpret(mesh))
    return fn(Wx, V, y0)


def ligru_tp_sharded(mesh, Wx, Wzx, V, Vz, y0, *, tp_axis: str = "model",
                     batch_axis=None, mxu_bf16: bool = False):
    """Full-array LiGRU over a mesh (drop-in for cells.ligru_scan)."""
    nd, b = _tp_mesh_args(mesh, tp_axis, batch_axis)
    _validate_tp(Wx.shape[-1], nd)
    fn = _ann_tp_fn(mesh, "ligru", tp_axis, b, nd, bool(mxu_bf16),
                    _mesh_interpret(mesh))
    return fn(Wx, Wzx, V, Vz, y0)


def gru_tp_sharded(mesh, Wx, Wzx, Wrx, V, Vz, Vr, y0, *,
                   tp_axis: str = "model", batch_axis=None,
                   mxu_bf16: bool = False):
    """Full-array GRU over a mesh (drop-in for cells.gru_scan)."""
    nd, b = _tp_mesh_args(mesh, tp_axis, batch_axis)
    _validate_tp(Wx.shape[-1], nd)
    fn = _ann_tp_fn(mesh, "gru", tp_axis, b, nd, bool(mxu_bf16),
                    _mesh_interpret(mesh))
    return fn(Wx, Wzx, Wrx, V, Vz, Vr, y0)
