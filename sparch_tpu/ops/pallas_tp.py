"""Tensor-parallel fused spiking cells: in-kernel ICI collectives (Pallas).

Why this exists: the fused cell kernels (``pallas_cells.py``) keep neuron
state and the recurrent matrix V resident in VMEM across the whole time
loop. Above the per-chip VMEM H-caps the 'auto' path falls back to scan
cells, whose per-step matmuls GSPMD can shard over the 'model' mesh axis
— but the scan pays the HBM carry round-trip the kernels exist to avoid
(1.3-2.3x slower at wide H, docs/STATUS.md "Wide layers"). Closing that
gap needs the collective INSIDE the Mosaic time loop: with neurons
column-sharded over P chips, each step's recurrent drive
``s_full @ V[:, shard]`` needs the full spike vector, i.e. a per-step
all-gather of the (bt, H/P) local spikes (forward) and a per-step
reduce-scatter of the ``((1-alpha)*A) @ V_loc^T`` partial (backward).

This module provides those collectives as kernel-side building blocks
plus standalone Pallas kernels that pin their semantics:

- ``_collective_barrier``: sync all chips on the TP axis at kernel entry
  (a remote DMA must never land before its target ring buffer exists).
- ``_ag_exchange``: every chip broadcasts its (bt, Hloc) block into the
  matching column block of every peer's gather buffer — offset-d shifted
  permutes, d = 1..P-1, on distinct DMA-semaphore lanes.
- ``_rs_exchange``: every chip sends column block q of its (bt, H)
  partial to chip q; the receiver sums its P-1 arrival slots + its own
  local block — the scatter-reduce dual of the gather.

Double-buffering discipline: exchanges alternate between two parity
slots, and the DMA semaphores are parity-indexed to match — two DMAs
between the same pair of chips are NOT ordered, so a step-k+1 arrival
can signal before the step-k arrival lands; with a shared semaphore
lane the step-k wait would consume that signal and read unwritten
memory (observed as NaN slots on the interpret-mode simulator before
the lanes were split). The spike dataflow itself provides the
backpressure against deeper reuse — a sender cannot reuse a parity slot
(step k+2) before computing its step-k+1 state, which requires the
receiver's step-k+1 block, which the receiver only sends after its
step-k dot consumed that slot — so no credit semaphores are needed.

Validation: the TPU interpret mode (``pltpu.InterpretParams``) simulates
the remote DMAs + semaphores across the virtual CPU mesh devices, so the
kernels are testable on the 8-device CPU mesh (tests/test_pallas_tp.py)
— the same standard the seqpipe subsystem is held to. On real hardware
the collectives ride ICI; no multi-chip TPU is available in this
environment, so on-chip evidence is limited to a P=1 compile/run smoke
(the remote-copy code path degenerates to self-copies).

Reference: the reference has no parallelism of any kind (SURVEY.md §2,
/root/reference/sparch/exp.py:81 is its entire device story); this is
TPU-native substrate, not a port. The cell dynamics match
/root/reference/sparch/models/snns.py:554-727 via ops/cells.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "tp_all_gather",
    "tp_reduce_scatter",
    "rlif_tp_pallas",
    "radlif_tp_pallas",
    "zero_diag_shard",
]

_LANE = 128
_SUBLANE = 8


def _interpret(flag=None):
    """Interpret-mode params. ``flag`` pins the decision (the sharded
    entry points derive it from their MESH's platform — the process
    default backend may be the axon TPU while the mesh is the virtual
    CPU one, and the custom_vjp bwd binds its pallas_call only when the
    OUTER grad is traced, so the flag must ride the op closures)."""
    if flag is None:
        flag = jax.default_backend() != "tpu"
    if flag:
        return pltpu.InterpretParams()
    return False


def _collective_barrier(axis_name: str, num_devices: int):
    """Block until every chip on the TP axis has entered the kernel."""
    if num_devices == 1:
        return
    sem = pltpu.get_barrier_semaphore()
    my = lax.axis_index(axis_name)
    for d in range(1, num_devices):
        pltpu.semaphore_signal(
            sem,
            device_id={axis_name: lax.rem(my + d, num_devices)},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
    pltpu.semaphore_wait(sem, num_devices - 1)


def _ag_exchange(
    stage_ref,
    slots_ref,
    parity,
    send_sems,
    recv_sems,
    *,
    axis_name: str,
    num_devices: int,
    hloc: int,
):
    """All-gather ``stage_ref`` (bt, Hloc) into ``slots_ref[parity]``
    (bt, P*Hloc), shard-order columns. Blocks until all P-1 receives (and
    this chip's sends) complete; the caller then reads the full plane."""
    my = lax.axis_index(axis_name)
    # own block: plain VMEM store into my column slot
    slots_ref[parity, :, pl.ds(my * hloc, hloc)] = stage_ref[:, :]
    copies = []
    for d in range(1, num_devices):
        dst = lax.rem(my + d, num_devices)
        copy = pltpu.make_async_remote_copy(
            src_ref=stage_ref,
            dst_ref=slots_ref.at[parity, :, pl.ds(my * hloc, hloc)],
            send_sem=send_sems.at[parity, d - 1],
            recv_sem=recv_sems.at[parity, d - 1],
            device_id={axis_name: dst},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        copy.start()
        copies.append(copy)
    for copy in copies:
        # waits this chip's send AND the symmetric offset-d receive
        # (the sender at (my-d) mod P targeted the same semaphore lane)
        copy.wait()


def _rs_exchange(
    part_ref,
    slots_ref,
    parity,
    send_sems,
    recv_sems,
    *,
    axis_name: str,
    num_devices: int,
    hloc: int,
):
    """Scatter-reduce a (bt, P*Hloc) partial: column block q of
    ``part_ref`` is sent to chip q, landing in ``slots_ref[parity, d-1]``
    (d = sender offset). Returns the (bt, Hloc) sum of this chip's own
    block + the P-1 arrivals."""
    my = lax.axis_index(axis_name)
    copies = []
    for d in range(1, num_devices):
        dst = lax.rem(my + d, num_devices)
        copy = pltpu.make_async_remote_copy(
            src_ref=part_ref.at[:, pl.ds(dst * hloc, hloc)],
            dst_ref=slots_ref.at[parity, d - 1],
            send_sem=send_sems.at[parity, d - 1],
            recv_sem=recv_sems.at[parity, d - 1],
            device_id={axis_name: dst},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        copy.start()
        copies.append(copy)
    for copy in copies:
        copy.wait()
    acc = part_ref[:, pl.ds(my * hloc, hloc)]
    for d in range(1, num_devices):
        acc = acc + slots_ref[parity, d - 1]
    return acc


# ---------------------------------------------------------------------------
# Standalone collective kernels (semantics pins for the building blocks)
# ---------------------------------------------------------------------------


def _ag_kernel(x_ref, out_ref, stage, slots, send_sems, recv_sems, *,
               axis_name, num_devices, hloc, rounds):
    _collective_barrier(axis_name, num_devices)
    my = lax.axis_index(axis_name)
    # run `rounds` back-to-back exchanges through the two parity slots to
    # exercise slot reuse. Each round's staging DEPENDS on the previous
    # gather's consumed value — the same producer->consumer chain the cell
    # kernels have (next spike state depends on the gathered s @ V drive),
    # which is what makes two parity slots sufficient: a sender cannot
    # reuse a slot before the receiver consumed it, because its own next
    # block transitively requires the receiver's previous block. An
    # UNCHAINED rounds loop here races (observed on the interpret-mode
    # simulator: stale/NaN slots) — exactly the discipline being pinned.
    prev = None
    for r in range(rounds):
        if r == 0:
            stage[:, :] = x_ref[:, :]
        else:
            # my own column of the previous gather == my previous stage
            # (re-read from the ref: Mosaic cannot lower dynamic_slice on
            # values; the re-read stays inside the consumption chain —
            # the peer's overwrite of this slot is gated on this round's
            # send, which follows in program order)
            stage[:, :] = (
                slots[(r - 1) % 2, :, pl.ds(my * hloc, hloc)] + 1.0
            )
        _ag_exchange(
            stage, slots, r % 2, send_sems, recv_sems,
            axis_name=axis_name, num_devices=num_devices, hloc=hloc,
        )
        prev = slots[r % 2, :, :]
        out_ref[r] = prev


def tp_all_gather(x, *, axis_name: str, num_devices: int, rounds: int = 3):
    """Per-shard (B, Hloc) -> (rounds, B, P*Hloc); round r gathers x + r.

    Test harness for the in-kernel all-gather (call under shard_map)."""
    B, hloc = x.shape
    assert hloc % _LANE == 0, "TP shard width must be lane-aligned"
    H = hloc * num_devices
    kernel = functools.partial(
        _ag_kernel, axis_name=axis_name, num_devices=num_devices,
        hloc=hloc, rounds=rounds,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rounds, B, H), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, hloc), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2, max(num_devices - 1, 1))),
            pltpu.SemaphoreType.DMA((2, max(num_devices - 1, 1))),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(collective_id=0),
    )(x)


def _rs_kernel(x_ref, out_ref, stage, slots, send_sems, recv_sems, *,
               axis_name, num_devices, hloc, rounds):
    _collective_barrier(axis_name, num_devices)
    # Same chained-rounds discipline as _ag_kernel: round r+1's staged
    # partial depends on round r's reduced value, so slot reuse is gated
    # by consumption (the cell backward has the same chain: the next
    # adjoint partial D depends on the reduced recurrent term R).
    acc = None
    for r in range(rounds):
        if r == 0:
            stage[:, :] = x_ref[:, :]
        else:
            stage[:, :] = x_ref[:, :] + acc[:, 0:1]
        acc = _rs_exchange(
            stage, slots, r % 2, send_sems, recv_sems,
            axis_name=axis_name, num_devices=num_devices, hloc=hloc,
        )
        out_ref[r] = acc


def tp_reduce_scatter(x, *, axis_name: str, num_devices: int,
                      rounds: int = 3):
    """Per-shard (B, H) partial -> (rounds, B, Hloc); chained rounds:
    round 0 reduces ``x`` itself; round r>0 re-stages ``x + acc[:, 0:1]``
    (the previous round's reduced first column, broadcast) and reduces
    that — the consumption chain that makes two parity slots sufficient
    (see _rs_kernel). tests/test_pallas_tp.py pins the recurrence.

    Test harness for the in-kernel reduce-scatter (call under shard_map)."""
    B, H = x.shape
    assert H % (num_devices * _LANE) == 0
    hloc = H // num_devices
    kernel = functools.partial(
        _rs_kernel, axis_name=axis_name, num_devices=num_devices,
        hloc=hloc, rounds=rounds,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rounds, B, hloc), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((2, max(num_devices - 1, 1), B, hloc), jnp.float32),
            pltpu.SemaphoreType.DMA((2, max(num_devices - 1, 1))),
            pltpu.SemaphoreType.DMA((2, max(num_devices - 1, 1))),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(collective_id=1),
    )(x)


# ---------------------------------------------------------------------------
# Tensor-parallel fused recurrent spiking cells (RLIF / RadLIF)
# ---------------------------------------------------------------------------
#
# Sharding layout (per chip, P chips on the TP axis, Hl = H / P):
#   Wx, u0/w0/s0, alpha/beta/a/b, spike outputs:  neuron-sharded (…, Hl)
#   V forward:  column shard  V[:, shard]   (Hg=P*Hl rows, Hl cols)
#   V backward: row shard     V[shard, :]   (derived by one all_to_all)
#   dV:         accumulated row-sharded (Hl, Hg), transposed back to the
#               column sharding by one all_to_all after the kernel
#
# Per-step communication (both directions exactly ONE (bt, Hl) exchange):
#   forward:  all-gather the new local spikes  -> s_full @ V_col
#   backward: all-gather D = (1-alpha)*A       -> R = D_full @ V_row^T
#             (the recurrent adjoint term) and dV += s_loc^T @ D_full.
#   Gathering D instead of reduce-scattering partials keeps every
#   exchange on the self-throttling dependency chain (next step's stage
#   depends on the previous gather's consumed value), so the two parity
#   slots + parity-indexed semaphores are sufficient synchronization.
#
# The dynamics, residual strategy (u stream + chunk-boundary states,
# s recomputed by re-thresholding, w unwound from the right boundary)
# and tail-chunk sanitisation mirror pallas_cells.py one-to-one; see its
# module docstring for the backward math. Affine fold and fused dropout
# are intentionally NOT in the TP kernels: above the single-chip caps
# the fallback already applies normalization/dropout outside the kernel
# at measured ~zero cost (STATUS "Wide layers" fair-A/B note), and the
# smaller fusion surface keeps the distributed kernel auditable.

_TP_VMEM_BUDGET = 64 * 1024 * 1024


def _tp_tile_plan(B: int, Hl: int, Hg: int, tc: int, streams: int,
                  mat_bytes_per_el: int) -> int:
    """Batch tile: double-buffered (tc, bt, Hl) streams + resident V
    shard(s) (Hg x Hl) + gather slots (2, bt, Hg) + a few (bt, *) states."""
    bt = B
    for cand in (128, 64, 32, 16, 8):
        if B % cand == 0:
            bt = cand
            break
    while bt > _SUBLANE and (
        2 * 4 * streams * tc * bt * Hl
        + mat_bytes_per_el * Hg * Hl
        + 2 * 4 * bt * Hg  # gather slots
        + 32 * bt * Hl
    ) > _TP_VMEM_BUDGET:
        bt //= 2
    return bt


def _pick_tc_tp(T: int, Hl: int) -> int:
    from sparch_tpu.ops.pallas_cells import _pick_tc

    return _pick_tc(T, Hl)


def _tp_fwd_kernel(
    wx_ref, alpha_ref, beta_ref, a_ref, b_ref, v_ref,
    u0_ref, w0_ref, s0f_ref,
    *refs,
    threshold: float,
    tc: int,
    T: int,
    adaptive: bool,
    save_residuals: bool,
    mxu_bf16: bool,
    axis_name: str,
    num_devices: int,
    hloc: int,
):
    refs = list(refs)
    n_out = 6 if (save_residuals and adaptive) else (4 if save_residuals else 1)
    outs = refs[:n_out]
    s_out_ref = outs[0]
    u_out_ref = outs[1] if save_residuals else None
    ub_out_ref = outs[2] if save_residuals else None
    sb_out_ref = outs[3] if save_residuals else None
    wb_out_ref = outs[4] if (save_residuals and adaptive) else None
    wf_out_ref = outs[5] if (save_residuals and adaptive) else None
    (u_scr, w_scr, s_scr, sv_scr, stage, slots,
     send_sems, recv_sems) = refs[n_out:]

    i = pl.program_id(0)
    t = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    my = lax.axis_index(axis_name)

    @pl.when((i == 0) & (t == 0))
    def _enter():
        _collective_barrier(axis_name, num_devices)

    v_mat = v_ref[:, :]
    if mxu_bf16:
        v_mat = v_mat.astype(jnp.bfloat16)

    @pl.when(t == 0)
    def _init():
        u_scr[:, :] = u0_ref[:, :]
        # s0 local = my column block of the pre-gathered s0_full
        # (dynamic REF slice: Mosaic cannot lower dynamic_slice on values)
        s_scr[:, :] = s0f_ref[:, pl.ds(my * hloc, hloc)]
        if adaptive:
            w_scr[:, :] = w0_ref[:, :]
        s0f = s0f_ref[:, :]
        if mxu_bf16:
            s0f = s0f.astype(jnp.bfloat16)
        sv_scr[:, :] = jnp.dot(
            s0f, v_mat, preferred_element_type=jnp.float32
        )

    alpha = alpha_ref[0, :]
    u = u_scr[:, :]
    s = s_scr[:, :]
    w = w_scr[:, :] if adaptive else None
    sV = sv_scr[:, :]

    if save_residuals:
        ub_out_ref[:, :] = u
        sb_out_ref[:, :] = s
        if adaptive:
            wb_out_ref[:, :] = w

    for k in range(tc):  # static unroll
        drive = wx_ref[k, :, :] + sV
        if adaptive:
            w = beta_ref[0, :] * w + a_ref[0, :] * u + b_ref[0, :] * s
            drive = drive - w
        u = alpha * (u - s) + (1.0 - alpha) * drive
        s = (u > threshold).astype(u.dtype)
        # gather the new spikes for the next step's recurrent drive.
        # Exchanged EVERY step (incl. dead tail steps and the final step,
        # whose gather is discarded) so the exchange sequence is
        # SPMD-identical; parity follows the global exchange index.
        stage[:, :] = s.astype(stage.dtype)
        parity = lax.rem((i * n_chunks + t) * tc + k, 2)
        _ag_exchange(
            stage, slots, parity, send_sems, recv_sems,
            axis_name=axis_name, num_devices=num_devices, hloc=hloc,
        )
        s_full = slots[parity, :, :]
        sV = jnp.dot(s_full, v_mat, preferred_element_type=jnp.float32)
        s_out_ref[k, :, :] = s.astype(s_out_ref.dtype)
        if save_residuals:
            u_out_ref[k, :, :] = u.astype(u_out_ref.dtype)
            if adaptive and k == (T - 1) % tc:
                wf_out_ref[:, :] = w

    u_scr[:, :] = u
    s_scr[:, :] = s
    if adaptive:
        w_scr[:, :] = w
    sv_scr[:, :] = sV


def _tp_bwd_kernel(
    g_ref, u_ref, ub_ref, sb_ref, we_ref,
    alpha_ref, beta_ref, a_ref, b_ref, vrow_ref,
    dwx_ref, dv_ref, dalpha_ref, dbeta_ref, da_ref, db_ref,
    du0_ref, dw0_ref, ds0_ref,
    A_scr, B_scr, R_scr, stage, slots, send_sems, recv_sems,
    *,
    threshold: float,
    tc: int,
    T: int,
    adaptive: bool,
    mxu_bf16: bool,
    axis_name: str,
    num_devices: int,
    hloc: int,
):
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
    def _init_adjoints():
        A_scr[:, :] = jnp.zeros_like(A_scr)
        B_scr[:, :] = jnp.zeros_like(B_scr)
        R_scr[:, :] = jnp.zeros_like(R_scr)

    @pl.when(first & (i == 0))
    def _init_accumulators():
        dv_ref[:, :] = jnp.zeros_like(dv_ref)
        dalpha_ref[:, :] = jnp.zeros_like(dalpha_ref)
        dbeta_ref[:, :] = jnp.zeros_like(dbeta_ref)
        da_ref[:, :] = jnp.zeros_like(da_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)

    alpha = alpha_ref[0, :]
    one_m_alpha = 1.0 - alpha
    beta = beta_ref[0, :]
    a_c = a_ref[0, :]
    b_c = b_ref[0, :]
    if adaptive:
        inv_beta = 1.0 / beta
        w_cur = we_ref[:, :]

    A = A_scr[:, :]
    B = B_scr[:, :]
    # R carries the reduced recurrent adjoint term sum_chips(D @ V^T)[:,
    # shard] for the CURRENT A (the TP analog of pallas_cells' carried AV)
    R = R_scr[:, :]
    vrow = vrow_ref[:, :]
    if mxu_bf16:
        vrow = vrow.astype(jnp.bfloat16)
    dv_acc = jnp.zeros_like(dv_ref)
    ones_row = jnp.ones((1, A.shape[0]), jnp.float32)
    from sparch_tpu.ops.pallas_cells import _mxu_colsum

    dal = jnp.zeros_like(dalpha_ref)
    dbe = jnp.zeros_like(dbeta_ref)
    daa = jnp.zeros_like(da_ref)
    dbb = jnp.zeros_like(db_ref)

    for k in range(tc - 1, -1, -1):  # reverse static unroll
        g_t = g_ref[k, :, :].astype(jnp.float32)
        u_t = u_ref[k, :, :].astype(jnp.float32)
        u_p = (
            u_ref[k - 1, :, :].astype(jnp.float32) if k > 0 else ub_ref[:, :]
        )
        s_p = (
            (u_p > threshold).astype(jnp.float32) if k > 0 else sb_ref[:, :]
        )
        if k >= tail_len:
            live = kc != 0
            g_t = jnp.where(live, g_t, 0.0)
            u_t = jnp.where(live, u_t, threshold + 10.0)  # window -> 0
            u_p = jnp.where(live, u_p, 0.0)
            s_p = jnp.where(live, s_p, 0.0)

        alphaA = alpha * A
        C = g_t - alphaA + R
        if adaptive:
            C = C + b_c * B
        wsub = u_t - threshold
        window = (wsub > -0.5) & (wsub <= 0.5)
        A_new = jnp.where(window, C, 0.0) + alphaA
        if adaptive:
            A_new = A_new + a_c * B
        ddrive = one_m_alpha * A_new
        dwx_ref[k, :, :] = ddrive.astype(dwx_ref.dtype)

        # gather D = ddrive across the TP axis: one exchange serves both
        # the recurrent adjoint term R and the dV row accumulation. The
        # single `D_full` read keeps every consumer on the parity chain.
        stage[:, :] = ddrive.astype(stage.dtype)
        parity = lax.rem(
            (i * n_chunks + kc) * tc + (tc - 1 - k), 2
        )
        _ag_exchange(
            stage, slots, parity, send_sems, recv_sems,
            axis_name=axis_name, num_devices=num_devices, hloc=hloc,
        )
        D_full = slots[parity, :, :]
        R = lax.dot_general(
            D_full, vrow,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sp_in = s_p.astype(jnp.bfloat16) if mxu_bf16 else s_p
        dv_acc = dv_acc + lax.dot_general(
            sp_in, D_full,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dal = dal + _mxu_colsum(ones_row, A_new * (u_p - s_p - u_t))
        if adaptive:
            w_p = (w_cur - a_c * u_p - b_c * s_p) * inv_beta
            if k >= tail_len:
                live = kc != 0
                w_p = jnp.where(live, w_p, 0.0)
                w_cur = jnp.where(live, w_p, w_cur)
            else:
                w_cur = w_p
            B_new = beta * B - ddrive
            dbe = dbe + _mxu_colsum(ones_row, B_new * w_p)
            daa = daa + _mxu_colsum(ones_row, B_new * u_p)
            dbb = dbb + _mxu_colsum(ones_row, B_new * s_p)
            B = B_new
        A = A_new

    A_scr[:, :] = A
    B_scr[:, :] = B
    R_scr[:, :] = R
    dv_ref[:, :] += dv_acc
    dalpha_ref[:, :] += dal / one_m_alpha
    if adaptive:
        dbeta_ref[:, :] += dbe
        da_ref[:, :] += daa
        db_ref[:, :] += dbb

    @pl.when(last)
    def _initial_state_grads():
        A_fin = A_scr[:, :]
        B_fin = B_scr[:, :]
        du0 = alpha * A_fin
        if adaptive:
            du0 = du0 + a_c * B_fin
        du0_ref[:, :] = du0
        dw0_ref[:, :] = beta * B_fin
        ds0 = -alpha * A_fin + R_scr[:, :]
        if adaptive:
            ds0 = ds0 + b_c * B_fin
        ds0_ref[:, :] = ds0


def _tp_forward(
    Wx, alpha, beta, a, b, Vcol, threshold, u0, w0, s0,
    *, adaptive: bool, save_residuals: bool, mxu_bf16: bool,
    axis_name: str, num_devices: int, interpret=None,
):
    """Per-shard fused TP forward (run under shard_map on the TP axis).
    Params must already be clamped/diag-masked. Shapes: Wx (B, T, Hl);
    alpha/beta/a/b (Hl,); Vcol (P*Hl, Hl); u0/w0/s0 (B, Hl)."""
    B, T, Hl = Wx.shape
    Hg = Hl * num_devices
    if B % _SUBLANE or Hl % _LANE:
        raise ValueError(
            f"TP kernel needs B%{_SUBLANE}==0 and Hl%{_LANE}==0, got "
            f"B={B} Hl={Hl} (the model layer falls back to scan otherwise)"
        )
    dtype = jnp.float32
    rdt = jnp.bfloat16 if mxu_bf16 else dtype  # spike stream + wire dtype
    vdt = jnp.bfloat16 if mxu_bf16 else dtype
    tc = _pick_tc_tp(T, Hl)
    bt = _tp_tile_plan(B, Hl, Hg, tc, streams=4,
                       mat_bytes_per_el=2 if mxu_bf16 else 4)
    n_chunks = (T + tc - 1) // tc

    # one XLA all-gather of the initial spikes (once per call, not per
    # step); tiled concat in axis order matches the kernel's slot order
    s0f = lax.all_gather(s0.astype(dtype), axis_name, axis=1, tiled=True)

    Wx_t = jnp.swapaxes(Wx, 0, 1)  # (T, B, Hl) time-major
    vec = lambda p: p.astype(dtype)[None, :]  # noqa: E731
    zero_vec = jnp.zeros((1, Hl), dtype)

    kernel = functools.partial(
        _tp_fwd_kernel,
        threshold=float(threshold), tc=tc, T=T, adaptive=adaptive,
        save_residuals=save_residuals, mxu_bf16=mxu_bf16,
        axis_name=axis_name, num_devices=num_devices, hloc=Hl,
    )
    bh = lambda i, t: (i, 0)  # noqa: E731
    tbh = lambda i, t: (t, i, 0)  # noqa: E731
    bnd_map = lambda i, t: (i, t)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hl), tbh, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, Hl), rep2, memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((Hg, Hl), rep2, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, Hl), bh, memory_space=pltpu.VMEM)
    full_state_spec = pl.BlockSpec((bt, Hg), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hl), bnd_map, memory_space=pltpu.VMEM)

    if save_residuals:
        out_specs = (tm_spec,) * 2 + (bnd_spec,) * 2
        out_shape = [
            jax.ShapeDtypeStruct((T, B, Hl), rdt),  # s
            jax.ShapeDtypeStruct((T, B, Hl), dtype),  # u
            jax.ShapeDtypeStruct((B, n_chunks * Hl), dtype),  # ub
            jax.ShapeDtypeStruct((B, n_chunks * Hl), dtype),  # sb
        ]
        if adaptive:
            out_specs = out_specs + (bnd_spec, state_spec)
            out_shape += [
                jax.ShapeDtypeStruct((B, n_chunks * Hl), dtype),  # wb
                jax.ShapeDtypeStruct((B, Hl), dtype),  # w final
            ]
        out_shape = tuple(out_shape)
    else:
        out_specs = (tm_spec,)
        out_shape = (jax.ShapeDtypeStruct((T, B, Hl), rdt),)

    nd1 = max(num_devices - 1, 1)
    outs = pl.pallas_call(
        kernel,
        grid=(B // bt, n_chunks),
        in_specs=[
            tm_spec,  # Wx
            vec_spec, vec_spec, vec_spec, vec_spec,  # alpha beta a b
            mat_spec,  # V column shard
            state_spec, state_spec,  # u0 w0
            full_state_spec,  # s0 gathered
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, Hl), jnp.float32),  # u
            pltpu.VMEM((bt, Hl), jnp.float32),  # w
            pltpu.VMEM((bt, Hl), jnp.float32),  # s
            pltpu.VMEM((bt, Hl), jnp.float32),  # carried s_full @ Vcol
            pltpu.VMEM((bt, Hl), rdt),  # exchange staging
            pltpu.VMEM((2, bt, Hg), rdt),  # gather slots (parity)
            pltpu.SemaphoreType.DMA((2, nd1)),
            pltpu.SemaphoreType.DMA((2, nd1)),
        ],
        interpret=_interpret(interpret),
        compiler_params=pltpu.CompilerParams(
            # Mosaic requires None when no barrier semaphore is used (P=1)
            collective_id=2 if num_devices > 1 else None,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        Wx_t, vec(alpha),
        vec(beta) if adaptive else zero_vec,
        vec(a) if adaptive else zero_vec,
        vec(b) if adaptive else zero_vec,
        Vcol.astype(vdt),
        u0.astype(dtype),
        (w0.astype(dtype) if adaptive else jnp.zeros((B, Hl), dtype)),
        s0f,
    )

    if not save_residuals:
        return jnp.swapaxes(outs[0], 0, 1), None
    if adaptive:
        s_seq, u_seq, ub, sb, wb, wf = outs
        wend = jnp.concatenate([wb[:, Hl:], wf], axis=1)
    else:
        s_seq, u_seq, ub, sb = outs
        wend = jnp.zeros_like(sb)
    return jnp.swapaxes(s_seq, 0, 1), (u_seq, ub, sb, wend)


def _tp_backward(
    g, residuals, alpha, beta, a, b, Vrow, threshold,
    *, adaptive: bool, mxu_bf16: bool, axis_name: str, num_devices: int,
    interpret=None,
):
    """Per-shard fused TP backward. ``Vrow`` is the (Hl, P*Hl) row shard
    (V[shard, :]); returns dV row-sharded (transposed back to the column
    sharding by the caller's all_to_all)."""
    u_pd, ub, sb, wend = residuals
    B, T, Hl = g.shape
    Hg = Hl * num_devices
    dtype = jnp.float32
    sdt = jnp.bfloat16 if mxu_bf16 else dtype
    tc = _pick_tc_tp(T, Hl)
    bt = _tp_tile_plan(B, Hl, Hg, tc, streams=4,
                       mat_bytes_per_el=(2 if mxu_bf16 else 4) + 4)
    n_chunks = (T + tc - 1) // tc

    g_t = jnp.swapaxes(g.astype(sdt), 0, 1)
    vec = lambda p: p.astype(dtype)[None, :]  # noqa: E731
    zero_vec = jnp.zeros((1, Hl), dtype)

    kernel = functools.partial(
        _tp_bwd_kernel,
        threshold=float(threshold), tc=tc, T=T, adaptive=adaptive,
        mxu_bf16=mxu_bf16,
        axis_name=axis_name, num_devices=num_devices, hloc=Hl,
    )
    rev_tm = lambda i, t: (n_chunks - 1 - t, i, 0)  # noqa: E731
    bh = lambda i, t: (i, 0)  # noqa: E731
    rev_bnd = lambda i, t: (i, n_chunks - 1 - t)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hl), rev_tm, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, Hl), rep2, memory_space=pltpu.VMEM)
    vrow_spec = pl.BlockSpec((Hl, Hg), rep2, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, Hl), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hl), rev_bnd, memory_space=pltpu.VMEM)

    nd1 = max(num_devices - 1, 1)
    outs = pl.pallas_call(
        kernel,
        grid=(B // bt, n_chunks),
        in_specs=[
            tm_spec,  # g
            tm_spec,  # u residual
            bnd_spec, bnd_spec, bnd_spec,  # ub sb wend
            vec_spec, vec_spec, vec_spec, vec_spec,  # alpha beta a b
            vrow_spec,  # V row shard
        ],
        out_specs=(
            tm_spec,  # dWx
            vrow_spec,  # dV (row-sharded)
            vec_spec, vec_spec, vec_spec, vec_spec,  # dalpha dbeta da db
            state_spec, state_spec, state_spec,  # du0 dw0 ds0
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, Hl), sdt),
            jax.ShapeDtypeStruct((Hl, Hg), dtype),
            jax.ShapeDtypeStruct((1, Hl), dtype),
            jax.ShapeDtypeStruct((1, Hl), dtype),
            jax.ShapeDtypeStruct((1, Hl), dtype),
            jax.ShapeDtypeStruct((1, Hl), dtype),
            jax.ShapeDtypeStruct((B, Hl), dtype),
            jax.ShapeDtypeStruct((B, Hl), dtype),
            jax.ShapeDtypeStruct((B, Hl), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, Hl), jnp.float32),  # A
            pltpu.VMEM((bt, Hl), jnp.float32),  # B
            pltpu.VMEM((bt, Hl), jnp.float32),  # carried reduced R
            pltpu.VMEM((bt, Hl), sdt),  # exchange staging (D)
            pltpu.VMEM((2, bt, Hg), sdt),  # gather slots
            pltpu.SemaphoreType.DMA((2, nd1)),
            pltpu.SemaphoreType.DMA((2, nd1)),
        ],
        interpret=_interpret(interpret),
        compiler_params=pltpu.CompilerParams(
            collective_id=3 if num_devices > 1 else None,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        g_t, u_pd, ub, sb, wend,
        vec(alpha),
        vec(beta) if adaptive else zero_vec,
        vec(a) if adaptive else zero_vec,
        vec(b) if adaptive else zero_vec,
        Vrow.astype(jnp.bfloat16 if mxu_bf16 else dtype),
    )
    dWx, dV_rows, dalpha, dbeta, da, db, du0, dw0, ds0 = outs
    return (
        jnp.swapaxes(dWx, 0, 1).astype(g.dtype),
        dV_rows,
        dalpha[0], dbeta[0], da[0], db[0],
        du0, dw0, ds0,
    )


@functools.lru_cache(maxsize=None)
def _get_tp_op(adaptive: bool, threshold: float, mxu_bf16: bool,
               axis_name: str, num_devices: int, interpret=None):
    """custom_vjp'd per-shard TP cell op (one cached instance per config,
    mirroring pallas_cells._make_op)."""

    def _fwd_only(Wx, alpha, beta, a, b, Vcol, u0, w0, s0):
        s, _ = _tp_forward(
            Wx, alpha, beta, a, b, Vcol, threshold, u0, w0, s0,
            adaptive=adaptive, save_residuals=False, mxu_bf16=mxu_bf16,
            axis_name=axis_name, num_devices=num_devices,
            interpret=interpret,
        )
        return s.astype(Wx.dtype)

    @jax.custom_vjp
    def op(Wx, alpha, beta, a, b, Vcol, u0, w0, s0):
        return _fwd_only(Wx, alpha, beta, a, b, Vcol, u0, w0, s0)

    def fwd(Wx, alpha, beta, a, b, Vcol, u0, w0, s0):
        s, res = _tp_forward(
            Wx, alpha, beta, a, b, Vcol, threshold, u0, w0, s0,
            adaptive=adaptive, save_residuals=True, mxu_bf16=mxu_bf16,
            axis_name=axis_name, num_devices=num_devices,
            interpret=interpret,
        )
        # zero-length state slices ride along as dtype tokens: the bwd's
        # du0/dw0/ds0 cotangents must match the primal dtypes
        # (custom_vjp contract — mirrors pallas_cells._make_op)
        return s.astype(Wx.dtype), (
            res, alpha, beta, a, b, Vcol, u0[:0], w0[:0], s0[:0]
        )

    def bwd(pack, gcot):
        res, alpha, beta, a, b, Vcol, u0_tok, w0_tok, s0_tok = pack
        # the backward contracts over V's columns: derive the row shard
        # V[shard, :] with one all_to_all (block transpose of the
        # column sharding), and transpose dV back the same way
        Vrow = lax.all_to_all(
            Vcol, axis_name, split_axis=0, concat_axis=1, tiled=True
        )
        (dWx, dV_rows, dalpha, dbeta, da, db, du0, dw0, ds0) = _tp_backward(
            gcot, res, alpha, beta, a, b, Vrow, threshold,
            adaptive=adaptive, mxu_bf16=mxu_bf16,
            axis_name=axis_name, num_devices=num_devices,
            interpret=interpret,
        )
        dVcol = lax.all_to_all(
            dV_rows, axis_name, split_axis=1, concat_axis=0, tiled=True
        )
        if not adaptive:
            dbeta = jnp.zeros_like(beta)
            da = jnp.zeros_like(a)
            db = jnp.zeros_like(b)
            dw0 = jnp.zeros_like(du0)
        # tangent dtypes must match the primals (custom_vjp contract)
        return (
            dWx,
            dalpha.astype(alpha.dtype), dbeta.astype(beta.dtype),
            da.astype(a.dtype), db.astype(b.dtype),
            dVcol.astype(Vcol.dtype),
            du0.astype(u0_tok.dtype), dw0.astype(w0_tok.dtype),
            ds0.astype(s0_tok.dtype),
        )

    op.defvjp(fwd, bwd)
    return op


def zero_diag_shard(Vcol, axis_name: str):
    """Zero the global diagonal of a column-sharded (P*Hl, Hl) V (the TP
    analog of cells.zero_diag; differentiable mask, so no gradient
    reaches the diagonal — reference snns.py:566)."""
    Hg, Hl = Vcol.shape
    my = lax.axis_index(axis_name)
    rows = lax.broadcasted_iota(jnp.int32, (Hg, Hl), 0)
    cols = lax.broadcasted_iota(jnp.int32, (Hg, Hl), 1) + my * Hl
    return Vcol * (rows != cols).astype(Vcol.dtype)


def rlif_tp_pallas(Wx, alpha, Vcol, threshold, u0, s0, *,
                   axis_name: str, num_devices: int,
                   mxu_bf16: bool = False, interpret=None):
    """Tensor-parallel fused RLIF (per-shard; run under shard_map).
    Semantics: cells.rlif_scan on the gathered arrays
    (reference snns.py:554-578)."""
    from sparch_tpu.ops import cells

    alpha = jnp.clip(alpha, *cells.ALPHA_LIM)
    Vcol = zero_diag_shard(Vcol, axis_name)
    z = jnp.zeros_like(alpha)
    op = _get_tp_op(False, float(threshold), bool(mxu_bf16),
                    axis_name, int(num_devices), interpret=interpret)
    return op(Wx, alpha, z, z, z, Vcol, u0, jnp.zeros_like(u0), s0)


def radlif_tp_pallas(Wx, alpha, beta, a, b, Vcol, threshold, u0, w0, s0,
                     *, axis_name: str, num_devices: int,
                     mxu_bf16: bool = False, interpret=None):
    """Tensor-parallel fused RadLIF (per-shard; run under shard_map).
    Semantics: cells.radlif_scan on the gathered arrays
    (reference snns.py:696-727)."""
    from sparch_tpu.ops import cells

    alpha = jnp.clip(alpha, *cells.ALPHA_LIM)
    beta = jnp.clip(beta, *cells.BETA_LIM)
    a = jnp.clip(a, *cells.A_LIM)
    b = jnp.clip(b, *cells.B_LIM)
    Vcol = zero_diag_shard(Vcol, axis_name)
    op = _get_tp_op(True, float(threshold), bool(mxu_bf16),
                    axis_name, int(num_devices), interpret=interpret)
    return op(Wx, alpha, beta, a, b, Vcol, u0, w0, s0)


# ---------------------------------------------------------------------------
# Full-array sharded entry points (model-layer integration)
# ---------------------------------------------------------------------------


def _mesh_interpret(mesh) -> bool:
    """Interpret-mode decision from the MESH's platform (the process
    default backend may differ — e.g. axon TPU default while the
    dryrun's mesh is virtual-CPU). Threaded explicitly into the op
    closures: the custom_vjp bwd binds its pallas_call only when the
    OUTER grad is traced, long after any wrapper scope has exited."""
    return mesh.devices.flat[0].platform != "tpu"


def _tp_mesh_specs(mesh, tp_axis: str, batch_axis):
    from jax.sharding import PartitionSpec as P

    nd = mesh.shape[tp_axis]
    b = (
        batch_axis
        if batch_axis is not None and batch_axis in mesh.shape
        else None
    )
    return nd, b, P


def _validate_tp(H: int, nd: int):
    if H % (nd * _LANE):
        raise ValueError(
            f"tensor-parallel fused cells need hidden_size divisible by "
            f"num_model_devices*{_LANE} (got H={H}, tp={nd}); use the scan "
            f"cells (GSPMD) for other widths"
        )


# The sharded entry points cache their jitted shard_map per
# (mesh, config) tuple: without the cache an EAGER (non-jitted) caller
# would rebuild + retrace the closure every invocation. All shipped
# call sites are inside jitted train/eval steps (where the jit is
# inlined and this cache is moot), but the direct API shouldn't be a
# retrace footgun.


@functools.lru_cache(maxsize=None)
def _rlif_tp_fn(mesh, threshold, tp_axis, b, nd, mxu_bf16, interp):
    from jax.sharding import PartitionSpec as P

    def per_shard(Wx, alpha, V, u0, s0):
        return rlif_tp_pallas(
            Wx, alpha, V, threshold, u0, s0,
            axis_name=tp_axis, num_devices=nd, mxu_bf16=mxu_bf16,
            interpret=interp,
        ).astype(Wx.dtype)

    # jit the shard_map (the recommended composition): an EAGER grad of a
    # bare shard_map trips an XLA sharding-override assertion on the 1-D
    # P(tp_axis) parameter cotangents (jit-of-grad and grad-of-jit are
    # both fine; observed on jax 0.9 CPU mesh)
    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(b, None, tp_axis), P(tp_axis), P(None, tp_axis),
                  P(b, tp_axis), P(b, tp_axis)),
        out_specs=P(b, None, tp_axis),
        check_vma=False,
    ))


def rlif_tp_sharded(mesh, Wx, alpha, V, threshold, u0, s0, *,
                    tp_axis: str = "model", batch_axis=None,
                    mxu_bf16: bool = False):
    """Full-array RLIF over a mesh: neuron-sharded fused kernels with the
    per-step in-kernel spike all-gather. Drop-in for cells.rlif_scan."""
    nd, b, _ = _tp_mesh_specs(mesh, tp_axis, batch_axis)
    _validate_tp(Wx.shape[-1], nd)
    fn = _rlif_tp_fn(mesh, float(threshold), tp_axis, b, nd,
                     bool(mxu_bf16), _mesh_interpret(mesh))
    return fn(Wx, alpha, V, u0, s0)


@functools.lru_cache(maxsize=None)
def _radlif_tp_fn(mesh, threshold, tp_axis, b, nd, mxu_bf16, interp):
    from jax.sharding import PartitionSpec as P

    def per_shard(Wx, alpha, beta, a, b_ad, V, u0, w0, s0):
        return radlif_tp_pallas(
            Wx, alpha, beta, a, b_ad, V, threshold, u0, w0, s0,
            axis_name=tp_axis, num_devices=nd, mxu_bf16=mxu_bf16,
            interpret=interp,
        ).astype(Wx.dtype)

    # (see _rlif_tp_fn for the jit-of-shard_map rationale)
    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(b, None, tp_axis), P(tp_axis), P(tp_axis), P(tp_axis),
                  P(tp_axis), P(None, tp_axis),
                  P(b, tp_axis), P(b, tp_axis), P(b, tp_axis)),
        out_specs=P(b, None, tp_axis),
        check_vma=False,
    ))


def radlif_tp_sharded(mesh, Wx, alpha, beta, a, b_ad, V, threshold,
                      u0, w0, s0, *, tp_axis: str = "model",
                      batch_axis=None, mxu_bf16: bool = False):
    """Full-array RadLIF over a mesh (drop-in for cells.radlif_scan)."""
    nd, b, _ = _tp_mesh_specs(mesh, tp_axis, batch_axis)
    _validate_tp(Wx.shape[-1], nd)
    fn = _radlif_tp_fn(mesh, float(threshold), tp_axis, b, nd,
                       bool(mxu_bf16), _mesh_interpret(mesh))
    return fn(Wx, alpha, beta, a, b_ad, V, u0, w0, s0)


@functools.lru_cache(maxsize=None)
def _lif_tp_fn(mesh, threshold, tp_axis, b, mxu_bf16, interp):
    from jax.sharding import PartitionSpec as P

    from sparch_tpu.ops import pallas_cells

    def per_shard(Wx, alpha, u0, s0):
        return pallas_cells.lif_pallas(
            Wx, alpha, threshold, u0, s0, mxu_bf16=mxu_bf16,
            interpret=interp,
        ).astype(Wx.dtype)

    # (see _rlif_tp_fn for the jit-of-shard_map rationale)
    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(b, None, tp_axis), P(tp_axis),
                  P(b, tp_axis), P(b, tp_axis)),
        out_specs=P(b, None, tp_axis),
        check_vma=False,
    ))


def lif_tp_sharded(mesh, Wx, alpha, threshold, u0, s0, *,
                   tp_axis: str = "model", batch_axis=None,
                   mxu_bf16: bool = False):
    """Neuron-sharded LIF: no recurrence, so no cross-shard dependency —
    the single-chip fused kernel simply runs per shard."""
    nd, b, _ = _tp_mesh_specs(mesh, tp_axis, batch_axis)
    fn = _lif_tp_fn(mesh, float(threshold), tp_axis, b,
                    bool(mxu_bf16), _mesh_interpret(mesh))
    return fn(Wx, alpha, u0, s0)


@functools.lru_cache(maxsize=None)
def _adlif_tp_fn(mesh, threshold, tp_axis, b, mxu_bf16, interp):
    from jax.sharding import PartitionSpec as P

    from sparch_tpu.ops import pallas_cells

    def per_shard(Wx, alpha, beta, a, b_ad, u0, w0, s0):
        return pallas_cells.adlif_pallas(
            Wx, alpha, beta, a, b_ad, threshold, u0, w0, s0,
            mxu_bf16=mxu_bf16, interpret=interp,
        ).astype(Wx.dtype)

    # (see _rlif_tp_fn for the jit-of-shard_map rationale)
    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(b, None, tp_axis), P(tp_axis), P(tp_axis), P(tp_axis),
                  P(tp_axis), P(b, tp_axis), P(b, tp_axis), P(b, tp_axis)),
        out_specs=P(b, None, tp_axis),
        check_vma=False,
    ))


def adlif_tp_sharded(mesh, Wx, alpha, beta, a, b_ad, threshold, u0, w0, s0,
                     *, tp_axis: str = "model", batch_axis=None,
                     mxu_bf16: bool = False):
    """Neuron-sharded adLIF (single-chip fused kernel per shard)."""
    nd, b, _ = _tp_mesh_specs(mesh, tp_axis, batch_axis)
    fn = _adlif_tp_fn(mesh, float(threshold), tp_axis, b,
                      bool(mxu_bf16), _mesh_interpret(mesh))
    return fn(Wx, alpha, beta, a, b_ad, u0, w0, s0)
