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
]

_LANE = 128


def _interpret():
    if jax.default_backend() != "tpu":
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
            device_id=lax.rem(my + d, num_devices),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
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
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
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
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
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
            # my own column of the previous gather == my previous stage;
            # `prev` is the slot's ONE read, so every use is chained
            stage[:, :] = (
                lax.dynamic_slice_in_dim(prev, my * hloc, hloc, axis=1)
                + 1.0
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
    """Per-shard (B, H) partial -> (rounds, B, Hloc); round r returns
    ``sum_chips(x)[:, my_shard] + r``.

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
