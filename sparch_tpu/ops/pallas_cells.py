"""Fused Pallas TPU kernels for the recurrent spiking cells — forward AND
backward.

Why kernels: the neuron recurrence is inherently sequential in T, and
under ``lax.scan`` XLA round-trips the carry through HBM every step. These
kernels keep the neuron state (forward: u[, w], s; backward: the adjoints
A = dL/du, B = dL/dw) resident in VMEM across the whole time loop, run the
recurrent matmuls (``s @ V`` forward, ``((1-alpha)*A) @ V^T`` backward and
the ``dV`` accumulation) on the MXU against VMEM-resident V, and stream
the per-timestep tensors through double-buffered VMEM blocks.

Fusion surface (beyond the recurrence itself):

- **Normalization affine fold** (``scale``/``shift`` operands): train-mode
  BatchNorm is, given the batch statistics, a per-feature affine
  ``drive = scale*Wx + shift``. The stats are computed by XLA (fused into
  the input projection); the *apply* — a full (B,T,H) read+write pass —
  and the backward's ``sum(dDrive)`` / ``sum(dDrive*Wx)`` reductions (two
  more full passes) are folded into these kernels. The affine params are
  differentiable operands: the backward kernel emits ``dscale``/``dshift``
  and the (scale-folded) ``dWx``.
- **Low-precision streams**: spike outputs and the g/dWx cotangent
  streams are bf16 in the bf16-MXU mode (spikes are 0/1 — exact; the
  cotangent is the adjoint of a bf16 output and dWx feeds bf16 MXU
  contractions). The u residual stays f32 so the backward's spike
  recomputation re-thresholds the exact values the forward thresholded.
- **Carried MXU products**: the recurrent products (``s @ V`` forward,
  ``((1-alpha)*A) @ V^T`` backward) are issued immediately after the new
  state/adjoint is known and first consumed at the top of the NEXT step,
  so their latency hides behind the remaining VPU work of the step
  instead of stalling the sequential chain.
- **MXU-offloaded reductions**: the six per-step batch reductions of the
  parameter gradients ride the otherwise-idle MXU as ``(1,bt) @ (bt,H)``
  ones-row contractions instead of VPU cross-sublane shuffle chains.

Layout: every (T, ., .) stream is TIME-major — a per-step slice
``ref[k, :, :]`` is then a whole tile-aligned (bt, H) plane, where a
batch-major block would pay sublane shuffles on every k-slice; the
producing/consuming XLA matmuls fold the logical transposes for free.

Grid: (batch tiles, time chunks), time fastest; tc timesteps are unrolled
inside each grid cell, with tc chosen to divide T when possible (no tail).
The backward kernel walks time chunks in reverse. The batch tile
auto-shrinks to fit the VMEM budget. B and H are padded to TPU tiling
(8 sublanes / 128 lanes; padded rows/neurons get a -1e9 drive so they
never spike, padded cotangents are zero). T is NOT padded — that would
cost two full HBM copies of every stream per call (~20% of the train
step): when tc cannot divide T, the tail time chunk instead reads
out-of-bounds memory, which the forward tolerates (tail state is never
consumed) and the backward sanitises per-step so garbage cannot poison
the adjoints.

Backward math (RadLIF general form; R/ad flags degenerate it). With total
adjoints A_t = dL/du_t, B_t = dL/dw_t and per-step output cotangent g_t,
walking t = T..1:

    C_t = g_t - alpha*A_{t+1} + ((1-alpha)*A_{t+1}) @ V^T + b*B_{t+1}
    A_t = boxcar(u_t - thr) * C_t + alpha*A_{t+1} + a*B_{t+1}
    B_t = -(1-alpha)*A_t + beta*B_{t+1}

    dDrive_t = (1-alpha)*A_t
    dWx_t   = dDrive_t * scale        (scale = 1 without the affine fold)
    dscale += sum_B dDrive_t * Wx_t;  dshift += sum_B dDrive_t
    dV     += s_{t-1}^T dDrive_t
    dalpha += sum_B A_t * ((u_{t-1}-s_{t-1}) - d_t)
            = sum_B A_t * (u_{t-1} - s_{t-1} - u_t) / (1-alpha)
      (d_t = (u_t - alpha*(u_{t-1}-s_{t-1})) / (1-alpha); the 1/(1-alpha)
       factor is hoisted out of the time loop as a single final scale)
    dbeta  += sum_B B_t * w_{t-1};  da += sum_B B_t * u_{t-1};
    db     += sum_B B_t * s_{t-1}
    du_0 = alpha*A_1 + a*B_1;  dw_0 = beta*B_1;
    ds_0 = -alpha*A_1 + ((1-alpha)*A_1) @ V^T + b*B_1

Gradients w.r.t. the raw (unclamped) parameters are obtained by pulling
the clamped-parameter cotangents back through ``jnp.clip``'s own VJP, and
dV through the zero-diagonal mask — identical semantics to the scan path
(sparch_tpu.ops.cells). The only full-length residual is the u series
(plus tiny chunk-boundary states): s_t is recomputed in the backward as
``(u_t > threshold)`` (exact — same f32 values the forward thresholded)
and w is unwound within each chunk from its right boundary via
``w_{t-1} = (w_t - a*u_{t-1} - b*s_{t-1}) / beta`` (beta >= exp(-1/30)
after clamping, so eight inversion steps amplify rounding by <= 1.31x
before the next boundary refresh). This is ~1/3 of the residual HBM
traffic ``lax.scan``'s VJP would stash and stream.

Equivalence with the scan cells (forward bit-exactness modulo f32 order,
gradient agreement) is pinned by tests/test_pallas.py, which runs these
kernels in interpret mode on the CPU mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparch_tpu.ops import cells

__all__ = [
    "rlif_pallas",
    "radlif_pallas",
    "lif_pallas",
    "adlif_pallas",
    "readout_pallas",
]

_LANE = 128
_SUBLANE = 8
_TC = 8  # fallback timesteps per grid cell (statically unrolled)


def _pick_tc(T: int, Hp: int = 0) -> int:
    """Timesteps per grid cell. Prefer a divisor of T so the tail chunk is
    full: the per-step out-of-bounds sanitisation (`k >= tail_len` selects)
    then compiles away entirely — for T=100 that removes 4 partially-dead
    unrolled steps and their `where` chains from EVERY chunk. Falls back to
    8 (with the tail logic) for awkward (e.g. prime) T.

    Wide layers (Hp >= 1536) cap the unroll at 4 steps: Mosaic compile
    time grows superlinearly in unrolled-ops x lanes and hits multi-minute
    builds at H=1536 with the default chunking (observed round 2), while
    the shorter unroll compiles in tens of seconds and the extra grid
    steps cost little — the per-step work at that width amortises the
    loop overhead on its own."""
    hi, lo = (4, 3) if Hp >= 1536 else (16, 6)
    if T <= hi:
        return max(T, 1)
    for cand in range(hi, lo - 1, -1):
        if T % cand == 0:
            return cand
    return min(_TC, hi)
# v5e has 128 MiB of VMEM per TensorCore. The budget must be generous:
# shrinking the batch tile below 128 rows starves the MXU (a (bt,H)@(H,H)
# matmul feeds only bt of the systolic array's 128 rows, so bt=32 runs the
# recurrent products at ~25% efficiency — measured 3.3x slower backward).
# 64 MiB keeps bt=128 up to H=1024 (the SC bidirectional config) with the
# plan's conservative 4-bytes-per-element stream accounting.
# The LIMIT is the hard scoped-vmem bound handed to Mosaic. The SNN
# kernels keep the round-3 96 MiB (the limit is also a Mosaic scheduling
# input, so a raise is not free: the north-star RadLIF bench is pinned
# against this value). The ANN kernels pass 120 MiB of the 128 MiB
# capacity instead — their byte-accurate plan (pallas_ann._plan_vmem,
# budget 96M x the 1.25 model-to-Mosaic calibration factor) tops out at
# ~120M, and the measured raised-tile configs (LiGRU 1536 @ bt=128:
# 116M real) need the headroom.
_VMEM_BUDGET = 64 * 1024 * 1024
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_LIMIT_WIDE = 120 * 1024 * 1024


def _scoped_limit(Hp: int) -> int:
    """Width-banded Mosaic scoped-vmem limit for the SNN kernels.

    The limit is not just a capacity guard — Mosaic uses it as a
    SCHEDULING input, and a tight limit is dramatically faster: the
    round-5 on-chip sweep (tools/probe_vmem_limit.py,
    docs/probe_vmem_limit_*.json) measured the north-star RadLIF
    fwd+bwd at H=512 f32 running 0.127 ms under a 32 MiB limit vs
    0.254 ms under the old fixed 96 MiB (2.0x), with the bf16 twin
    showing the same shape. The bands are the smallest compiling
    limit plus margin, measured on the real v5e:

    - Hp <= 640: real demand < 24 MiB (24 compiled and ran); 32-48 all
      fast, 40 splits the f32/bf16 optima.
    - Hp <= 1024: f32 demand is in (48, 64] (48 FAILS to compile, 64
      runs 0.793 vs 0.878 ms at 96); bf16 compiles at 48 (0.566 vs
      0.651). 72 clears the f32 demand with margin for the
      affine/dropout variants.
    - wider: keep the round-3 96 MiB. bf16 H=2048 (wide path) measured
      64: 1.235 / 96: 1.297 / 112: 1.326 — only ~5% on the table, the
      wide configs are MXU-bound and the f32 wide demand below 96 is
      unprobed; not worth the compile-failure risk.

    The on-chip check_kernels matrix (42 cases: affine folds, dropout,
    bf16 streams, wide 1536/2048, prime-T tails) is the compile+parity
    gate for these bands."""
    if Hp <= 640:
        return 40 * 1024 * 1024
    if Hp <= 1024:
        return 72 * 1024 * 1024
    return _VMEM_LIMIT


def _compiler_params(limit: int = _VMEM_LIMIT):
    # shape_invariant_numerics=False restores Mosaic's permissive handling
    # of float add-reductions over offset layouts (the batch-dim sums of
    # the gradient accumulators); all reduced values are explicitly
    # sanitised in-kernel, so padding cannot leak into the sums.
    return pltpu.CompilerParams(
        vmem_limit_bytes=limit,
        shape_invariant_numerics=False,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _keep_u32(drop_rate: float) -> int:
    """uint32 threshold such that P(bits < thr) = 1 - drop_rate."""
    return min(2**32 - 1, int(round((1.0 - drop_rate) * 2**32)))


def _tile_plan(Bp: int, Hp: int, streams: int = None, tc: int = _TC, *,
               stream_bytes: int = None, mat_bytes: int = 8,
               budget: int = _VMEM_BUDGET):
    """Pick the batch tile so the double-buffered (tc, bt, Hp) stream
    blocks + resident (Hp, Hp) matrices + a few (bt, Hp) state buffers
    fit the VMEM budget. Prefer the full 128 MXU rows; shrink only for
    very wide layers.

    ``stream_bytes``: total bytes per (tc·bt·Hp) element summed over
    every double-buffered time-major stream (defaults to 4 bytes x
    ``streams`` — the SNN kernels' all-f32 accounting, kept bit-identical
    for their call sites). ``mat_bytes``: total resident (Hp, Hp) bytes
    per element across the V matrices and their dV accumulators (default
    8 = one f32 V+dV pair; the multi-gate ANN kernels pass their true
    per-mode value — see ``pallas_ann._plan_vmem``, calibrated against
    the measured GRU Hp=1280 Mosaic OOM breakdown)."""
    if stream_bytes is None:
        stream_bytes = 4 * streams
    bt = Bp
    for cand in (128, 64, 32, 16, 8):
        if Bp % cand == 0:
            bt = cand
            break
    while bt > _SUBLANE and (
        2 * stream_bytes * bt * tc * Hp + mat_bytes * Hp * Hp
        + 24 * bt * Hp
    ) > budget:
        bt //= 2
    return bt


def _interpret() -> bool:
    # Default interpret-mode decision: the PROCESS default backend. Wrong
    # when a kernel is traced for a mesh on a DIFFERENT platform (the
    # driver's dryrun builds a virtual CPU mesh while the axon TPU plugin
    # owns the default backend) — entry points that know their mesh
    # (ops/pallas_tp.py sharded wrappers) pass an explicit ``interpret``
    # instead, threaded through the custom_vjp closures because the bwd
    # kernel binds only when the OUTER grad is traced, long after any
    # wrapper scope has exited.
    return jax.default_backend() != "tpu"


def _mxu_colsum(ones_row, x):
    """Batch-dim reduction ``sum_b x[b, :]`` as a (1,bt)@(bt,H) contraction.

    The backward kernel is VPU-throughput-bound; the MXU sits mostly idle
    between the two big per-step products, so the six per-step gradient
    reductions ride it for free instead of paying cross-sublane shuffle
    chains on the VPU (measured better even at bt=8: a VPU-sum variant
    for tiny tiles benched 0.044 -> 0.058 ms on the LIF-b8 config)."""
    return jax.lax.dot_general(
        ones_row, x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _random_keep(shape, s0, s1, tile_i, t_global, keep_u32, use_hw_prng):
    """Deterministic per-(seed, batch-tile, timestep, element) keep mask.

    Forward and backward kernels regenerate the identical mask from the
    same seeds, so the dropout pattern needs no stream and no storage.
    On TPU the hardware PRNG is used (one seed + one draw per step); in
    interpret mode (where the PRNG primitives are a zero stub) a murmur-
    style index hash supplies real, reproducible masks for the CPU tests.
    """
    if use_hw_prng:
        # Mosaic accepts at most two seed scalars: mix the batch-tile and
        # timestep indices into them (wrapping int32 arithmetic)
        sa = s0 + tile_i * jnp.int32(-1640531527)  # 0x9E3779B9
        sb = s1 + jnp.asarray(t_global, jnp.int32) * jnp.int32(40503)
        pltpu.prng_seed(sa, sb)
        bits = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    else:
        r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        z = (
            r * jnp.uint32(0x9E3779B1)
            + c * jnp.uint32(0x85EBCA77)
            + jnp.asarray(s0, jnp.uint32) * jnp.uint32(0xC2B2AE3D)
            + jnp.asarray(s1, jnp.uint32)
            + jnp.asarray(t_global, jnp.uint32) * jnp.uint32(0x27D4EB2F)
            + jnp.asarray(tile_i, jnp.uint32) * jnp.uint32(0x165667B1)
        )
        z = z ^ (z >> 16)
        z = z * jnp.uint32(0x7FEB352D)
        z = z ^ (z >> 15)
        z = z * jnp.uint32(0x846CA68B)
        bits = z ^ (z >> 16)
    return bits < jnp.uint32(keep_u32)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    *refs,
    threshold: float,
    tc: int,
    T: int,
    recurrent: bool,
    adaptive: bool,
    affine: bool,
    drop_rate: float,
    use_hw_prng: bool,
    save_residuals: bool,
    mxu_bf16: bool,
):
    # inputs: Wx (bt,TC,H); scale/shift/alpha/beta/a/b (1,H); V (H,H);
    #         u0/w0/s0 (bt,H)
    # outputs: s (bt,TC,H) [+ u/w residual streams and u/s/w chunk-boundary
    # states when saving — the boundaries feed the backward kernel, written
    # here so no host-side strided gather (and its layout-change copy of
    # the 26 MB residuals) is needed]
    # scratch: u, w, s state (bt,H) — persists across time-chunk grid steps
    refs = list(refs)
    (
        wx_ref, scale_ref, shift_ref,
        alpha_ref, beta_ref, a_ref, b_ref, v_ref,
        u0_ref, w0_ref, s0_ref,
    ) = refs[:11]
    del refs[:11]
    # dropout seed scalars (SMEM) only exist on the fused-dropout path
    has_dropout = drop_rate > 0.0
    seed_ref = refs.pop(0) if has_dropout else None
    # residual outputs: s and u streams + chunk-boundary states. The w
    # series is NOT streamed — the backward reconstructs it within each
    # chunk from the next boundary (w_{t-1} = (w_t - a*u_p - b*s_p)/beta),
    # and s_t is recomputed as (u_t > threshold). Adaptive cells
    # additionally emit the w boundaries and the final w state.
    if save_residuals:
        n_out = 6 if adaptive else 4
    else:
        n_out = 1
    outs = refs[:n_out]
    s_out_ref = outs[0]
    u_out_ref = outs[1] if save_residuals else None
    ub_out_ref = outs[2] if save_residuals else None
    sb_out_ref = outs[3] if save_residuals else None
    wb_out_ref = outs[4] if (save_residuals and adaptive) else None
    wf_out_ref = outs[5] if (save_residuals and adaptive) else None
    u_scr, w_scr, s_scr, sv_scr = refs[n_out:]

    t = pl.program_id(1)

    v_mat = None
    if recurrent:
        v_mat = v_ref[:, :]
        if mxu_bf16:
            v_mat = v_mat.astype(jnp.bfloat16)

    @pl.when(t == 0)
    def _init():
        u_scr[:, :] = u0_ref[:, :]
        s_scr[:, :] = s0_ref[:, :]
        if adaptive:
            w_scr[:, :] = w0_ref[:, :]
        if recurrent:
            s0 = s0_ref[:, :]
            if mxu_bf16:
                s0 = s0.astype(jnp.bfloat16)
            sv_scr[:, :] = jnp.dot(
                s0, v_mat, preferred_element_type=jnp.float32
            )

    alpha = alpha_ref[0, :]
    if affine:
        scale = scale_ref[0, :]
        shift = shift_ref[0, :]
    u = u_scr[:, :]
    s = s_scr[:, :]
    w = w_scr[:, :] if adaptive else None
    # sV carries s @ V for the CURRENT s: issued right after each new spike
    # vector so the MXU product overlaps the dropout/store/w VPU work
    # instead of stalling the next step's drive.
    sV = sv_scr[:, :] if recurrent else None

    if save_residuals:
        # state at this chunk's left boundary (t = chunk_start - 1)
        ub_out_ref[:, :] = u
        sb_out_ref[:, :] = s
        if adaptive:
            wb_out_ref[:, :] = w

    for k in range(tc):  # static unroll
        # Wx streams time-major (TC, bt, H): XLA's projection+BN-stats
        # fusion writes its (B,T,H) output in the {2,0,1} (time-major)
        # layout, so the transposed view is a free bitcast where a
        # batch-major block would cost a 26 MB relayout copy per layer.
        drive = wx_ref[k, :, :]
        if affine:
            # normalization folded to a per-feature affine on load
            drive = scale * drive + shift
        if recurrent:
            drive = drive + sV
        if adaptive:
            w = beta_ref[0, :] * w + a_ref[0, :] * u + b_ref[0, :] * s
            drive = drive - w
        u = alpha * (u - s) + (1.0 - alpha) * drive
        s = (u > threshold).astype(u.dtype)
        if recurrent:
            # spikes are 0/1 — exactly representable in bf16; with a bf16 V
            # the MXU runs at full (single-pass) rate instead of the 3-pass
            # f32 mode, at ~1e-3 relative error on the recurrent drive
            s_in = s.astype(jnp.bfloat16) if mxu_bf16 else s
            sV = jnp.dot(s_in, v_mat, preferred_element_type=jnp.float32)
        if has_dropout:
            # raw spikes stay in the recurrence (and are reconstructed
            # from u in the backward); only the layer OUTPUT is dropped,
            # so the mask needs no stream or storage
            keep = _random_keep(
                s.shape, seed_ref[0], seed_ref[1], pl.program_id(0),
                t * tc + k, _keep_u32(drop_rate), use_hw_prng,
            )
            s_out_ref[k, :, :] = jnp.where(
                keep, s * (1.0 / (1.0 - drop_rate)), 0.0
            ).astype(s_out_ref.dtype)
        else:
            s_out_ref[k, :, :] = s.astype(s_out_ref.dtype)
        if save_residuals:
            u_out_ref[k, :, :] = u.astype(u_out_ref.dtype)
            if adaptive and k == (T - 1) % tc:
                # final w state, captured after the last LIVE step of the
                # tail chunk (later dead steps corrupt the register from
                # out-of-bounds Wx reads); earlier chunks' writes to this
                # revisited block are overwritten by later chunks. The
                # backward unwinds w from here / from the chunk boundaries.
                wf_out_ref[:, :] = w

    u_scr[:, :] = u
    s_scr[:, :] = s
    if adaptive:
        w_scr[:, :] = w
    if recurrent:
        sv_scr[:, :] = sV


def _forward_pallas(
    Wx, scale, shift, alpha, beta, a, b, V, threshold, u0, w0, s0, seed,
    *, recurrent: bool, adaptive: bool, affine: bool, drop_rate: float,
    save_residuals: bool, mxu_bf16: bool = False,
    interpret: bool | None = None,
):
    """Run the fused forward. Params must already be clamped/masked.
    Returns s, or (s, residuals). ``interpret`` pins interpret mode for
    callers whose mesh platform differs from the default backend
    (ops/pallas_tp.py); None = decide from the default backend."""
    interp = _interpret() if interpret is None else bool(interpret)
    B, T, H = Wx.shape
    dtype = jnp.float32
    # Spike streams are bf16 in the bf16-MXU mode: raw spikes are 0/1
    # (exact); only dropout-kept values pay one bf16 rounding. This became
    # profitable with the time-major layout — in batch-major blocks the
    # packed (16,128) bf16 tiling made every per-step k-slice pay sublane
    # unpack shuffles that cost more than the halved HBM traffic saved,
    # but a time-major per-step slice is a whole (bt, Hp) plane.
    rdt = jnp.bfloat16 if mxu_bf16 else dtype
    # The u residual stays f32: the backward recomputes s_t EXACTLY by
    # re-thresholding the same f32 u values the forward thresholded; a
    # bf16 u would flip spikes whose membrane sits within one bf16 ulp of
    # the threshold and corrupt dV/dbeta with O(1) per-element errors.
    udt = dtype
    Hp = _round_up(H, _LANE)
    Bp = _round_up(B, _SUBLANE)
    tc = _pick_tc(T, Hp)
    # streams=4 matches the backward's plan so both kernels always pick
    # the same batch tile — the fused-dropout mask regeneration keys on
    # the batch-tile index, so fwd/bwd tiles must align
    bt = _tile_plan(Bp, Hp, streams=4, tc=tc)
    # T is NOT padded: the tail time chunk reads out-of-bounds garbage
    # (harmless — tail state is never consumed) and its out-of-range
    # writes are discarded by Pallas. Padding T would cost two full
    # HBM copies of every (B,T,H) stream per call.
    n_chunks = (T + tc - 1) // tc

    def pad_bh(x, fill=0.0):
        return jnp.pad(
            x.astype(dtype), ((0, Bp - B), (0, Hp - H)), constant_values=fill
        )

    # Wx keeps its incoming dtype (bf16 on the bf16-MXU fold path — the
    # layer casts after computing f32 normalization stats); the in-kernel
    # affine promotes back to f32 on load.
    Wx_p = jnp.swapaxes(
        jnp.pad(
            Wx,
            ((0, Bp - B), (0, 0), (0, Hp - H)),
            constant_values=-1e9,
        ),
        0, 1,
    )  # (T, Bp, Hp) — free bitcast given the producer's T-major layout
    pad_h = lambda p, fill=0.0: jnp.pad(  # noqa: E731
        p.astype(dtype), (0, Hp - H), constant_values=fill
    )[None, :]
    # padded feature lanes must never spike: with the affine fold their
    # drive is scale*Wx + shift = 0*Wx + (-1e9); without it the -1e9 Wx
    # padding does the same job
    scale_p = pad_h(scale) if affine else jnp.zeros((1, Hp), dtype)
    shift_p = (
        pad_h(shift, fill=-1e9) if affine else jnp.zeros((1, Hp), dtype)
    )
    alpha_p = pad_h(alpha)
    beta_p = pad_h(beta) if adaptive else jnp.zeros((1, Hp), dtype)
    a_p = pad_h(a) if adaptive else jnp.zeros((1, Hp), dtype)
    b_p = pad_h(b) if adaptive else jnp.zeros((1, Hp), dtype)
    # non-recurrent cells never read V: a (1,1) dummy avoids building,
    # streaming, and holding an HxH zero block resident in VMEM.
    # In the bf16-MXU mode V is stored bf16 *in VMEM*: the in-kernel dots
    # already consume V.astype(bf16), so casting before the pad is
    # bit-identical — it just halves the resident footprint (the padded
    # Hp x Hp block is the largest fixed VMEM tenant at wide H).
    vdt = jnp.bfloat16 if mxu_bf16 else dtype
    V_p = (
        jnp.pad(V.astype(vdt), ((0, Hp - H), (0, Hp - H)))
        if recurrent
        else jnp.zeros((1, 1), dtype)
    )
    u0_p = pad_bh(u0, fill=-1e9)
    s0_p = pad_bh(s0)
    w0_p = pad_bh(w0) if adaptive else jnp.zeros((Bp, Hp), dtype)

    grid = (Bp // bt, n_chunks)
    kernel = functools.partial(
        _fwd_kernel,
        threshold=float(threshold),
        tc=tc,
        T=T,
        recurrent=recurrent,
        adaptive=adaptive,
        affine=affine,
        drop_rate=drop_rate,
        use_hw_prng=not interp,
        save_residuals=save_residuals,
        mxu_bf16=mxu_bf16,
    )
    seed_ops = ()
    seed_specs = []
    if drop_rate > 0.0:
        seed_ops = (jnp.asarray(seed, jnp.int32),)
        seed_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    bh = lambda i, t: (i, 0)  # noqa: E731
    tbh = lambda i, t: (t, i, 0)  # noqa: E731
    bnd_map = lambda i, t: (i, t)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    # ALL (T,.,.) streams are time-major: the in-kernel per-step slice
    # [k, :, :] is then a whole tile-aligned (bt, Hp) plane (a batch-major
    # (bt, tc, Hp) block would pay sublane shuffles on every k-slice), and
    # the producing/consuming XLA matmuls fold the logical transpose for
    # free.
    tm_spec = pl.BlockSpec((tc, bt, Hp), tbh, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM)
    mat_spec = (
        pl.BlockSpec((Hp, Hp), rep2, memory_space=pltpu.VMEM)
        if recurrent
        else pl.BlockSpec((1, 1), rep2, memory_space=pltpu.VMEM)
    )
    state_spec = pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hp), bnd_map, memory_space=pltpu.VMEM)

    if save_residuals:
        out_specs = (tm_spec,) * 2 + (bnd_spec,) * 2
        out_shape = [
            jax.ShapeDtypeStruct((T, Bp, Hp), rdt),  # s
            jax.ShapeDtypeStruct((T, Bp, Hp), udt),  # u
            jax.ShapeDtypeStruct((Bp, n_chunks * Hp), dtype),  # ub
            jax.ShapeDtypeStruct((Bp, n_chunks * Hp), dtype),  # sb
        ]
        if adaptive:
            out_specs = out_specs + (bnd_spec, state_spec)
            out_shape += [
                jax.ShapeDtypeStruct((Bp, n_chunks * Hp), dtype),  # wb
                jax.ShapeDtypeStruct((Bp, Hp), dtype),  # w final
            ]
        out_shape = tuple(out_shape)
    else:
        out_specs = (tm_spec,)
        out_shape = (jax.ShapeDtypeStruct((T, Bp, Hp), rdt),)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tm_spec,  # Wx (time-major)
            vec_spec, vec_spec,  # scale shift
            vec_spec, vec_spec, vec_spec, vec_spec,  # alpha beta a b
            mat_spec,  # V
            state_spec, state_spec, state_spec,  # u0 w0 s0
        ] + seed_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, Hp), jnp.float32),
            pltpu.VMEM((bt, Hp), jnp.float32),
            pltpu.VMEM((bt, Hp), jnp.float32),
            pltpu.VMEM((bt, Hp), jnp.float32),  # carried s @ V
        ],
        interpret=interp,
        compiler_params=_compiler_params(_scoped_limit(Hp)),
    )(Wx_p, scale_p, shift_p, alpha_p, beta_p, a_p, b_p, V_p,
      u0_p, w0_p, s0_p, *seed_ops)

    if not save_residuals:
        return jnp.swapaxes(outs[0][:, :B, :H], 0, 1)
    if adaptive:
        s_seq, u_seq, ub, sb, wb, wf = outs
        # chunk-END w boundaries: slots shift by one, final state closes
        # the last chunk — the backward unwinds w inside each chunk
        wend = jnp.concatenate([wb[:, Hp:], wf], axis=1)
    else:
        s_seq, u_seq, ub, sb = outs
        wend = jnp.zeros_like(sb)
    # residuals stay in padded time-major (T, Bp, Hp) form — the backward
    # kernel consumes them directly, avoiding slice/pad round-trips
    return jnp.swapaxes(s_seq[:, :B, :H], 0, 1), (u_seq, ub, sb, wend)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    *refs,
    threshold: float,
    tc: int,
    T: int,
    recurrent: bool,
    adaptive: bool,
    affine: bool,
    drop_rate: float,
    use_hw_prng: bool,
    mxu_bf16: bool,
):
    refs = list(refs)
    g_ref = refs.pop(0)  # (bt, TC, H) — output cotangent, reverse-streamed
    # raw Wx stream only exists on the affine-fold path
    wx_ref = refs.pop(0) if affine else None
    has_dropout = drop_rate > 0.0
    seed_ref = refs.pop(0) if has_dropout else None
    (
        u_ref,  # (bt, TC, H) — saved u_t (the ONLY full residual stream:
        # s_t is recomputed as (u_t > threshold) and w is unwound within
        # the chunk from its end boundary)
        ub_ref,  # (bt, H) — u at this chunk's left boundary (t = start-1)
        sb_ref,  # (bt, H) — s at the left boundary (s0 is independent of
        # u0, so it cannot be recomputed for the first chunk)
        we_ref,  # (bt, H) — w at this chunk's RIGHT boundary (last step)
        scale_ref,  # (1, H)
        alpha_ref,  # (1, H)
        beta_ref,
        a_ref,
        b_ref,
        v_ref,  # (H, H) — V (contracted as A @ V^T in-kernel; materialising
        # V^T on the host costs a layout-change copy)
        dwx_ref,  # (bt, TC, H) out
        dv_ref,  # (H, H) out, accumulated
        dalpha_ref,  # (1, H) out, accumulated
        dbeta_ref,
        da_ref,
        db_ref,
        dscale_ref,  # (1, H) out, accumulated (affine fold)
        dshift_ref,
        du0_ref,  # (bt, H) out
        dw0_ref,
        ds0_ref,
        A_scr,  # (bt, H) persistent adjoint scratch
        B_scr,
        AV_scr,  # (bt, H) carried ((1-alpha)*A) @ V^T (see loop note)
    ) = refs[:24]
    kc = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    first = kc == 0
    last = kc == n_chunks - 1
    # T is unpadded: only the FIRST reverse chunk (kc == 0, the forward
    # tail) can be partial. Steps with k >= tail_len are valid in every
    # other chunk; in the tail chunk their out-of-bounds loads are
    # sanitised to zero so garbage (possibly NaN) memory cannot poison
    # the adjoints or accumulators.
    n_chunks_static = (T + tc - 1) // tc
    tail_len = T - (n_chunks_static - 1) * tc

    @pl.when(first)
    def _init_adjoints():
        A_scr[:, :] = jnp.zeros_like(A_scr)
        B_scr[:, :] = jnp.zeros_like(B_scr)
        AV_scr[:, :] = jnp.zeros_like(AV_scr)

    @pl.when(first & (pl.program_id(0) == 0))
    def _init_accumulators():
        dv_ref[:, :] = jnp.zeros_like(dv_ref)
        dalpha_ref[:, :] = jnp.zeros_like(dalpha_ref)
        dbeta_ref[:, :] = jnp.zeros_like(dbeta_ref)
        da_ref[:, :] = jnp.zeros_like(da_ref)
        db_ref[:, :] = jnp.zeros_like(db_ref)
        dscale_ref[:, :] = jnp.zeros_like(dscale_ref)
        dshift_ref[:, :] = jnp.zeros_like(dshift_ref)

    alpha = alpha_ref[0, :]
    one_m_alpha = 1.0 - alpha
    beta = beta_ref[0, :]
    a_c = a_ref[0, :]
    b_c = b_ref[0, :]
    scale = scale_ref[0, :] if affine else None
    if adaptive:
        # beta >= exp(-1/30) after clamping: the in-chunk backward unwind
        # w_{t-1} = (w_t - a*u_p - b*s_p)/beta amplifies rounding by at
        # most (1/beta)^TC ~ 1.3 before the next boundary refresh
        inv_beta = 1.0 / beta
        w_cur = we_ref[:, :]

    A = A_scr[:, :]
    B = B_scr[:, :]
    # AV carries ((1-alpha)*A) @ V^T for the CURRENT A: each step issues the
    # next step's product immediately after A_new is known, so the MXU
    # latency hides behind the rest of the step's gradient work instead of
    # sitting on the sequential adjoint chain.
    AV = AV_scr[:, :] if recurrent else None
    v = None
    if recurrent:
        v = v_ref[:, :]
        if mxu_bf16:
            v = v.astype(jnp.bfloat16)
    ones_row = jnp.ones((1, A.shape[0]), jnp.float32)
    dv_acc = jnp.zeros_like(dv_ref) if recurrent else None
    dal = jnp.zeros_like(dalpha_ref)
    dbe = jnp.zeros_like(dbeta_ref)
    daa = jnp.zeros_like(da_ref)
    dbb = jnp.zeros_like(db_ref)
    dsc = jnp.zeros_like(dscale_ref)
    dsh = jnp.zeros_like(dshift_ref)

    for k in range(tc - 1, -1, -1):  # reverse static unroll
        g_t = g_ref[k, :, :].astype(jnp.float32)
        if has_dropout:
            # regenerate the forward's keep mask from the same seeds: the
            # incoming cotangent is w.r.t. the DROPPED output
            keep = _random_keep(
                g_t.shape, seed_ref[0], seed_ref[1], pl.program_id(0),
                (n_chunks - 1 - kc) * tc + k, _keep_u32(drop_rate),
                use_hw_prng,
            )
            g_t = jnp.where(keep, g_t * (1.0 / (1.0 - drop_rate)), 0.0)
        u_t = u_ref[k, :, :].astype(jnp.float32)
        # previous-step state: in-block for k > 0, chunk boundary for k == 0
        # (boundary arrays carry state at t = chunk_start - 1, incl. u0/s0/w0
        # for the first chunk) — avoids streaming full shifted copies.
        # s_{t-1} is the forward's threshold function of u_{t-1}, so it is
        # recomputed instead of streamed (exact: same f32 u values).
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
        C = g_t - alphaA
        if recurrent:
            C = C + AV
        if adaptive:
            C = C + b_c * B
        wsub = u_t - threshold
        window = (wsub > -0.5) & (wsub <= 0.5)
        A_new = jnp.where(window, C, 0.0) + alphaA
        if adaptive:
            A_new = A_new + a_c * B
        ddrive = one_m_alpha * A_new
        if recurrent:
            # next step's A @ V^T (contraction over V's second axis),
            # issued as early as possible; first consumed next iteration
            A_in = ddrive.astype(jnp.bfloat16) if mxu_bf16 else ddrive
            AV = jax.lax.dot_general(
                A_in, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if affine:
            wx_t = wx_ref[k, :, :]  # time-major stream (see forward)
            if k >= tail_len:
                wx_t = jnp.where(kc != 0, wx_t, 0.0)
            dsc = dsc + _mxu_colsum(ones_row, ddrive * wx_t)
            dsh = dsh + _mxu_colsum(ones_row, ddrive)
            dwx_ref[k, :, :] = (ddrive * scale).astype(dwx_ref.dtype)
        else:
            dwx_ref[k, :, :] = ddrive.astype(dwx_ref.dtype)

        if recurrent:
            # dV += s_{t-1}^T dDrive — contract over the batch tile
            sp_in, dd_in = s_p, ddrive
            if mxu_bf16:
                sp_in = sp_in.astype(jnp.bfloat16)
                dd_in = dd_in.astype(jnp.bfloat16)
            dv_acc = dv_acc + jax.lax.dot_general(
                sp_in, dd_in,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # dalpha term: (u_p-s_p) - d_t == (u_p - s_p - u_t)/(1-alpha);
        # the divide is hoisted out of the loop (final scale below)
        dal = dal + _mxu_colsum(ones_row, A_new * (u_p - s_p - u_t))
        if adaptive:
            # unwind w: w_cur holds w_t for this step; invert the forward
            # update to get w_{t-1} (used by the dbeta sum and carried)
            w_p = (w_cur - a_c * u_p - b_c * s_p) * inv_beta
            if k >= tail_len:
                live = kc != 0
                w_p = jnp.where(live, w_p, 0.0)
                # dead tail steps must not unwind the carried state
                w_cur = jnp.where(live, w_p, w_cur)
            else:
                w_cur = w_p
            B_new = beta * B - ddrive  # == -(1-alpha)*A_new + beta*B
            dbe = dbe + _mxu_colsum(ones_row, B_new * w_p)
            daa = daa + _mxu_colsum(ones_row, B_new * u_p)
            dbb = dbb + _mxu_colsum(ones_row, B_new * s_p)
            B = B_new
        A = A_new

    A_scr[:, :] = A
    B_scr[:, :] = B
    if recurrent:
        AV_scr[:, :] = AV
    if recurrent:
        dv_ref[:, :] += dv_acc
    # 1-alpha >= 0.039 after clamping
    dalpha_ref[:, :] += dal / one_m_alpha
    if adaptive:
        dbeta_ref[:, :] += dbe
        da_ref[:, :] += daa
        db_ref[:, :] += dbb
    if affine:
        dscale_ref[:, :] += dsc
        dshift_ref[:, :] += dsh

    @pl.when(last)
    def _initial_state_grads():
        A_fin = A_scr[:, :]
        B_fin = B_scr[:, :]
        du0 = alpha * A_fin
        if adaptive:
            du0 = du0 + a_c * B_fin
        du0_ref[:, :] = du0
        dw0_ref[:, :] = beta * B_fin
        ds0 = -alpha * A_fin
        if recurrent:
            # the carried product already holds ((1-alpha)*A_fin) @ V^T
            ds0 = ds0 + AV_scr[:, :]
        if adaptive:
            ds0 = ds0 + b_c * B_fin
        ds0_ref[:, :] = ds0


def _backward_pallas(
    g, Wx, residuals, scale, alpha, beta, a, b, V, threshold, seed,
    *, recurrent: bool, adaptive: bool, affine: bool, drop_rate: float,
    mxu_bf16: bool = False, interpret: bool | None = None,
):
    """Fused reverse-time BPTT. Params must already be clamped/masked;
    ``residuals`` are the forward kernel's padded outputs
    (u_pd, ub, sb, wend). Returns (dWx, dscale, dshift, dV,
    dalpha, dbeta, da, db, du0, dw0, ds0) w.r.t. the clamped parameters."""
    interp = _interpret() if interpret is None else bool(interpret)
    u_pd, ub, sb, wend = residuals
    B, T, H = g.shape
    dtype = jnp.float32
    # g/dWx stream in bf16 in the bf16-MXU mode (the cotangent already
    # arrives bf16 — it is the adjoint of the bf16 spike output — and dWx
    # feeds bf16 MXU wgrad/dgrad contractions, so nothing loses precision
    # that the mode hadn't already traded); the u residual stays f32.
    sdt = jnp.bfloat16 if mxu_bf16 else dtype
    _, Bp, Hp = u_pd.shape  # residuals are time-major (T, Bp, Hp)
    tc = _pick_tc(T, Hp)
    # streams: g, u, dwx out (+ Wx on the affine path); fixed at 4 so the
    # batch tile always matches the forward's (mask regeneration keys on
    # the tile index)
    bt = _tile_plan(Bp, Hp, streams=4, tc=tc)
    n_chunks = (T + tc - 1) // tc

    # zero cotangent on padded rows/cols keeps adjoints silent; time-major
    # like every other stream
    g_p = jnp.swapaxes(
        jnp.pad(g.astype(sdt), ((0, Bp - B), (0, 0), (0, Hp - H))), 0, 1
    )
    wx_ops = ()
    if affine:
        # time-major, matching the producer's layout (see forward kernel);
        # dtype preserved (bf16 on the bf16-MXU fold path)
        wx_ops = (
            jnp.swapaxes(
                jnp.pad(Wx, ((0, Bp - B), (0, 0), (0, Hp - H))),
                0, 1,
            ),
        )

    pad_h = lambda p: jnp.pad(p.astype(dtype), (0, Hp - H))[None, :]  # noqa: E731
    scale_p = pad_h(scale) if affine else jnp.zeros((1, Hp), dtype)
    alpha_p = pad_h(alpha)
    beta_p = pad_h(beta) if adaptive else jnp.zeros((1, Hp), dtype)
    a_p = pad_h(a) if adaptive else jnp.zeros((1, Hp), dtype)
    b_p = pad_h(b) if adaptive else jnp.zeros((1, Hp), dtype)
    V_p = (
        # bf16-resident in the bf16-MXU mode — see the forward wrapper
        jnp.pad(
            V.astype(jnp.bfloat16 if mxu_bf16 else dtype),
            ((0, Hp - H), (0, Hp - H)),
        )
        if recurrent
        else jnp.zeros((1, 1), dtype)  # never read (see forward)
    )

    grid = (Bp // bt, n_chunks)
    kernel = functools.partial(
        _bwd_kernel,
        threshold=float(threshold),
        tc=tc,
        T=T,
        recurrent=recurrent,
        adaptive=adaptive,
        affine=affine,
        drop_rate=drop_rate,
        use_hw_prng=not interp,
        mxu_bf16=mxu_bf16,
    )
    seed_ops = ()
    seed_specs = []
    if drop_rate > 0.0:
        seed_ops = (jnp.asarray(seed, jnp.int32),)
        seed_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    # time chunks walked in reverse; every stream is time-major (see the
    # forward kernel's layout note)
    rev_tm = lambda i, t: (n_chunks - 1 - t, i, 0)  # noqa: E731
    bh = lambda i, t: (i, 0)  # noqa: E731
    rev_bnd = lambda i, t: (i, n_chunks - 1 - t)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hp), rev_tm, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM)
    mat_spec = (
        pl.BlockSpec((Hp, Hp), rep2, memory_space=pltpu.VMEM)
        if recurrent
        else pl.BlockSpec((1, 1), rep2, memory_space=pltpu.VMEM)
    )
    state_spec = pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hp), rev_bnd, memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [tm_spec]  # g
            + ([tm_spec] if affine else [])  # raw Wx (affine fold)
            + seed_specs  # dropout seed scalars (SMEM)
            + [
                tm_spec,  # u
                bnd_spec,  # u left boundary
                bnd_spec,  # s left boundary
                bnd_spec,  # w right boundary
                vec_spec,  # scale
                vec_spec, vec_spec, vec_spec, vec_spec,  # alpha beta a b
                mat_spec,  # V
            ]
        ),
        out_specs=(
            tm_spec,  # dWx
            mat_spec,  # dV
            vec_spec, vec_spec, vec_spec, vec_spec,  # dalpha dbeta da db
            vec_spec, vec_spec,  # dscale dshift
            state_spec, state_spec, state_spec,  # du0 dw0 ds0
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, Hp), sdt),  # dWx
            jax.ShapeDtypeStruct((Hp, Hp) if recurrent else (1, 1), dtype),
            jax.ShapeDtypeStruct((1, Hp), dtype),
            jax.ShapeDtypeStruct((1, Hp), dtype),
            jax.ShapeDtypeStruct((1, Hp), dtype),
            jax.ShapeDtypeStruct((1, Hp), dtype),
            jax.ShapeDtypeStruct((1, Hp), dtype),
            jax.ShapeDtypeStruct((1, Hp), dtype),
            jax.ShapeDtypeStruct((Bp, Hp), dtype),
            jax.ShapeDtypeStruct((Bp, Hp), dtype),
            jax.ShapeDtypeStruct((Bp, Hp), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, Hp), jnp.float32),
            pltpu.VMEM((bt, Hp), jnp.float32),
            pltpu.VMEM((bt, Hp), jnp.float32),  # carried A @ V^T
        ],
        interpret=interp,
        compiler_params=_compiler_params(_scoped_limit(Hp)),
    )(
        g_p, *wx_ops, *seed_ops, u_pd, ub, sb, wend,
        scale_p, alpha_p, beta_p, a_p, b_p, V_p,
    )

    (
        dWx, dV, dalpha, dbeta, da, db, dscale, dshift, du0, dw0, ds0
    ) = outs
    return (
        jnp.swapaxes(dWx[:, :B, :H], 0, 1),
        dscale[0, :H],
        dshift[0, :H],
        dV[:H, :H],
        dalpha[0, :H],
        dbeta[0, :H],
        da[0, :H],
        db[0, :H],
        du0[:B, :H],
        dw0[:B, :H],
        ds0[:B, :H],
    )


# ---------------------------------------------------------------------------
# custom_vjp wrappers
# ---------------------------------------------------------------------------


def _clip_and_mask(alpha, beta, a, b, V, recurrent, adaptive):
    alpha_c = jnp.clip(alpha, *cells.ALPHA_LIM)
    beta_c = jnp.clip(beta, *cells.BETA_LIM) if adaptive else beta
    a_c = jnp.clip(a, *cells.A_LIM) if adaptive else a
    b_c = jnp.clip(b, *cells.B_LIM) if adaptive else b
    V_m = cells.zero_diag(V) if recurrent else V
    return alpha_c, beta_c, a_c, b_c, V_m


@functools.lru_cache(maxsize=None)
def _make_op(recurrent: bool, adaptive: bool, affine: bool, threshold: float,
             drop_rate: float = 0.0, mxu_bf16: bool = False,
             interpret: bool | None = None):
    """Build (and memoize) the custom_vjp op for a fixed static threshold —
    the kernels need a concrete Python float, so threshold (and the
    dropout rate) cannot be traced operands."""

    @jax.custom_vjp
    def op(Wx, scale, shift, alpha, beta, a, b, V, u0, w0, s0, seed):
        cm = _clip_and_mask(alpha, beta, a, b, V, recurrent, adaptive)
        return _forward_pallas(
            Wx, scale, shift, *cm[:4], cm[4], threshold, u0, w0, s0, seed,
            recurrent=recurrent, adaptive=adaptive, affine=affine,
            drop_rate=drop_rate, save_residuals=False, mxu_bf16=mxu_bf16,
            interpret=interpret,
        )

    def fwd(Wx, scale, shift, alpha, beta, a, b, V, u0, w0, s0, seed):
        cm = _clip_and_mask(alpha, beta, a, b, V, recurrent, adaptive)
        s_out, residuals = _forward_pallas(
            Wx, scale, shift, *cm[:4], cm[4], threshold, u0, w0, s0, seed,
            recurrent=recurrent, adaptive=adaptive, affine=affine,
            drop_rate=drop_rate, save_residuals=True, mxu_bf16=mxu_bf16,
            interpret=interpret,
        )
        # non-affine: a zero-length slice keeps Wx's dtype reachable for
        # the tangent casts below without holding the 26 MB array alive
        wx_saved = Wx if affine else Wx[:0]
        res = (wx_saved, scale, shift, alpha, beta, a, b, V, residuals,
               u0, w0, s0, seed)
        return s_out, res

    def bwd(res, g):
        (wx_saved, scale, shift, alpha, beta, a, b, V, residuals,
         u0, w0, s0, seed) = res

        # Re-derive the clamped params with their clip VJPs so raw-param
        # gradients match the scan path exactly.
        alpha_c, alpha_vjp = jax.vjp(
            lambda p: jnp.clip(p, *cells.ALPHA_LIM), alpha
        )
        if adaptive:
            beta_c, beta_vjp = jax.vjp(
                lambda p: jnp.clip(p, *cells.BETA_LIM), beta
            )
            a_c, a_vjp = jax.vjp(lambda p: jnp.clip(p, *cells.A_LIM), a)
            b_c, b_vjp = jax.vjp(lambda p: jnp.clip(p, *cells.B_LIM), b)
        else:
            beta_c, a_c, b_c = beta, a, b
        if recurrent:
            V_m, v_vjp = jax.vjp(cells.zero_diag, V)
        else:
            V_m = V

        (
            dWx, dscale, dshift, dV_m, dalpha_c, dbeta_c, da_c, db_c,
            du0, dw0, ds0,
        ) = _backward_pallas(
            g, wx_saved, residuals, scale,
            alpha_c, beta_c, a_c, b_c, V_m, threshold, seed,
            recurrent=recurrent, adaptive=adaptive, affine=affine,
            drop_rate=drop_rate, mxu_bf16=mxu_bf16, interpret=interpret,
        )

        (dalpha,) = alpha_vjp(dalpha_c)
        if adaptive:
            (dbeta,) = beta_vjp(dbeta_c)
            (da,) = a_vjp(da_c)
            (db,) = b_vjp(db_c)
        else:
            dbeta = jnp.zeros_like(beta)
            da = jnp.zeros_like(a)
            db = jnp.zeros_like(b)
        if recurrent:
            (dV,) = v_vjp(dV_m)
        else:
            dV = jnp.zeros_like(V)
        if not adaptive:
            dw0 = jnp.zeros_like(w0)
        if not affine:
            dscale = jnp.zeros_like(scale)
            dshift = jnp.zeros_like(shift)
        dseed = np.zeros(seed.shape, jax.dtypes.float0)
        # tangent dtypes must match the primals (custom_vjp contract); the
        # bf16 dWx stream converts on its way into the wgrad/dgrad dots
        dWx = dWx.astype(wx_saved.dtype)
        du0 = du0.astype(u0.dtype)
        dw0 = dw0.astype(w0.dtype)
        ds0 = ds0.astype(s0.dtype)
        return (dWx, dscale, dshift, dalpha, dbeta, da, db, dV,
                du0, dw0, ds0, dseed)

    op.defvjp(fwd, bwd)
    return op


def _call_op(Wx, scale, shift, alpha, beta, a, b, V, threshold, u0, w0, s0,
             *, recurrent, adaptive, mxu_bf16, drop_rate=0.0, drop_seed=None,
             interpret=None):
    affine = scale is not None
    op = _make_op(recurrent, adaptive, affine, float(threshold),
                  float(drop_rate), mxu_bf16,
                  None if interpret is None else bool(interpret))
    H = Wx.shape[-1]
    if not affine:
        scale = jnp.zeros((H,), Wx.dtype)
        shift = jnp.zeros((H,), Wx.dtype)
    if drop_seed is None:
        drop_seed = jnp.zeros((2,), jnp.int32)
    return op(Wx, scale, shift, alpha, beta, a, b, V, u0, w0, s0, drop_seed)


def radlif_pallas(Wx, alpha, beta, a, b, V, threshold, u0, w0, s0,
                  mxu_bf16: bool = False, scale=None, shift=None,
                  drop_rate: float = 0.0, drop_seed=None, interpret=None):
    """Fused RadLIF layer recurrence (drop-in for cells.radlif_scan).
    With ``scale``/``shift`` the normalization affine is applied on load
    (drive = scale*Wx + shift) and their gradients are returned. With
    ``drop_rate``/``drop_seed`` the layer-output dropout is fused: masks
    are regenerated from the seed in the backward, so the raw spikes need
    neither a second output stream nor storage."""
    return _call_op(Wx, scale, shift, alpha, beta, a, b, V, threshold,
                    u0, w0, s0, recurrent=True, adaptive=True,
                    mxu_bf16=mxu_bf16, drop_rate=drop_rate,
                    drop_seed=drop_seed, interpret=interpret)


def rlif_pallas(Wx, alpha, V, threshold, u0, s0, mxu_bf16: bool = False,
                scale=None, shift=None, drop_rate: float = 0.0,
                drop_seed=None, interpret=None):
    """Fused RLIF layer recurrence (drop-in for cells.rlif_scan)."""
    z = jnp.zeros_like(alpha)
    zs = jnp.zeros_like(u0)
    return _call_op(Wx, scale, shift, alpha, z, z, z, V, threshold,
                    u0, zs, s0, recurrent=True, adaptive=False,
                    mxu_bf16=mxu_bf16, drop_rate=drop_rate,
                    drop_seed=drop_seed, interpret=interpret)


def adlif_pallas(Wx, alpha, beta, a, b, threshold, u0, w0, s0,
                 scale=None, shift=None, drop_rate: float = 0.0,
                 drop_seed=None, mxu_bf16: bool = False, interpret=None):
    """Fused adLIF layer recurrence (drop-in for cells.adlif_scan).
    ``mxu_bf16`` halves the s/g/dWx stream traffic (no MXU products
    exist here — raw spikes are 0/1, exactly representable, so the
    dropout-free forward is bit-identical to f32; with fused dropout the
    kept values s/(1-p) round to bf16, and the dWx cotangent stream
    rounds, matching what the consuming default-precision matmuls do
    anyway)."""
    V = jnp.zeros((1, 1), Wx.dtype)  # never read (non-recurrent)
    return _call_op(Wx, scale, shift, alpha, beta, a, b, V, threshold,
                    u0, w0, s0, recurrent=False, adaptive=True,
                    mxu_bf16=mxu_bf16, drop_rate=drop_rate,
                    drop_seed=drop_seed, interpret=interpret)


def lif_pallas(Wx, alpha, threshold, u0, s0, scale=None, shift=None,
               drop_rate: float = 0.0, drop_seed=None,
               mxu_bf16: bool = False, interpret=None):
    """Fused LIF layer recurrence (drop-in for cells.lif_scan).
    ``mxu_bf16``: see adlif_pallas."""
    z = jnp.zeros_like(alpha)
    zs = jnp.zeros_like(u0)
    V = jnp.zeros((1, 1), Wx.dtype)  # never read (non-recurrent)
    return _call_op(Wx, scale, shift, alpha, z, z, z, V, threshold,
                    u0, zs, s0, recurrent=False, adaptive=False,
                    mxu_bf16=mxu_bf16, drop_rate=drop_rate,
                    drop_seed=drop_seed, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused readout kernel: u_t = a*u + (1-a)*Wx_t ; out += softmax(u_t)
# (reference snns.py:808-825). Pure VPU work, but as lax.scan it costs two
# sequential while-loops (fwd + BPTT) per step; fused it is one kernel each
# way with u / the adjoint G resident in VMEM.
#
# Backward math: out = sum_t softmax(u_t), gout constant over t:
#   G_t = p_t * (gout - <p_t, gout>) + alpha * G_{t+1}
#   dWx_t = (1-alpha) * G_t
#   dalpha += sum_B G_t * (u_{t-1} - Wx_t),
#             Wx_t = (u_t - alpha*u_{t-1}) / (1-alpha)
#   du_0 = alpha * G_1
# p_t is recomputed from the saved u_t series (cheaper than storing it).
# ---------------------------------------------------------------------------


def _softmax_lastdim(u):
    m = jnp.max(u, axis=-1, keepdims=True)
    e = jnp.exp(u - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _readout_fwd_kernel(*refs, tc, T, save_residuals):
    (wx_ref, alpha_ref, u0_ref) = refs[:3]
    n_out = 3 if save_residuals else 1
    outs = refs[3 : 3 + n_out]
    out_ref = outs[0]  # (bt, H) accumulator — block resident across chunks
    u_out_ref = outs[1] if save_residuals else None
    ub_out_ref = outs[2] if save_residuals else None
    (u_scr,) = refs[3 + n_out :]

    kc = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    n_chunks_static = (T + tc - 1) // tc
    tail_len = T - (n_chunks_static - 1) * tc

    @pl.when(kc == 0)
    def _init():
        u_scr[:, :] = u0_ref[:, :]
        out_ref[:, :] = jnp.zeros_like(out_ref)

    alpha = alpha_ref[0, :]
    u = u_scr[:, :]
    if save_residuals:
        ub_out_ref[:, :] = u
    acc = out_ref[:, :]

    for k in range(tc):
        u = alpha * u + (1.0 - alpha) * wx_ref[k, :, :]
        if save_residuals:
            u_out_ref[k, :, :] = u
        p = _softmax_lastdim(u)
        if k >= tail_len:
            # forward tail: out-of-bounds steps must not accumulate
            p = jnp.where(kc != n_chunks - 1, p, 0.0)
        acc = acc + p

    u_scr[:, :] = u
    out_ref[:, :] = acc


def _readout_bwd_kernel(
    u_ref, ub_ref, gout_ref, alpha_ref,
    dwx_ref, dalpha_ref, du0_ref,
    G_scr,
    *, tc, T,
):
    kc = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    first = kc == 0
    last = kc == n_chunks - 1
    n_chunks_static = (T + tc - 1) // tc
    tail_len = T - (n_chunks_static - 1) * tc

    @pl.when(first)
    def _init():
        G_scr[:, :] = jnp.zeros_like(G_scr)

    @pl.when(first & (pl.program_id(0) == 0))
    def _init_acc():
        dalpha_ref[:, :] = jnp.zeros_like(dalpha_ref)

    alpha = alpha_ref[0, :]
    one_m_alpha = 1.0 - alpha
    gout = gout_ref[:, :]
    G = G_scr[:, :]
    dal = jnp.zeros_like(dalpha_ref)

    for k in range(tc - 1, -1, -1):
        u_t = u_ref[k, :, :]
        u_p = u_ref[k - 1, :, :] if k > 0 else ub_ref[:, :]
        g_eff = gout
        if k >= tail_len:
            live = kc != 0
            g_eff = jnp.where(live, g_eff, 0.0)
            u_t = jnp.where(live, u_t, 0.0)
            u_p = jnp.where(live, u_p, 0.0)
        p = _softmax_lastdim(u_t)
        jac = p * (g_eff - jnp.sum(p * g_eff, axis=-1, keepdims=True))
        G = jac + alpha * G
        dwx_ref[k, :, :] = one_m_alpha * G
        # u_p - wx_t == (u_p - u_t)/(1-alpha); divide hoisted out of loop
        dal = dal + jnp.sum(G * (u_p - u_t), axis=0, keepdims=True)

    G_scr[:, :] = G
    dalpha_ref[:, :] += dal / one_m_alpha

    @pl.when(last)
    def _du0():
        du0_ref[:, :] = alpha * G_scr[:, :]


def _readout_forward(Wx, alpha, u0, *, save_residuals):
    B, T, H = Wx.shape
    dtype = jnp.float32
    Hp = _round_up(H, _LANE)
    Bp = _round_up(B, _SUBLANE)
    tc = _pick_tc(T, Hp)
    bt = _tile_plan(Bp, Hp, streams=2, tc=tc)
    n_chunks = (T + tc - 1) // tc

    Wx_p = jnp.swapaxes(
        jnp.pad(
            Wx.astype(dtype), ((0, Bp - B), (0, 0), (0, Hp - H)),
            constant_values=-1e9,  # padded class lanes never win the softmax
        ),
        0, 1,
    )
    alpha_p = jnp.pad(alpha.astype(dtype), (0, Hp - H))[None, :]
    u0_p = jnp.pad(
        u0.astype(dtype), ((0, Bp - B), (0, Hp - H)), constant_values=-1e9
    )

    grid = (Bp // bt, n_chunks)
    kernel = functools.partial(
        _readout_fwd_kernel, tc=tc, T=T, save_residuals=save_residuals
    )
    bh = lambda i, t: (i, 0)  # noqa: E731
    tbh = lambda i, t: (t, i, 0)  # noqa: E731
    bnd_map = lambda i, t: (i, t)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hp), tbh, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hp), bnd_map, memory_space=pltpu.VMEM)

    if save_residuals:
        out_specs = (state_spec, tm_spec, bnd_spec)
        out_shape = (
            jax.ShapeDtypeStruct((Bp, Hp), dtype),
            jax.ShapeDtypeStruct((T, Bp, Hp), dtype),
            jax.ShapeDtypeStruct((Bp, n_chunks * Hp), dtype),
        )
    else:
        out_specs = (state_spec,)
        out_shape = (jax.ShapeDtypeStruct((Bp, Hp), dtype),)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tm_spec, vec_spec, state_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, Hp), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(_scoped_limit(Hp)),
    )(Wx_p, alpha_p, u0_p)

    if not save_residuals:
        return outs[0][:B, :H]
    out, u_seq, ub = outs
    return out[:B, :H], (u_seq, ub)


def _readout_backward(g, residuals, alpha, T):
    u_seq, ub = residuals
    _, Bp, Hp = u_seq.shape  # residuals are time-major (T, Bp, Hp)
    B, H = g.shape
    dtype = jnp.float32
    tc = _pick_tc(T, Hp)
    bt = _tile_plan(Bp, Hp, streams=2, tc=tc)
    n_chunks = (T + tc - 1) // tc

    g_p = jnp.pad(g.astype(dtype), ((0, Bp - B), (0, Hp - H)))
    alpha_p = jnp.pad(alpha.astype(dtype), (0, Hp - H))[None, :]

    grid = (Bp // bt, n_chunks)
    kernel = functools.partial(_readout_bwd_kernel, tc=tc, T=T)
    rev_tm = lambda i, t: (n_chunks - 1 - t, i, 0)  # noqa: E731
    rev_bnd = lambda i, t: (i, n_chunks - 1 - t)  # noqa: E731
    bh = lambda i, t: (i, 0)  # noqa: E731
    rep2 = lambda i, t: (0, 0)  # noqa: E731
    tm_spec = pl.BlockSpec((tc, bt, Hp), rev_tm, memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, Hp), rep2, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, Hp), bh, memory_space=pltpu.VMEM)
    bnd_spec = pl.BlockSpec((bt, Hp), rev_bnd, memory_space=pltpu.VMEM)

    dWx, dalpha, du0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tm_spec, bnd_spec, state_spec, vec_spec],
        out_specs=(tm_spec, vec_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((1, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bt, Hp), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(_scoped_limit(Hp)),
    )(u_seq, ub, g_p, alpha_p)

    return jnp.swapaxes(dWx[:, :B, :H], 0, 1), dalpha[0, :H], du0[:B, :H]


@functools.lru_cache(maxsize=None)
def _make_readout_op():
    @jax.custom_vjp
    def op(Wx, alpha, u0):
        alpha_c = jnp.clip(alpha, *cells.ALPHA_LIM)
        return _readout_forward(Wx, alpha_c, u0, save_residuals=False)

    def fwd(Wx, alpha, u0):
        alpha_c = jnp.clip(alpha, *cells.ALPHA_LIM)
        out, residuals = _readout_forward(
            Wx, alpha_c, u0, save_residuals=True
        )
        return out, (alpha, residuals, Wx.shape[1])

    def bwd(res, g):
        alpha, residuals, T = res
        alpha_c, alpha_vjp = jax.vjp(
            lambda p: jnp.clip(p, *cells.ALPHA_LIM), alpha
        )
        dWx, dalpha_c, du0 = _readout_backward(g, residuals, alpha_c, T)
        (dalpha,) = alpha_vjp(dalpha_c)
        return (dWx, dalpha, du0)

    op.defvjp(fwd, bwd)
    return op


def readout_pallas(Wx, alpha, u0):
    """Fused cumulative-softmax readout (drop-in for cells.readout_sum)."""
    return _make_readout_op()(Wx, alpha, u0)
