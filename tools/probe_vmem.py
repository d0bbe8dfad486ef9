#!/usr/bin/env python
"""Compile-probe the fused ANN/SNN kernels at a given width and report
either success (with the chosen tile plan) or the Mosaic VMEM-OOM
breakdown (it itemises per-buffer demand — the data `_tile_plan` fixes
must be derived from).

Usage: python tools/probe_vmem.py MODE H [--B 128] [--T 100] [--f32]
       [--fwd_only] [--drop 0.1] [--affine] [--time]
MODE in {rnn, ligru, gru}. The default probe compiles forward AND
backward (the real training footprint); ``--fwd_only`` opts out.
Compile-only (no dispatch), so a probe is cheap even over the tunnel.
Prints one JSON line.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode")
    ap.add_argument("H", type=int)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--f32", action="store_true",
                    help="f32-resident V (default probes the bf16-MXU mode)")
    ap.add_argument("--fwd_only", action="store_true")
    ap.add_argument("--drop", type=float, default=0.0)
    ap.add_argument("--affine", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--time", action="store_true",
                    help="also time fused-vs-scan fwd+bwd (time_fn)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from sparch_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    B, T, H = args.B, args.T, args.H
    mxu_bf16 = not args.f32
    wx = jnp.zeros((B, T, H), jnp.float32)
    v = jnp.zeros((H, H), jnp.float32)
    y0 = jnp.zeros((B, H), jnp.float32)
    aff = dict(
        scales=(jnp.ones((H,)),) * {"rnn": 1, "ligru": 2, "gru": 3}.get(
            args.mode, 1
        ),
        shifts=(jnp.zeros((H,)),) * {"rnn": 1, "ligru": 2, "gru": 3}.get(
            args.mode, 1
        ),
    ) if args.affine else {}
    # the kernels' SMEM seed ref is (2,)-shaped (see check_kernels.py)
    drop = dict(drop_rate=args.drop,
                drop_seed=jnp.array([1, 3], jnp.int32)) \
        if args.drop else {}

    if args.mode in ("rnn", "ligru", "gru"):
        from sparch_tpu.ops import pallas_ann as pa

        fns = {
            "rnn": lambda: pa.rnn_pallas(wx, v, y0, mxu_bf16, **aff, **drop),
            "ligru": lambda: pa.ligru_pallas(
                wx, wx, v, v, y0, mxu_bf16, **aff, **drop
            ),
            "gru": lambda: pa.gru_pallas(
                wx, wx, wx, v, v, v, y0, mxu_bf16, **aff, **drop
            ),
        }
        f = fns[args.mode]

        def loss():
            return jnp.sum(f())

        target = (
            (lambda: loss()) if args.fwd_only
            else (lambda: _grad_of(wx, v, y0, mxu_bf16, aff, drop,
                                   args.mode))
        )
    else:
        print(json.dumps({"error": f"mode {args.mode} not wired"}))
        return 2

    try:
        jax.jit(target).lower().compile()
        from sparch_tpu.ops.pallas_cells import _tile_plan, _round_up, \
            _pick_tc, _LANE, _SUBLANE
        from sparch_tpu.ops.pallas_ann import _plan_vmem, _ANN_VMEM_BUDGET

        Hp = _round_up(H, _LANE)
        Bp = _round_up(B, _SUBLANE)
        tc = _pick_tc(T, Hp)
        sb, mb = _plan_vmem(args.mode, args.affine, mxu_bf16,
                            args.drop > 0)
        bt = _tile_plan(Bp, Hp, tc=tc, stream_bytes=sb, mat_bytes=mb,
                        budget=_ANN_VMEM_BUDGET)
        result = {
            "mode": args.mode, "H": H, "B": B, "T": T,
            "mxu_bf16": mxu_bf16, "ok": True,
            "plan": {"tc": tc, "bt": bt, "Hp": Hp, "Bp": Bp},
        }
        if args.time:
            result["fused_ms"], result["scan_ms"] = _time_pair(
                args.mode, wx, v, y0, mxu_bf16, aff, drop
            )
        print(json.dumps(result))
        return 0
    except Exception as e:
        msg = str(e)
        # the Mosaic VMEM breakdown sits at the END of the compile-helper
        # log; keep both ends and stash the full text for inspection
        with open("/tmp/probe_vmem_error.txt", "w") as f:
            f.write(msg)
        print(json.dumps({
            "mode": args.mode, "H": H, "B": B, "T": T,
            "mxu_bf16": mxu_bf16, "ok": False,
            "error_head": msg[:800], "error_tail": msg[-6000:],
        }))
        return 1


def _time_pair(mode, wx, v, y0, mxu_bf16, aff, drop):
    """fwd+bwd ms/step: fused kernel vs the scan-cell fallback the model
    would use above the cap (quadratic loss for data-dependent adjoints,
    like bench.py's roofline).

    Fairness: the model's above-cap fallback pays the BN affine and the
    dropout OUTSIDE the kernel (`_proj`'s SeqNorm + `_post`'s
    nn.Dropout, models/ann.py), so under --affine/--drop the scan side
    applies the equivalent elementwise ops — otherwise scan_ms
    underestimates the real fallback and biases the cap decision."""
    import jax
    import jax.numpy as jnp

    from sparch_tpu.ops import cells
    from sparch_tpu.ops import pallas_ann as pa
    from sparch_tpu.utils.timing import time_fn

    def fused_loss(wx, v, y0):
        fns = {
            "rnn": lambda: pa.rnn_pallas(wx, v, y0, mxu_bf16, **aff, **drop),
            "ligru": lambda: pa.ligru_pallas(
                wx, wx, v, v, y0, mxu_bf16, **aff, **drop
            ),
            "gru": lambda: pa.gru_pallas(
                wx, wx, wx, v, v, v, y0, mxu_bf16, **aff, **drop
            ),
        }
        out = fns[mode]().astype(jnp.float32)
        return 0.5 * jnp.sum(out * out)

    def scan_loss(wx, v, y0):
        if aff:
            gates = [
                wx * sc + sh
                for sc, sh in zip(aff["scales"], aff["shifts"])
            ]
        else:
            gates = [wx] * {"rnn": 1, "ligru": 2, "gru": 3}[mode]
        fns = {
            "rnn": lambda: cells.rnn_scan(gates[0], v, y0),
            "ligru": lambda: cells.ligru_scan(
                gates[0], gates[1], v, v, y0
            ),
            "gru": lambda: cells.gru_scan(
                gates[0], gates[1], gates[2], v, v, v, y0
            ),
        }
        out = fns[mode]()
        if drop:
            keep = 1.0 - drop["drop_rate"]
            mask = jax.random.bernoulli(
                jax.random.PRNGKey(0), keep, out.shape
            )
            out = jnp.where(mask, out / keep, 0.0)
        return 0.5 * jnp.sum(out * out)

    fused = time_fn(jax.grad(fused_loss, argnums=(0, 1, 2)), wx, v, y0,
                    iters=16, repeats=3)
    scan = time_fn(jax.grad(scan_loss, argnums=(0, 1, 2)), wx, v, y0,
                   iters=16, repeats=3)
    return round(fused * 1e3, 3), round(scan * 1e3, 3)


def _grad_of(wx, v, y0, mxu_bf16, aff, drop, mode):
    import jax
    import jax.numpy as jnp

    from sparch_tpu.ops import pallas_ann as pa

    n_wx = {"rnn": 1, "ligru": 2, "gru": 3}[mode]
    n_v = n_wx

    def loss(wxs, vs, y0):
        fns = {
            "rnn": lambda: pa.rnn_pallas(
                wxs[0], vs[0], y0, mxu_bf16, **aff, **drop
            ),
            "ligru": lambda: pa.ligru_pallas(
                wxs[0], wxs[1], vs[0], vs[1], y0, mxu_bf16, **aff, **drop
            ),
            "gru": lambda: pa.gru_pallas(
                wxs[0], wxs[1], wxs[2], vs[0], vs[1], vs[2], y0,
                mxu_bf16, **aff, **drop
            ),
        }
        return jnp.sum(fns[mode]())

    return jax.grad(loss, argnums=(0, 1, 2))(
        (wx,) * n_wx, (v,) * n_v, y0
    )


if __name__ == "__main__":
    sys.exit(main())
