#!/usr/bin/env python
"""Probe the Mosaic scoped-vmem limit's effect on the plain fused RadLIF
kernel (fwd+bwd) at the north-star config, and compare against the P=1
TP twin. docs/ab_tp_p1_r5.json measured the degenerate-TP kernel FASTER
than the plain kernel (-21% at H=512 f32, -16% bf16); the TP kernels
pass vmem_limit=100M while the plain SNN kernels pin 96M (a Mosaic
scheduling input — pallas_cells._VMEM_LIMIT comment). This isolates
whether the limit explains the gap.

Usage: python tools/probe_vmem_limit.py [--json FILE]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--limits", default="64,96,100,112,128")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--cell", default="radlif",
                    choices=("radlif", "ligru", "gru"),
                    help="radlif probes pallas_cells' limit; ligru/gru "
                    "probe pallas_ann's (its _compiler_params import "
                    "binding is patched instead)")
    ap.add_argument("--H", type=int, default=512)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--iters", type=int, default=64,
                    help="fori iterations per timed loop; small values "
                    "(16) let tunnel-latency noise swamp the differenced "
                    "measurement (observed: impossible ~0 ms readings)")
    args = ap.parse_args()

    from sparch_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from sparch_tpu.ops import pallas_ann, pallas_cells
    from sparch_tpu.utils.timing import time_fn

    B, T, H = args.B, 100, args.H
    rng = np.random.default_rng(11)
    wx = jnp.asarray(rng.uniform(-0.8, 0.8, (B, T, H)), jnp.float32)
    v = jnp.asarray(rng.uniform(-0.15, 0.15, (H, H)), jnp.float32)
    y0 = jnp.asarray(rng.uniform(0, 1, (B, H)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.36, 0.96, H), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.96, 0.99, H), jnp.float32)
    a = jnp.asarray(rng.uniform(-1, 1, H), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 2, H), jnp.float32)
    w0 = jnp.zeros((B, H), jnp.float32)

    def fwdbwd(fn):
        def step(wx, v):
            def loss(wx, v):
                out = fn(wx, v).astype(jnp.float32)
                return jnp.sum(out * out)

            l, g = jax.value_and_grad(loss, (0, 1))(wx, v)
            return l + g[0].astype(jnp.float32).sum() + \
                g[1].astype(jnp.float32).sum()
        return step

    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    limits = [int(x) for x in args.limits.split(",")]
    runs = {mib: [] for mib in limits}
    errors = {}

    def measure(mib):
        # _compiler_params' default arg binds _VMEM_LIMIT at def time;
        # swap the function itself (call sites resolve via module
        # globals) so every kernel in this iteration gets `mib`.
        def _probe_params(limit=None, _mib=mib):
            return pltpu.CompilerParams(
                vmem_limit_bytes=_mib * 1024 * 1024,
                shape_invariant_numerics=False,
            )

        if args.cell == "radlif":
            pallas_cells._compiler_params = _probe_params

            def single(wx, v):
                return pallas_cells.radlif_pallas(
                    wx, alpha, beta, a, b, v, 1.0, y0, w0, y0,
                    mxu_bf16=args.bf16,
                )
        else:
            # pallas_ann bound _compiler_params at import; patch ITS
            # global. _make_ann_op caches per config, but the pallas_call
            # params are read at trace time (inside _ann_forward), and
            # each `single` closure below is a fresh jit entry.
            pallas_ann._compiler_params = _probe_params
            wz = jnp.asarray(
                rng.uniform(-0.8, 0.8, (B, T, H)), jnp.float32)
            vz = jnp.asarray(
                rng.uniform(-0.15, 0.15, (H, H)), jnp.float32)
            if args.cell == "ligru":
                def single(wx, v):
                    return pallas_ann.ligru_pallas(
                        wx, wz, v, vz, y0, mxu_bf16=args.bf16)
            else:
                wr = jnp.asarray(
                    rng.uniform(-0.8, 0.8, (B, T, H)), jnp.float32)
                vr = jnp.asarray(
                    rng.uniform(-0.15, 0.15, (H, H)), jnp.float32)

                def single(wx, v):
                    return pallas_ann.gru_pallas(
                        wx, wz, wr, v, vz, vr, y0, mxu_bf16=args.bf16)

        return round(
            time_fn(fwdbwd(single), wx, v, iters=args.iters) * 1e3, 4)

    # Interleave limits across repeats (A/B/A/B) so slow drift in tunnel
    # latency hits every limit equally instead of biasing one.
    for rep in range(args.repeat):
        for mib in limits:
            if mib in errors:
                continue
            try:
                ms = measure(mib)
                runs[mib].append(ms)
                print(json.dumps({"rep": rep, "vmem_limit_mib": mib,
                                  "ms": ms}), flush=True)
            except Exception as e:  # noqa: BLE001
                errors[mib] = f"{type(e).__name__}: {str(e)[:200]}"
                print(json.dumps({"rep": rep, "vmem_limit_mib": mib,
                                  "error": errors[mib]}), flush=True)

    results = []
    for mib in limits:
        if mib in errors:
            results.append({"vmem_limit_mib": mib, "error": errors[mib]})
        else:
            mss = sorted(runs[mib])
            results.append({"vmem_limit_mib": mib,
                            "ms": mss[len(mss) // 2],  # median
                            "runs": runs[mib]})

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": jax.default_backend(), "cell": args.cell,
                       "B": B, "T": T,
                       "H": H, "bf16": args.bf16, "results": results}, f,
                      indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
