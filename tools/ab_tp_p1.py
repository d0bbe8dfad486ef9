#!/usr/bin/env python
"""A/B the P=1 tensor-parallel fused kernels against the plain fused
kernels on ONE chip — the only TP perf number this environment can
produce (no multi-chip TPU exists here).

At num_devices=1 the TP kernels' remote DMAs degenerate to self-copies
and the barrier to a no-op wait, so (tp1_ms - pallas_ms) bounds the
in-kernel collective PLUMBING cost per step: staging stores, DMA
issue/wait, semaphore traffic, and the extra gather-slot VMEM tenancy.
If the P=1 overhead is small, the P>=2 crossover against scan-GSPMD is
governed by the real ICI exchange (~(bt x H) x T x 2 per step) rather
than by kernel mechanics; if it is large, the TP path needs work before
multi-chip hardware ever appears.

Both sides run the SAME surface: raw kernel fwd+bwd with a quadratic
loss (data-dependent adjoints), no affine fold / dropout — the TP
kernels deliberately don't fuse those (ops/pallas_tp.py design note),
and the model applies them outside the kernel on both paths at measured
~zero cost (docs/STATUS.md "Wide layers" fair-A/B note).

Usage: python tools/ab_tp_p1.py [--json FILE] [--only SUBSTR]
Prints one JSON line per config.
"""
import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _configs():
    # (name, family, kind, B, T, H, mxu_bf16)
    return [
        # north-star config's cell (bench.py: RadLIF 3x512 B128 T100)
        ("radlif/512", "snn", "radlif", 128, 100, 512, False),
        ("radlif/512bf16", "snn", "radlif", 128, 100, 512, True),
        # the widest single-chip RadLIF (cap 2048) — where TP would engage
        ("radlif/2048bf16", "snn", "radlif", 128, 100, 2048, True),
        # GRU at its single-chip cap (1024) — the first cell to need TP
        ("gru/1024bf16", "ann", "gru", 128, 100, 1024, True),
        ("ligru/1024bf16", "ann", "ligru", 128, 100, 1024, True),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        from sparch_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from sparch_tpu.ops import pallas_cells, pallas_ann, pallas_tp
    from sparch_tpu.ops import pallas_tp_ann
    from sparch_tpu.utils.timing import time_fn

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("model",))
    results = []
    for name, family, kind, B, T, H, bf16 in _configs():
        if args.only and args.only not in name:
            continue
        rng = np.random.default_rng(11)
        wx = jnp.asarray(rng.uniform(-0.8, 0.8, (B, T, H)), jnp.float32)
        v = jnp.asarray(rng.uniform(-0.15, 0.15, (H, H)), jnp.float32)
        y0 = jnp.asarray(rng.uniform(0, 1, (B, H)), jnp.float32)
        if family == "snn":
            alpha = jnp.asarray(rng.uniform(0.36, 0.96, H), jnp.float32)
            beta = jnp.asarray(rng.uniform(0.96, 0.99, H), jnp.float32)
            a = jnp.asarray(rng.uniform(-1, 1, H), jnp.float32)
            b = jnp.asarray(rng.uniform(0, 2, H), jnp.float32)
            w0 = jnp.zeros((B, H), jnp.float32)

            def single(wx, v):
                return pallas_cells.radlif_pallas(
                    wx, alpha, beta, a, b, v, 1.0, y0, w0, y0,
                    mxu_bf16=bf16,
                )

            def tp1(wx, v):
                return pallas_tp.radlif_tp_sharded(
                    mesh, wx, alpha, beta, a, b, v, 1.0, y0, w0, y0,
                    tp_axis="model", batch_axis=None, mxu_bf16=bf16,
                )
        elif kind == "gru":
            def single(wx, v):
                return pallas_ann.gru_pallas(
                    wx, wx, wx, v, v, v, y0, mxu_bf16=bf16
                )

            def tp1(wx, v):
                return pallas_tp_ann.gru_tp_sharded(
                    mesh, wx, wx, wx, v, v, v, y0,
                    tp_axis="model", batch_axis=None, mxu_bf16=bf16,
                )
        else:  # ligru
            def single(wx, v):
                return pallas_ann.ligru_pallas(
                    wx, wx, v, v, y0, mxu_bf16=bf16
                )

            def tp1(wx, v):
                return pallas_tp_ann.ligru_tp_sharded(
                    mesh, wx, wx, v, v, y0,
                    tp_axis="model", batch_axis=None, mxu_bf16=bf16,
                )

        def fwdbwd(fn):
            def step(wx, v):
                def loss(wx, v):
                    out = fn(wx, v).astype(jnp.float32)
                    return jnp.sum(out * out)

                l, g = jax.value_and_grad(loss, (0, 1))(wx, v)
                return l + g[0].astype(jnp.float32).sum() + \
                    g[1].astype(jnp.float32).sum()
            return step

        try:
            ms_single = time_fn(fwdbwd(single), wx, v, iters=16) * 1e3
            ms_tp1 = time_fn(fwdbwd(tp1), wx, v, iters=16) * 1e3
            rec = {
                "config": name, "B": B, "T": T, "H": H,
                "mxu_bf16": bf16,
                "pallas_ms": round(ms_single, 4),
                "tp1_ms": round(ms_tp1, 4),
                "tp1_overhead": round(ms_tp1 / ms_single - 1.0, 4),
            }
        except Exception as e:  # noqa: BLE001 — report, keep going
            rec = {"config": name, "error": f"{type(e).__name__}: "
                   f"{str(e)[:300]}"}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
