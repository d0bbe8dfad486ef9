#!/usr/bin/env python
"""Measure what ``--remat`` actually buys: compiled peak-temp memory of
the full training step with and without layer rematerialisation.

``jax.checkpoint`` over the hidden layers drops their residual streams
(Wx projections, membranes, gate activations — several (B,T,H) f32
buffers per layer) from the forward->backward live set and recomputes
them per-layer in the backward. XLA's ``memory_analysis()`` exposes the
compiled executable's temp-buffer peak, so the saving can be read out
exactly without running a step.

CAVEAT — the backend's scheduler decides whether checkpointing pays:
each recomputed layer-forward depends only on that layer's input, which
exists from early in the program, so a scheduler that is not
memory-aware is free to hoist every recompute right back next to the
original forward — re-inflating the live set to the un-rematted one.
Measured on XLA **CPU** that is exactly what happens: remat temp peak
is ~1.1-1.2x the base at every (layers, H, T) tried, and a minimal
4-layer scan micro-model shows base 29.52 MB vs checkpointed 29.56 MB
(prevent_cse on or off). XLA **TPU** runs a memory-aware scheduler +
rematerialisation pass, which is the component this flag exists for —
only the on-TPU reading of this tool is meaningful for the HBM claim
(tunnel-return checklist, docs/ROUND4_PLAN.md).

Usage:
  python tools/measure_remat.py [--platform cpu] [--model RadLIF]
      [--layers 3] [--hidden 512] [--time 1000] [--batch 128] [--json F]

Defaults sketch the long-sequence regime remat targets (T=1000 is 10x
the SHD benchmark length — e.g. raw-audio-rate rasters).
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu when the "
                    "tunnel is down); default = environment's")
    ap.add_argument("--model", default="RadLIF")
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--time", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--feats", type=int, default=700)
    ap.add_argument("--classes", type=int, default=20)
    ap.add_argument("--cell_impl", default="scan",
                    help="scan compiles everywhere; pallas only on TPU")
    ap.add_argument("--json", default=None, help="append one JSON line")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from sparch_tpu.models import build_model
    from sparch_tpu.train.state import create_train_state
    from sparch_tpu.train.steps import make_train_step

    B, T, F, H, C = (args.batch, args.time, args.feats, args.hidden,
                     args.classes)
    x = np.zeros((B, T, F), np.float32)
    y = np.zeros((B,), np.int64)
    rng = jax.random.PRNGKey(0)

    def peak(remat):
        model = build_model(
            args.model, (B, T, F),
            [H] * args.layers + [C],
            dropout=0.1, normalization="batchnorm", state_init="uniform",
            cell_impl=args.cell_impl, remat=remat,
        )
        state = create_train_state(model, x, lr=1e-2, rng=rng)
        # donate=False: donated input buffers distort the temp account
        step = make_train_step(model, use_regularizers=True, donate=False)
        mem = jax.jit(step).lower(state, x, y).compile().memory_analysis()
        return {
            "temp_bytes": int(mem.temp_size_in_bytes),
            "argument_bytes": int(mem.argument_size_in_bytes),
            "output_bytes": int(mem.output_size_in_bytes),
        }

    base = peak(False)
    rem = peak(True)
    rec = {
        "model": args.model, "layers": args.layers, "hidden": args.hidden,
        "time": args.time, "batch": args.batch,
        "platform": jax.devices()[0].platform,
        "cell_impl": args.cell_impl,
        "base": base, "remat": rem,
        "temp_ratio": rem["temp_bytes"] / max(base["temp_bytes"], 1),
    }
    mb = 1 / (1024 * 1024)
    print(
        f"{args.model} {args.layers}x{args.hidden} T={args.time} "
        f"B={args.batch} [{rec['platform']}/{args.cell_impl}]\n"
        f"  temp peak: base {base['temp_bytes'] * mb:8.1f} MB -> "
        f"remat {rem['temp_bytes'] * mb:8.1f} MB "
        f"(x{rec['temp_ratio']:.3f})"
    )
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return rec


if __name__ == "__main__":
    main()
