#!/usr/bin/env python
"""Capture a device trace of a full train step and print the per-op
time budget (aggregated by fusion/kernel name).

Usage: python tools/trace_step.py [outdir] [MODEL] [H] [NB_LAYERS] [bf16]
(defaults: the north-star RadLIF 3x512; e.g. `... /tmp/t adLIF 128 2`
for the small-config floor investigation; a trailing `bf16` arg traces
the `--compute_dtype bfloat16` AMP build instead)
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

B, T, F, C = 128, 100, 700, 35


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparch_trace"
    model_name = sys.argv[2] if len(sys.argv) > 2 else "RadLIF"
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    nb_layers = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    jax.config.update("jax_default_prng_impl", "rbg")
    from sparch_tpu.models import build_model
    from sparch_tpu.train.state import create_train_state
    from sparch_tpu.train.steps import make_train_step

    amp = len(sys.argv) > 5 and sys.argv[5] == "bf16"
    import jax.numpy as jnp

    model = build_model(model_name, (B, T, F),
                        [H] * (nb_layers - 1) + [C], dropout=0.1,
                        normalization="batchnorm", state_init="uniform",
                        compute_dtype=jnp.bfloat16 if amp else None)
    rng = np.random.default_rng(0)
    x = jax.device_put((rng.random((B, T, F)) < 0.02).astype(np.float32))
    y = jax.device_put((np.arange(B) % C).astype(np.int64))
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, donate=False)

    def run_once():
        s2, m = step(state, x, y)
        return float(m["loss"])

    run_once()  # compile
    jax.profiler.start_trace(outdir)
    for _ in range(8):
        run_once()
    jax.profiler.stop_trace()

    traces = sorted(
        glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace file produced", file=sys.stderr)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    # device-track events only: pick the pid whose process name mentions
    # TPU/device; fall back to all complete events with args
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Chip" in n
    }
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        totals[name] += ev.get("dur", 0.0)
        counts[name] += 1
    if not totals:
        print("pids seen:", pid_names)
        return
    grand = sum(totals.values())
    print(f"{'op':70s} {'total us':>10s} {'n':>5s} {'%':>6s}")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:70]:70s} {us:10.1f} {counts[name]:5d} "
              f"{100*us/grand:6.2f}")
    print(f"{'TOTAL':70s} {grand:10.1f}")


if __name__ == "__main__":
    main()
