#!/usr/bin/env python
"""One-command executor for the tunnel-return checklist
(docs/ROUND4_PLAN.md — the on-chip backlog that accumulates while the
axon TPU tunnel is down).

Runs, in order, each with its own timeout and a PASS/FAIL/SKIP line:

1. probe        — trivial on-chip op (fail-fast if the tunnel is down;
                  everything else is skipped in that case)
2. check        — tools/check_kernels.py --json docs/check_kernels_r5.json
                  (the on-chip kernel==scan record; covers the bf16-V and
                  rec_dot scan-side changes)
3. bench        — python bench.py (median-of-3 north star, one JSON line)
4. fuzz         — tools/fuzz_kernels.py --cases 20 --seed 1 (compiled-
                  Mosaic shape fuzz; fresh shapes = fresh compiles)

Steps 3-4 only run when --full is given (they cost tens of minutes of
remote compiles); the default probe+check pair is the correctness gate.

Results land in docs/TUNNEL_RETURN.json plus the stdout log. Manual
follow-ups after this passes (ROUND4_PLAN): the AMP north-star re-pin
(rec_dot changed the AMP backward; expected ~0 delta — MXU accumulates
f32 either way) and the wide-H cap experiments (GRU 1280 / LiGRU 2048,
which need a human reading Mosaic OOM breakdowns).
"""
import argparse
import json
import subprocess
import sys
import time


def run(name, cmd, timeout, results):
    print(f"--- {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout
        )
        ok = p.returncode == 0
        tail = (p.stdout + p.stderr).strip().splitlines()[-8:]
        for line in tail:
            print("   ", line)
    except subprocess.TimeoutExpired:
        ok, tail = False, [f"timeout after {timeout}s"]
        print(f"    TIMEOUT after {timeout}s")
    results[name] = {
        "ok": ok,
        "seconds": round(time.time() - t0, 1),
        "tail": tail,
    }
    print(f"--- {name}: {'PASS' if ok else 'FAIL'} "
          f"({results[name]['seconds']}s)", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also run bench + compiled-shape fuzz")
    ap.add_argument("--out", default="docs/TUNNEL_RETURN.json")
    args = ap.parse_args()

    results = {}
    probe = (
        "import jax, jax.numpy as jnp; "
        "print('devices', jax.devices()); "
        "print('compute', float(jnp.sum(jnp.ones((8, 8)) * 2)))"
    )
    if not run("probe", [sys.executable, "-c", probe], 240, results):
        print("tunnel down — skipping the on-chip checklist")
        results["skipped"] = ["check", "bench", "fuzz"]
        json.dump(results, open(args.out, "w"), indent=1)
        return 3

    run("check", [sys.executable, "tools/check_kernels.py",
                  "--json", "docs/check_kernels_r5.json"], 5400, results)
    if args.full:
        run("bench", [sys.executable, "bench.py"], 3600, results)
        run("fuzz", [sys.executable, "tools/fuzz_kernels.py",
                     "--cases", "20", "--seed", "1",
                     "--json", "docs/fuzz_kernels_r3_tpu.json"],
            7200, results)
    json.dump(results, open(args.out, "w"), indent=1)
    print(json.dumps({k: v.get("ok") for k, v in results.items()
                      if isinstance(v, dict)}))
    return 0 if all(
        v["ok"] for v in results.values() if isinstance(v, dict)
    ) else 1


if __name__ == "__main__":
    sys.exit(main())
