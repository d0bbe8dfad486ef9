#!/usr/bin/env python
"""Random-shape fuzz over the fused Pallas kernels vs the scan cells.

`tools/check_kernels.py` pins a curated 33-case matrix (incl. prime-T
tails and 17-tile batches); this tool samples the SHAPE SPACE instead —
B/T/H drawn from ranges that include 1, odd values, primes, and
non-lane-aligned widths — because the classic Pallas failure mode is a
tail/padding bug at a shape nobody enumerated (the kernels pad B to the
sublane tile, H to 128 lanes, and read T's tail chunk out of bounds by
design; every (B % 8, H % 128, T % tc) residue class is a distinct
sanitisation path). Each sampled shape runs one kernel family with
randomly drawn toggles (affine fold, bf16 MXU mode, fused dropout) and
asserts the same forward/gradient agreement as check_kernels.

Deterministic per --seed: case k re-runs bit-identically (shape draw and
data draw both key on (seed, k)), so a failure line is a repro recipe on
its own. Run it on CPU (interpret mode) when the TPU tunnel is down —
shape/tail logic is platform-independent — and on the real chip for the
compiled Mosaic paths:

    python tools/fuzz_kernels.py --cases 60 --seed 0 [--platform cpu]
        [--json docs/fuzz_kernels.json] [--only gru]

Exit status is non-zero if any case fails.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

FAMILIES = (
    "lif", "adlif", "rlif", "radlif",      # spiking cells
    "lif/drop", "radlif/drop",             # fused-dropout paths
    "readout",
    "rnn", "ligru", "gru",                 # ANN cells
    "ligru/drop", "gru/drop",
)

# Values that historically hide tail bugs get extra probability mass.
_EDGE_B = (1, 2, 3, 7, 8, 9, 17, 31)
_EDGE_T = (1, 2, 3, 5, 13, 29, 37)       # primes force a live tail chunk
_EDGE_H = (1, 2, 7, 16, 33, 127, 128, 129, 130)


def _draw_shape(rng):
    B = int(rng.choice(_EDGE_B)) if rng.random() < 0.5 else int(
        rng.integers(1, 49))
    T = int(rng.choice(_EDGE_T)) if rng.random() < 0.5 else int(
        rng.integers(1, 41))
    H = int(rng.choice(_EDGE_H)) if rng.random() < 0.5 else int(
        rng.integers(1, 161))
    return B, T, H


def draw_case(ck, k, seed):
    """Draw fuzz case k; returns (name, thunk, bf16) without running it."""
    rng = np.random.default_rng((seed << 20) ^ k)
    fam = FAMILIES[int(rng.integers(0, len(FAMILIES)))]
    B, T, H = _draw_shape(rng)
    name = f"{fam}@B{B}T{T}H{H}"

    base, _, sub = fam.partition("/")
    toggles = {}
    if sub == "drop":
        # the curated cases' empirical keep-fraction check (+-0.02/0.03
        # absolute) needs enough mask elements that binomial noise can't
        # trip it: sd = sqrt(p(1-p)/N) <= 0.006 at N >= 8192 (~4 sigma)
        while B * T * H < 8192:
            B2, T2, H2 = _draw_shape(rng)
            B, T, H = max(B, B2), max(T, T2), max(H, H2)
        name = f"{fam}@B{B}T{T}H{H}"
        p = float(rng.uniform(0.1, 0.6))
        name += f"p{p:.2f}"
        if base in ("lif", "adlif", "rlif", "radlif"):
            thunk = lambda: ck.spiking_dropout_case(  # noqa: E731
                base, B=B, T=T, H=H, p=p)
        else:
            thunk = lambda: ck.ann_case(  # noqa: E731
                base, B=B, T=T, H=H, drop=p, p_seed=k + 1)
        bf16 = False
    elif base == "readout":
        thunk = lambda: ck.readout_case(B=B, T=T, H=H)  # noqa: E731
        bf16 = False
    else:
        toggles["affine"] = bool(rng.random() < 0.5)
        toggles["bf16"] = bool(rng.random() < 0.3)
        bf16 = toggles["bf16"]
        if toggles["affine"]:
            name += "+aff"
        if bf16:
            name += "+bf16"
        if base in ("rnn", "ligru", "gru"):
            thunk = lambda: ck.ann_case(base, B=B, T=T, H=H, **toggles)  # noqa: E731
        else:
            thunk = lambda: ck.spiking_case(base, B=B, T=T, H=H, **toggles)  # noqa: E731

    return name, thunk, bf16


def run_case(jax, thunk, bf16):
    try:
        if bf16:
            # Mosaic rejects a HIGHEST attr on the kernels' bf16 dots;
            # the scan oracle still runs at highest (inner contexts)
            return thunk()
        with jax.default_matmul_precision("highest"):
            return thunk()
    except Exception as e:  # noqa: BLE001 — report, keep fuzzing
        return {}, [f"EXCEPTION: {type(e).__name__}: {e}"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only", default="", help="substring filter (family)")
    ap.add_argument("--json", default="", help="write results to this file")
    ap.add_argument("--platform", default="",
                    help="force a JAX platform (e.g. 'cpu')")
    args = ap.parse_args()

    import jax  # noqa: E402 — after the platform decision below

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        from sparch_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()

    # reuse the curated harness's case functions (tools/ is not a package)
    import importlib.util

    _ck_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "check_kernels.py")
    _spec = importlib.util.spec_from_file_location("check_kernels", _ck_path)
    ck = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(ck)

    backend = jax.default_backend()
    print(f"backend: {backend} "
          f"({'COMPILED Mosaic' if backend == 'tpu' else 'interpret mode'})",
          flush=True)

    results, n_fail, k, ran = [], 0, 0, 0
    while ran < args.cases:
        name, thunk, bf16 = draw_case(ck, k, args.seed)
        k += 1
        if args.only and args.only not in name:
            continue
        m, fails = run_case(jax, thunk, bf16)
        ran += 1
        status = "PASS" if not fails else "FAIL"
        n_fail += bool(fails)
        print(f"{status}  #{k - 1:<4d} {name:<28} "
              f"worst_grad={m.get('worst_grad', float('nan')):.3e}"
              + (f"  [{'; '.join(fails)}]" if fails else ""), flush=True)
        results.append({"k": k - 1, "case": name, "status": status,
                        **{kk: vv for kk, vv in m.items()}, "fails": fails})
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": backend, "seed": args.seed,
                       "results": results}, f, indent=1)
    print(f"{ran} cases, {n_fail} failed", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
