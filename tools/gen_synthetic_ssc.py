#!/usr/bin/env python
"""Generate an SSC-shaped synthetic dataset on disk for the end-to-end
on-chip training record (docs/STATUS.md "End-to-end on-chip").

Writes ``ssc_{train,valid,test}.h5`` in the exact Heidelberg HDF5 schema
the real loader reads (ragged spikes/times + spikes/units + labels —
reference spiking_datasets.py:57-61), at real-SSC shape: 700 units,
35 classes, ~1.0 s utterances with O(1e3) events each. The task is
class-coded unit blocks + ``--noise_frac`` uniform-noise events, so the
loss trajectory is meaningfully learnable without being trivial.

This exists because the environment has no datasets and no egress
(BASELINE criterion "real SSC parity" stays env-blocked); it exercises
every real pipeline stage — HDF5 ragged reads, C++ binning, worker
processes, host->device streams — at real scale and cadence.

Usage: python tools/gen_synthetic_ssc.py --out /tmp/ssc_synth \
           [--n_train 10000 --n_valid 2000 --n_test 2000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.fixtures import make_shd_h5  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=10000)
    ap.add_argument("--n_valid", type=int, default=2000)
    ap.add_argument("--n_test", type=int, default=2000)
    ap.add_argument("--nb_classes", type=int, default=35)
    ap.add_argument("--noise_frac", type=float, default=0.5)
    ap.add_argument("--events", type=int, nargs=2, default=(800, 3000),
                    help="min/max events per utterance")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for split, n, seed in (
        ("train", args.n_train, args.seed),
        ("valid", args.n_valid, args.seed + 1),
        ("test", args.n_test, args.seed + 2),
    ):
        path = os.path.join(args.out, f"ssc_{split}.h5")
        t0 = time.perf_counter()
        make_shd_h5(
            path,
            n=n,
            nb_classes=args.nb_classes,
            nb_units=700,
            max_time=1.0,
            seed=seed,
            noise_frac=args.noise_frac,
            n_events_range=tuple(args.events),
        )
        dt = time.perf_counter() - t0
        mb = os.path.getsize(path) / 1e6
        print(f"{path}: n={n} ({mb:.0f} MB, {dt:.1f} s)")


if __name__ == "__main__":
    main()
