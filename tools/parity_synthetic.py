#!/usr/bin/env python
"""At-scale synthetic training parity vs the PyTorch reference.

The real-data accuracy criterion (BASELINE.md: |Δacc| <= 0.5% on
SHD/SSC) is blocked in this environment (no datasets, no egress) —
`tools/parity_run.py` covers it the moment data exists. This tool is the
strongest available substitute at REAL problem scale: it trains the
reference SNN (imported read-only from /root/reference) and this
framework's model on the SAME synthetic SHD-schema dataset at SHD
dimensions — F=700 units, T=100 bins, hidden 128x2, C=20 classes,
thousands of utterances, the reference's default 5 epochs / Adam 1e-2 —
and compares mean test accuracy over seeds. The reference runs on the
host CPU through its own torch code; our side runs its NORMAL training
path (on the TPU with the fused kernels when available).

The task is noised (a fraction of events land on random units) so
accuracies sit mid-range, where the comparison is informative.
Dropout is 0 (RNG streams can't be aligned across frameworks) and
state_init is zeros on both sides (the reference's torch.rand states
are monkeypatched to zeros, exactly as tests/test_training_parity.py
does at small scale — see that module for the regime rationale).

Usage:
  python tools/parity_synthetic.py [--seeds 0,1] [--neurons LIF,RadLIF]
      [--n_train 2048] [--epochs 5] [--norm layernorm] [--json OUT]

One JSON line per (neuron, seed) pair + a summary line per neuron.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

B, T, F, C = 16, 100, 700, 20
H_SIZES = [128, 128, C]  # reference default: 3 layers, last = readout


def _batches(folder, split, shuffle, seed=0):
    from sparch_tpu.data.spiking import load_shd_or_ssc

    return load_shd_or_ssc(
        "shd", folder, split, batch_size=B, shuffle=shuffle, seed=seed
    )


ANN_TYPES = ("MLP", "RNN", "LiGRU", "GRU")


def train_reference(folder, neuron_type, norm, seed, epochs):
    import torch

    orig_rand = torch.rand
    # SNN initial states are torch.rand draws (zeroed to match our
    # state_init='zeros'); the reference ANN layers already start from
    # zeros (anns.py:331), so the patch is a no-op there
    torch.rand = lambda *s, **k: torch.zeros(*s, **k)
    try:
        torch.manual_seed(seed)
        if neuron_type in ANN_TYPES:
            from sparch.models.anns import ANN as RefANN

            net = RefANN(
                input_shape=(B, T, F),
                layer_sizes=list(H_SIZES),
                ann_type=neuron_type,
                dropout=0.0,
                normalization=norm,
                use_readout_layer=True,
            )
        else:
            from sparch.models.snns import SNN as RefSNN

            net = RefSNN(
                input_shape=(B, T, F),
                layer_sizes=list(H_SIZES),
                neuron_type=neuron_type,
                dropout=0.0,
                normalization=norm,
                use_readout_layer=True,
            )
        opt = torch.optim.Adam(net.parameters(), 1e-2)
        loss_fn = torch.nn.CrossEntropyLoss()
        for e in range(epochs):
            net.train()
            for x, _, y in _batches(folder, "train", True, seed=e):
                xb = torch.from_numpy(np.asarray(x))
                yb = torch.from_numpy(np.asarray(y))
                out, _ = net(xb)
                loss = loss_fn(out, yb)
                opt.zero_grad()
                loss.backward()
                opt.step()
        net.eval()
        accs = []
        with torch.no_grad():
            for x, _, y in _batches(folder, "test", False):
                out, _ = net(torch.from_numpy(np.asarray(x)))
                accs.append(
                    (out.argmax(1).numpy() == np.asarray(y)).mean()
                )
        return float(np.mean(accs))
    finally:
        torch.rand = orig_rand


def train_ours(folder, neuron_type, norm, seed, epochs):
    import jax

    from sparch_tpu.models import build_model
    from sparch_tpu.train.state import create_train_state
    from sparch_tpu.train.steps import make_eval_step, make_train_step

    model = build_model(
        neuron_type, (B, T, F), list(H_SIZES), dropout=0.0,
        normalization=norm, state_init="zeros",
    )
    sample = np.zeros((2, 8, F), np.float32)
    state = create_train_state(
        model, sample, lr=1e-2, rng=jax.random.PRNGKey(seed)
    )
    train_step = make_train_step(model, donate=False)
    eval_step = make_eval_step(model)
    for e in range(epochs):
        for x, _, y in _batches(folder, "train", True, seed=e):
            state, _ = train_step(state, x, y)
    accs = []
    for x, _, y in _batches(folder, "test", False):
        m = eval_step(state, x, y, jax.random.PRNGKey(0))
        accs.append(float(m["acc"]))
    return float(np.mean(accs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--neurons", default="LIF,RadLIF")
    ap.add_argument("--n_train", type=int, default=2048)
    ap.add_argument("--n_test", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--norm", default="layernorm")
    ap.add_argument("--noise_frac", type=float, default=0.45)
    ap.add_argument("--json", default="")
    ap.add_argument(
        "--platform", default="",
        help="force a JAX platform for our side (e.g. 'cpu' when the "
        "TPU tunnel is down — the dynamics comparison is about training "
        "semantics, and kernel==scan equivalence is pinned separately "
        "by tools/check_kernels.py)",
    )
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    seeds = [int(s) for s in args.seeds.split(",")]
    neurons = args.neurons.split(",")

    from fixtures import make_shd_h5

    if not args.platform:
        # remote-TPU compiles only: the shared cache dir holds AOT
        # entries from OTHER machines/feature sets, and XLA:CPU loads
        # them with a "could lead to execution errors such as SIGILL"
        # warning (results were verified identical with and without,
        # but running on someone else's machine features is not a risk
        # a measurement tool should take)
        from sparch_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()

    folder = tempfile.mkdtemp(prefix="parity_syn_")
    make_shd_h5(
        f"{folder}/shd_train.h5", n=args.n_train, nb_classes=C, seed=0,
        noise_frac=args.noise_frac, n_events_range=(30, 90),
    )
    make_shd_h5(
        f"{folder}/shd_test.h5", n=args.n_test, nb_classes=C, seed=1,
        noise_frac=args.noise_frac, n_events_range=(30, 90),
    )

    rows = []
    for neuron in neurons:
        refs, ours = [], []
        for seed in seeds:
            t0 = time.time()
            a_ref = train_reference(
                folder, neuron, args.norm, seed, args.epochs
            )
            t1 = time.time()
            a_our = train_ours(folder, neuron, args.norm, seed, args.epochs)
            t2 = time.time()
            row = {
                "neuron": neuron, "seed": seed, "ref_acc": round(a_ref, 4),
                "our_acc": round(a_our, 4),
                "ref_s": round(t1 - t0, 1), "our_s": round(t2 - t1, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            refs.append(a_ref)
            ours.append(a_our)
        summary = {
            "neuron": neuron, "summary": True,
            "ref_mean": round(float(np.mean(refs)), 4),
            "our_mean": round(float(np.mean(ours)), 4),
            "delta": round(float(np.mean(ours) - np.mean(refs)), 4),
            "seeds": seeds, "n_train": args.n_train,
            "epochs": args.epochs, "norm": args.norm,
            "layer_sizes": H_SIZES,
        }
        rows.append(summary)
        print(json.dumps(summary), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
