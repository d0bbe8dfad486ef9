#!/usr/bin/env python
"""Lockstep training-trajectory parity vs the PyTorch reference.

The strongest training-semantics check available without real datasets:
build the reference net (torch init), transplant its EXACT initial
weights into our model, train BOTH on the identical synthetic batch
sequence (same loader, same order), and compare the per-batch CE loss
step by step. With per-step math pinned (tests/test_reference_parity),
the curves must be bit-identical for the first steps and bounded by
float-noise growth for tens of steps; any abrupt early split is a
train-mode semantics bug (wrong norm mode, loss, optimizer, ...).

Chaotic divergence after ~25-40 steps is EXPECTED (sensitive
dependence: fp noise ~1e-7/step compounds through recurrent dynamics
and Adam); the tool therefore judges only the early window.

Observed on the SHD-scale GRU/layernorm config (round 3): losses
bit-identical (d=0.0) for ~10 steps, |d| < 1e-3 through ~25 steps,
trajectory separation after ~40 — while the same config's final
accuracy at cliff-edge noise (0.75) is bimodal on BOTH sides (the
torch reference itself collapses to chance on some seeds, e.g. seed 4).
Mean-accuracy comparisons near a learnability cliff measure basin
luck, not parity; this tool measures the dynamics themselves.

Usage:
  python tools/parity_lockstep.py [--model GRU] [--norm layernorm]
      [--steps 48] [--seed 1] [--scale shd|small] [--noise_frac 0.75]
      [--json OUT] [--platform cpu]

Reference oracle: /root/reference (read-only import), models
anns.py / snns.py; optimizer exp.py:89 (Adam 1e-2).
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

ANN_TYPES = ("MLP", "RNN", "LiGRU", "GRU")
SCALES = {
    # (B, T, F, C, hidden sizes, n_train) — T and F are pinned by the
    # SHD-schema loader (700 units, 100 bins); only width/depth shrink
    "shd": (16, 100, 700, 20, [128, 128], 2048),
    "small": (8, 100, 700, 4, [24, 24], 64),
}


def transplanted_pair(model_type, norm, seed, shape, layer_sizes):
    """(ref_net, our_model, our_variables) with identical initial weights.

    The mapped leaves can share memory with the live torch tensors
    (jnp.asarray zero-copies aligned contiguous CPU arrays), and the
    torch optimizer updates in place — deep-copy before training.
    """
    import jax
    import torch
    from test_reference_parity import (
        _ann_params_from_ref,
        _snn_params_from_ref,
    )

    from sparch_tpu.models import build_model

    B, T, F = shape
    sizes = list(layer_sizes)
    torch.manual_seed(seed)
    if model_type in ANN_TYPES:
        from sparch.models.anns import ANN as RefANN

        ref = RefANN(
            input_shape=(B, T, F), layer_sizes=sizes,
            ann_type=model_type, dropout=0.0, normalization=norm,
            use_readout_layer=True,
        )
        variables = _ann_params_from_ref(ref, model_type, norm, False)
    else:
        from sparch.models.snns import SNN as RefSNN

        ref = RefSNN(
            input_shape=(B, T, F), layer_sizes=sizes,
            neuron_type=model_type, dropout=0.0, normalization=norm,
            use_readout_layer=True,
        )
        variables = _snn_params_from_ref(ref, model_type, norm, False)
    variables = jax.tree.map(lambda a: np.array(a, copy=True), variables)
    model = build_model(
        model_type, (B, T, F), sizes, dropout=0.0, normalization=norm,
        state_init="zeros",
    )
    return ref, model, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="GRU")
    ap.add_argument("--norm", default="layernorm")
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--scale", default="shd", choices=sorted(SCALES))
    ap.add_argument("--noise_frac", type=float, default=0.75)
    ap.add_argument("--json", default="")
    ap.add_argument("--platform", default="cpu",
                    help="JAX platform for our side (default cpu: the "
                    "comparison is about semantics; '' = environment "
                    "default)")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import torch
    from fixtures import make_shd_h5

    from sparch_tpu.data.spiking import load_shd_or_ssc
    from sparch_tpu.train.state import create_train_state
    from sparch_tpu.train.steps import make_train_step

    B, T, F, C, hidden, n_train = SCALES[args.scale]
    sizes = hidden + [C]

    # reference SNN forwards draw torch.rand initial states every call;
    # zero them to match state_init='zeros' (no-op for ANNs, anns.py:331)
    orig_rand = torch.rand
    torch.rand = lambda *s, **k: torch.zeros(*s, **k)
    try:
        ref, model, variables = transplanted_pair(
            args.model, args.norm, args.seed, (B, T, F), sizes
        )

        folder = tempfile.mkdtemp(prefix="lockstep_")
        make_shd_h5(
            f"{folder}/shd_train.h5", n=n_train, nb_classes=C, seed=0,
            noise_frac=args.noise_frac, n_events_range=(30, 90),
        )
        batches = []
        while len(batches) < args.steps:
            epoch = len(batches) // max(1, n_train // B)
            for x, _, y in load_shd_or_ssc(
                "shd", folder, "train", batch_size=B, shuffle=True,
                seed=epoch,
            ):
                batches.append((np.asarray(x), np.asarray(y)))
                if len(batches) >= args.steps:
                    break

        # --- reference trajectory
        opt = torch.optim.Adam(ref.parameters(), 1e-2)
        loss_fn = torch.nn.CrossEntropyLoss()
        ref.train()
        ref_losses = []
        for x, y in batches:
            out, _ = ref(torch.from_numpy(x))
            loss = loss_fn(out, torch.from_numpy(y))
            opt.zero_grad()
            loss.backward()
            opt.step()
            ref_losses.append(float(loss.detach()))

        # --- our trajectory from the same weights
        state = create_train_state(
            model, np.zeros((2, 8, F), np.float32), lr=1e-2,
            rng=jax.random.PRNGKey(0),
        )
        if "batch_stats" in variables:
            state = state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
            )
        else:
            state = state.replace(params=variables["params"])
        train_step = make_train_step(model, donate=False)
        our_losses = []
        for x, y in batches:
            state, m = train_step(state, x, y)
            our_losses.append(float(m["loss"]))
    finally:
        torch.rand = orig_rand

    ds = [abs(a - b) for a, b in zip(ref_losses, our_losses)]
    rows = [
        {"step": i, "ref": round(ref_losses[i], 6),
         "ours": round(our_losses[i], 6), "absdiff": float(f"{ds[i]:.3e}")}
        for i in range(len(ds))
    ]
    head = {
        "model": args.model, "norm": args.norm, "scale": args.scale,
        "seed": args.seed, "steps": args.steps,
        "noise_frac": args.noise_frac,
        "max_absdiff_first5": max(ds[:5]),
        "max_absdiff_first20": max(ds[:20]) if len(ds) >= 20 else None,
        "max_absdiff_all": max(ds),
    }
    print(json.dumps(head), flush=True)
    for r in rows:
        print(json.dumps(r), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"summary": head, "steps": rows}, f, indent=1)
    # Early-window verdict — judged for the ANN types only. The spiking
    # models' dynamics are DISCONTINUOUS: a 1-ulp difference in u (torch
    # and XLA reduce matmuls in different orders) flips a spike at some
    # (t, neuron) and cascades macroscopically within the first batch,
    # so a per-step loss comparison is structurally loose there; their
    # trajectory-level parity is covered by tests/test_training_parity
    # (mean-accuracy band) + exact per-step grad parity
    # (tests/test_reference_parity). Thresholds are from the observed
    # fp-noise envelope; chaos beyond the window is expected, not judged.
    if args.model not in ANN_TYPES:
        print("LOCKSTEP INFO (spiking model: not pass/fail judged; "
              "see docstring)", flush=True)
        return 0
    ok = head["max_absdiff_first5"] <= 1e-4 and (
        head["max_absdiff_first20"] is None
        or head["max_absdiff_first20"] <= 0.05
    )
    print("LOCKSTEP", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
