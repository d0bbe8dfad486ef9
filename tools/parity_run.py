#!/usr/bin/env python
"""Accuracy-parity harness: train the PyTorch reference and sparch-tpu on
the SAME real dataset with matched configs and compare test accuracies.

The BASELINE target is ±0.5% test accuracy on SHD/SSC (BASELINE.md). This
script is the measurement tool: point it at a real SHD/SSC download and it
trains both frameworks (the reference imported from /root/reference and
driven directly — its exp.py cannot be imported without torchaudio) with
identical architecture, optimizer, schedule, and epoch budget.

Usage:
    python tools/parity_run.py --data_folder /data/shd --dataset shd \
        --model_type LIF --nb_hiddens 128 --nb_layers 3 --epochs 5

Notes:
- The reference's hidden-state init is U[0,1) per forward; ours matches
  with state_init='uniform'. Accuracies are distributions over seeds;
  run >= 3 seeds for a fair comparison.
"""
import argparse
import sys
import time

# order matters: the repo must shadow the reference's own run_exp.py
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", required=True)
    p.add_argument("--dataset", default="shd", choices=["shd", "ssc"])
    p.add_argument("--model_type", default="LIF",
                   choices=["LIF", "adLIF", "RLIF", "RadLIF"])
    p.add_argument("--nb_hiddens", type=int, default=128)
    p.add_argument("--nb_layers", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--normalization", default="batchnorm")
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_reference", action="store_true")
    return p.parse_args()


def loaders(args, seed):
    from sparch_tpu.data.spiking import load_shd_or_ssc

    kw = dict(dataset_name=args.dataset, data_folder=args.data_folder,
              batch_size=args.batch_size, seed=seed)
    train = load_shd_or_ssc(split="train", shuffle=True, **kw)
    test = load_shd_or_ssc(
        split="test" if args.dataset == "ssc" else "valid",
        shuffle=False, **kw,
    )
    return train, test


def run_reference(args):
    import torch

    from sparch.models.snns import SNN as RefSNN

    torch.manual_seed(args.seed)
    n_out = 20 if args.dataset == "shd" else 35
    sizes = [args.nb_hiddens] * (args.nb_layers - 1) + [n_out]
    net = RefSNN(
        input_shape=(args.batch_size, None, 700),
        layer_sizes=sizes,
        neuron_type=args.model_type,
        dropout=args.dropout,
        normalization=args.normalization,
        use_readout_layer=True,
    )
    opt = torch.optim.Adam(net.parameters(), args.lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.7, patience=1, min_lr=1e-6
    )
    loss_fn = torch.nn.CrossEntropyLoss()
    train, test = loaders(args, args.seed)

    def evaluate():
        net.eval()
        accs = []
        with torch.no_grad():
            for x, _, y in test:
                out, _ = net(torch.from_numpy(np.asarray(x)))
                accs.append((out.argmax(1).numpy() == np.asarray(y)).mean())
        return float(np.mean(accs))

    for e in range(args.epochs):
        net.train()
        t0 = time.time()
        for x, _, y in train:
            out, _ = net(torch.from_numpy(np.asarray(x)))
            loss = loss_fn(out, torch.from_numpy(np.asarray(y)))
            opt.zero_grad()
            loss.backward()
            opt.step()
        acc = evaluate()
        sched.step(acc)
        print(f"[reference] epoch {e+1}: test acc {acc:.4f} "
              f"({time.time()-t0:.1f}s)", flush=True)
    return acc  # last epoch's evaluation — no redundant extra test pass


def run_ours(args):
    import run_exp

    exp = run_exp.main([
        "--dataset_name", args.dataset,
        "--data_folder", args.data_folder,
        "--new_exp_folder", f"exp/parity_{args.dataset}_{args.model_type}"
        f"_{args.seed}_{int(time.time())}",
        "--model_type", args.model_type,
        "--nb_layers", str(args.nb_layers),
        "--nb_hiddens", str(args.nb_hiddens),
        "--batch_size", str(args.batch_size),
        "--nb_epochs", str(args.epochs),
        "--lr", str(args.lr),
        "--normalization", args.normalization,
        "--pdrop", str(args.dropout),
        "--seed", str(args.seed),
    ])
    return exp.test_acc


def main():
    args = parse_args()
    acc_ours = run_ours(args)
    print(f"sparch-tpu test acc: {acc_ours:.4f}")
    if not args.skip_reference:
        acc_ref = run_reference(args)
        print(f"reference  test acc: {acc_ref:.4f}")
        print(f"delta: {abs(acc_ours - acc_ref)*100:.2f}% "
              f"(target <= 0.5%)")


if __name__ == "__main__":
    main()
