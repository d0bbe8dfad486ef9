#!/usr/bin/env python
"""Convert a trained PyTorch reference checkpoint (idiap/sparch
``best_model.pth``) into a sparch-tpu experiment folder.

    python tools/import_torch_checkpoint.py REF.pth OUT_FOLDER \
        [--sparch_path /path/to/sparch/repo] [--lr 0.01] \
        [--set KEY=VALUE ...] [--verify]

Handles both checkpoint formats: the pickled whole-module the
reference's trainer writes (exp.py:462 — ``--sparch_path`` makes the
``sparch`` package importable for unpickling) and bare ``state_dict``
saves (architecture inferred from key/shape structure; ``--set`` fills
the fields a state_dict cannot carry, e.g. ``--set threshold=1.4
dropout=0.25``).

The output folder serves and fine-tunes like a natively-trained one:

    Predictor.from_experiment(OUT_FOLDER)
    python run_exp.py --use_pretrained_model 1 --load_exp_folder OUT ...

``--verify`` (module checkpoints only) runs both frameworks' eval
forwards on random input with deterministic zero state init and asserts
they agree to 2e-4 — the same bound the parity suite pins.

SECURITY: unpickling executes code — only convert trusted checkpoints.
"""
import argparse
import ast
import sys

sys.path.insert(0, "/root/repo")


def _parse_sets(pairs):
    out = {}
    for pair in pairs or ():
        key, _, val = pair.partition("=")
        if not _:
            raise SystemExit(f"--set expects KEY=VALUE, got {pair!r}")
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val  # bare strings: --set normalization=layernorm
    return out


def _verify(net, config, variables):
    """Forward-parity check of the converted weights against the torch
    module itself (eval mode, zero state init on both sides)."""
    import numpy as np
    import torch

    net.eval()

    from sparch_tpu.models import build_model_from_config

    model = build_model_from_config(
        config, state_init="zeros", cell_impl="scan"
    )

    B, T, F = 4, 20, config["input_shape"][-1]
    x = np.random.default_rng(0).random((B, T, F)).astype(np.float32) * 4.0
    orig_rand = torch.rand
    torch.rand = lambda *s, **k: torch.zeros(*s, **k)  # zero state init
    try:
        with torch.no_grad():
            ref_out, _ = net(torch.from_numpy(x))
    finally:
        torch.rand = orig_rand
    out = model.apply(variables, x, train=False)
    out = out[0] if isinstance(out, tuple) else out
    err = float(np.abs(np.asarray(out) - ref_out.numpy()).max())
    if err > 2e-4:
        raise SystemExit(f"VERIFY FAILED: max |ours - torch| = {err:.3e} "
                         f"(bound 2e-4)")
    print(f"verify OK: max |ours - torch| = {err:.3e} (bound 2e-4)")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("pth", help="reference checkpoint (.pth)")
    ap.add_argument("out", help="experiment folder to create")
    ap.add_argument("--sparch_path", default=None,
                    help="reference repo root, for unpickling module "
                    "checkpoints (adds it to sys.path)")
    ap.add_argument("--lr", type=float, default=0.01,
                    help="initial LR recorded in the fresh optimizer state")
    ap.add_argument("--prng_impl", default="rbg",
                    help="PRNG impl for the fresh RNG state; must match "
                    "the --prng_impl of later fine-tune runs (default "
                    "mirrors the trainer's: rbg)")
    ap.add_argument("--set", nargs="*", metavar="KEY=VALUE", dest="sets",
                    help="architecture overrides for state_dict "
                    "checkpoints (threshold, dropout, batch_size, ...)")
    ap.add_argument("--verify", action="store_true",
                    help="compare the converted forward against the torch "
                    "module (module checkpoints only)")
    args = ap.parse_args(argv)

    import jax

    # conversion is pure host work; never wake a (possibly tunnelled)
    # accelerator backend for it
    jax.config.update("jax_platforms", "cpu")

    from sparch_tpu.migrate import (
        import_torch_checkpoint,
        load_torch_checkpoint,
    )

    # load once; with --verify, reject state_dict checkpoints BEFORE the
    # conversion writes anything (a state_dict has no forward to compare)
    obj = load_torch_checkpoint(args.pth, args.sparch_path)
    if args.verify and isinstance(obj, dict):
        raise SystemExit("--verify needs a pickled-module checkpoint "
                         "(a state_dict has no forward to compare against)")

    model, variables = import_torch_checkpoint(
        args.pth, args.out,
        lr=args.lr,
        prng_impl=args.prng_impl,
        config_overrides=_parse_sets(args.sets),
        loaded=obj,
    )
    import json
    import os

    with open(os.path.join(args.out, "checkpoints", "meta.json")) as f:
        cfg = json.load(f)["model"]
    print(f"imported {args.pth} -> {args.out}")
    print(f"  {cfg['model_type']} layers={cfg['layer_sizes']} "
          f"norm={cfg['normalization']} bias={cfg['use_bias']} "
          f"bidir={cfg['bidirectional']}")
    if args.verify:
        _verify(obj, cfg, variables)
    return 0


if __name__ == "__main__":
    sys.exit(main())
