"""Orbax checkpointing: full training state, not just model weights.

The reference pickles the whole ``nn.Module`` for the best validation
epoch only, losing optimizer/scheduler/RNG state on resume
(exp.py:456-463, torch.load at exp.py:299-301). Here a checkpoint stores
params + batch stats + optimizer state + RNG + scheduler state + epoch
bookkeeping, under the same ``<exp>/checkpoints/`` layout with best-only
retention, so ``--use_pretrained_model --start_epoch E`` resumes are exact.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from sparch_tpu.train.state import TrainState

__all__ = ["save_checkpoint", "restore_checkpoint", "checkpoint_exists"]

_STATE_DIR = "best_model"
_META_FILE = "meta.json"


def checkpoint_exists(checkpoint_dir: str) -> bool:
    return os.path.isdir(os.path.join(checkpoint_dir, _STATE_DIR))


def save_checkpoint(checkpoint_dir: str, state: TrainState, meta: dict) -> None:
    """Save (overwrite) the best-model checkpoint + JSON metadata."""
    path = os.path.abspath(os.path.join(checkpoint_dir, _STATE_DIR))
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "step": state.step,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    # the Orbax save is collective, but the metadata write must not be:
    # N hosts truncating the same file concurrently can leave partial
    # JSON that breaks the next --auto_resume
    if jax.process_index() == 0:
        tmp = os.path.join(checkpoint_dir, _META_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, os.path.join(checkpoint_dir, _META_FILE))


def restore_checkpoint(
    checkpoint_dir: str, template: TrainState
) -> Tuple[TrainState, dict]:
    """Restore into the structure of ``template`` (a freshly-created state
    with identical model/optimizer config)."""
    path = os.path.abspath(os.path.join(checkpoint_dir, _STATE_DIR))
    target = {
        "params": template.params,
        "batch_stats": template.batch_stats,
        "opt_state": template.opt_state,
        "rng": template.rng,
        "step": template.step,
    }
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path, abstract)
    state = template.replace(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        rng=tree["rng"],
        step=tree["step"],
    )
    meta_path = os.path.join(checkpoint_dir, _META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
