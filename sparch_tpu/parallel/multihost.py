"""Multi-host (multi-process / DCN) utilities.

On a multi-host TPU pod each process sees only its local chips. The recipe:

1. ``maybe_initialize()`` — call ``jax.distributed.initialize()`` when the
   launcher provides coordination env vars (no-op single-host).
2. Each host's DataLoader takes ``num_shards=jax.process_count()`` and
   ``shard_index=jax.process_index()`` — disjoint slices of the same
   global batch order (shared shuffle seed).
3. ``global_batch(...)`` assembles a globally-sharded ``jax.Array`` from
   each host's local slice, laid out on the mesh's 'data' axis; the jitted
   train step then works unchanged (the gradient psum rides ICI within a
   slice and DCN across slices, both placed by XLA).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["maybe_initialize", "global_batch"]

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when launcher env vars are present.
    Returns True if multi-process mode is active.

    The decision is made from the environment alone and
    ``jax.distributed.initialize()`` runs *before* anything queries the
    backend: ``jax.process_count()`` (or any dispatch) initializes the
    runtime, and initializing the distributed client after that point
    either raises or silently leaves the job single-process.
    """
    global _initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coord and not _initialized:
        try:
            jax.distributed.initialize()
        except RuntimeError:
            # already initialized by the launcher
            pass
        _initialized = True
    return jax.process_count() > 1


def global_batch(mesh: Mesh, local_x, local_y: np.ndarray):
    """Build global arrays sharded on the 'data' mesh axis from per-host
    local slices (every host holds global_batch/process_count rows).
    ``local_x`` may be a pytree (e.g. (waveform, xlens) on the
    device-frontend path)."""
    sharding = NamedSharding(mesh, P("data"))
    x = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, a),
        local_x,
    )
    y = jax.make_array_from_process_local_data(sharding, local_y)
    return x, y
