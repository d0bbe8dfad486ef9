"""Device mesh and sharding utilities.

The reference has no distributed backend at all (its entire device story
is one ``torch.device`` handle, exp.py:81). This module supplies the
TPU-native equivalent: a ``jax.sharding.Mesh`` over all chips with axes
``('data', 'model')``, batch-data-parallel sharding by default, and
optional tensor-parallel sharding of the hidden dimension for wide
layers. Under ``jit`` with these shardings XLA inserts the gradient
all-reduces (psum over ICI) automatically — there is no hand-written
collective code on the training path.

Design notes (scaling-book recipe): pick a mesh, annotate shardings on
params and batch, let XLA place collectives. For sparch-sized models
(<10M params) pure DP is compute-optimal; the 'model' axis exists for
wide bidirectional RadLIF configs (3x1024+) and to exercise multi-axis
sharding in the dry-run harness.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate",
    "batch_sharding",
    "model_param_pspecs",
    "shard_state",
]


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Create a ('data', 'model') mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors are sharded on the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def _pspec_for_param(path: str, shape, v_cols: bool = False) -> P:
    """Name-based tensor-parallel partitioning rule for SNN/ANN params.

    Hidden layers: feedforward kernels column-sharded (output/hidden dim on
    'model'), per-neuron constants and norm scales sharded on 'model',
    recurrent V row-sharded (contracting dim on 'model' -> psum after the
    per-step matmul). Readout params stay replicated (tiny).

    ``v_cols`` flips the recurrent matrices to COLUMN sharding — the
    layout the tensor-parallel fused kernels consume (ops/pallas_tp.py:
    each chip computes ``s_full @ V[:, shard]`` after an in-kernel spike
    all-gather, so V lives output-dim-sharded in VMEM). Storing V the
    way the kernel reads it avoids an all-to-all at every shard_map
    entry.
    """
    if "readout" in path:
        return P()
    leaf = path.split("/")[-1]
    if leaf == "kernel":
        return P(None, "model")
    if leaf == "bias":
        return P("model")
    if leaf in ("alpha", "beta", "a", "b"):
        return P("model")
    if leaf == "V" or leaf in ("Vz", "Vr"):
        return P(None, "model") if v_cols else P("model", None)
    if leaf in ("scale", "mean", "var"):
        return P("model")
    return P()


def model_param_pspecs(tree, v_cols: bool = False):
    """Build a PartitionSpec pytree for params/batch_stats via name rules."""
    flat = jax.tree_util.tree_flatten_with_path(tree)
    specs = {}

    def path_str(kp):
        parts = []
        for k in kp:
            name = getattr(k, "key", getattr(k, "name", None))
            parts.append(str(name))
        return "/".join(parts)

    paths_leaves, treedef = flat
    spec_leaves = [
        _pspec_for_param(path_str(kp), leaf.shape, v_cols=v_cols)
        for kp, leaf in paths_leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, spec_leaves)


def shard_state(state, mesh: Mesh, tensor_parallel: bool = False,
                v_cols: bool = False):
    """Place a TrainState on the mesh: replicated by default; with
    ``tensor_parallel`` the hidden dimension of params/batch_stats/opt_state
    moments is sharded over 'model' (``v_cols`` column-shards the
    recurrent matrices for the fused-kernel TP path, see
    ``_pspec_for_param``)."""
    if not tensor_parallel:
        return replicate(state, mesh)

    param_specs = model_param_pspecs(state.params, v_cols=v_cols)
    stats_specs = model_param_pspecs(state.batch_stats, v_cols=v_cols)

    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
        )

    new_params = put(state.params, param_specs)
    new_stats = put(state.batch_stats, stats_specs)

    # Adam moments follow the param sharding; scalar counters replicate.
    def shard_opt(opt_state):
        def place(x):
            return jax.device_put(x, NamedSharding(mesh, P()))

        import optax

        def map_moments(os):
            if isinstance(os, optax.ScaleByAdamState):
                return os._replace(
                    count=place(os.count),
                    mu=put(os.mu, param_specs),
                    nu=put(os.nu, param_specs),
                )
            return jax.tree.map(place, os, is_leaf=lambda l: l is None)

        if hasattr(opt_state, "inner_state"):
            return opt_state._replace(
                hyperparams=jax.tree.map(place, opt_state.hyperparams),
                inner_state=tuple(map_moments(s) for s in opt_state.inner_state),
            )
        return jax.tree.map(place, opt_state)

    return state.replace(
        params=new_params,
        batch_stats=new_stats,
        opt_state=shard_opt(state.opt_state),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        rng=jax.device_put(state.rng, NamedSharding(mesh, P())),
    )
