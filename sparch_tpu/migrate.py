"""Import trained PyTorch reference checkpoints (idiap/sparch).

The reference saves its best model by pickling the whole ``nn.Module``
(``torch.save(self.net, ...)`` -> ``best_model.pth``, reference
exp.py:462). This module converts such a checkpoint — or a bare
``state_dict`` — into this package's native format, so a user migrating
from the reference keeps their trained models:

* :func:`variables_from_state_dict` — flax ``{"params", "batch_stats"}``
  from a torch ``state_dict`` + architecture config.
* :func:`config_from_module` / :func:`infer_config_from_state_dict` —
  recover the architecture record (the same dict the training loop
  stores in ``checkpoints/meta.json``) from a pickled module's
  attributes, or from the ``state_dict`` key/shape structure alone.
* :func:`import_torch_checkpoint` — one call: read a ``.pth``, write an
  experiment folder (Orbax checkpoint + ``meta.json``) that
  ``Predictor.from_experiment`` and ``run_exp.py --use_pretrained_model
  1 --load_exp_folder <out>`` load directly.

Weight-layout contract (pinned end-to-end by ``tests/test_migrate.py``
against the reference's own forward, and mirrored from the parity suite
``tests/test_reference_parity.py``):

* Feedforward ``W``: torch ``nn.Linear`` computes ``x @ weight.T`` while
  flax ``Dense`` computes ``x @ kernel`` -> kernel = ``weight.T``.
* SNN recurrent ``V``: the reference multiplies ``st @ V.weight``
  directly (snns.py:446) -> copied UNtransposed.
* ANN recurrent gates (``V``/``Vz``/``Vr``): applied as modules
  (``self.V(y)`` = ``y @ weight.T``, anns.py) -> transposed.
* Norms: ``weight``/``bias`` -> ``scale``/``bias``; batchnorm
  ``running_mean``/``running_var`` land in ``batch_stats``
  (``num_batches_tracked`` is dropped — flax keeps no step counter).

Only model weights transfer: optimizer moments, plateau-scheduler state
and RNG are framework-specific and start fresh (documented in
docs/MIGRATION.md). SECURITY: unpickling a module checkpoint executes
arbitrary code by design of the pickle format — only import checkpoints
you trust, exactly as with ``torch.load`` itself.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "variables_from_state_dict",
    "config_from_module",
    "infer_config_from_state_dict",
    "load_torch_checkpoint",
    "import_torch_checkpoint",
]

_SNN_TYPES = ("LIF", "adLIF", "RLIF", "RadLIF")
_ANN_TYPES = ("MLP", "RNN", "LiGRU", "GRU")
# recurrent-gate matrices per ANN type, reference anns.py layer classes
_ANN_GATES = {"MLP": (), "RNN": ("V",), "LiGRU": ("V", "Vz"),
              "GRU": ("V", "Vz", "Vr")}
# gate-projection linears (beyond W) per ANN type
_ANN_WGATES = {"MLP": (), "RNN": (), "LiGRU": ("Wz",), "GRU": ("Wz", "Wr")}
# reference norm attribute per projection: W->norm, Wz->normz, Wr->normr
_NORM_OF = {"W": "norm", "Wz": "normz", "Wr": "normr"}


_BOOL_CONFIG_KEYS = ("use_bias", "bidirectional", "use_readout_layer",
                     "remat")


def _as_bool(v) -> bool:
    """Tolerate string booleans ('false', '0', 'no') from CLI --set
    overrides — bool('false') is True, which silently corrupts the
    conversion (a dropped readout remaps every layer)."""
    if isinstance(v, str):
        low = v.strip().lower()
        if low in ("true", "t", "yes", "y", "on", "1"):
            return True
        if low in ("false", "f", "no", "n", "off", "0"):
            return False
        raise ValueError(f"not a boolean: {v!r}")
    return bool(v)


def _apply_overrides(config: Dict[str, Any], overrides: Dict[str, Any]):
    """Merge user overrides into an architecture record, interpreting the
    structured fields identically for both checkpoint formats:
    ``batch_size`` targets ``input_shape[0]``, booleans accept string
    forms."""
    overrides = dict(overrides)
    if "batch_size" in overrides:
        config["input_shape"][0] = int(overrides.pop("batch_size"))
    for key, val in overrides.items():
        config[key] = _as_bool(val) if key in _BOOL_CONFIG_KEYS else val
    return config


def _np(t) -> np.ndarray:
    """Detach a torch tensor to an owned float copy (never alias torch
    storage — a live optimizer could mutate it in place)."""
    return np.array(t.detach().cpu().numpy(), copy=True)


def _norm_params(sd: Dict[str, Any], prefix: str, normalization: str):
    """(flax norm params, batch stats or None) for one torch norm."""
    scale = _np(sd[f"{prefix}.weight"])
    bias = _np(sd[f"{prefix}.bias"])
    if normalization == "batchnorm":
        params = {"BatchNorm_0": {"scale": scale, "bias": bias}}
        stats = {"BatchNorm_0": {
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"]),
        }}
        return params, stats
    if normalization == "layernorm":
        return {"LayerNorm_0": {"scale": scale, "bias": bias}}, None
    raise ValueError(f"no norm params for normalization={normalization!r}")


def _linear(sd: Dict[str, Any], prefix: str, use_bias: bool):
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if use_bias:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def variables_from_state_dict(
    state_dict: Dict[str, Any], config: Dict[str, Any]
) -> Dict[str, Any]:
    """Convert a reference ``state_dict`` into flax variables.

    ``config`` is an architecture record with at least ``model_type``,
    ``normalization``, ``use_bias`` and ``use_readout_layer`` (see
    :func:`config_from_module`). Returns ``{"params": ...}`` plus
    ``"batch_stats"`` when the model carries batchnorm running stats.
    """
    model_type = config["model_type"]
    normalization = config["normalization"]
    use_bias = bool(config["use_bias"])
    use_readout = bool(config.get("use_readout_layer", True))
    is_snn = model_type in _SNN_TYPES
    container = "snn" if is_snn else "ann"

    indices = sorted({
        int(k.split(".")[1]) for k in state_dict if k.startswith(container + ".")
    })
    if not indices:
        raise ValueError(
            f"state_dict has no '{container}.*' keys — not a reference "
            f"{'SNN' if is_snn else 'ANN'} checkpoint (model_type="
            f"{model_type!r})"
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in indices:
        is_readout = use_readout and i == indices[-1]
        name = "readout" if is_readout else f"layer_{i}"
        lp = f"{container}.{i}"
        p: Dict[str, Any] = {"W": _linear(state_dict, f"{lp}.W", use_bias)}
        layer_stats: Dict[str, Any] = {}

        if is_snn:
            # every reference SNN layer (readout included) carries alpha
            p["alpha"] = _np(state_dict[f"{lp}.alpha"])
            if not is_readout and model_type in ("adLIF", "RadLIF"):
                for k in ("beta", "a", "b"):
                    p[k] = _np(state_dict[f"{lp}.{k}"])
            if not is_readout and model_type in ("RLIF", "RadLIF"):
                # reference computes st @ V.weight (snns.py:446) — as-is
                p["V"] = _np(state_dict[f"{lp}.V.weight"])
            if normalization in ("batchnorm", "layernorm"):
                p["norm"], s = _norm_params(state_dict, f"{lp}.norm",
                                            normalization)
                if s is not None:
                    layer_stats["norm"] = s
        else:
            if not is_readout:
                for g in _ANN_GATES[model_type]:
                    # gate modules apply y @ weight.T (anns.py) — transpose
                    p[g] = _np(state_dict[f"{lp}.{g}.weight"]).T
                for w in _ANN_WGATES[model_type]:
                    p[w] = _linear(state_dict, f"{lp}.{w}", use_bias)
            if normalization in ("batchnorm", "layernorm"):
                wnames = ("W",) + (() if is_readout
                                   else _ANN_WGATES[model_type])
                for w in wnames:
                    key = "norm" if is_readout else f"norm_{w}"
                    p[key], s = _norm_params(
                        state_dict, f"{lp}.{_NORM_OF[w]}", normalization
                    )
                    if s is not None:
                        layer_stats[key] = s

        params[name] = p
        if layer_stats:
            stats[name] = layer_stats

    variables: Dict[str, Any] = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


def config_from_module(net) -> Dict[str, Any]:
    """Architecture record from a pickled reference module's attributes
    (reference snns.py:94-107 / anns.py:71-83), in the exact shape the
    training loop writes to ``checkpoints/meta.json``."""
    is_snn = bool(getattr(net, "is_snn", hasattr(net, "snn")))
    model_type = net.neuron_type if is_snn else net.ann_type
    return {
        "model_type": str(model_type),
        "input_shape": [int(net.batch_size), None, int(net.input_size)],
        "layer_sizes": [int(h) for h in net.layer_sizes],
        "threshold": float(getattr(net, "threshold", 1.0)),
        "dropout": float(net.dropout),
        "normalization": str(net.normalization),
        "use_bias": bool(net.use_bias),
        "bidirectional": bool(net.bidirectional),
        "use_readout_layer": bool(net.use_readout_layer),
        # the reference draws uniform hidden states each forward
        # (snns.py:286-287) — that is this package's 'uniform' mode
        "state_init": "uniform",
        "cell_impl": "auto",
        "compute_dtype": "float32",
        "input_dtype": "float32",
        "frontend": "host",
        "remat": False,
    }


def infer_config_from_state_dict(
    state_dict: Dict[str, Any], **overrides
) -> Dict[str, Any]:
    """Recover the architecture from ``state_dict`` structure alone, for
    checkpoints saved as ``torch.save(net.state_dict(), ...)`` where no
    module attributes survive.

    Inferable: model family + type (key prefixes / per-layer parameter
    sets), layer sizes (weight shapes), ``use_bias``, ``normalization``
    (running stats => batchnorm), ``bidirectional`` (downstream in-dims
    are doubled). NOT in a state_dict — supply via ``overrides`` if they
    differed from the reference defaults: ``threshold`` (1.0),
    ``dropout`` (0.0 here; weights are unaffected either way),
    ``batch_size`` (128), ``use_readout_layer`` (True).
    """
    keys = set(state_dict)
    container = ("snn" if any(k.startswith("snn.") for k in keys)
                 else "ann" if any(k.startswith("ann.") for k in keys)
                 else None)
    if container is None:
        raise ValueError(
            "state_dict has neither 'snn.*' nor 'ann.*' keys — not a "
            "reference sparch checkpoint"
        )
    is_snn = container == "snn"
    indices = sorted({int(k.split(".")[1])
                      for k in keys if k.startswith(container + ".")})
    use_readout = _as_bool(overrides.pop("use_readout_layer", True))
    hidden = indices[:-1] if use_readout else indices
    first_hidden = hidden[0] if hidden else indices[0]

    def has(i, suffix):
        return f"{container}.{i}.{suffix}" in keys

    if is_snn:
        ad = has(first_hidden, "beta")
        rec = has(first_hidden, "V.weight")
        model_type = {(False, False): "LIF", (True, False): "adLIF",
                      (False, True): "RLIF", (True, True): "RadLIF"}[(ad, rec)]
    else:
        if has(first_hidden, "Vr.weight"):
            model_type = "GRU"
        elif has(first_hidden, "Vz.weight"):
            model_type = "LiGRU"
        elif has(first_hidden, "V.weight"):
            model_type = "RNN"
        else:
            model_type = "MLP"

    w0 = state_dict[f"{container}.{indices[0]}.W.weight"]
    layer_sizes = [int(state_dict[f"{container}.{i}.W.weight"].shape[0])
                   for i in indices]
    # a downstream layer reads H_prev * (1 + bidirectional) features
    # (reference snns.py:140 / anns.py:119); MLP stacks are always
    # unidirectional (the reference rejects the combination)
    bidirectional = False
    if len(indices) > 1 and model_type != "MLP":
        in1 = int(state_dict[f"{container}.{indices[1]}.W.weight"].shape[1])
        bidirectional = in1 == 2 * layer_sizes[0]
        if in1 not in (layer_sizes[0], 2 * layer_sizes[0]):
            raise ValueError(
                f"layer-1 in-dim {in1} matches neither H0={layer_sizes[0]} "
                f"nor 2*H0 — not a reference layer stack"
            )

    normalization = "none"
    if has(indices[0], "norm.running_mean"):
        normalization = "batchnorm"
    elif has(indices[0], "norm.weight"):
        normalization = "layernorm"

    cfg = {
        "model_type": model_type,
        "input_shape": [int(overrides.pop("batch_size", 128)), None,
                        int(w0.shape[1])],
        "layer_sizes": layer_sizes,
        "threshold": float(overrides.pop("threshold", 1.0)),
        "dropout": float(overrides.pop("dropout", 0.0)),
        "normalization": normalization,
        "use_bias": has(indices[0], "W.bias"),
        "bidirectional": bidirectional,
        "use_readout_layer": use_readout,
        "state_init": "uniform",
        "cell_impl": "auto",
        "compute_dtype": "float32",
        "input_dtype": "float32",
        "frontend": "host",
        "remat": False,
    }
    return _apply_overrides(cfg, overrides)


def load_torch_checkpoint(pth_path: str, sparch_path: Optional[str] = None):
    """``torch.load`` a reference checkpoint (module or state_dict), with
    an actionable error when the pickled module's package is missing."""
    import sys

    import torch

    if sparch_path and sparch_path not in sys.path:
        sys.path.insert(0, sparch_path)
    try:
        # pickled-module checkpoints need full unpickling (torch>=2.6
        # defaults to weights_only=True, which rejects them)
        return torch.load(pth_path, map_location="cpu", weights_only=False)
    except ModuleNotFoundError as e:
        raise ModuleNotFoundError(
            f"unpickling {pth_path} needs the reference package "
            f"({e.name!r}) importable — pass sparch_path=<its repo root>"
        ) from e


def import_torch_checkpoint(
    pth_path: str,
    out_exp_folder: str,
    sparch_path: Optional[str] = None,
    lr: float = 0.01,
    prng_impl: str = "rbg",
    config_overrides: Optional[Dict[str, Any]] = None,
    loaded: Any = None,
) -> Tuple[Any, Dict[str, Any]]:
    """Convert a reference ``.pth`` checkpoint into an experiment folder.

    Accepts both formats the torch ecosystem produces: a pickled module
    (what the reference's trainer writes, exp.py:462 — requires the
    ``sparch`` package importable to unpickle; pass ``sparch_path`` to
    add its repo to ``sys.path``) or a bare ``state_dict`` (architecture
    inferred from key/shape structure, see
    :func:`infer_config_from_state_dict`; override non-inferable fields
    via ``config_overrides``).

    Writes ``<out>/checkpoints/best_model`` (Orbax: imported params +
    batch stats, fresh optimizer/RNG at ``lr``; ``prng_impl`` must match
    the ``--prng_impl`` any later fine-tune runs with — key shapes
    differ per impl and Orbax restores strictly) and
    ``<out>/checkpoints/meta.json`` (architecture record + provenance),
    so the folder behaves exactly like one produced by training here:
    serve with ``Predictor.from_experiment(out)``, or fine-tune with
    ``run_exp.py --use_pretrained_model 1 --load_exp_folder <out>``.

    Returns ``(model, variables)`` for immediate in-process use.
    ``loaded`` skips the ``torch.load`` when the caller already holds the
    module / state_dict (``pth_path`` is still recorded as provenance).
    """
    obj = loaded if loaded is not None else load_torch_checkpoint(
        pth_path, sparch_path
    )

    overrides = dict(config_overrides or {})
    if isinstance(obj, dict):
        state_dict = obj
        config = infer_config_from_state_dict(state_dict, **overrides)
    else:
        state_dict = obj.state_dict()
        config = _apply_overrides(config_from_module(obj), overrides)

    config["prng_impl"] = prng_impl

    if not config.get("use_readout_layer", True):
        raise ValueError(
            "experiment-folder export requires use_readout_layer=True "
            "(the only mode the CLI trains); use "
            "variables_from_state_dict() directly for headless stacks"
        )

    variables = variables_from_state_dict(state_dict, config)

    import jax

    from sparch_tpu.models import build_model_from_config
    from sparch_tpu.train.checkpoint import save_checkpoint
    from sparch_tpu.train.state import create_train_state

    model = build_model_from_config(config)
    sample = np.zeros((2, 8, config["input_shape"][-1]), np.float32)
    # a TYPED key carries its impl through create_train_state's splits
    # regardless of the process default; the stored state keeps raw key
    # data (uint32, impl-shaped) exactly like the trainer's checkpoints,
    # which restore strictly into a --prng_impl-matched template
    state = create_train_state(
        model, sample, lr=lr, rng=jax.random.key(0, impl=prng_impl)
    )
    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        rng=jax.random.key_data(state.rng),
    )

    ckdir = os.path.join(out_exp_folder, "checkpoints")
    os.makedirs(ckdir, exist_ok=True)
    meta = {
        "epoch": 0,
        "best_acc": 0.0,
        "model": {k: v for k, v in config.items()
                  if k != "use_readout_layer"},
        "imported_from": os.path.abspath(pth_path),
    }
    save_checkpoint(ckdir, state, meta)
    return model, variables
