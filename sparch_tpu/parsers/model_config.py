"""Model configuration flags — full parity with the reference surface
(reference parsers/model_config.py:19-83): same names, types, choices and
defaults. ``strtobool`` is re-implemented locally (distutils is removed
from Python >= 3.12)."""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

__all__ = ["add_model_options", "print_model_options", "strtobool"]

_MODEL_OPTION_KEYS = [
    "model_type",
    "nb_layers",
    "nb_hiddens",
    "pdrop",
    "normalization",
    "use_bias",
    "bidirectional",
    # TPU-native extensions
    "threshold",
    "remat",
]


def strtobool(val) -> bool:
    v = str(val).lower()
    if v in ("y", "yes", "t", "true", "on", "1"):
        return True
    if v in ("n", "no", "f", "false", "off", "0"):
        return False
    raise ValueError(f"invalid truth value {val!r}")


def add_model_options(parser):
    parser.add_argument(
        "--model_type",
        type=str,
        choices=["LIF", "adLIF", "RLIF", "RadLIF", "MLP", "RNN", "LiGRU", "GRU"],
        default="LIF",
        help="Network architecture: one of the spiking neuron variants "
        "(LIF/adLIF/RLIF/RadLIF) or a non-spiking baseline "
        "(MLP/RNN/LiGRU/GRU).",
    )
    parser.add_argument(
        "--nb_layers",
        type=int,
        default=3,
        help="Total layer count; the final layer is the readout.",
    )
    parser.add_argument(
        "--nb_hiddens",
        type=int,
        default=128,
        help="Width (neuron count) of every hidden layer.",
    )
    parser.add_argument(
        "--pdrop",
        type=float,
        default=0.1,
        help="Dropout probability on hidden-layer outputs, in [0, 1].",
    )
    parser.add_argument(
        "--normalization",
        type=str,
        default="batchnorm",
        help="Feature normalization applied after the input projection: "
        "'batchnorm' or 'layernorm'; anything else disables it.",
    )
    parser.add_argument(
        "--use_bias",
        type=strtobool,
        default=False,
        help="Add a learnable bias term to the feedforward projections.",
    )
    parser.add_argument(
        "--bidirectional",
        type=strtobool,
        default=False,
        help="Run each layer over the sequence in both directions and "
        "concatenate the two passes, doubling the layer's output width.",
    )
    parser.add_argument(
        "--threshold",
        type=float,
        default=1.0,
        help="Fixed spiking threshold for the membrane potential.",
    )
    # --- TPU-native extensions (defaults preserve reference behaviour) ---
    parser.add_argument(
        "--state_init",
        type=str,
        choices=["uniform", "zeros"],
        default="uniform",
        help="Hidden-state initialisation per forward: 'uniform' matches the "
        "reference's U[0,1) random states; 'zeros' is deterministic.",
    )
    parser.add_argument(
        "--cell_impl",
        type=str,
        choices=["auto", "scan", "pallas", "pallas_tp"],
        default="auto",
        help="Neuron recurrence implementation: fused Pallas TPU kernels or "
        "XLA lax.scan. 'auto' uses Pallas on TPU, scan elsewhere. "
        "'pallas_tp' (spiking models, --mesh_model >= 2) runs the fused "
        "kernels neuron-sharded over the 'model' mesh axis with in-kernel "
        "ICI collectives — the fused-kernel path for layers wider than "
        "one chip's VMEM cap.",
    )
    parser.add_argument(
        "--compute_dtype",
        type=str,
        choices=["float32", "bfloat16"],
        default="float32",
        help="Matmul compute dtype on TPU (params stay float32).",
    )
    parser.add_argument(
        "--input_dtype",
        type=str,
        choices=["float32", "bfloat16"],
        default="float32",
        help="Storage dtype of the input batches shipped to the device. "
        "'bfloat16' halves host->device traffic and the two largest HBM "
        "streams of the step (the input-projection forward and its dW "
        "backward both read the full raster). For spiking rasters this "
        "is LOSSLESS: bin counts are small integers, exactly "
        "representable in bfloat16, and the MXU's default-precision "
        "matmul already rounds the f32 operands to bfloat16 passes. For "
        "continuous features (hd/sc fbank) it is AMP-like instead. "
        "Fastest where the input projection is stream-bound (narrow "
        "hidden layers over wide rasters, e.g. 2.1x at H=128/F=700); "
        "neutral where it is MXU-bound (H>=512).",
    )
    parser.add_argument(
        "--remat",
        type=strtobool,
        default=False,
        help="Rematerialise hidden layers in the backward pass "
        "(jax.checkpoint): activations/residual streams are recomputed "
        "from each layer's input instead of stored, at the cost of one "
        "extra forward. Whether that shrinks peak HBM is up to XLA's "
        "memory-aware scheduling: measured 3.0x temp-peak saving on "
        "TPU (RadLIF 3x512, T=1000, B=128 — docs/measure_remat_tpu.json) "
        "but a ~1.17x REGRESSION on the CPU backend, whose scheduler "
        "hoists the recomputes (tools/measure_remat.py). RNG streams "
        "replay, so gradients "
        "match the stored-activation run (up to float reassociation). "
        "Try it when long sequences / wide stacks OOM or force a "
        "smaller batch.",
    )
    return parser


def print_model_options(args):
    """Log the resolved model options, one key=value line each."""
    opts = vars(args)
    lines = ["", "model options:"]
    lines += [f"  {k}={opts[k]}" for k in _MODEL_OPTION_KEYS if k in opts]
    logging.info("\n".join(lines))
