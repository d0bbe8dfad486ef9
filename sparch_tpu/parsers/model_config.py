"""Model configuration flags — full parity with the reference surface
(reference parsers/model_config.py:19-83): same names, types, choices and
defaults. ``strtobool`` is re-implemented locally (distutils is removed
from Python >= 3.12)."""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

__all__ = ["add_model_options", "print_model_options", "strtobool"]


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
        help="Type of ANN or SNN model.",
    )
    parser.add_argument(
        "--nb_layers",
        type=int,
        default=3,
        help="Number of layers (including readout layer).",
    )
    parser.add_argument(
        "--nb_hiddens",
        type=int,
        default=128,
        help="Number of neurons in all hidden layers.",
    )
    parser.add_argument(
        "--pdrop",
        type=float,
        default=0.1,
        help="Dropout rate, must be between 0 and 1.",
    )
    parser.add_argument(
        "--normalization",
        type=str,
        default="batchnorm",
        help="Type of normalization, Every string different from batchnorm "
        "and layernorm will result in no normalization.",
    )
    parser.add_argument(
        "--use_bias",
        type=strtobool,
        default=False,
        help="Whether to include trainable bias with feedforward weights.",
    )
    parser.add_argument(
        "--bidirectional",
        type=strtobool,
        default=False,
        help="If True, a bidirectional model that scans the sequence in both "
        "directions is used, which doubles the size of feedforward matrices. ",
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
        choices=["auto", "scan", "pallas"],
        default="auto",
        help="Neuron recurrence implementation: fused Pallas TPU kernels or "
        "XLA lax.scan. 'auto' uses Pallas on TPU, scan elsewhere.",
    )
    parser.add_argument(
        "--compute_dtype",
        type=str,
        choices=["float32", "bfloat16"],
        default="float32",
        help="Matmul compute dtype on TPU (params stay float32).",
    )
    return parser


def print_model_options(args):
    logging.info(
        """
        Model Config
        ------------
        Model Type: {model_type}
        Number of layers: {nb_layers}
        Number of hidden neurons: {nb_hiddens}
        Dropout rate: {pdrop}
        Normalization: {normalization}
        Use bias: {use_bias}
        Bidirectional: {bidirectional}
    """.format(**vars(args))
    )
