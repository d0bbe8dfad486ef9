"""Training configuration flags — full parity with the reference surface
(reference parsers/training_config.py:19-177), plus TPU-native extensions
(seed, mesh, padding buckets) that default to reference-equivalent
behaviour."""
from __future__ import annotations

import logging

from sparch_tpu.parsers.model_config import strtobool

logger = logging.getLogger(__name__)

__all__ = ["add_training_options", "print_training_options"]


def add_training_options(parser):
    parser.add_argument(
        "--use_pretrained_model",
        type=strtobool,
        default=False,
        help="Whether to load a pretrained model or to create a new one.",
    )
    parser.add_argument(
        "--only_do_testing",
        type=strtobool,
        default=False,
        help="If True, will skip training and only perform testing of the "
        "loaded model.",
    )
    parser.add_argument(
        "--load_exp_folder",
        type=str,
        default=None,
        help="Path to experiment folder with a pretrained model to load. Note "
        "that the same path will be used to store the current experiment.",
    )
    parser.add_argument(
        "--new_exp_folder",
        type=str,
        default=None,
        help="Path to output folder to store experiment.",
    )
    parser.add_argument(
        "--dataset_name",
        type=str,
        choices=["shd", "ssc", "hd", "sc"],
        default="shd",
        help="Dataset name (shd, ssc, hd or sc).",
    )
    parser.add_argument(
        "--data_folder",
        type=str,
        default="data/shd_dataset/",
        help="Path to dataset folder.",
    )
    parser.add_argument(
        "--log_tofile",
        type=strtobool,
        default=False,
        help="Whether to print experiment log in an dedicated file or "
        "directly inside the terminal.",
    )
    parser.add_argument(
        "--save_best",
        type=strtobool,
        default=True,
        help="If True, the model from the epoch with the highest validation "
        "accuracy is saved, if False, no model is saved.",
    )
    parser.add_argument(
        "--batch_size",
        type=int,
        default=128,
        help="Number of input examples inside a single batch.",
    )
    parser.add_argument(
        "--nb_epochs",
        type=int,
        default=5,
        help="Number of training epochs (i.e. passes through the dataset).",
    )
    parser.add_argument(
        "--start_epoch",
        type=int,
        default=0,
        help="Epoch number to start training at. Will be 0 if no pretrained "
        "model is given. First epoch will be start_epoch+1.",
    )
    parser.add_argument(
        "--lr",
        type=float,
        default=1e-2,
        help="Initial learning rate for training. The default value of 0.01 "
        "is good for SHD and SC, but 0.001 seemed to work better for HD and SC.",
    )
    parser.add_argument(
        "--scheduler_patience",
        type=int,
        default=1,
        help="Number of epochs without progress before the learning rate "
        "gets decreased.",
    )
    parser.add_argument(
        "--scheduler_factor",
        type=float,
        default=0.7,
        help="Factor between 0 and 1 by which the learning rate gets "
        "decreased when the scheduler patience is reached.",
    )
    parser.add_argument(
        "--use_regularizers",
        type=strtobool,
        default=False,
        help="Whether to use regularizers in order to constrain the "
        "firing rates of spiking neurons within a given range.",
    )
    parser.add_argument(
        "--reg_factor",
        type=float,
        default=0.5,
        help="Factor that scales the loss value from the regularizers.",
    )
    parser.add_argument(
        "--reg_fmin",
        type=float,
        default=0.01,
        help="Lowest firing frequency value of spiking neurons for which "
        "there is no regularization loss.",
    )
    parser.add_argument(
        "--reg_fmax",
        type=float,
        default=0.5,
        help="Highest firing frequency value of spiking neurons for which "
        "there is no regularization loss.",
    )
    parser.add_argument(
        "--use_augm",
        type=strtobool,
        default=False,
        help="Whether to use data augmentation or not. Only implemented for "
        "nonspiking HD and SC datasets.",
    )
    parser.add_argument(
        "--nb_steps",
        type=int,
        default=100,
        help="Number of time bins for the spiking (shd/ssc) datasets.",
    )
    # --- TPU-native extensions ---
    parser.add_argument(
        "--auto_resume",
        type=strtobool,
        default=False,
        help="If the experiment folder already exists with a checkpoint, "
        "resume from it instead of failing (crash recovery; the reference "
        "requires a manual --use_pretrained_model relaunch).",
    )
    parser.add_argument(
        "--prng_impl",
        type=str,
        choices=["rbg", "threefry2x32"],
        default="rbg",
        help="JAX PRNG implementation. 'rbg' uses the TPU hardware RNG "
        "path (~0.4 ms/step faster for dropout mask generation); "
        "'threefry2x32' is JAX's default counter-based generator. Both "
        "are deterministic per key; streams differ. Checkpoints store "
        "the key, so keep the same impl across save/resume.",
    )
    parser.add_argument(
        "--seed",
        type=int,
        default=0,
        help="Global PRNG seed (params init, dropout, state init, shuffling).",
    )
    parser.add_argument(
        "--mesh_model",
        type=int,
        default=1,
        help="Tensor-parallel ('model' mesh axis) size; 1 = pure data "
        "parallelism over all chips.",
    )
    parser.add_argument(
        "--profile_dir",
        type=str,
        default=None,
        help="If set, capture a jax.profiler trace of the first training "
        "epoch into this directory (TensorBoard/xprof format).",
    )
    parser.add_argument(
        "--pad_multiple",
        type=int,
        default=100,
        help="Round variable-length (hd/sc) batch time dims up to this "
        "multiple so XLA compiles a bounded number of shapes.",
    )
    return parser


def print_training_options(args):
    logging.info(
        """
        Training Config
        ---------------
        Use pretrained model: {use_pretrained_model}
        Only do testing: {only_do_testing}
        Load experiment folder: {load_exp_folder}
        New experiment folder: {new_exp_folder}
        Dataset name: {dataset_name}
        Data folder: {data_folder}
        Log to file: {log_tofile}
        Save best model: {save_best}
        Batch size: {batch_size}
        Number of epochs: {nb_epochs}
        Start epoch: {start_epoch}
        Initial learning rate: {lr}
        Scheduler patience: {scheduler_patience}
        Scheduler factor: {scheduler_factor}
        Use regularizers: {use_regularizers}
        Regularization factor: {reg_factor}
        Regularization min firing rate: {reg_fmin}
        Reguarization max firing rate: {reg_fmax}
        Use data augmentation: {use_augm}
    """.format(**vars(args))
    )
