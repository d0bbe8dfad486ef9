#!/usr/bin/env python
"""Experiment runner CLI (drop-in parity with the reference run_exp.py).

Run ``python run_exp.py -h`` for the full flag surface: the reference's 26
flags (same names, choices, and defaults) plus the TPU-native extensions
--threshold, --nb_steps, --seed, --state_init, --cell_impl,
--compute_dtype, --mxu_precision, --mesh_model, --pad_multiple,
--workers, --frontend, --prng_impl, --compile_cache, --profile_dir and
--auto_resume (none of which exist in the reference CLI).
"""
import argparse
import logging

from sparch_tpu.parsers.model_config import add_model_options
from sparch_tpu.parsers.training_config import add_training_options
from sparch_tpu.train.loop import Experiment

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train or evaluate spiking/non-spiking speech-command "
        "models (SHD/SSC/HD/SC) on TPU."
    )
    parser = add_model_options(parser)
    parser = add_training_options(parser)
    return parser.parse_args(argv)


def main(argv=None):
    """Build an Experiment from the CLI flags and drive it to completion."""
    args = parse_args(argv)
    experiment = Experiment(args)
    experiment.forward()
    return experiment


if __name__ == "__main__":
    main()
