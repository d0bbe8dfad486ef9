"""sparch-tpu: a TPU-native (JAX/XLA/Pallas) framework for training and
testing surrogate-gradient spiking neural networks — and non-spiking ANN
baselines — on speech command recognition datasets.

Re-designed TPU-first with the capabilities of the sparch PyTorch toolkit
(Bittar & Garner 2022): see SURVEY.md for the reference analysis.
"""
__version__ = "0.1.0"

from sparch_tpu.models import ANN, SNN, build_model  # noqa: F401
from sparch_tpu.ops import spike_boxcar  # noqa: F401
