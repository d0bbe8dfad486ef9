"""Model registry: spiking {LIF, adLIF, RLIF, RadLIF} and non-spiking
{MLP, RNN, LiGRU, GRU} families selected by a single model-type string
(reference dispatch at exp.py:303-334)."""
from sparch_tpu.models.ann import (
    ANN,
    ANN_TYPES,
    GRULayer,
    LiGRULayer,
    MLPLayer,
    ReadoutLayerANN,
    RNNLayer,
)
from sparch_tpu.models.snn import (
    SNN,
    SNN_NEURON_TYPES,
    LIFLayer,
    RadLIFLayer,
    ReadoutLayer,
    RLIFLayer,
    adLIFLayer,
)

MODEL_TYPES = SNN_NEURON_TYPES + ANN_TYPES


def build_model(
    model_type: str,
    input_shape,
    layer_sizes,
    dropout: float = 0.0,
    normalization: str = "batchnorm",
    use_bias: bool = False,
    bidirectional: bool = False,
    use_readout_layer: bool = True,
    **kwargs,
):
    """Build an SNN or ANN from a model-type string (the single registry the
    CLI dispatches through, mirroring reference exp.py:303-334)."""
    if model_type in SNN_NEURON_TYPES:
        return SNN(
            input_shape=tuple(input_shape),
            layer_sizes=tuple(layer_sizes),
            neuron_type=model_type,
            dropout=dropout,
            normalization=normalization,
            use_bias=use_bias,
            bidirectional=bidirectional,
            use_readout_layer=use_readout_layer,
            **kwargs,
        )
    if model_type in ANN_TYPES:
        kwargs.pop("state_init", None)
        kwargs.pop("threshold", None)
        return ANN(
            input_shape=tuple(input_shape),
            layer_sizes=tuple(layer_sizes),
            ann_type=model_type,
            dropout=dropout,
            normalization=normalization,
            use_bias=use_bias,
            bidirectional=bidirectional,
            use_readout_layer=use_readout_layer,
            **kwargs,
        )
    raise ValueError(f"Invalid model type {model_type}")


def build_model_from_config(config, **overrides):
    """Build a model from an architecture record — the dict the training
    loop writes to ``checkpoints/meta.json`` (train/loop.py
    ``_model_config``) and the torch importer reconstructs
    (sparch_tpu/migrate.py). The single translation point for that
    record: serving (serve.load_experiment) and migration both route
    through here, so a new config field is threaded exactly once."""
    import jax.numpy as jnp

    cfg = {**config, **overrides}
    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else None
    cell_impl = cfg.get("cell_impl", "auto")
    if cell_impl == "pallas_tp":
        # the TP mesh is a process-local object, not part of the saved
        # architecture; serving/migration rebuild single-process (or
        # seq-sharded via Predictor(mesh=...)) — 'auto' picks the right
        # single-chip path for the same param tree
        cell_impl = "auto"
    return build_model(
        cfg["model_type"],
        tuple(cfg["input_shape"]),
        cfg["layer_sizes"],
        threshold=cfg.get("threshold", 1.0),
        dropout=cfg.get("dropout", 0.0),
        normalization=cfg["normalization"],
        use_bias=cfg["use_bias"],
        bidirectional=cfg["bidirectional"],
        use_readout_layer=cfg.get("use_readout_layer", True),
        state_init=cfg.get("state_init", "uniform"),
        cell_impl=cell_impl,
        compute_dtype=dtype,
        remat=cfg.get("remat", False),
    )


__all__ = [
    "ANN",
    "SNN",
    "MODEL_TYPES",
    "ANN_TYPES",
    "SNN_NEURON_TYPES",
    "build_model",
    "LIFLayer",
    "adLIFLayer",
    "RLIFLayer",
    "RadLIFLayer",
    "ReadoutLayer",
    "MLPLayer",
    "RNNLayer",
    "LiGRULayer",
    "GRULayer",
    "ReadoutLayerANN",
]
