"""Offline batch inference (serving path).

The reference has only a test-epoch loop (exp.py:469-518); this adds a
deployment-ready predictor: one jit-compiled eval program per padded batch
shape, deterministic outputs (models with ``state_init='uniform'`` get a
fixed state key per predictor), faithful label/probability outputs, and
fixed-shape padding so repeated calls never recompile.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Predictor", "load_experiment"]


def load_experiment(exp_folder: str):
    """Rebuild the exact trained model + variables from a CLI experiment
    folder (the training loop records the architecture in the
    checkpoint's meta.json). Returns ``(model, variables)`` — feed them
    to :class:`Predictor` or to ``streaming_init``."""
    import json
    import os

    from sparch_tpu.models import build_model_from_config
    from sparch_tpu.train.checkpoint import restore_checkpoint
    from sparch_tpu.train.state import create_train_state

    ckdir = os.path.join(exp_folder, "checkpoints")
    meta_path = os.path.join(ckdir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    cfg = meta.get("model")
    if cfg is None:
        raise ValueError(
            f"{meta_path} has no 'model' record (experiment predates "
            "architecture-in-meta); rebuild the model and pass variables "
            "directly"
        )
    if cfg.get("frontend") == "device":
        # the trained step took (waveforms, frame_lens); rebuild the same
        # FbankFrontend wrapper the training loop used (train/loop.py
        # init_model) — Predictor then accepts raw waveforms directly
        from sparch_tpu.models.frontend import FbankFrontend

        model = FbankFrontend(
            inner=build_model_from_config(cfg, use_readout_layer=True)
        )
        sample = (
            np.zeros((2, 400 + 7 * 160), np.float32),
            np.full((2,), 8, np.int32),
        )
    else:
        model = build_model_from_config(cfg, use_readout_layer=True)
        sample = np.zeros((2, 8, cfg["input_shape"][-1]), np.float32)
    # the checkpoint's raw RNG key is shaped by the TRAINING process's
    # PRNG impl (--prng_impl, default rbg: (4,) uint32) — a template
    # built with this process's default impl (often threefry: (2,))
    # fails Orbax's strict restore. Build an impl-matched typed key
    # (splits inside create_train_state follow the key's own impl),
    # then swap in its raw data to mirror the stored layout. Metas from
    # before prng_impl was recorded fall back to trying each CLI impl.
    impls = [cfg["prng_impl"]] if "prng_impl" in cfg else \
        ["rbg", "threefry2x32"]
    state = None
    for i, impl in enumerate(impls):
        template = create_train_state(
            model, sample, lr=1e-2, rng=jax.random.key(0, impl=impl)
        )
        template = template.replace(rng=jax.random.key_data(template.rng))
        try:
            state, _ = restore_checkpoint(ckdir, template)
            break
        except ValueError:
            if i == len(impls) - 1:  # rng-shape mismatch on every impl
                raise
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model, variables


class Predictor:
    """Wraps a model + trained variables for batched inference.

    Example:
        predictor = Predictor(model, {"params": ..., "batch_stats": ...})
        labels, probs = predictor(x)          # x: (n, T, F) any n
    """

    @classmethod
    def from_experiment(cls, exp_folder: str, batch_size: int = 128,
                        seed: int = 0,
                        pad_multiple: Optional[int] = None) -> "Predictor":
        """Load the best checkpoint of a CLI experiment for inference:

            predictor = Predictor.from_experiment("exp/test_exps/...")
            labels, probs = predictor(x)

        ``--frontend device`` experiments serve raw waveforms (see
        ``__call__``); ``pad_multiple`` buckets their frame counts —
        left as None it is read from the experiment's own meta record
        (the training run's ``--pad_multiple``), so serving reproduces
        the training eval path's padded sequence lengths exactly.
        (See :func:`load_experiment` for the underlying rebuild; use it
        directly with ``streaming_init`` for frame-by-frame serving.)
        """
        model, variables = load_experiment(exp_folder)
        if pad_multiple is None:
            import json
            import os

            meta_path = os.path.join(exp_folder, "checkpoints", "meta.json")
            with open(meta_path) as f:
                pad_multiple = json.load(f)["model"].get("pad_multiple", 100)
        return cls(model, variables, batch_size=batch_size, seed=seed,
                   pad_multiple=pad_multiple)

    def __init__(self, model, variables, batch_size: int = 128,
                 seed: int = 0, pad_multiple: int = 100,
                 mesh=None, n_micro: int = 4):
        """``mesh``: a ``jax.sharding.Mesh`` with a ``seq`` axis (and
        optionally ``data``/``model`` axes — ``parallel.seqpipe.
        make_seq_mesh``) runs inference time-sharded across its devices
        with the same pipelined recurrence as seq-parallel training, for
        long-sequence inputs that exceed one chip's HBM. Constraints
        (checked loudly): feature-input models only, ``batch_size``
        divisible by data-axis-size x ``n_micro``, and each call's T
        divisible by the ``seq`` axis size."""
        from sparch_tpu.models.frontend import FbankFrontend

        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        # device-frontend models take (waveforms, frame_lens); frame
        # counts are bucketed to pad_multiple (the training loader's
        # bounded-compile-shape policy, data/audio.py) so repeated calls
        # reuse a handful of compiled programs
        self._waveform = isinstance(model, FbankFrontend)
        self.pad_multiple = pad_multiple
        # models built with state_init='uniform' (the training default,
        # reference snns.py:286-287) need a 'state' RNG even in eval; a
        # fixed key keeps inference deterministic call-to-call
        rngs = (
            {"state": jax.random.PRNGKey(seed)}
            if getattr(model, "state_init", None) == "uniform"
            else None
        )
        is_snn = getattr(model, "is_snn", False)

        def _normalize(out):
            if is_snn:
                # the SNN readout already emits a sum of per-step softmax
                # posteriors (reference snns.py:808-825): normalising by
                # its own mass IS the class probability; a second softmax
                # would saturate on the O(T) score range
                return out / jnp.sum(out, axis=-1, keepdims=True)
            return jax.nn.softmax(out, axis=-1)

        self._seq_mesh = mesh
        if mesh is not None:
            if self._waveform:
                raise ValueError(
                    "seq-sharded serving takes feature inputs; run the "
                    "fbank frontend on host (ops.fbank.fbank_np) or use "
                    "the single-chip waveform path"
                )
            if "seq" not in mesh.axis_names:
                raise ValueError(
                    f"mesh axes {mesh.axis_names} have no 'seq' axis; "
                    "build one with parallel.seqpipe.make_seq_mesh"
                )
            from sparch_tpu.parallel.seqpipe import (
                make_seqpipe_predict, seq_batch_sharding,
            )

            n_data = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
                "data", 1
            )
            if batch_size % (n_data * n_micro):
                raise ValueError(
                    f"batch_size {batch_size} not divisible by data axis "
                    f"({n_data}) x n_micro ({n_micro})"
                )
            self._n_seq = dict(
                zip(mesh.axis_names, mesh.devices.shape)
            )["seq"]
            predict = make_seqpipe_predict(model, mesh, n_micro)
            x_sharding = seq_batch_sharding(mesh)
            state_key = (
                jax.random.PRNGKey(seed)
                if getattr(model, "state_init", None) == "uniform"
                else None
            )

            # one jitted program per call: the pipelined forward AND the
            # probability normalisation (un-jitted dispatches pay tens of
            # ms of tunnel latency each on the serving hot path)
            @jax.jit
            def _predict_probs(params, batch_stats, x):
                return _normalize(predict(params, batch_stats, x,
                                          state_key))

            def fwd(variables, x):
                if x.shape[1] % self._n_seq:
                    raise ValueError(
                        f"sequence length {x.shape[1]} not divisible by "
                        f"the mesh's seq axis ({self._n_seq})"
                    )
                # device_put of the host array straight to the mesh
                # sharding — no intermediate default-device copy
                x = jax.device_put(x, x_sharding)
                return _predict_probs(
                    variables["params"], variables.get("batch_stats", {}),
                    x,
                )

            self._fwd = fwd
            return

        def fwd(variables, x):
            out, _ = model.apply(variables, x, train=False, rngs=rngs)
            return _normalize(out)

        self._fwd = jax.jit(fwd)

    def __call__(
        self, x, lengths=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Predict labels; returns (labels, probs).

        Feature models (the default) take ``x: (n, T, F)``. Device-
        frontend models (``--frontend device`` experiments) take raw
        16 kHz waveforms: a list of 1-D float arrays (ragged OK, each
        consumed full-length) or a pre-padded ``(n, samples)`` array —
        which REQUIRES the true per-item sample ``lengths`` (treating
        zero padding as signal would silently diverge from the
        training pipeline's masked features).
        """
        if lengths is not None and not self._waveform:
            raise ValueError(
                "lengths= applies only to device-frontend (waveform) "
                "models; feature inputs carry no padding information"
            )
        if len(x) == 0:
            c = self.model.num_outputs
            return (np.zeros((0,), np.int64),
                    np.zeros((0, c), np.float32))
        if self._waveform:
            x, lengths = self._pad_waveforms(x, lengths)
        n = x.shape[0]
        bs = self.batch_size
        probs_out = []
        for i in range(0, n, bs):
            chunk = x[i : i + bs]
            pad = bs - chunk.shape[0]
            if pad:  # fixed shape -> one compiled program
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            if self._waveform:
                lens = lengths[i : i + bs]
                if pad:
                    lens = np.concatenate(
                        [lens, np.zeros((pad,), lens.dtype)]
                    )
                arg = (jnp.asarray(chunk), jnp.asarray(lens))
            else:
                arg = jnp.asarray(chunk)
            probs = np.asarray(self._fwd(self.variables, arg))
            probs_out.append(probs[: bs - pad] if pad else probs)
        probs = np.concatenate(probs_out, axis=0)
        return probs.argmax(axis=-1), probs

    def _pad_waveforms(self, x, lengths):
        """Ragged waveforms -> fixed (n, samples) + per-item FRAME counts
        (the lengths FbankFrontend masks padded frames with). Routed
        through the training collate's own padding policy
        (data/audio.py pad_waveform_batch) so serving and training
        cannot desync."""
        from sparch_tpu.data.audio import pad_waveform_batch

        if isinstance(x, np.ndarray) and x.ndim == 2 and lengths is None:
            raise ValueError(
                "pre-padded (n, samples) waveform batches need lengths= "
                "(true per-item sample counts); pass a list of 1-D "
                "arrays instead for full-length semantics"
            )
        waves = [np.asarray(w, np.float32) for w in x]
        if lengths is not None:
            if len(lengths) != len(waves):
                raise ValueError(
                    f"{len(lengths)} lengths for {len(waves)} waveforms"
                )
            waves = [w[: int(m)] for w, m in zip(waves, lengths)]
        return pad_waveform_batch(waves, self.pad_multiple)
