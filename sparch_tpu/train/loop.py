"""Experiment orchestration: end-to-end train/valid/test driver.

Drop-in equivalent of the reference ``Experiment`` class (exp.py:36-518)
with the same CLI semantics, experiment-folder conventions, logging
format, LR plateau scheduling, best-model checkpointing, and
test-split selection — re-architected for TPU:

- jitted, donated train/eval steps over a ``('data','model')`` device
  mesh (XLA inserts the gradient psum; no hand-written collectives);
- batches stream host->device with background prefetch; metrics stay on
  device until the end of the epoch (the reference syncs every batch);
- Orbax checkpoints carry optimizer/scheduler/RNG state, so resume is
  exact rather than approximate.
"""
from __future__ import annotations

import logging
import os
import time
from datetime import timedelta
from typing import Optional

import jax
import numpy as np

from sparch_tpu.data.audio import load_hd_or_sc
from sparch_tpu.data.spiking import load_shd_or_ssc
from sparch_tpu.models import ANN_TYPES, SNN_NEURON_TYPES, build_model
from sparch_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_state
from sparch_tpu.parsers.model_config import print_model_options
from sparch_tpu.parsers.training_config import print_training_options
from sparch_tpu.train.checkpoint import (
    checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from sparch_tpu.train.schedule import ReduceLROnPlateau
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_eval_step, make_train_step

logger = logging.getLogger(__name__)

__all__ = ["Experiment"]


class Experiment:
    """Training and testing of SNN/ANN models on the four speech command
    recognition datasets (shd, ssc, hd, sc). Reference: exp.py:36-100."""

    def __init__(self, args):
        # New model config (reference exp.py:45-51)
        self.model_type = args.model_type
        self.nb_layers = args.nb_layers
        self.nb_hiddens = args.nb_hiddens
        self.pdrop = args.pdrop
        self.normalization = args.normalization
        self.use_bias = args.use_bias
        self.bidirectional = args.bidirectional

        # Training config (reference exp.py:54-72)
        self.use_pretrained_model = args.use_pretrained_model
        self.only_do_testing = args.only_do_testing
        self.load_exp_folder = args.load_exp_folder
        self.new_exp_folder = args.new_exp_folder
        self.dataset_name = args.dataset_name
        self.data_folder = args.data_folder
        self.log_tofile = args.log_tofile
        self.save_best = args.save_best
        self.batch_size = args.batch_size
        self.nb_epochs = args.nb_epochs
        self.start_epoch = args.start_epoch
        self.lr = args.lr
        self.scheduler_patience = args.scheduler_patience
        self.scheduler_factor = args.scheduler_factor
        self.use_regularizers = args.use_regularizers
        self.reg_factor = args.reg_factor
        self.reg_fmin = args.reg_fmin
        self.reg_fmax = args.reg_fmax
        self.use_augm = args.use_augm
        self.threshold = getattr(args, "threshold", 1.0)
        self.nb_steps = getattr(args, "nb_steps", 100)
        self.auto_resume = getattr(args, "auto_resume", False)

        # TPU-native extensions (not in the reference CLI; all defaulted)
        self.seed = getattr(args, "seed", 0)
        self.state_init = getattr(args, "state_init", "uniform")
        self.cell_impl = getattr(args, "cell_impl", "auto")
        self.mesh_model = getattr(args, "mesh_model", 1)
        self.seq_parallel = getattr(args, "seq_parallel", 1)
        self.seq_microbatches = getattr(args, "seq_microbatches", 4)
        self.pad_multiple = getattr(args, "pad_multiple", 100)
        self.workers = getattr(args, "workers", 0)
        self.compute_dtype = getattr(args, "compute_dtype", "float32")
        self.remat = getattr(args, "remat", False)
        self.input_dtype = getattr(args, "input_dtype", "float32")
        self.profile_dir = getattr(args, "profile_dir", None)
        self.prng_impl = getattr(args, "prng_impl", "rbg")
        from sparch_tpu.utils.cache import resolve_cache_arg

        self.compile_cache = resolve_cache_arg(
            getattr(args, "compile_cache", None))
        if self.compile_cache is not False:
            from sparch_tpu.utils.cache import enable_compile_cache

            enable_compile_cache(self.compile_cache)
        self.frontend = getattr(args, "frontend", "host")
        if self.frontend == "device" and self.dataset_name not in ("hd", "sc"):
            logging.warning(
                "\n--frontend device only applies to hd/sc (waveform "
                "datasets); using the standard pipeline.\n"
            )
            self.frontend = "host"
        if self.input_dtype == "bfloat16" and self.frontend == "device":
            # the device frontend ships raw waveforms (a pytree with
            # lengths); bf16 would round the audio samples themselves
            logging.warning(
                "\n--input_dtype bfloat16 is ignored with --frontend "
                "device (waveform batches stay float32).\n"
            )
            self.input_dtype = "float32"
        if self.input_dtype == "bfloat16":
            import ml_dtypes

            bf16 = ml_dtypes.bfloat16

            def _cast_batch(batch):
                x, xlens, y = batch
                return x.astype(bf16), xlens, y

            # applied inside the loader's producer thread so the ~5.5
            # ms/batch cast overlaps device compute (see DataLoader)
            self._batch_transform = _cast_batch
        else:
            self._batch_transform = None
        jax.config.update("jax_default_prng_impl", self.prng_impl)

        # Initialize logging and output folders
        self.init_exp_folders()
        self.init_logging()
        print_model_options(args)
        print_training_options(args)

        # Multi-host initialization (no-op single host), then the device
        # mesh (reference's single-device handle -> full mesh, SURVEY §5.8)
        from sparch_tpu.parallel.multihost import maybe_initialize

        self.is_multihost = maybe_initialize()
        self.mesh = make_mesh(model=self.mesh_model)
        n_dev = self.mesh.devices.size
        logging.info(
            f"\nDevice mesh: {n_dev} x {jax.devices()[0].platform} "
            f"(data={self.mesh.devices.shape[0]}, "
            f"model={self.mesh.devices.shape[1]})\n"
        )

        # Optional sequence-parallel (time-pipelined) mesh: dp x sp x tp
        self.seq_mesh = None
        if self.seq_parallel > 1:
            from sparch_tpu.parallel.seqpipe import make_seq_mesh

            if self.is_multihost:
                raise ValueError("--seq_parallel is single-host only")
            if self.remat:
                raise ValueError(
                    "--remat has no effect under --seq_parallel: the "
                    "time-pipelined step stores only per-microbatch "
                    "activations already (its own memory bound). Drop "
                    "one of the two flags."
                )
            if self.frontend == "device":
                raise ValueError(
                    "--seq_parallel requires --frontend host (waveform "
                    "pytree batches cannot shard the time axis)"
                )
            per = self.seq_parallel * self.mesh_model
            if n_dev % per:
                raise ValueError(
                    f"{n_dev} devices not divisible by seq_parallel x "
                    f"mesh_model = {per}"
                )
            self.seq_mesh = make_seq_mesh(
                data=n_dev // per, model=self.mesh_model
            )
            logging.info(
                f"Sequence-parallel mesh: "
                f"{dict(zip(self.seq_mesh.axis_names, self.seq_mesh.devices.shape))}, "
                f"{self.seq_microbatches} microbatches\n"
            )

        # Initialize dataloaders and model/optimizer state
        self.init_dataset()
        self.init_model()

        # Plateau LR schedule (reference exp.py:92-98); on resume the
        # saved scheduler state is restored so the LR trajectory continues
        # exactly (the reference restarts the schedule from scratch).
        if self._restored_meta.get("scheduler"):
            self.scheduler = ReduceLROnPlateau.from_state_dict(
                self._restored_meta["scheduler"]
            )
        else:
            self.scheduler = ReduceLROnPlateau(
                lr=self.lr,
                mode="max",
                factor=self.scheduler_factor,
                patience=self.scheduler_patience,
                min_lr=1e-6,
            )

        # Compiled steps. With --seq_parallel the pipelined pair handles
        # every mesh-divisible batch; the plain pair stays as the exact
        # fallback for ragged shapes (both implement the same math).
        self._train_step = make_train_step(
            self.net,
            use_regularizers=self.use_regularizers,
            reg_factor=self.reg_factor,
            reg_fmin=self.reg_fmin,
            reg_fmax=self.reg_fmax,
        )
        self._eval_step = make_eval_step(self.net)
        # pallas_tp: ragged batches (B not divisible by the 'data' axis)
        # run through the scan twin — same math, GSPMD-sharded, no
        # shard_map divisibility constraint
        self._tp_fb_train_step = self._tp_fb_eval_step = None
        if self._tp_fallback_net is not None:
            self._tp_fb_train_step = make_train_step(
                self._tp_fallback_net,
                use_regularizers=self.use_regularizers,
                reg_factor=self.reg_factor,
                reg_fmin=self.reg_fmin,
                reg_fmax=self.reg_fmax,
            )
            self._tp_fb_eval_step = make_eval_step(self._tp_fallback_net)
        self._pipe_train_step = self._pipe_eval_step = None
        if self.seq_mesh is not None:
            from sparch_tpu.parallel.seqpipe import (
                make_seqpipe_eval_step, make_seqpipe_train_step,
            )

            self._pipe_train_step = make_seqpipe_train_step(
                self.net, self.seq_mesh, n_micro=self.seq_microbatches,
                use_regularizers=self.use_regularizers,
                reg_factor=self.reg_factor,
                reg_fmin=self.reg_fmin,
                reg_fmax=self.reg_fmax,
            )
            self._pipe_eval_step = make_seqpipe_eval_step(
                self.net, self.seq_mesh, n_micro=self.seq_microbatches
            )
            from sparch_tpu.parallel.seqpipe import seq_batch_sharding

            self._seq_sharding = seq_batch_sharding(self.seq_mesh)
        self._eval_rng = jax.random.PRNGKey(self.seed + 1)

    # ------------------------------------------------------------------
    # Setup
    # ------------------------------------------------------------------

    def init_exp_folders(self):
        """Experiment folder conventions (reference exp.py:149-189)."""
        if self.use_pretrained_model:
            exp_folder = self.load_exp_folder
            self.load_path = os.path.join(exp_folder, "checkpoints")
            if not checkpoint_exists(self.load_path):
                raise FileNotFoundError(
                    f"No checkpoint found at {self.load_path}/best_model"
                )
        elif self.new_exp_folder is not None:
            exp_folder = self.new_exp_folder
        else:
            outname = self.dataset_name + "_" + self.model_type + "_"
            outname += str(self.nb_layers) + "lay" + str(self.nb_hiddens)
            outname += "_drop" + str(self.pdrop) + "_" + str(self.normalization)
            outname += "_bias" if self.use_bias else "_nobias"
            outname += "_bdir" if self.bidirectional else "_udir"
            outname += "_reg" if self.use_regularizers else "_noreg"
            outname += "_lr" + str(self.lr)
            exp_folder = "exp/test_exps/" + outname.replace(".", "_")

        self._auto_resumed = False
        if not self.use_pretrained_model and os.path.exists(exp_folder):
            ckdir = os.path.join(exp_folder, "checkpoints")
            if self.auto_resume and checkpoint_exists(ckdir):
                self._auto_resumed = True
                self.load_path = ckdir
            else:
                raise FileExistsError(
                    f"Experiment folder already exists: {exp_folder}"
                )

        self.log_dir = os.path.join(exp_folder, "log")
        self.checkpoint_dir = os.path.join(exp_folder, "checkpoints")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self.exp_folder = exp_folder

    def init_logging(self):
        """Log to a dedicated file or the terminal (reference exp.py:191-212)."""
        if self.log_tofile:
            logging.basicConfig(
                filename=os.path.join(self.log_dir, "exp.log"),
                level=logging.INFO,
                format="%(message)s",
                force=True,
            )
        else:
            logging.basicConfig(
                level=logging.INFO, format="%(message)s", force=True
            )

    def init_dataset(self):
        """Dataloaders for the chosen dataset (reference exp.py:214-289)."""
        if self.dataset_name in ["shd", "ssc"]:
            self.nb_inputs = 700
            self.nb_outputs = 20 if self.dataset_name == "shd" else 35
            kw = dict(
                dataset_name=self.dataset_name,
                data_folder=self.data_folder,
                batch_size=self.batch_size,
                nb_steps=self.nb_steps,
                seed=self.seed,
                workers=self.workers,
                batch_transform=self._batch_transform,
                **self._shard_kw(),
            )
            self.train_loader = load_shd_or_ssc(split="train", shuffle=True, **kw)
            self.valid_loader = load_shd_or_ssc(split="valid", shuffle=False, **kw)
            if self.dataset_name == "ssc":
                self.test_loader = load_shd_or_ssc(
                    split="test", shuffle=False, **kw
                )
            if self.use_augm:
                logging.warning(
                    "\nWarning: Data augmentation not implemented for SHD and SSC.\n"
                )
        elif self.dataset_name in ["hd", "sc"]:
            self.nb_inputs = 40
            self.nb_outputs = 20 if self.dataset_name == "hd" else 35
            kw = dict(
                dataset_name=self.dataset_name,
                data_folder=self.data_folder,
                batch_size=self.batch_size,
                use_augm=self.use_augm,
                pad_multiple=self.pad_multiple,
                seed=self.seed,
                workers=self.workers,
                frontend=self.frontend,
                batch_transform=self._batch_transform,
                **self._shard_kw(),
            )
            self.train_loader = load_hd_or_sc(split="train", shuffle=True, **kw)
            self.valid_loader = load_hd_or_sc(split="valid", shuffle=False, **kw)
            if self.dataset_name == "sc":
                self.test_loader = load_hd_or_sc(split="test", shuffle=False, **kw)
            if self.use_augm:
                logging.info("\nData augmentation is used\n")
        else:
            raise ValueError(f"Invalid dataset name {self.dataset_name}")

    def init_model(self):
        """Build (or restore) the model + train state
        (reference exp.py:291-339)."""
        import jax.numpy as jnp

        input_shape = (self.batch_size, None, self.nb_inputs)
        layer_sizes = [self.nb_hiddens] * (self.nb_layers - 1) + [self.nb_outputs]

        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            self.compute_dtype
        ]
        # architecture record saved into checkpoint meta so serving can
        # rebuild the exact model from the experiment folder alone
        # (serve.Predictor.from_experiment)
        self._model_config = {
            "model_type": self.model_type,
            "input_shape": list(input_shape),
            "layer_sizes": list(layer_sizes),
            "threshold": self.threshold,
            "dropout": self.pdrop,
            "normalization": self.normalization,
            "use_bias": self.use_bias,
            "bidirectional": self.bidirectional,
            "state_init": self.state_init,
            "cell_impl": self.cell_impl,
            "compute_dtype": self.compute_dtype,
            "input_dtype": self.input_dtype,
            "frontend": self.frontend,
            "remat": self.remat,
            # serving rebuilds the restore template in a fresh process
            # whose default PRNG impl may differ; the stored raw RNG key
            # is impl-shaped, so the template must match
            # (serve.load_experiment)
            "prng_impl": self.prng_impl,
            # serving buckets waveform/feature padding identically to the
            # training loader so probabilities reproduce the eval path
            # (serve.Predictor.from_experiment)
            "pad_multiple": self.pad_multiple,
        }
        build_kw = dict(
            threshold=self.threshold,
            dropout=self.pdrop,
            normalization=self.normalization,
            use_bias=self.use_bias,
            bidirectional=self.bidirectional,
            use_readout_layer=True,
            state_init=self.state_init,
            compute_dtype=None if self.compute_dtype == "float32" else dtype,
            remat=self.remat,
        )
        # Tensor-parallel fused cells: neuron-sharded Pallas kernels with
        # per-step in-kernel ICI collectives (ops/pallas_tp.py) — the
        # fused-kernel path for layers wider than one chip's VMEM cap.
        # A scan twin (identical param tree) handles init and the ragged
        # final batch (shard_map needs B divisible by the 'data' axis;
        # the plain GSPMD step doesn't).
        self._tp_fallback_net = None
        if self.cell_impl == "pallas_tp":
            if self.model_type not in SNN_NEURON_TYPES:
                raise ValueError(
                    "--cell_impl pallas_tp covers the spiking models "
                    "(LIF/adLIF/RLIF/RadLIF); the ANN cells tensor-"
                    "parallelise via GSPMD scan (--cell_impl auto)"
                )
            if self.mesh_model < 2:
                raise ValueError(
                    "--cell_impl pallas_tp needs --mesh_model >= 2 (the "
                    "kernels shard neurons over the 'model' mesh axis)"
                )
            if self.seq_mesh is not None:
                raise ValueError(
                    "--cell_impl pallas_tp does not compose with "
                    "--seq_parallel (the time-pipelined step shards the "
                    "recurrence itself)"
                )
            if self.nb_hiddens % (self.mesh_model * 128):
                raise ValueError(
                    f"--cell_impl pallas_tp needs --nb_hiddens divisible "
                    f"by mesh_model*128 = {self.mesh_model * 128} (lane-"
                    f"aligned neuron shards), got {self.nb_hiddens}"
                )
            self.net = build_model(
                self.model_type, input_shape, layer_sizes,
                cell_impl="pallas_tp", tp_mesh=self.mesh, tp_axis="model",
                tp_batch_axis="data", **build_kw,
            )
            self._tp_fallback_net = build_model(
                self.model_type, input_shape, layer_sizes,
                cell_impl="scan", **build_kw,
            )
        else:
            self.net = build_model(
                self.model_type, input_shape, layer_sizes,
                cell_impl=self.cell_impl, **build_kw,
            )

        if self.frontend == "device":
            from sparch_tpu.models.frontend import FbankFrontend

            self.net = FbankFrontend(inner=self.net)
            if self._tp_fallback_net is not None:
                self._tp_fallback_net = FbankFrontend(
                    inner=self._tp_fallback_net
                )
            # smallest waveform batch producing 8 fbank frames, + lengths
            sample = (
                np.zeros((2, 400 + 7 * 160), np.float32),
                np.full((2,), 8, np.int32),
            )
        else:
            sample = np.zeros((2, 8, self.nb_inputs), np.float32)
        # init through the scan twin on the pallas_tp path: identical
        # param tree, and the un-jitted init never dispatches the
        # distributed kernels (whose tiny 2-sample init batch would not
        # even divide the mesh)
        init_net = (
            self._tp_fallback_net if self._tp_fallback_net is not None
            else self.net
        )
        self.state = create_train_state(
            init_net, sample, self.lr, jax.random.PRNGKey(self.seed)
        )

        self._restored_meta = {}
        if self.use_pretrained_model or self._auto_resumed:
            self.state, self._restored_meta = restore_checkpoint(
                self.load_path, self.state
            )
            logging.info(f"\nLoaded model at: {self.load_path}\n")

        if self.seq_mesh is not None:
            # replicated on the seq mesh: the pipelined step shards the
            # hidden weights itself via its shard_map in_specs (and the
            # ragged-batch fallback step wants replicated state anyway)
            self.state = replicate(self.state, self.seq_mesh)
        else:
            self.state = shard_state(
                self.state, self.mesh, tensor_parallel=self.mesh_model > 1,
                v_cols=self.cell_impl == "pallas_tp",
            )

        self.nb_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params)
        )
        kind = "spiking" if self.model_type in SNN_NEURON_TYPES else "non-spiking"
        logging.info(f"\nCreated new {kind} model: {self.net}\n")
        logging.info(f"Total number of trainable parameters is {self.nb_params}")

    # ------------------------------------------------------------------
    # Device placement
    # ------------------------------------------------------------------

    def _shard_kw(self):
        """Per-host dataset sharding kwargs (multi-host data parallelism)."""
        if not self.is_multihost:
            return {}
        return dict(
            num_shards=jax.process_count(), shard_index=jax.process_index()
        )

    def _seq_ok(self, x):
        """Whether this batch's shapes divide the seq-parallel mesh (and
        microbatching); anything ragged falls back to the plain step."""
        if self.seq_mesh is None:
            return False
        shp = dict(zip(self.seq_mesh.axis_names, self.seq_mesh.devices.shape))
        data, seq = shp.get("data", 1), shp["seq"]
        B, T = x.shape[0], x.shape[1]
        return (
            B % data == 0
            and (B // data) % self.seq_microbatches == 0
            and T % seq == 0
        )

    def _tp_ok(self, x):
        """Whether this batch's shapes fit the pallas_tp shard_map: the
        batch must divide the 'data' axis AND leave each shard a
        sublane-aligned (multiple-of-8) slice for the kernels. Ragged
        batches run the scan-twin fallback step (same math, GSPMD)."""
        n_data = self.mesh.devices.shape[0]
        lead = jax.tree.leaves(x)[0]
        B = lead.shape[0]
        return B % n_data == 0 and (B // n_data) % 8 == 0

    def _put_batch(self, x, y):
        """Shard on 'data' when divisible; a ragged final batch runs
        replicated (one extra compile, exact reference semantics — no
        padding perturbs BN stats or the loss). ``x`` may be a pytree
        (waveform, xlens) on the device-frontend path."""
        if self.is_multihost:
            from sparch_tpu.parallel.multihost import global_batch

            return global_batch(self.mesh, x, y)
        n_data = self.mesh.devices.shape[0]
        lead = jax.tree.leaves(x)[0]
        if lead.shape[0] % n_data == 0:
            sharding = batch_sharding(self.mesh)
            return jax.device_put(x, sharding), jax.device_put(y, sharding)
        return replicate(x, self.mesh), replicate(y, self.mesh)

    # ------------------------------------------------------------------
    # Train / valid / test epochs (reference exp.py:341-518)
    # ------------------------------------------------------------------

    def train_one_epoch(self, e: int):
        start = time.time()
        losses, accs, rates = [], [], []

        for x, xlens, y in self.train_loader:
            if self.frontend == "device":
                x = (x, xlens.astype(np.int32))
            if self._seq_ok(x):
                xs = jax.device_put(x, self._seq_sharding)
                self.state, metrics = self._pipe_train_step(
                    self.state, xs, y
                )
            else:
                x, y = self._put_batch(x, y)
                step = (
                    self._tp_fb_train_step
                    if self._tp_fb_train_step is not None
                    and not self._tp_ok(x)
                    else self._train_step
                )
                self.state, metrics = step(self.state, x, y)
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
            rates.append(metrics["spike_rate"])

        # Single host sync for the whole epoch
        losses, accs, rates = jax.device_get((losses, accs, rates))

        current_lr = self.scheduler.lr
        logging.info(f"Epoch {e}: lr={current_lr}")
        train_loss = float(np.mean(losses))
        logging.info(f"Epoch {e}: train loss={train_loss}")
        train_acc = float(np.mean(accs))
        logging.info(f"Epoch {e}: train acc={train_acc}")
        if self.net.is_snn:
            # Correct mean over batches (the reference divides by
            # len(loader)-1, exp.py:398 — off-by-one not reproduced)
            logging.info(
                f"Epoch {e}: train mean act rate={float(np.mean(rates))}"
            )
        elapsed = str(timedelta(seconds=time.time() - start))
        logging.info(f"Epoch {e}: train elapsed time={elapsed}")

    def _eval_epoch(self, loader):
        losses, accs, rates = [], [], []
        # ONE host dispatch for the whole epoch's state-init keys: a
        # per-batch jax.random.split would pay the tunnel dispatch
        # latency (tens of ms) on every eval batch
        keys = np.asarray(
            jax.device_get(jax.random.split(self._eval_rng, len(loader) + 1))
        )
        self._eval_rng = keys[0]
        for bi, (x, xlens, y) in enumerate(loader):
            if self.frontend == "device":
                x = (x, xlens.astype(np.int32))
            step_rng = keys[bi + 1] if bi + 1 < len(keys) else keys[-1]
            if self._seq_ok(x):
                xs = jax.device_put(x, self._seq_sharding)
                metrics = self._pipe_eval_step(self.state, xs, y, step_rng)
            else:
                x, y = self._put_batch(x, y)
                step = (
                    self._tp_fb_eval_step
                    if self._tp_fb_eval_step is not None
                    and not self._tp_ok(x)
                    else self._eval_step
                )
                metrics = step(self.state, x, y, step_rng)
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
            rates.append(metrics["spike_rate"])
        losses, accs, rates = jax.device_get((losses, accs, rates))
        return float(np.mean(losses)), float(np.mean(accs)), float(np.mean(rates))

    def valid_one_epoch(self, e: int, best_epoch: int, best_acc: float):
        valid_loss, valid_acc, rate = self._eval_epoch(self.valid_loader)
        logging.info(f"Epoch {e}: valid loss={valid_loss}")
        logging.info(f"Epoch {e}: valid acc={valid_acc}")
        if self.net.is_snn:
            logging.info(f"Epoch {e}: valid mean act rate={rate}")

        # Update learning rate (plateau on valid acc, reference exp.py:453)
        new_lr = self.scheduler.step(valid_acc)
        self.state = self.state.set_lr(new_lr)

        if valid_acc > best_acc:
            best_acc = valid_acc
            best_epoch = e
            if self.save_best:
                save_checkpoint(
                    self.checkpoint_dir,
                    self.state,
                    meta={
                        "epoch": e,
                        "best_acc": best_acc,
                        "scheduler": self.scheduler.state_dict(),
                        "model": self._model_config,
                    },
                )
                logging.info(f"\nBest model saved with valid acc={valid_acc}")

        logging.info("\n-----------------------------\n")
        return best_epoch, best_acc

    def test_one_epoch(self, test_loader):
        logging.info("\n------ Begin Testing ------\n")
        test_loss, test_acc, rate = self._eval_epoch(test_loader)
        logging.info(f"Test loss={test_loss}")
        logging.info(f"Test acc={test_acc}")
        if self.net.is_snn:
            logging.info(f"Test mean act rate={rate}")
        logging.info("\n-----------------------------\n")
        self.test_acc = test_acc
        return test_acc

    # ------------------------------------------------------------------
    # Main driver (reference exp.py:102-147)
    # ------------------------------------------------------------------

    def forward(self):
        if not self.only_do_testing:
            if self._auto_resumed:
                best_epoch = int(self._restored_meta.get("epoch", 0))
                best_acc = float(self._restored_meta.get("best_acc", 0.0))
                logging.info(
                    f"\n------ Auto-resumed from epoch {best_epoch} "
                    f"(best valid acc {best_acc}) ------\n"
                )
            elif self.use_pretrained_model:
                logging.info("\n------ Using pretrained model ------\n")
                best_epoch, best_acc = self.valid_one_epoch(self.start_epoch, 0, 0)
            else:
                best_epoch, best_acc = 0, 0

            logging.info("\n------ Begin training ------\n")

            from sparch_tpu.utils.profiling import trace

            first_epoch = best_epoch + 1  # best_epoch mutates in the loop
            for e in range(best_epoch + 1, best_epoch + self.nb_epochs + 1):
                # capture a profiler trace of the first epoch if requested
                with trace(self.profile_dir if e == first_epoch else None):
                    self.train_one_epoch(e)
                best_epoch, best_acc = self.valid_one_epoch(e, best_epoch, best_acc)

            logging.info(f"\nBest valid acc at epoch {best_epoch}: {best_acc}\n")
            logging.info("\n------ Training finished ------\n")

            # Load the best checkpoint back for final testing
            if self.save_best and checkpoint_exists(self.checkpoint_dir):
                self.state, _ = restore_checkpoint(self.checkpoint_dir, self.state)
                logging.info(
                    f"Loading best model, epoch={best_epoch}, valid acc={best_acc}"
                )
            else:
                logging.info(
                    "Cannot load best model because save_best option is "
                    "disabled. Model from last epoch is used for testing."
                )

        # Test trained model (shd/hd reuse the valid split, exp.py:140-147)
        if self.dataset_name in ["sc", "ssc"]:
            self.test_one_epoch(self.test_loader)
        else:
            self.test_one_epoch(self.valid_loader)
            logging.info(
                "\nThis dataset uses the same split for validation and testing.\n"
            )
