"""SHD / SSC spiking dataset pipeline.

Reads the Heidelberg HDF5 layout (groups ``spikes/times``, ``spikes/units``
and ``labels`` — reference spiking_datasets.py:57-61) and bins each
utterance's spike events into a dense ``(nb_steps, 700)`` float array:
event times are digitised into ``nb_steps`` bins spanning ``max_time``
seconds and scattered additively, so a unit spiking twice in one bin gets
value 2.0 — exactly the semantics of the reference's sparse-COO-then-dense
construction (spiking_datasets.py:66-78).

TPU notes: SHD/SSC batches are fully static ``(B, 100, 700)`` shapes, so
every training step hits the same compiled executable. The scatter runs on
host NumPy (``np.add.at``); an optional C++ binning kernel
(sparch_tpu.data.native) accelerates it for large batch throughput.
"""
from __future__ import annotations

import logging
from typing import Optional

import h5py
import numpy as np

from sparch_tpu.data.loader import DataLoader

logger = logging.getLogger(__name__)

__all__ = ["SpikingDataset", "load_shd_or_ssc"]

NB_UNITS = 700
MAX_TIME = 1.4


class SpikingDataset:
    """Dataset for the Spiking Heidelberg Digits (SHD) or Spiking Speech
    Commands (SSC) dataset (reference spiking_datasets.py:24-87)."""

    def __init__(
        self,
        dataset_name: str,
        data_folder: str,
        split: str,
        nb_steps: int = 100,
    ):
        self.nb_steps = nb_steps
        self.nb_units = NB_UNITS
        self.max_time = MAX_TIME
        # Bin edges match np.linspace(0, 1.4, nb_steps) digitisation
        # (reference spiking_datasets.py:54,68).
        self.time_bins = np.linspace(0, self.max_time, num=self.nb_steps)

        self._filename = f"{data_folder}/{dataset_name}_{split}.h5"
        # HDF5 handles are not fork-safe and not picklable: labels are
        # read eagerly (small); the spikes handle opens lazily, once per
        # process, so the dataset works under multi-process loading.
        with h5py.File(self._filename, "r") as f:
            self.labels = np.array(f["labels"], dtype=np.int64)
        self._h5 = None

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_h5"] = None
        return state

    def _spikes(self):
        if self._h5 is None:
            self._h5 = h5py.File(self._filename, "r")
        return self._h5["spikes"]

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, index: int):
        from sparch_tpu.data.native import bin_events

        spikes = self._spikes()
        # digitize + additive scatter (native C++ kernel with NumPy
        # fallback); events at/after max_time are dropped, matching the
        # reference's silent sparse-to-dense discard of out-of-range bins.
        x = bin_events(
            np.asarray(spikes["times"][index], np.float64),
            np.asarray(spikes["units"][index], np.int64),
            self.time_bins,
            self.nb_steps,
            self.nb_units,
        )
        return x, self.labels[index]

    def generate_batch(self, batch):
        """Collate: stack fixed-shape spike rasters; return (xs, xlens, ys).

        ``xlens`` is the per-item step count — constant ``nb_steps`` here,
        kept for interface parity with the reference collate
        (spiking_datasets.py:80-87)."""
        xs, ys = zip(*batch)
        xs = np.stack(xs, axis=0)
        xlens = np.full((len(ys),), self.nb_steps, dtype=np.int64)
        ys = np.asarray(ys, dtype=np.int64)
        return xs, xlens, ys


def load_shd_or_ssc(
    dataset_name: str,
    data_folder: str,
    split: str,
    batch_size: int,
    nb_steps: int = 100,
    shuffle: bool = True,
    workers: int = 0,
    seed: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
    batch_transform=None,
) -> DataLoader:
    """Create a loader for a split of SHD or SSC
    (reference spiking_datasets.py:90-140). ``batch_transform`` runs on
    each collated batch in the loader's producer thread (see
    DataLoader)."""
    if dataset_name not in ["shd", "ssc"]:
        raise ValueError(f"Invalid dataset name {dataset_name}")
    if split not in ["train", "valid", "test"]:
        raise ValueError(f"Invalid split name {split}")
    if dataset_name == "shd" and split == "valid":
        logging.info("SHD does not have a validation split. Using test split.")
        split = "test"

    dataset = SpikingDataset(dataset_name, data_folder, split, nb_steps)
    logging.info(f"Number of examples in {split} set: {len(dataset)}")

    return DataLoader(
        dataset,
        batch_size=batch_size,
        collate_fn=dataset.generate_batch,
        shuffle=shuffle,
        seed=seed,
        prefetch=2 if workers >= 0 else 0,
        workers=max(workers, 0),
        num_shards=num_shards,
        shard_index=shard_index,
        batch_transform=batch_transform,
    )
