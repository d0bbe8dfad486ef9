"""Minimal NumPy data loader with background prefetch.

Replaces torch's DataLoader (reference spiking_datasets.py:132-139) for a
JAX host pipeline: pure-NumPy batches, deterministic shuffling from a
seed, a custom collate function, and an optional background thread that
overlaps host-side preprocessing with device compute (the reference's
``pin_memory`` + synchronous loop has no equivalent benefit on TPU; what
matters here is keeping the TPU fed while the host bins/featurises the
next batch).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

__all__ = ["DataLoader"]


class DataLoader:
    """Iterates a dataset in (optionally shuffled) batches.

    dataset must implement ``__len__`` and ``__getitem__``; ``collate_fn``
    maps a list of items to a batch. Each ``__iter__`` pass reshuffles
    (when enabled) using an internal counter so epochs differ like torch's
    sampler behaviour.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        """``num_shards``/``shard_index`` give multi-host data parallelism:
        every host derives the SAME shuffled order from the shared seed and
        takes a disjoint contiguous slice of each global batch, so the
        global batch across hosts matches the single-host order exactly."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_index = shard_index
        if batch_size % num_shards:
            raise ValueError(
                f"batch_size {batch_size} not divisible by {num_shards} shards"
            )
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[Sequence[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        per_shard = self.batch_size // self.num_shards
        for i in range(0, end, self.batch_size):
            batch = order[i : i + self.batch_size]
            if self.num_shards == 1:
                yield batch
                continue
            # this host's slice of the global batch (ragged final batch:
            # split as evenly as contiguous slicing allows)
            lo = min(self.shard_index * per_shard, len(batch))
            hi = min(lo + per_shard, len(batch))
            yield batch[lo:hi]

    def __iter__(self):
        self._epoch += 1
        if self.prefetch <= 0:
            for idxs in self._batches():
                yield self.collate_fn([self.dataset[int(i)] for i in idxs])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            try:
                for idxs in self._batches():
                    q.put(self.collate_fn([self.dataset[int(i)] for i in idxs]))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
