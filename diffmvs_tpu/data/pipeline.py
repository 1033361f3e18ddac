"""Host-side batching + device prefetch.

Replaces the reference's torch DataLoader worker pool
(/root/reference/train.py:359-362). A background thread assembles numpy
batches (the datasets are indexable) and a one-deep prefetch overlaps host
IO with device compute; batches land on device via
diffmvs_tpu.parallel.shard_batch when a mesh is given.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import jax
import numpy as np


def _collate(samples: Sequence[dict]) -> dict:
    """Stack a list of dataset samples into a batch pytree."""
    out = {}
    first = samples[0]
    for key, value in first.items():
        if isinstance(value, dict):
            out[key] = {k: np.stack([s[key][k] for s in samples])
                        for k in value}
        elif isinstance(value, str):
            out[key] = [s[key] for s in samples]
        else:
            out[key] = np.stack([s[key] for s in samples])
    return out


class DataPipeline:
    """Iterable over device-ready batches with background prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, mesh=None, seed: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.mesh = mesh
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            idx = order[i:i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            batches.append(idx)
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        self._epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for idx in batches:
                    samples = [self.dataset[int(i)] for i in idx]
                    q.put(_collate(samples))
            finally:
                q.put(stop)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        while True:
            item = q.get()
            if item is stop:
                break
            if self.mesh is not None:
                from diffmvs_tpu.parallel.mesh import shard_batch
                strings = {k: v for k, v in item.items()
                           if isinstance(v, list)}
                arrays = {k: v for k, v in item.items()
                          if not isinstance(v, list)}
                arrays = shard_batch(self.mesh, arrays)
                item = {**arrays, **strings}
            yield item
