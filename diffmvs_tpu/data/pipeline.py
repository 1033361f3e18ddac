"""Host-side batching + device prefetch.

Replaces the reference's torch DataLoader worker pool
(/root/reference/train.py:359-362). Two host-parallelism modes:

  num_workers=0 — a background thread assembles numpy batches and a
    prefetch queue overlaps host IO with device compute (enough for
    training-sized resolutions on a single-core host).
  num_workers>0 — a pool of spawned worker processes decodes/resizes
    samples in parallel (the DataLoader-workers equivalent; needed to
    feed >20 maps/s at DTU eval resolution, ~5 decodes+resizes per map).

Workers are jax-free by construction: they only run dataset.__getitem__
(PIL + numpy) and _collate, so they can never contend for the TPU tunnel
or XLA locks. Batches land on device via diffmvs_tpu.parallel.shard_batch
when a mesh is given.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue
import threading
from typing import Iterator, Optional, Sequence

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


def _worker_loop(dataset, in_q, out_q):
    """Worker process: pull (batch_id, indices), push (batch_id, batch).
    Must stay jax-free (see module docstring)."""
    os.environ["OMP_NUM_THREADS"] = "1"
    while True:
        item = in_q.get()
        if item is None:
            return
        bid, idx = item
        try:
            samples = [dataset[int(i)] for i in idx]
            out_q.put((bid, _collate(samples)))
        except Exception as e:                      # surface, don't hang
            out_q.put((bid, e))


class DataPipeline:
    """Iterable over device-ready batches with background prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, mesh=None, seed: int = 0,
                 prefetch: int = 2, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.mesh = mesh
        self.seed = seed
        self.prefetch = prefetch
        self.num_workers = num_workers
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

    def _iter_threaded(self, batches) -> Iterator[dict]:
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
            yield item

    def _iter_workers(self, batches) -> Iterator[dict]:
        # fork on posix (torch DataLoader's choice): spawn re-imports the
        # caller's __main__, which recursively re-runs unguarded user
        # scripts. Forked children are safe here because they are jax-free
        # by construction (dataset __getitem__ + _collate only) and never
        # touch the inherited XLA/tunnel state.
        method = "fork" if "fork" in mp.get_all_start_methods() else "spawn"
        ctx = mp.get_context(method)
        in_q = ctx.Queue()
        out_q = ctx.Queue(maxsize=max(2 * self.num_workers, self.prefetch))
        procs = [ctx.Process(target=_worker_loop,
                             args=(self.dataset, in_q, out_q), daemon=True)
                 for _ in range(self.num_workers)]
        for p in procs:
            p.start()
        try:
            for bid, idx in enumerate(batches):
                in_q.put((bid, np.asarray(idx)))
            for _ in procs:
                in_q.put(None)
            pending = {}
            for want in range(len(batches)):
                while want not in pending:
                    bid, payload = out_q.get()
                    if isinstance(payload, Exception):
                        raise payload
                    pending[bid] = payload
                yield pending.pop(want)
        finally:
            for p in procs:
                p.terminate()
                p.join()

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        self._epoch += 1
        it = (self._iter_workers(batches) if self.num_workers > 0
              else self._iter_threaded(batches))
        for item in it:
            if self.mesh is not None:
                from diffmvs_tpu.parallel.mesh import shard_batch
                strings = {k: v for k, v in item.items()
                           if isinstance(v, list)}
                arrays = {k: v for k, v in item.items()
                          if not isinstance(v, list)}
                arrays = shard_batch(self.mesh, arrays)
                item = {**arrays, **strings}
            yield item
