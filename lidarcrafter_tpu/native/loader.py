"""Threaded prefetching batch loader over a map-style dataset.

TPU-native counterpart of the reference's multi-worker torch DataLoader
(``tools/train/train_lidm.py:125``: ``DataLoader(..., num_workers,
drop_last=True, shuffle=True)``).  Threads (not processes) are the right
host model here: the per-sample work is numpy file IO + the native C++
projection (``native/src/range_projection.cpp``), both of which release the
GIL, so a small pool overlaps disk, decode and projection with the
accelerator step without pickling samples across processes.

Semantics match ``tools/train.py::real_batches``: infinite shuffled epochs,
``drop_last`` batching, one ``collate`` call per batch.  With the same seed
the batch stream is identical to the synchronous generator (tested in
``tests/test_native.py``).
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

import numpy as np


class PrefetchLoader:
    """Iterate collated batches with up to ``queue_depth`` batches in flight.

    Args:
      dataset: map-style (``__len__`` / ``__getitem__``) dataset.
      batch_size: samples per batch (incomplete tail batches are dropped,
        matching the reference's ``drop_last=True``).
      collate: list-of-samples → batch; defaults to ``dataset.collate_fn``.
      num_workers: thread-pool size for ``__getitem__`` calls.
      queue_depth: batches submitted ahead of consumption.
      seed: shuffle seed (per-epoch reshuffle, same order as
        ``real_batches`` given the same seed).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable | None = None,
        num_workers: int = 2,
        queue_depth: int = 4,
        seed: int = 0,
    ):
        if len(dataset) < batch_size:
            raise ValueError(
                f"dataset ({len(dataset)}) smaller than one batch "
                f"({batch_size}) — drop_last semantics would yield nothing"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate if collate is not None else dataset.collate_fn
        self.num_workers = max(1, int(num_workers))
        self.queue_depth = max(1, int(queue_depth))
        self.seed = seed

    def _index_stream(self) -> Iterator[list[int]]:
        rng = np.random.RandomState(self.seed)
        B = self.batch_size
        while True:
            order = rng.permutation(len(self.dataset))
            for i in range(0, len(order) - B + 1, B):
                yield [int(j) for j in order[i : i + B]]

    def __iter__(self):
        pool = ThreadPoolExecutor(
            max_workers=self.num_workers, thread_name_prefix="lct-loader"
        )
        try:
            stream = self._index_stream()
            pending: deque = deque()
            for _ in range(self.queue_depth):
                idxs = next(stream)
                pending.append([pool.submit(self.dataset.__getitem__, j)
                                for j in idxs])
            while True:
                futs = pending.popleft()
                batch = self.collate([f.result() for f in futs])
                idxs = next(stream)
                pending.append([pool.submit(self.dataset.__getitem__, j)
                                for j in idxs])
                yield batch
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
