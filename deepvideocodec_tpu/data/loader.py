"""Simple multi-worker batch loader with background prefetch.

The host side of the input pipeline: shuffling, thread-pool decode (PNG
decode is the bottleneck and releases the GIL inside PIL/zlib), batch
stacking, and a bounded prefetch queue so host IO overlaps device compute —
the TPU-side equivalent of the reference's DataLoader(num_workers=8)
(/root/reference/dmc/train.py:547-554).

Multi-host determinism: the epoch shuffle is a pure function of
(seed, epoch), NOT of a mutating per-process RNG stream, so every host
derives the SAME global order. With `num_shards`/`shard_index` set, each
host loads only its contiguous slice of every global batch; the slices
concatenated in shard order are exactly the single-host global batch
(the contract `parallel.local_batch_slice` consumers rely on).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = True,
        prefetch: int = 2,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        if not (0 <= shard_index < num_shards):
            raise ValueError(f"shard_index {shard_index} out of range "
                             f"for num_shards {num_shards}")
        if num_shards > 1 and batch_size % num_shards != 0:
            raise ValueError("num_shards must divide the global batch_size")
        if num_shards > 1 and not drop_last:
            # a trailing non-full global batch would hand hosts unequal
            # (possibly empty) local slices — per-host iteration counts
            # desynchronize and the collective global-array assembly in
            # parallel.device_put_batch deadlocks
            raise ValueError("num_shards > 1 requires drop_last=True")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch used for the next iteration's shuffle (otherwise
        epochs auto-increment after each completed iteration)."""
        self.epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _global_batches(self, epoch: int):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # seeded by (seed, epoch): identical on every host, distinct
            # per epoch (the reference reshuffles per epoch via the
            # DataLoader sampler).
            np.random.default_rng([self.seed, epoch]).shuffle(order)
        batches = [
            order[i:i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[np.ndarray]:
        epoch, self.epoch = self.epoch, self.epoch + 1
        batches = self._global_batches(epoch)
        if self.num_shards > 1:
            # every batch is full here (sharding requires drop_last)
            per = self.batch_size // self.num_shards
            lo = self.shard_index * per
            batches = [b[lo:lo + per] for b in batches]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, idxs))
                    q.put(np.stack(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
