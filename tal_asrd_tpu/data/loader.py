"""Host data loading: sharded sampling + background prefetch to device.

Replaces torch DataLoader + DistributedSampler (tal/asr/system.py:810-818):
  * ShardedSampler deals each epoch's shuffled indices round-robin across
    data-parallel hosts (DistributedSampler semantics: per-epoch seed,
    padding to equal shard sizes);
  * DataLoader maps a dataset through worker threads (audio decode releases
    the GIL in numpy/scipy) and collates to static-shape batches;
  * DevicePrefetcher keeps N batches in flight on device so the TPU never
    waits on the host (double-buffering).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np


class ShardedSampler:
    def __init__(self, dataset_len: int, shard_id: int = 0, num_shards: int = 1,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False):
        self.n = dataset_len
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.drop_last:
            usable = (self.n // self.num_shards) * self.num_shards
            idx = idx[:usable]
        else:
            # pad to equal shard sizes (DistributedSampler semantics)
            pad = (-len(idx)) % self.num_shards
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
        return iter(idx[self.shard_id :: self.num_shards].tolist())

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.num_shards
        return -(-self.n // self.num_shards)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        sampler: Optional[ShardedSampler] = None,
        num_workers: int = 4,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.sampler = sampler or ShardedSampler(len(dataset), shuffle=False)
        self.num_workers = max(num_workers, 0)
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        indices = list(iter(self.sampler))
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers == 0:
            for batch_idx in batches:
                yield self.collate_fn([self.dataset[i] for i in batch_idx])
            return

        # Thread pool keeps ordering; numpy/scipy IO releases the GIL.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.num_workers) as pool:
            def fetch(batch_idx):
                return self.collate_fn([self.dataset[i] for i in batch_idx])

            futures: "queue.Queue" = queue.Queue()
            depth = self.num_workers * 2
            it = iter(batches)
            inflight = 0
            for _ in range(depth):
                try:
                    futures.put(pool.submit(fetch, next(it)))
                    inflight += 1
                except StopIteration:
                    break
            while inflight:
                f = futures.get()
                inflight -= 1
                try:
                    futures.put(pool.submit(fetch, next(it)))
                    inflight += 1
                except StopIteration:
                    pass
                yield f.result()


class DevicePrefetcher:
    """Keeps `depth` device-resident batches in flight (host->HBM overlap)."""

    def __init__(self, iterator, put_fn: Callable, depth: int = 2):
        self.iterator = iter(iterator)
        self.put_fn = put_fn
        self.depth = depth

    def __iter__(self):
        import collections

        buf = collections.deque()
        for item in self.iterator:
            buf.append(self.put_fn(item))
            if len(buf) >= self.depth:
                yield buf.popleft()
        while buf:
            yield buf.popleft()
