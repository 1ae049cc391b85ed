"""Batching + device-feed pipeline.

The reference uses a single-threaded torch DataLoader with ``num_workers=0``
(the CPU data path blocks the GPU, ``train.py:531,534`` — SURVEY.md §3.1).
Here the host side is a thread-pooled batch loader and the device side is a
double-buffered prefetcher: batch N+1 is decoded and transferred while the
TPU computes on batch N, so steady-state step time is max(compute, input)
instead of their sum.
"""
from __future__ import annotations

import collections
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def collate(samples: list) -> dict:
    """Stack a list of sample dicts into one batch dict (numpy)."""
    batch = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        else:
            batch[key] = vals  # seq_name / frame_index stay as lists
    return batch


class BatchLoader:
    """Iterates a dataset in batches; mirrors the reference's loop contract:
    ``next_batch()`` is invoked before each batch (train.py:562-563) so the
    per-batch crop/scale augmentation ratios are redrawn."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        seed: Optional[int] = None,
        num_workers: int = 4,
        drop_last: bool = True,
        process_shard: Optional[tuple] = None,
    ):
        """``process_shard=(process_id, process_count)`` makes this loader
        yield only its host's contiguous slice of each *global* batch
        (multi-host DP): every process draws the same seeded shuffle, so the
        slices are disjoint and together form the global batch — matching the
        addressable-shard layout ``jax.make_array_from_process_local_data``
        expects on a ('replica', 'data') mesh."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = random.Random(seed)
        self.num_workers = num_workers
        self.drop_last = drop_last
        if process_shard and process_shard[1] > 1:
            pid, nproc = process_shard
            if batch_size % nproc:
                raise ValueError(
                    f"global batch {batch_size} must be divisible by the {nproc} processes")
            self.process_shard = (pid, nproc)
        else:
            self.process_shard = None

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(order) // self.batch_size
        if not self.drop_last and len(order) % self.batch_size:
            n_batches += 1

        def load_batch(bi):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            if self.process_shard is not None:
                pid, nproc = self.process_shard
                # Slice THIS batch's actual length (the trailing batch under
                # drop_last=False can be short): every process must get an
                # equal, non-empty share or the per-host shards would
                # disagree with the global-array layout.
                local, rem = divmod(len(idxs), nproc)
                if rem or local == 0:
                    raise ValueError(
                        f"batch of {len(idxs)} cannot be split evenly over "
                        f"{nproc} processes (use drop_last=True or a dataset "
                        f"size divisible by the global batch)")
                idxs = idxs[pid * local : (pid + 1) * local]
            if hasattr(self.dataset, "next_batch"):
                try:
                    self.dataset.next_batch(bi)  # deterministic per-batch ratios
                except TypeError:
                    self.dataset.next_batch()
            return collate([self.dataset[i] for i in idxs])

        if self.num_workers <= 1:
            for bi in range(n_batches):
                yield load_batch(bi)
            return

        # Pipeline batches through a small thread pool, preserving order.
        # (Augmentation ratio state is per-batch; workers each call
        # next_batch() so ratios are drawn per batch as in the reference.)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()
            depth = self.num_workers
            for bi in range(min(depth, n_batches)):
                pending.append(pool.submit(load_batch, bi))
            next_submit = depth
            while pending:
                fut = pending.popleft()
                if next_submit < n_batches:
                    pending.append(pool.submit(load_batch, next_submit))
                    next_submit += 1
                yield fut.result()


def device_prefetch(iterator: Iterator[dict], size: int = 2, put=None) -> Iterator:
    """Double-buffered device transfer: keep ``size`` staged batches in
    flight while the current one computes, so steady-state step time is
    max(compute, input) instead of their sum (north star: "double-buffered
    HBM prefetch"; replaces the reference's blocking per-step H2D copies,
    ``train.py:568-578``).

    ``put`` stages one host batch (device transfer / sharding / host-side
    reshaping); transfers it enqueues are async, so they overlap the device
    step running on the previous batch. Default: ``jax.device_put`` every
    ndarray value of a batch dict.
    """
    import jax

    queue = collections.deque()

    if put is None:
        def put(batch):
            return {
                k: jax.device_put(v) if isinstance(v, np.ndarray) else v
                for k, v in batch.items()
            }

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
