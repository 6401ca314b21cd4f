"""Threaded host input pipeline with double-buffered device prefetch.

The reference feeds the GPU from a synchronous single-process DataLoader
(train.py:261-265) — PIL decode blocks the training step. Here:

- a thread pool decodes/transforms samples concurrently with device compute;
- batches are assembled into pinned numpy arrays with static shapes
  (drop_remainder) so every step hits the same compiled executable;
- ``prefetch_to_device`` keeps ``depth`` batches in flight on the accelerator
  (``jax.device_put`` is async), optionally laying each batch out with a
  ``NamedSharding`` so a data-parallel mesh reads its shards directly.

This is where most of the throughput-vs-reference win outside the model
compute comes from.
"""

from __future__ import annotations

import collections
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np


class DataLoader:
    """Minimal batched loader over an indexable dataset of (image, mask) pairs."""

    def __init__(
        self,
        dataset,
        batch_size: int = 8,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = True,
        num_workers: int = 4,
        indices: Optional[np.ndarray] = None,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.num_workers = max(1, num_workers)
        self.indices = np.asarray(indices if indices is not None else np.arange(len(dataset)))
        self._epoch = 0
        # Multi-host data feed: process_shard=(pid, pcount) makes this loader
        # yield only this process's contiguous slice of every global batch —
        # rows [pid*B/pc, (pid+1)*B/pc). All processes iterate the SAME global
        # index order (seed+epoch-keyed shuffle), so slices are disjoint and
        # exhaustive; jax.make_array_from_process_local_data reassembles the
        # global batch on the mesh (parallel/distributed.assemble_global_batch).
        # Requires drop_remainder (static local shapes; no ambiguous tails).
        if process_shard is not None:
            pid, pc = process_shard
            if not (0 <= pid < pc):
                raise ValueError(f"process_shard index {pid} out of range for {pc}")
            if pc > 1:
                if not drop_remainder:
                    raise ValueError("process_shard requires drop_remainder=True")
                if batch_size % pc:
                    raise ValueError(f"batch_size {batch_size} not divisible by {pc} processes")
            else:
                process_shard = None
        self.process_shard = process_shard

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle key for the NEXT iteration pass to ``epoch``.

        The shuffle is keyed by ``seed + epoch`` (not by Python iteration
        count alone), so a resumed run that calls ``set_epoch(k)`` replays
        the exact batch order the uninterrupted run used at epoch ``k`` —
        Trainer.fit does this every epoch (exact-resume contract,
        tests/test_train_e2e.py::test_resume_exact_continuation)."""
        self._epoch = int(epoch)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            order = rng.permutation(order)
        self._epoch += 1

        nb = len(self)
        if nb == 0:
            return

        def fetch(i):
            return self.dataset[int(i)]

        if self.process_shard is not None:
            # Keep only this process's slice of each global batch; only those
            # rows are ever decoded.
            pid, pc = self.process_shard
            k = self.batch_size // pc
            order = np.concatenate([
                order[b * self.batch_size + pid * k : b * self.batch_size + (pid + 1) * k]
                for b in range(nb)
            ]) if nb else order[:0]
            local_bs = k
        else:
            local_bs = self.batch_size

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # Submit everything; batches complete roughly in order.
            futures = [pool.submit(fetch, i) for i in order[: nb * local_bs if self.drop_remainder else None]]
            for b in range(nb):
                chunk = futures[b * local_bs : (b + 1) * local_bs]
                samples = [f.result() for f in chunk]
                xs = np.stack([s[0] for s in samples])
                ys = np.stack([s[1] for s in samples])
                yield xs, ys


def prefetch_to_device(iterator, depth: int = 2, sharding=None):
    """Keep ``depth`` batches resident on device ahead of the consumer.

    ``jax.device_put`` returns immediately (async dispatch); holding a small
    deque of in-flight batches overlaps H2D DMA with the previous step's
    compute — the double-buffered feed from the build plan (SURVEY.md §7).
    """
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass

    while queue:
        batch = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
