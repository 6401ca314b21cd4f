"""Whole-dataset device residency: batches become on-device gathers.

The 512^2 epoch breakdown (docs/PERF.md) shows the axon tunnel's
host->device bandwidth (~9 MB/s effective) as the training wall even after
the uint8 feed: 6.5 s of H2D overhead against 2.15 s of compute per epoch.
Segmentation datasets at reference scale are small — the tooth set is
~1.2 GB as uint8 at 512^2 — so the TPU-idiomatic fix is to upload the whole
dataset to HBM once and index it on device: per-epoch H2D drops to the batch
indices (a few hundred bytes). The reference streams from a synchronous
DataLoader every epoch (train.py:261-265); there is no equivalent.

Opt-in via ``DataConfig.device_cache`` (single-host only; multi-host feeds
stay per-process slices through the threaded loader).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np


class DeviceCache:
    """Lazily uploads an indexable (image, mask) dataset as two device
    arrays (one decode pass + one transfer, amortized over all epochs)."""

    def __init__(self, dataset, max_gb: float = 4.0):
        self.dataset = dataset
        self.max_gb = float(max_gb)
        self._arrays = None

    def arrays(self):
        if self._arrays is None:
            import jax

            n = len(self.dataset)
            if n == 0:
                raise ValueError("cannot device-cache an empty dataset")
            x0, y0 = self.dataset[0]
            bytes_est = n * (np.asarray(x0).nbytes + np.asarray(y0).nbytes)
            if bytes_est > self.max_gb * 1e9:
                raise ValueError(
                    f"device_cache: dataset is ~{bytes_est / 1e9:.2f} GB "
                    f"(> data.device_cache_max_gb={self.max_gb}); disable "
                    "data.device_cache or raise the limit"
                )
            xs = np.empty((n, *x0.shape), x0.dtype)
            ys = np.empty((n, *y0.shape), y0.dtype)
            xs[0], ys[0] = x0, y0
            for i in range(1, n):
                xs[i], ys[i] = self.dataset[i]
            self._arrays = (jax.device_put(xs), jax.device_put(ys))
        return self._arrays


class DeviceCachedLoader:
    """Drop-in for data.pipeline.DataLoader over a DeviceCache: identical
    length/shuffle semantics (seed+epoch-keyed permutation), but batches are
    device-side gathers instead of host stacks + H2D transfers."""

    def __init__(
        self,
        cache: DeviceCache,
        batch_size: int = 8,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = True,
        indices: Optional[np.ndarray] = None,
    ):
        self.cache = cache
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(cache.dataset))
        )
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle key for the next pass (same contract as
        data.pipeline.DataLoader.set_epoch — exact-resume batch order)."""
        self._epoch = int(epoch)

    def __iter__(self) -> Iterator[Tuple[object, object]]:
        import jax.numpy as jnp

        images, masks = self.cache.arrays()
        order = self.indices
        if self.shuffle:
            # Same keying as DataLoader.__iter__: trajectories match the
            # streamed path batch-for-batch (tests/test_device_cache.py).
            rng = np.random.default_rng(self.seed + self._epoch)
            order = rng.permutation(order)
        self._epoch += 1
        nb = len(self)
        end = nb * self.batch_size if self.drop_remainder else len(order)
        for b in range(nb):
            idx = jnp.asarray(order[b * self.batch_size : min((b + 1) * self.batch_size, end)])
            yield jnp.take(images, idx, axis=0), jnp.take(masks, idx, axis=0)
