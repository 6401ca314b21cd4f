"""Synthetic segmentation data — test fixture and benchmark feed.

The reference has no test data strategy at all (SURVEY.md §4); this module
provides (a) an in-memory dataset of random soft blobs with exact masks, and
(b) a writer that materializes the same data as a ToothDataset-style
``{split}/{images,masks}`` PNG tree so the folder loader and CLI paths can be
exercised end-to-end.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def make_blob_sample(rng: np.random.Generator, h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """One (image, mask) pair: 1-3 ellipses on textured background."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mask = np.zeros((h, w), np.float32)
    for _ in range(rng.integers(1, 4)):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        ry, rx = rng.uniform(0.08, 0.3) * h, rng.uniform(0.08, 0.3) * w
        mask = np.maximum(mask, (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0).astype(np.float32))
    img = rng.normal(0.35, 0.1, (h, w, 3)).astype(np.float32)
    img += mask[..., None] * rng.uniform(0.25, 0.45)
    img = np.clip(img + rng.normal(0, 0.03, (h, w, 3)), 0, 1).astype(np.float32)
    return img, mask[..., None]


class SyntheticDataset:
    """In-memory indexable dataset matching SegmentationFolderDataset's contract."""

    def __init__(
        self,
        n: int = 8,
        image_size: Tuple[int, int] = (64, 64),
        seed: int = 0,
        normalize_mean: Sequence[float] = (0.485, 0.456, 0.406),
        normalize_std: Sequence[float] = (0.229, 0.224, 0.225),
    ):
        rng = np.random.default_rng(seed)
        h, w = image_size
        self.samples = []
        mean = np.asarray(normalize_mean, np.float32)
        std = np.asarray(normalize_std, np.float32)
        for _ in range(n):
            img, mask = make_blob_sample(rng, h, w)
            self.samples.append(((img - mean) / std, mask))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        return self.samples[idx]


def write_synthetic_tree(
    root: str,
    n_train: int = 8,
    n_test: int = 4,
    image_size: Tuple[int, int] = (64, 64),
    seed: int = 0,
) -> str:
    """Materialize a ToothDataset-style PNG tree for folder-loader/CLI tests."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    h, w = image_size
    for split, n in (("train", n_train), ("test", n_test)):
        img_dir = os.path.join(root, split, "images")
        mask_dir = os.path.join(root, split, "masks")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        for i in range(n):
            img, mask = make_blob_sample(rng, h, w)
            Image.fromarray((img * 255).astype(np.uint8)).save(os.path.join(img_dir, f"{i:04d}.png"))
            Image.fromarray((mask[..., 0] * 255).astype(np.uint8), mode="L").save(
                os.path.join(mask_dir, f"{i:04d}.png")
            )
    return root
