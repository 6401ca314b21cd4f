"""Packed-dataset tests: pack -> serve parity with the folder dataset."""

import numpy as np
import pytest

from eelunet_tpu.data.dataset import SegmentationFolderDataset
from eelunet_tpu.data.packed import PackedDataset, pack_dataset


def test_pack_and_serve_matches_folder(synthetic_tree, tmp_path):
    out = str(tmp_path / "packed")
    pack_dataset(synthetic_tree, out, "train", (64, 64))
    pack_dataset(synthetic_tree, out, "test", (64, 64))

    folder = SegmentationFolderDataset(synthetic_tree, "train", (64, 64))
    packed = PackedDataset(out, "train")
    assert len(folder) == len(packed)
    for i in (0, len(folder) - 1):
        xf, yf = folder[i]
        xp, yp = packed[i]
        np.testing.assert_allclose(xp, xf, atol=1e-5)
        np.testing.assert_allclose(yp, yf, atol=1e-5)


def test_packed_resize(synthetic_tree, tmp_path):
    out = str(tmp_path / "packed32")
    pack_dataset(synthetic_tree, out, "test", (32, 32))
    ds = PackedDataset(out, "test")
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and y.shape == (32, 32, 1)


def test_packed_is_fast(synthetic_tree, tmp_path):
    """Serving from memmap must be much faster than decoding (sanity bound)."""
    import time

    out = str(tmp_path / "packed_speed")
    pack_dataset(synthetic_tree, out, "train", (64, 64))
    packed = PackedDataset(out, "train")
    packed[0]  # warm page cache
    t0 = time.perf_counter()
    for _ in range(50):
        for i in range(len(packed)):
            packed[i]
    dt = time.perf_counter() - t0
    per_sample = dt / (50 * len(packed))
    assert per_sample < 0.005, f"packed read too slow: {per_sample * 1000:.2f} ms/sample"
