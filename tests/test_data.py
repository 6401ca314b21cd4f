"""Data pipeline tests: folder dataset, split, loader, prefetch, augment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eelunet_tpu.data.dataset import SegmentationFolderDataset, train_val_split
from eelunet_tpu.data.pipeline import DataLoader, prefetch_to_device
from eelunet_tpu.data.synthetic import SyntheticDataset


def test_folder_dataset_layout(synthetic_tree):
    ds = SegmentationFolderDataset(synthetic_tree, split="train", image_size=(64, 64))
    assert len(ds) == 8
    x, y = ds[0]
    assert x.shape == (64, 64, 3) and x.dtype == np.float32
    assert y.shape == (64, 64, 1)
    assert 0.0 <= y.min() and y.max() <= 1.0
    # image is ImageNet-normalized: mean well below raw [0,1] range
    assert x.min() < 0.0


def test_folder_dataset_resize(synthetic_tree):
    ds = SegmentationFolderDataset(synthetic_tree, split="test", image_size=(32, 48))
    x, y = ds[0]
    assert x.shape == (32, 48, 3)
    assert y.shape == (32, 48, 1)


def test_train_val_split_disjoint():
    tr, va = train_val_split(100, 0.1, seed=3)
    assert len(tr) == 90 and len(va) == 10
    assert len(np.intersect1d(tr, va)) == 0
    tr2, _ = train_val_split(100, 0.1, seed=3)
    np.testing.assert_array_equal(tr, tr2)  # deterministic


def test_loader_batching_and_shuffle():
    ds = SyntheticDataset(n=10, image_size=(16, 16))
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0, drop_remainder=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 16, 16, 3)
    assert batches[0][1].shape == (4, 16, 16, 1)
    # second epoch shuffles differently
    b2 = list(loader)
    assert not all(np.array_equal(a[0], b[0]) for a, b in zip(batches, b2))


def test_loader_no_drop_remainder():
    ds = SyntheticDataset(n=10, image_size=(8, 8))
    loader = DataLoader(ds, batch_size=4, drop_remainder=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1][0].shape[0] == 2


def test_prefetch_to_device_order():
    ds = SyntheticDataset(n=8, image_size=(8, 8))
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    host = [b[0][0, 0, 0, 0] for b in loader]
    dev = [np.asarray(b[0])[0, 0, 0, 0] for b in prefetch_to_device(loader, depth=2)]
    np.testing.assert_allclose(host, dev)


def test_augment_add_canny_edge():
    from eelunet_tpu.data.augment import add_canny_edge

    x = np.zeros((1, 32, 32, 3), np.float32)
    x[:, :, 16:, :] = 1.0
    out = np.asarray(add_canny_edge(jnp.array(x)))
    assert out.shape == (1, 32, 32, 4)
    assert out[..., 3].sum() > 0  # found the vertical edge
    np.testing.assert_allclose(out[..., :3], x)


def test_augment_canny_enhance():
    from eelunet_tpu.data.augment import canny_enhance

    x = np.zeros((1, 32, 32, 3), np.float32)
    x[:, :, 16:, :] = 0.5
    out = np.asarray(canny_enhance(jnp.array(x), alpha=0.3))
    assert out.shape == x.shape
    assert out.max() <= 1.0 and out.min() >= 0.0
    assert out.sum() > x.sum()  # edges brightened
