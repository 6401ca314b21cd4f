"""End-to-end wiring of the augmentation flags (DataConfig.add_canny_edge /
canny_enhance -> device-side augment chain). Reference call sites:
data/ToothDataset.py:52-55, augmentation/AddCannyEdge.py:8-41,
augmentation/CannyEnhance.py:7-44."""

from __future__ import annotations

import numpy as np
import pytest

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.data.augment import make_augment_fn, normalize_imagenet
from eelunet_tpu.data.dataset import SegmentationFolderDataset


def _cfg(tmp_path, tree, *ov):
    base = [
        "model.name=unet", "data.image_size=[64,64]", "data.batch_size=4",
        f"data.data_dir={tree}", f"save_dir={tmp_path / 'ckpts'}",
        f"log_dir={tmp_path / 'runs'}", "seed=0", "epochs=1",
        "snapshot_every=100", "data.num_workers=0",
    ]
    return apply_overrides(TrainConfig(), base + list(ov))


def test_dataset_normalize_flag(synthetic_tree):
    raw = SegmentationFolderDataset(synthetic_tree, "train", (64, 64), normalize=False)
    x, _ = raw[0]
    assert 0.0 <= x.min() and x.max() <= 1.0
    norm = SegmentationFolderDataset(synthetic_tree, "train", (64, 64))
    xn, _ = norm[0]
    assert xn.min() < -0.5  # ImageNet normalization pushes values negative


def test_make_augment_fn_off_is_none():
    cfg = TrainConfig()
    assert make_augment_fn(cfg.data) is None


def test_augment_chain_semantics(rng):
    cfg = apply_overrides(TrainConfig(), ["data.add_canny_edge=true", "data.canny_enhance=true"])
    fn = make_augment_fn(cfg.data)
    x = rng.random((2, 32, 32, 3), dtype=np.float32)
    out = np.asarray(fn(x))
    assert out.shape == (2, 32, 32, 4)
    # edge channel is a {0,1} map, unnormalized
    assert set(np.unique(out[..., 3])) <= {0.0, 1.0}

    # enhance-only: still 3 channels, equals normalize(enhanced raw)
    cfg2 = apply_overrides(TrainConfig(), ["data.canny_enhance=true"])
    out2 = np.asarray(make_augment_fn(cfg2.data)(x))
    assert out2.shape == (2, 32, 32, 3)
    from eelunet_tpu.data.augment import canny_enhance

    want = np.asarray(normalize_imagenet(canny_enhance(x, 0.2)))
    np.testing.assert_allclose(out2, want, atol=1e-6)


def test_flags_change_training_input(synthetic_tree, tmp_path):
    """The device batch the model sees must differ once a flag is on —
    round-1 regression: the flags were silently ignored."""
    from eelunet_tpu.cli.common import build_loaders
    from eelunet_tpu.train.trainer import Trainer

    cfg_off = _cfg(tmp_path, synthetic_tree)
    cfg_on = _cfg(tmp_path, synthetic_tree, "data.canny_enhance=true")
    tr_off, tr_on = Trainer(cfg_off), Trainer(cfg_on)
    loader_off = build_loaders(cfg_off)[2]
    loader_on = build_loaders(cfg_on)[2]
    b_off = next(iter(tr_off._device_batches(loader_off)))[0]
    b_on = next(iter(tr_on._device_batches(loader_on)))[0]
    assert b_off.shape == b_on.shape
    assert not np.allclose(np.asarray(b_off), np.asarray(b_on))


def test_train_e2e_with_add_canny_edge(synthetic_tree, tmp_path):
    """Full fit with add_canny_edge: in_channels auto-bumps to 4, training and
    the per-epoch evaluation run on 4-channel inputs."""
    import jax

    from eelunet_tpu.cli.common import build_loaders
    from eelunet_tpu.train.trainer import Trainer

    cfg = _cfg(tmp_path, synthetic_tree, "data.add_canny_edge=true",
               "data.canny_enhance=true", "optimizer.lr=0.003")
    trainer = Trainer(cfg)
    assert trainer.cfg.model.in_channels == 4
    state, history = trainer.fit(*build_loaders(cfg), log=lambda *a: None)
    # first conv consumed 4 input channels
    first = state.params["ConvBlock_0"]["TorchConv_0"]["Conv_0"]["kernel"]
    assert first.shape[-2] == 4
    assert np.isfinite(history["train_loss"][0])
    assert history["metrics"][0]["dice"] >= 0.0


def test_packed_plus_augment_rejected_on_float_path(tmp_path):
    """Only the float packed path serves normalized tensors; with uint8_feed
    (default) the memmaps are raw and the device augment chain applies."""
    from eelunet_tpu.cli.common import build_loaders

    cfg = _cfg(tmp_path, "/nonexistent", "data.packed=true",
               "data.add_canny_edge=true", "data.uint8_feed=false")
    with pytest.raises(ValueError, match="raw images"):
        build_loaders(cfg)
