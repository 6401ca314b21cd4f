"""Config round-trip + override tests."""

import pytest

from eelunet_tpu.config import (
    TrainConfig,
    apply_overrides,
    config_from_json,
    config_to_json,
)


def test_json_roundtrip():
    cfg = TrainConfig()
    cfg2 = config_from_json(config_to_json(cfg))
    assert cfg == cfg2


def test_overrides_nested():
    cfg = apply_overrides(
        TrainConfig(),
        ["model.name=unet", "optimizer.lr=0.01", "data.image_size=[128,128]", "epochs=3"],
    )
    assert cfg.model.name == "unet"
    assert cfg.optimizer.lr == 0.01
    assert cfg.data.image_size == (128, 128)
    assert cfg.epochs == 3
    # untouched fields keep defaults
    assert cfg.optimizer.lr_step_size == 30


def test_override_scalar_image_size():
    # A bare int (--set data.image_size=64) means square size; consumers
    # (SegmentationFolderDataset and friends) require an (H, W) tuple.
    cfg = apply_overrides(TrainConfig(), ["data.image_size=64"])
    assert cfg.data.image_size == (64, 64)
    assert config_from_json(config_to_json(cfg)).data.image_size == (64, 64)


def test_override_string_values():
    cfg = apply_overrides(TrainConfig(), ["loss.name=edge_bce_dice", "save_dir=/tmp/x"])
    assert cfg.loss.name == "edge_bce_dice"
    assert cfg.save_dir == "/tmp/x"


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        apply_overrides(TrainConfig(), ["nope.nope=1"])


def test_bad_override_format():
    with pytest.raises(ValueError):
        apply_overrides(TrainConfig(), ["justakey"])


def test_reference_defaults():
    """Defaults mirror the reference's effective hyperparameters (SURVEY §5)."""
    cfg = TrainConfig()
    assert cfg.data.batch_size == 8            # train.py:227
    assert cfg.data.image_size == (256, 256)   # train.py:250
    assert cfg.optimizer.lr == 1e-4            # train.py:228
    assert cfg.optimizer.weight_decay == 1e-5  # train.py:312
    assert cfg.optimizer.lr_step_size == 30    # train.py:315
    assert cfg.optimizer.lr_gamma == 0.5
    assert cfg.data.normalize_mean == (0.485, 0.456, 0.406)  # ToothDataset.py:60
    assert cfg.model.name == "eelunet"
    assert cfg.data.val_fraction == 0.1        # train.py:256-259


def test_model_name_alias_normalized():
    """Shell-friendly 'unetpp' resolves to the registry's 'unet++'."""
    assert apply_overrides(TrainConfig(), ["model.name=unetpp"]).model.name == "unet++"
    assert apply_overrides(TrainConfig(), ["model.name=unetplusplus"]).model.name == "unet++"
