"""uint8 device feed (DataConfig.uint8_feed): the host ships raw uint8
batches and the jitted preprocess computes u8/255 -> (x-mean)/std on device.
Must match the host-side float path (data/dataset.py:75-78) to f32 rounding
(XLA fuses scale+normalize into fma form: <=1e-6 abs) — the flag is a pure
transfer-bandwidth optimization (4x fewer H2D bytes
through the axon tunnel, docs/PERF.md epoch breakdown)."""

from __future__ import annotations

import numpy as np

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.data.augment import make_input_preprocess
from eelunet_tpu.data.dataset import SegmentationFolderDataset


def _cfg(*ov):
    return apply_overrides(TrainConfig(), list(ov))


def test_uint8_preprocess_matches_host_float(synthetic_tree):
    f = SegmentationFolderDataset(synthetic_tree, "train", (64, 64))
    u = SegmentationFolderDataset(synthetic_tree, "train", (64, 64), as_uint8=True)
    pre, has_aug = make_input_preprocess(_cfg().data)
    assert not has_aug
    for i in range(3):
        xf, yf = f[i]
        xu, yu = u[i]
        assert xu.dtype == np.uint8 and yu.dtype == np.uint8
        xd, yd = pre(xu[None], yu[None])
        np.testing.assert_allclose(np.asarray(xd)[0], xf, atol=1e-6, rtol=0)
        np.testing.assert_allclose(np.asarray(yd)[0], yf, atol=1e-6, rtol=0)


def test_uint8_preprocess_matches_raw_float_augment(synthetic_tree):
    cfg = _cfg("data.add_canny_edge=true", "data.canny_enhance=true")
    pre, has_aug = make_input_preprocess(cfg.data)
    assert has_aug
    raw = SegmentationFolderDataset(synthetic_tree, "train", (64, 64), normalize=False)
    u8 = SegmentationFolderDataset(synthetic_tree, "train", (64, 64), as_uint8=True)
    xr, yr = raw[0]
    xu, yu = u8[0]
    a, la = pre(xr[None], yr[None])       # raw-float path (pre-uint8-feed)
    b, lb = pre(xu[None], yu[None])       # uint8 path
    assert a.shape[-1] == 4               # edge channel appended
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6, rtol=0)


def test_preprocess_identity_for_normalized_float(synthetic_tree):
    ds = SegmentationFolderDataset(synthetic_tree, "train", (64, 64))
    pre, _ = make_input_preprocess(_cfg().data)
    x, y = ds[0]
    xd, yd = pre(x[None], y[None])
    np.testing.assert_array_equal(np.asarray(xd)[0], x)
    np.testing.assert_array_equal(np.asarray(yd)[0], y)


def test_packed_uint8_serves_raw_and_supports_augment(synthetic_tree, tmp_path):
    from eelunet_tpu.cli.common import build_loaders
    from eelunet_tpu.data.packed import pack_dataset

    out = str(tmp_path / "packed")
    pack_dataset(synthetic_tree, out, "train", (64, 64))
    pack_dataset(synthetic_tree, out, "test", (64, 64))

    cfg = _cfg(f"data.data_dir={out}", "data.packed=true", "data.batch_size=4",
               "data.image_size=[64,64]", "data.canny_enhance=true",
               "data.num_workers=0", "seed=0")
    train_loader, _, _ = build_loaders(cfg)
    xs, ys = next(iter(train_loader))
    assert xs.dtype == np.uint8 and ys.dtype == np.uint8
    pre, _ = make_input_preprocess(cfg.data)
    xd, yd = pre(xs, ys)
    # normalized RGB output (mean subtraction pushes values negative)
    assert float(np.asarray(xd).min()) < -0.5
    assert 0.0 <= float(np.asarray(yd).min()) <= float(np.asarray(yd).max()) <= 1.0


def test_trainer_batches_uint8_vs_float_identical(synthetic_tree, tmp_path):
    """The device batch the train step sees matches to f32 rounding."""
    from eelunet_tpu.cli.common import build_loaders
    from eelunet_tpu.train.trainer import Trainer

    base = [
        "model.name=unet", "data.image_size=[64,64]", "data.batch_size=4",
        f"data.data_dir={synthetic_tree}", f"save_dir={tmp_path / 'ck'}",
        "seed=0", "data.num_workers=0",
    ]
    cfg_u8 = apply_overrides(TrainConfig(), base + ["data.uint8_feed=true"])
    cfg_f = apply_overrides(TrainConfig(), base + ["data.uint8_feed=false"])
    b_u8 = next(iter(Trainer(cfg_u8)._device_batches(build_loaders(cfg_u8)[2])))
    b_f = next(iter(Trainer(cfg_f)._device_batches(build_loaders(cfg_f)[2])))
    np.testing.assert_allclose(np.asarray(b_u8[0]), np.asarray(b_f[0]), atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(b_u8[1]), np.asarray(b_f[1]), atol=1e-6, rtol=0)
