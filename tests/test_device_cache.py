"""Device-resident dataset cache (data/device_cache.py): batches must be
bit-identical to the streamed loader's — same shuffle keying, same content,
same tail handling — so enabling data.device_cache changes only where bytes
move (H2D per epoch -> one upfront upload), never the training trajectory."""

from __future__ import annotations

import numpy as np
import pytest

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.data.device_cache import DeviceCache, DeviceCachedLoader
from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.data.synthetic import SyntheticDataset


class _U8(SyntheticDataset):
    """Synthetic pairs quantized to uint8 (the uint8_feed host format)."""

    def __getitem__(self, i):
        x, y = super().__getitem__(i)
        return (x * 255).astype(np.uint8), (y * 255).astype(np.uint8)


def test_batches_match_streamed_loader_across_epochs():
    ds = _U8(n=10, image_size=(16, 16), seed=0)
    cache = DeviceCache(ds)
    kw = dict(batch_size=4, shuffle=True, seed=3, drop_remainder=True)
    dev = DeviceCachedLoader(cache, **kw)
    host = DataLoader(ds, num_workers=1, **kw)
    assert len(dev) == len(host) == 2
    for _ in range(2):  # shuffle must advance identically epoch to epoch
        for (dx, dy), (hx, hy) in zip(dev, host):
            np.testing.assert_array_equal(np.asarray(dx), hx)
            np.testing.assert_array_equal(np.asarray(dy), hy)


def test_tail_batch_kept_without_drop_remainder():
    ds = _U8(n=10, image_size=(16, 16), seed=0)
    loader = DeviceCachedLoader(DeviceCache(ds), batch_size=4, drop_remainder=False)
    sizes = [np.asarray(x).shape[0] for x, _ in loader]
    assert sizes == [4, 4, 2]


def test_memory_guard():
    ds = _U8(n=10, image_size=(16, 16), seed=0)
    with pytest.raises(ValueError, match="device_cache"):
        DeviceCache(ds, max_gb=1e-9).arrays()


def test_device_cache_composes_with_augment_chain(synthetic_tree, tmp_path):
    """device_cache + add_canny_edge: cached uint8 batches flow through the
    device augment chain (4-channel input) and train."""
    from eelunet_tpu.cli.common import build_loaders
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(
        TrainConfig(),
        ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
         f"data.data_dir={synthetic_tree}", "seed=0", "epochs=1",
         f"save_dir={tmp_path}/ck", f"log_dir={tmp_path}/runs",
         "snapshot_every=100", "data.device_cache=true",
         "data.add_canny_edge=true"],
    )
    tr, va, te = build_loaders(cfg)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    assert trainer.cfg.model.in_channels == 4
    _, history = trainer.fit(tr, va, te, log=lambda *a: None)
    assert np.isfinite(history["train_loss"][0])


def test_build_loaders_device_cache_and_trajectory(synthetic_tree, tmp_path):
    """data.device_cache=true trains to the same loss trajectory as the
    streamed uint8 feed (same seed, same batches)."""
    from eelunet_tpu.cli.common import build_loaders
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    def run(device_cache):
        cfg = apply_overrides(
            TrainConfig(),
            ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
             f"data.data_dir={synthetic_tree}", "seed=0", "epochs=2",
             f"save_dir={tmp_path}/ck_{device_cache}",
             f"log_dir={tmp_path}/runs_{device_cache}",
             "snapshot_every=100", "data.num_workers=1",
             f"data.device_cache={'true' if device_cache else 'false'}"],
        )
        tr, va, te = build_loaders(cfg)
        trainer = Trainer(cfg, mesh=create_mesh(1, 1))
        _, history = trainer.fit(tr, va, te, log=lambda *a: None)
        return history

    h_dev = run(True)
    h_host = run(False)
    np.testing.assert_allclose(h_dev["train_loss"], h_host["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(h_dev["val_loss"], h_host["val_loss"], rtol=1e-6)
