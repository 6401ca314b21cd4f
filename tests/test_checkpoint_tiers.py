"""Two-tier checkpointing: weights-only best-metric tags vs full snapshots.

Best tags mirror the reference's ``torch.save(model.state_dict())``
(train.py:157-180): params + batch_stats only, hardlink-deduped when several
metrics peak in the same epoch. Full TrainState round-trips live only in
``epoch_N`` / ``last`` snapshots, which is what resume_from=auto targets —
restore() must refuse weights-only dirs with a clear error instead of a
shape mismatch deep in orbax."""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.data.synthetic import SyntheticDataset
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.train.checkpoint import is_weights_only
from eelunet_tpu.train.trainer import Trainer


def _cfg(tmp_path, epochs=1):
    return apply_overrides(
        TrainConfig(),
        ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
         "seed=0", f"save_dir={tmp_path}/ckpt", f"log_dir={tmp_path}/runs",
         f"epochs={epochs}", "snapshot_every=100", "optimizer.lr=0.003"],
    )


def test_weights_tags_are_weights_only_and_hardlink_deduped(tmp_path):
    trainer = Trainer(_cfg(tmp_path), mesh=create_mesh(1, 1))
    state = trainer.init_state()
    paths = trainer.ckpt.save_weights_tags(["best_dice", "best_iou", "best"], state)
    assert len(paths) == 3 and all(is_weights_only(p) for p in paths)

    # dedup: the copies' array files share inodes with the first save
    def data_inodes(root):
        return {
            os.path.relpath(os.path.join(dp, f), root): os.stat(os.path.join(dp, f)).st_ino
            for dp, _, fs in os.walk(root) for f in fs
            if f != "framework_meta.json"
        }

    first, second = data_inodes(paths[0]), data_inodes(paths[1])
    assert first.keys() == second.keys()
    assert all(first[k] == second[k] for k in first)

    # weights-only restore works; full-state restore refuses clearly
    template = trainer.init_state()
    restored = trainer.ckpt.restore_params(paths[0], template)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="weights-only"):
        trainer.ckpt.restore(paths[0], template)

    # resume-auto never picks a weights-only dir
    assert trainer.ckpt.latest_path() is None
    full = trainer.ckpt.save("epoch_1", state)
    assert trainer.ckpt.latest_path() == full


def test_fit_writes_best_tags_and_last_snapshot(tmp_path):
    cfg = _cfg(tmp_path, epochs=2)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    state, _ = trainer.fit(loader, loader, loader, log=lambda *a: None)

    root = os.path.join(cfg.save_dir, "unet")
    best = os.path.join(root, "unet_best")
    last = os.path.join(root, "unet_last")
    assert os.path.isdir(best) and is_weights_only(best)
    assert os.path.isdir(last) and not is_weights_only(last)

    # the final snapshot resumes exactly; the best tag loads weights
    template = Trainer(cfg, mesh=create_mesh(1, 1)).init_state(steps_per_epoch=2)
    resumed = trainer.ckpt.restore(last, template)
    assert int(resumed.step) == int(state.step)
    trainer.ckpt.restore_params(best, template)  # must not raise


def test_fit_skips_last_when_final_epoch_snapshotted(tmp_path):
    """If the final epoch writes its periodic epoch_N snapshot, `last` would
    be an identical full save — fit skips it and resume-auto finds epoch_N."""
    cfg = _cfg(tmp_path, epochs=2)
    cfg.snapshot_every = 2
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    trainer.fit(loader, loader, loader, log=lambda *a: None)

    root = os.path.join(cfg.save_dir, "unet")
    assert not os.path.exists(os.path.join(root, "unet_last"))
    epoch2 = os.path.join(root, "unet_epoch_2")
    assert os.path.isdir(epoch2) and not is_weights_only(epoch2)
    assert trainer.ckpt.latest_path() == epoch2


def test_prune_snapshots_retention(tmp_path):
    """keep_snapshots bounds disk growth: only the newest N epoch_N FULL
    snapshots survive (by epoch number, incl. N>=10 vs N=9 ordering); best
    tags and `last` are never pruned; keep=0 = reference's unbounded policy."""
    trainer = Trainer(_cfg(tmp_path), mesh=create_mesh(1, 1))
    state = trainer.init_state()
    for n in (1, 2, 9, 10, 11):
        trainer.ckpt.save(f"epoch_{n}", state)
    trainer.ckpt.save_weights_tags(["best_dice"], state)
    trainer.ckpt.save("last", state)

    assert trainer.ckpt.prune_snapshots(0) == []          # keep-all
    doomed = trainer.ckpt.prune_snapshots(2)
    root = trainer.ckpt.root
    assert sorted(os.path.basename(p) for p in doomed) == [
        "unet_epoch_1", "unet_epoch_2", "unet_epoch_9"]
    kept = sorted(d for d in os.listdir(root))
    assert "unet_epoch_10" in kept and "unet_epoch_11" in kept
    assert "unet_best_dice" in kept and "unet_last" in kept
    # idempotent once under the bound
    assert trainer.ckpt.prune_snapshots(2) == []


def test_fit_honors_keep_snapshots(tmp_path):
    cfg = _cfg(tmp_path, epochs=3)
    cfg.snapshot_every = 1
    cfg.keep_snapshots = 1
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    trainer.fit(loader, loader, loader, log=lambda *a: None)
    root = os.path.join(cfg.save_dir, "unet")
    snaps = [d for d in os.listdir(root) if "_epoch_" in d]
    assert snaps == ["unet_epoch_3"]
    # resume-auto still finds the surviving snapshot
    assert trainer.ckpt.latest_path() == os.path.join(root, "unet_epoch_3")
