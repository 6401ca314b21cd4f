"""Async checkpointing: fit's per-epoch saves overlap the next epoch's compute.

The measured per-epoch wall on the TPU tunnel is dominated by the
device->host fetch inside checkpoint saves (docs/PERF.md checkpoint-cost
entry). With ``async_checkpoint=true`` (default) fit snapshots the tree on
device (compiled copy — immune to train_step's buffer donation) and a worker
thread pays the fetch + orbax write in the background. These tests pin the
correctness contract: identical artifacts to the synchronous path, donation
safety, strict write ordering, and loud failure propagation."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.data.synthetic import SyntheticDataset
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.train.checkpoint import CheckpointManager
from eelunet_tpu.train.trainer import Trainer


def _cfg(tmp_path, sub, async_ckpt):
    return apply_overrides(
        TrainConfig(),
        ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
         "seed=0", f"save_dir={tmp_path}/{sub}/ckpt",
         f"log_dir={tmp_path}/{sub}/runs", "epochs=3", "snapshot_every=2",
         "optimizer.lr=0.003", f"async_checkpoint={json.dumps(async_ckpt)}"],
    )


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_async_fit_matches_sync_fit(tmp_path):
    """Same seed, async on vs off: identical loss history and bit-identical
    best/last checkpoints — async changes WHEN writes happen, never what."""
    results = {}
    for mode in (True, False):
        cfg = _cfg(tmp_path, f"async_{mode}", mode)
        trainer = Trainer(cfg, mesh=create_mesh(1, 1))
        ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
        state, history = trainer.fit(loader, loader, loader, log=lambda *a: None)
        root = os.path.join(cfg.save_dir, "unet")
        template = trainer.init_state(steps_per_epoch=2)
        best = trainer.ckpt.restore_params(os.path.join(root, "unet_best"), template)
        last = trainer.ckpt.restore(os.path.join(root, "unet_last"), template)
        with open(os.path.join(root, "best_meta.json")) as f:
            best_meta = json.load(f)
        results[mode] = (history, _leaves(best.params), _leaves(last.params),
                         _leaves(last.opt_state), best_meta)

    a, s = results[True], results[False]
    assert a[0]["train_loss"] == s[0]["train_loss"]
    assert a[0]["val_loss"] == s[0]["val_loss"]
    for x, y in zip(a[1], s[1]):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(a[2], s[2]):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(a[3], s[3]):
        np.testing.assert_array_equal(x, y)
    assert a[4] == s[4]  # best_meta.json (queued behind the tag saves)


def test_background_save_survives_donation(tmp_path):
    """The device snapshot must decouple the queued write from the live state:
    donating (and overwriting) the state buffers right after save() returns
    must not corrupt what lands on disk."""
    cfg = _cfg(tmp_path, "donate", True)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state = trainer.init_state()
    want = _leaves(state.params)

    path = trainer.ckpt.save("donation_test", state, background=True)
    # Donate + clobber the very buffers the queued save references.
    zeroed = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x * 0, p), donate_argnums=0
    )(state.params)
    jax.block_until_ready(zeroed)

    trainer.ckpt.wait()
    restored = trainer.ckpt.restore(path, trainer.init_state())
    got = _leaves(restored.params)
    assert any(np.any(w != 0) for w in want)  # the test would pass vacuously on zeros
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_write_ordering_and_failure_propagation(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "unet", async_writes=True)
    order = []
    mgr.run_after_saves(lambda: order.append(1))
    mgr.run_after_saves(lambda: order.append(2))
    mgr.wait()
    assert order == [1, 2]

    def boom():
        raise OSError("disk on fire")

    mgr.run_after_saves(boom)
    mgr.run_after_saves(lambda: order.append(3))  # skipped after a failure
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        mgr.wait()
    assert order == [1, 2]
    # the failure was consumed: the writer is usable again
    mgr.run_after_saves(lambda: order.append(4))
    mgr.wait()
    assert order == [1, 2, 4]


def test_sync_manager_runs_inline(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "unet", async_writes=False)
    order = []
    mgr.run_after_saves(lambda: order.append("now"))
    assert order == ["now"]
    mgr.wait()  # no-op


def test_direct_save_is_synchronous_even_with_writer(tmp_path):
    """Direct API calls (no background=) must be readable the moment they
    return — by ANY reader, not just this manager's wait()-aware methods."""
    cfg = _cfg(tmp_path, "direct", True)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state = trainer.init_state()
    path = trainer.ckpt.save("direct_test", state)
    # No wait(): the sidecar is written AFTER the orbax save completes, so its
    # presence proves the whole checkpoint is already on disk.
    assert os.path.exists(os.path.join(path, "framework_meta.json"))
