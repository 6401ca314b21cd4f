"""EMA weight averaging (optimizer.ema_decay — beyond-reference).

Contracts: the EMA tracks params exactly per e' = d*e + (1-d)*p after each
optimizer step; fit emits a weights-only '{name}_ema' tag loadable by the
standard weights-restore path; full snapshots round-trip the EMA for exact
resume; and pre-EMA checkpoints restore into an EMA-enabled run by seeding
the average from the restored params (with a warning), never crashing.
"""

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


def _cfg(tmp_path, **over):
    ov = ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
          "seed=0", f"save_dir={tmp_path}/ckpt", f"log_dir={tmp_path}/runs",
          "epochs=1", "snapshot_every=100", "data.num_workers=0",
          "donate_buffers=false"]
    ov += [f"{k}={v}" for k, v in over.items()]
    return apply_overrides(TrainConfig(), ov)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_ema_update_math(tmp_path):
    d = 0.9
    trainer = Trainer(_cfg(tmp_path, **{"optimizer.ema_decay": d}), mesh=create_mesh(1, 1))
    state = trainer.init_state()
    assert state.ema_params is not None
    for a, b in zip(_leaves(state.ema_params), _leaves(state.params)):
        np.testing.assert_array_equal(a, b)  # EMA starts at the init params

    step = trainer._get_step("train", state)
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    yb = (rng.uniform(size=(4, 32, 32, 1)) > 0.5).astype(np.float32)

    p0 = _leaves(state.params)
    s1, _, _ = step(state, xb, yb)
    for e1, p1, e0 in zip(_leaves(s1.ema_params), _leaves(s1.params), p0):
        np.testing.assert_allclose(e1, d * e0 + (1 - d) * p1, rtol=2e-6, atol=1e-7)
    s2, _, _ = step(s1, xb, yb)
    for e2, p2, e1 in zip(_leaves(s2.ema_params), _leaves(s2.params),
                          _leaves(s1.ema_params)):
        np.testing.assert_allclose(e2, d * e1 + (1 - d) * p2, rtol=2e-6, atol=1e-7)


def test_fit_saves_ema_tag_and_snapshot_roundtrip(tmp_path):
    cfg = _cfg(tmp_path, epochs=2, **{"optimizer.ema_decay": "0.9"})
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    state, _ = trainer.fit(loader, loader, loader, log=lambda *a: None)

    root = os.path.join(cfg.save_dir, "unet")
    ema_tag = os.path.join(root, "unet_ema")
    assert os.path.isdir(ema_tag) and is_weights_only(ema_tag)

    # the tag's params ARE the final EMA (not the last iterate)
    template = Trainer(cfg, mesh=create_mesh(1, 1)).init_state(steps_per_epoch=2)
    loaded = trainer.ckpt.restore_params(ema_tag, template)
    for a, b in zip(_leaves(loaded.params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)
    # EMA after training differs from the last iterate
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(_leaves(state.ema_params), _leaves(state.params))
    )

    # full snapshot round-trips the EMA exactly (exact resume)
    last = os.path.join(root, "unet_last")
    resumed = trainer.ckpt.restore(last, template)
    for a, b in zip(_leaves(resumed.ema_params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)


def test_pre_ema_checkpoint_restores_with_warning(tmp_path):
    # save WITHOUT ema, restore into an ema-enabled template
    t0 = Trainer(_cfg(tmp_path), mesh=create_mesh(1, 1))
    s0 = t0.init_state()
    path = t0.ckpt.save("epoch_1", s0)

    t1 = Trainer(_cfg(tmp_path, **{"optimizer.ema_decay": "0.99"}), mesh=create_mesh(1, 1))
    s1 = t1.init_state()
    with pytest.warns(UserWarning, match="predates optimizer.ema_decay"):
        restored = t1.ckpt.restore(path, s1)
    for a, b in zip(_leaves(restored.ema_params), _leaves(s0.params)):
        np.testing.assert_array_equal(a, b)

    # and the reverse: ema checkpoint into an ema-off template drops the EMA
    path2 = t1.ckpt.save("epoch_2", restored)
    with pytest.warns(UserWarning, match="dropping"):
        plain = t0.ckpt.restore(path2, t0.init_state())
    assert plain.ema_params is None
