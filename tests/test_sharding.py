"""Multi-device sharding tests on the 8-device virtual CPU mesh:
data-parallel training equivalence, tensor-parallel layouts, and the
mesh helpers (SURVEY.md §2.8 TPU-native plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.data.synthetic import SyntheticDataset
from eelunet_tpu.parallel.mesh import batch_sharding, create_mesh, param_shardings
from eelunet_tpu.train.trainer import Trainer


def test_virtual_devices_present():
    assert jax.device_count() == 8


def test_create_mesh_shapes():
    m = create_mesh(-1, 1)
    assert m.shape == {"data": 8, "model": 1, "spatial": 1}
    m2 = create_mesh(-1, 2)
    assert m2.shape == {"data": 4, "model": 2, "spatial": 1}
    m3 = create_mesh(-1, 2, 2)
    assert m3.shape == {"data": 2, "model": 2, "spatial": 2}
    with pytest.raises(ValueError):
        create_mesh(-1, 3)


def test_param_shardings_tp_rule():
    mesh = create_mesh(-1, 2)
    params = {
        "big_kernel": jnp.zeros((3, 3, 256, 1024)),
        "small_kernel": jnp.zeros((3, 3, 16, 32)),
        "bias": jnp.zeros((1024,)),
    }
    sh = param_shardings(params, mesh)
    assert sh["big_kernel"].spec == P(None, None, None, "model")
    assert sh["small_kernel"].spec == P()
    assert sh["bias"].spec == P()


def _loaders(bs):
    tr = SyntheticDataset(n=16, image_size=(32, 32), seed=0)
    te = SyntheticDataset(n=8, image_size=(32, 32), seed=1)
    return (
        DataLoader(tr, batch_size=bs, shuffle=True, seed=0),
        DataLoader(te, batch_size=bs),
        DataLoader(te, batch_size=bs),
    )


def _cfg(tmp_path, overrides=()):
    cfg = TrainConfig()
    return apply_overrides(
        cfg,
        [
            "model.name=unet",
            "data.image_size=[32,32]",
            "data.batch_size=8",
            "epochs=1",
            "seed=0",
            f"save_dir={tmp_path}/ckpt",
            f"log_dir={tmp_path}/runs",
            "snapshot_every=100",
            *overrides,
        ],
    )


def test_dp_training_matches_single_device(tmp_path):
    """A data-parallel step over 8 devices computes the same loss trajectory
    as single-device (same global batch): pjit's grad psum == one big batch."""
    histories = []
    for mesh in (create_mesh(1, 1, devices=jax.devices()[:1]), create_mesh(-1, 1)):
        trainer = Trainer(_cfg(tmp_path), mesh=mesh)
        tr, va, te = _loaders(bs=8)
        _, history = trainer.fit(tr, va, te, log=lambda *a: None)
        histories.append(history["train_loss"])
    np.testing.assert_allclose(histories[0], histories[1], rtol=2e-4)


def test_tp_training_matches_single_device(tmp_path):
    """Tensor parallelism held to the same bar as DP/SP: eelunet with its
    1024-wide bottleneck kernels ACTUALLY sharded over 'model' must produce
    the same loss trajectory as the unsharded model — XLA's partitioned
    matmuls + inserted collectives are numerically the same computation."""
    histories = []
    states = []
    for mesh in (create_mesh(1, 1, devices=jax.devices()[:1]), create_mesh(-1, 2)):
        cfg = _cfg(tmp_path, overrides=["model.name=eelunet"])
        trainer = Trainer(cfg, mesh=mesh)
        tr = DataLoader(SyntheticDataset(n=8, image_size=(32, 32), seed=0), batch_size=8)
        te = DataLoader(SyntheticDataset(n=8, image_size=(32, 32), seed=1), batch_size=8)
        state, history = trainer.fit(tr, te, te, log=lambda *a: None)
        histories.append(history["train_loss"])
        states.append(state)
    np.testing.assert_allclose(histories[0], histories[1], rtol=2e-4)
    # the wide kernels really are tensor-sharded, not replicated
    k = states[1].params["bottleneck_conv"]["Conv_0"]["kernel"]
    assert "model" in str(k.sharding.spec)
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 2


def test_eval_with_ragged_tail_batch(tmp_path):
    """Eval loaders never drop samples; a tail batch that doesn't divide the
    data axis must fall back to replicated placement with exact metrics."""
    ds = SyntheticDataset(n=6, image_size=(32, 32), seed=1)  # 6 % 8 != 0
    loader = DataLoader(ds, batch_size=6, drop_remainder=False)

    metrics = []
    for mesh in (create_mesh(1, 1, devices=jax.devices()[:1]), create_mesh(-1, 1)):
        trainer = Trainer(_cfg(tmp_path), mesh=mesh)
        state = trainer.init_state()
        metrics.append(trainer.evaluate(state, loader))
    for k in metrics[0]:
        assert metrics[0][k] == pytest.approx(metrics[1][k], rel=1e-5)


def test_batch_sharding_layout():
    mesh = create_mesh(-1, 1)
    x = np.zeros((8, 4, 4, 3), np.float32)
    sharded = jax.device_put(x, batch_sharding(mesh))
    assert sharded.sharding.spec == P("data", None, None, None)
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (1, 4, 4, 3)


def test_batch_sharding_spatial_layout():
    mesh = create_mesh(2, 1, 4)
    x = np.zeros((4, 32, 8, 3), np.float32)
    sharded = jax.device_put(x, batch_sharding(mesh))
    assert sharded.sharding.spec == P("data", "spatial", None, None)
    assert sharded.addressable_shards[0].data.shape == (2, 8, 8, 3)


def test_spatial_training_matches_single_device(tmp_path):
    """H-sharded (spatial-parallel) training: XLA partitions convs (halo
    exchange), BN/global pools (psum) and the loss pyramid automatically —
    trajectory must match unsharded training. Composes with data parallel on
    a 2x1x4 mesh."""
    histories = []
    for mesh in (
        create_mesh(1, 1, devices=jax.devices()[:1]),
        create_mesh(2, 1, 4),
    ):
        trainer = Trainer(_cfg(tmp_path), mesh=mesh)
        tr, va, te = _loaders(bs=8)
        _, history = trainer.fit(tr, va, te, log=lambda *a: None)
        histories.append(history["train_loss"])
    np.testing.assert_allclose(histories[0], histories[1], rtol=2e-4)


def test_trainer_highpass_policy(tmp_path, monkeypatch):
    """Constructor policy: spatial meshes pin lowrank; multi-device TPU
    meshes select the sharded kernels for bf16 models ONLY (f32 keeps the
    lowrank path whose matmuls pin Precision.HIGHEST); CPU keeps 'auto'."""
    ee = ["model.name=eelunet"]

    # multi-device CPU: no clone — "auto" resolves to lowrank at dispatch
    tr = Trainer(_cfg(tmp_path, overrides=ee), mesh=create_mesh(-1, 1))
    assert tr.model.highpass_impl == "auto"

    # pretend we're on TPU: bf16 -> pallas_sharded, f32 -> stays auto
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    tr_bf16 = Trainer(
        _cfg(tmp_path, overrides=ee + ["model.dtype=bfloat16"]), mesh=create_mesh(-1, 1)
    )
    assert tr_bf16.model.highpass_impl == "pallas_sharded"
    tr_f32 = Trainer(_cfg(tmp_path, overrides=ee), mesh=create_mesh(-1, 1))
    assert tr_f32.model.highpass_impl == "auto"
    # single device: no clone even on TPU (plain pallas via dispatch)
    tr_one = Trainer(
        _cfg(tmp_path, overrides=ee + ["model.dtype=bfloat16"]),
        mesh=create_mesh(1, 1, devices=jax.devices()[:1]),
    )
    assert tr_one.model.highpass_impl == "auto"


def test_spatial_training_eelunet_runs(tmp_path):
    """EELUnet under spatial sharding: exercises the FFT high-pass (pinned to
    the XLA low-rank path by the trainer), token-MLPs and SE global pools
    across H-shards; one epoch, finite loss."""
    cfg = _cfg(tmp_path, overrides=["model.name=eelunet", "mesh.spatial_axis=8"])
    trainer = Trainer(cfg, mesh=create_mesh(1, 1, 8))
    assert trainer.model.highpass_impl == "lowrank"
    tr, va, te = _loaders(bs=8)
    _, history = trainer.fit(tr, va, te, log=lambda *a: None)
    assert np.isfinite(history["train_loss"]).all()
