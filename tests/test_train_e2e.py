"""End-to-end training smoke: a few steps must run, reduce loss, checkpoint,
and resume — on CPU with tiny shapes (SURVEY.md §4 test plan)."""

import os

import numpy as np
import jax
import pytest

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.data.synthetic import SyntheticDataset
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.train.trainer import Trainer


def _tiny_cfg(tmp_path, model="unet", epochs=2):
    cfg = TrainConfig()
    cfg = apply_overrides(
        cfg,
        [
            f"model.name={model}",
            "data.image_size=[32,32]",
            "data.batch_size=4",
            f"epochs={epochs}",
            "seed=0",
            f"save_dir={tmp_path}/ckpt",
            f"log_dir={tmp_path}/runs",
            "snapshot_every=100",
            "optimizer.lr=0.003",
        ],
    )
    return cfg


def _loaders(n=8, hw=32, bs=4):
    tr = SyntheticDataset(n=n, image_size=(hw, hw), seed=0)
    te = SyntheticDataset(n=4, image_size=(hw, hw), seed=1)
    return (
        DataLoader(tr, batch_size=bs, shuffle=True, seed=0),
        DataLoader(te, batch_size=bs),
        DataLoader(te, batch_size=bs),
    )


@pytest.mark.parametrize("model", ["unet", "eelunet"])
def test_train_reduces_loss(tmp_path, model):
    cfg = _tiny_cfg(tmp_path, model=model, epochs=3)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    tr, va, te = _loaders()
    state, history = trainer.fit(tr, va, te, log=lambda *a: None)
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert all(np.isfinite(history["train_loss"]))
    # best checkpoint written
    assert os.path.exists(os.path.join(cfg.save_dir, model, f"{model}_best"))
    assert os.path.exists(os.path.join(cfg.save_dir, model, "loss_history.json"))


def test_metrics_reported(tmp_path):
    cfg = _tiny_cfg(tmp_path, epochs=1)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    tr, va, te = _loaders()
    state, history = trainer.fit(tr, va, te, log=lambda *a: None)
    m = history["metrics"][-1]
    for k in ("iou", "dice", "miou", "mdice", "boundary_f1", "pixel_accuracy"):
        assert k in m and 0.0 <= m[k] <= 1.0


def test_checkpoint_resume(tmp_path):
    cfg = _tiny_cfg(tmp_path, epochs=1)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    tr, va, te = _loaders()
    state, _ = trainer.fit(tr, va, te, log=lambda *a: None)
    step0 = int(state.step)
    path = trainer.ckpt.save("resume_test", state)

    trainer2 = Trainer(cfg, mesh=create_mesh(1, 1))
    template = trainer2.init_state(steps_per_epoch=2)
    restored = trainer2.ckpt.restore(path, template)
    assert int(restored.step) == step0

    # explicit-path save (cli.prune --out with a path) round-trips too
    explicit = trainer.ckpt.save_to(str(tmp_path / "explicit_ckpt"), state)
    assert explicit == str(tmp_path / "explicit_ckpt")
    assert int(trainer2.ckpt.restore(explicit, template).step) == step0
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_resume_auto(tmp_path):
    """resume_from=auto picks the most recent checkpoint (or starts fresh
    when none exists) — restart-after-preemption recovery."""
    from eelunet_tpu.config import apply_overrides

    cfg = _tiny_cfg(tmp_path, epochs=1)
    tr, va, te = _loaders()

    # no checkpoints yet: must start fresh, not crash
    cfg_auto = apply_overrides(cfg, ["resume_from=auto"])
    trainer = Trainer(cfg_auto, mesh=create_mesh(1, 1))
    msgs = []
    state, _ = trainer.fit(tr, va, te, log=msgs.append)
    assert any("starting fresh" in m for m in msgs)
    step0 = int(state.step)
    assert trainer.ckpt.latest_path() is not None

    # second run with a HIGHER total-epoch target resumes from the newest
    # checkpoint and trains only the remaining epochs
    cfg_more = apply_overrides(cfg_auto, ["epochs=2"])
    trainer2 = Trainer(cfg_more, mesh=create_mesh(1, 1))
    msgs2 = []
    state2, hist2 = trainer2.fit(tr, va, te, log=msgs2.append)
    assert any("Resumed full train state" in m for m in msgs2)
    assert int(state2.step) == 2 * step0  # exactly one more epoch ran

    # target already reached: resuming again is a no-op
    trainer3 = Trainer(cfg_more, mesh=create_mesh(1, 1))
    msgs3 = []
    state3, _ = trainer3.fit(tr, va, te, log=msgs3.append)
    assert any("nothing to do" in m for m in msgs3)
    assert int(state3.step) == int(state2.step)


def test_resume_exact_continuation(tmp_path):
    """Interrupted-and-resumed training is EXACTLY the uninterrupted run:
    same shuffle order (set_epoch-pinned keys), same schedule (restored
    step), same final params — the guarantee the reference cannot make
    (it never persists optimizer state or epoch, SURVEY.md §5)."""
    from eelunet_tpu.config import apply_overrides

    # Run A: 4 epochs straight through.
    cfgA = apply_overrides(_tiny_cfg(tmp_path / "A", epochs=4), ["snapshot_every=2"])
    trA = Trainer(cfgA, mesh=create_mesh(1, 1))
    stateA, histA = trA.fit(*_loaders(), log=lambda *a: None)

    # Run B: 2 epochs (full snapshot at epoch 2), then resume to 4.
    cfgB = apply_overrides(_tiny_cfg(tmp_path / "B", epochs=2), ["snapshot_every=2"])
    Trainer(cfgB, mesh=create_mesh(1, 1)).fit(*_loaders(), log=lambda *a: None)
    cfgB2 = apply_overrides(cfgB, ["epochs=4", "resume_from=auto"])
    trB = Trainer(cfgB2, mesh=create_mesh(1, 1))
    stateB, histB = trB.fit(*_loaders(), log=lambda *a: None)

    assert int(stateB.step) == int(stateA.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(stateA.params), jax.tree_util.tree_leaves(stateB.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(stateA.opt_state),
        jax.tree_util.tree_leaves(stateB.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # history continues across the restart: epochs 1-2 carried over from the
    # interrupted run's loss_history.json, 3-4 identical to run A's
    assert len(histB["train_loss"]) == 4
    np.testing.assert_allclose(histB["train_loss"], histA["train_loss"], rtol=1e-6)
    # best-tag high-water marks survive the restart
    assert trB.best.min_val_loss <= min(histB["val_loss"][:2])


def test_resume_epoch_from_checkpoint_meta(tmp_path):
    """The completed-epoch count rides in the snapshot's meta, so resuming
    with a DIFFERENT dataset/batch geometry neither re-runs nor skips
    epochs (step // len(loader) would miscount)."""
    from eelunet_tpu.config import apply_overrides

    cfg = apply_overrides(_tiny_cfg(tmp_path, epochs=2), ["snapshot_every=2"])
    Trainer(cfg, mesh=create_mesh(1, 1)).fit(*_loaders(), log=lambda *a: None)

    # resume with twice the data (steps_per_epoch doubles: the step-derived
    # guess would claim only 1 epoch is done and re-run epoch 2)
    cfg2 = apply_overrides(cfg, ["epochs=3", "resume_from=auto"])
    tr2 = Trainer(cfg2, mesh=create_mesh(1, 1))
    big = SyntheticDataset(n=16, image_size=(32, 32), seed=0)
    te = SyntheticDataset(n=4, image_size=(32, 32), seed=1)
    msgs = []
    state, hist = tr2.fit(
        DataLoader(big, batch_size=4, shuffle=True, seed=0),
        DataLoader(te, batch_size=4),
        DataLoader(te, batch_size=4),
        log=msgs.append,
    )
    assert any("continuing at epoch 3/3" in m for m in msgs)
    # 2 epochs x 2 steps from the first run + 1 epoch x 4 steps resumed
    assert int(state.step) == 2 * 2 + 4


def test_checkpoint_format_marker_and_preformat_warning(tmp_path):
    """New checkpoints carry framework_meta.json; restoring an eelunet
    checkpoint WITHOUT it (pre-concat-bridge era) warns about the
    interleaved-cin incompatibility instead of silently mis-predicting."""
    import warnings

    cfg = _tiny_cfg(tmp_path, epochs=1)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state = trainer.init_state(steps_per_epoch=2)
    path = trainer.ckpt.save("marker_test", state)
    assert os.path.exists(os.path.join(path, "framework_meta.json"))

    from eelunet_tpu.train.checkpoint import warn_if_preformat

    # marker present, or non-eelunet model: no warning
    assert not warn_if_preformat(path, "eelunet")
    os.remove(os.path.join(path, "framework_meta.json"))
    assert not warn_if_preformat(path, "unet")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert warn_if_preformat(path, "eelunet")
    assert any("migrate_interleaved_checkpoint" in str(x.message) for x in w)


def test_migrate_interleaved_checkpoint_exact():
    """conv(interleave(a,b), K_old) == conv(concat(a,b), K_migrated) — the
    bridge-layout migration must be exact for every dec stage."""
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.models.eelunet import migrate_interleaved_checkpoint
    from eelunet_tpu.nn.layers import interleave_channels

    rng = np.random.default_rng(0)
    c = 8
    params = {
        f"dec{i}": {
            "TorchConv_0": {
                "Conv_0": {
                    "kernel": jnp.asarray(
                        rng.standard_normal((3, 3, 2 * c, 4)), jnp.float32
                    ),
                    "bias": jnp.zeros((4,), jnp.float32),
                }
            }
        }
        for i in (1, 2, 3, 4)
    }
    migrated = migrate_interleaved_checkpoint(params)
    a = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers((2, 8, 8, 2 * c), (3, 3, 2 * c, 4), ("NHWC", "HWIO", "NHWC"))

    def conv(x, k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)

    for i in (1, 2, 3, 4):
        k_old = params[f"dec{i}"]["TorchConv_0"]["Conv_0"]["kernel"]
        k_new = migrated[f"dec{i}"]["TorchConv_0"]["Conv_0"]["kernel"]
        want = conv(interleave_channels(a, b), k_old)
        got = conv(jnp.concatenate([a, b], axis=-1), k_new)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_cli_migrate_interleaved_checkpoint(tmp_path):
    """cli.migrate round-trip: un-permute HEAD params into interleave-era
    order, save without the format marker, migrate, and recover the
    original params exactly (marker written on the output)."""
    import jax.numpy as jnp

    from eelunet_tpu.cli import migrate as cli_migrate

    cfg = _tiny_cfg(tmp_path, model="eelunet", epochs=1)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state = trainer.init_state(steps_per_epoch=1)

    # Fill the Adam moments with random values: fresh-init mu/nu are zeros and
    # permuting zeros is a no-op, which would leave the opt_state branch of
    # the migration unverified (advisor finding, round 1).
    mrng = np.random.default_rng(7)
    leaves, treedef = jax.tree_util.tree_flatten(state.opt_state)
    leaves = [
        jnp.asarray(mrng.standard_normal(l.shape), l.dtype)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        else l
        for l in leaves
    ]
    state = state.replace(opt_state=jax.tree_util.tree_unflatten(treedef, leaves))

    def unmigrate(params):
        out = jax.tree_util.tree_map(lambda x: x, params)
        for mod in ("dec1", "dec2", "dec3", "dec4"):
            leaf = out[mod]["TorchConv_0"]["Conv_0"]
            k = leaf["kernel"]
            c = k.shape[-2] // 2
            kn = jnp.zeros_like(k)
            kn = kn.at[..., 0::2, :].set(k[..., :c, :])
            kn = kn.at[..., 1::2, :].set(k[..., c:, :])
            leaf["kernel"] = kn
        return out

    def unmigrate_opt(opt_state):
        is_params_like = lambda sub: isinstance(sub, dict) and all(
            f"dec{i}" in sub for i in (1, 2, 3, 4)
        )
        return jax.tree_util.tree_map(
            lambda sub: unmigrate(sub) if is_params_like(sub) else sub,
            opt_state,
            is_leaf=is_params_like,
        )

    old_path = str(tmp_path / "old_ckpt")
    trainer.ckpt.save_to(
        old_path,
        state.replace(params=unmigrate(state.params), opt_state=unmigrate_opt(state.opt_state)),
    )
    os.remove(os.path.join(old_path, "framework_meta.json"))  # simulate pre-format era

    new_path = str(tmp_path / "migrated_ckpt")
    cli_migrate.main(["--checkpoint", old_path, "--out", new_path])
    assert os.path.exists(os.path.join(new_path, "framework_meta.json"))

    restored = trainer.ckpt.restore(new_path, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params), jax.tree_util.tree_leaves(state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Adam moments round-trip through the same permutation (nonzero, so the
    # opt_state branch is actually exercised)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.opt_state), jax.tree_util.tree_leaves(state.opt_state)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # already-migrated checkpoints are refused
    with pytest.raises(SystemExit, match="needs no migration"):
        cli_migrate.main(["--checkpoint", new_path, "--out", str(tmp_path / "x")])


def test_grad_accumulation_matches_full_batch(tmp_path):
    """accum_steps=4 must follow the accum_steps=1 trajectory: every loss is a
    mean of per-sample terms, so micro-batch grad means == full-batch grads
    (unet has no BN, so there is no batch-statistics divergence)."""
    histories = []
    for accum in (1, 4):
        tr, va, te = _loaders()  # fresh: shuffling loaders are stateful across epochs
        cfg = apply_overrides(_tiny_cfg(tmp_path, epochs=2), [f"accum_steps={accum}"])
        trainer = Trainer(cfg, mesh=create_mesh(1, 1))
        _, history = trainer.fit(tr, va, te, log=lambda *a: None)
        histories.append(history)
    np.testing.assert_allclose(
        histories[0]["train_loss"], histories[1]["train_loss"], rtol=2e-4
    )
    np.testing.assert_allclose(histories[0]["val_loss"], histories[1]["val_loss"], rtol=2e-4)


def test_grad_accumulation_bn_model(tmp_path):
    """BN models run under accumulation (stats update per micro-batch) and
    still converge; batch not divisible by accum_steps is rejected."""
    import jax.numpy as jnp

    from eelunet_tpu.train.trainer import make_train_step

    cfg = apply_overrides(_tiny_cfg(tmp_path, model="malunet", epochs=2), ["accum_steps=2"])
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    tr, va, te = _loaders()
    state, history = trainer.fit(tr, va, te, log=lambda *a: None)
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert all(np.isfinite(history["train_loss"]))

    step = make_train_step(trainer.model, trainer.loss_fn, True, accum_steps=3)
    with pytest.raises(ValueError, match="divisible"):
        step(state, jnp.zeros((4, 32, 32, 3)), jnp.zeros((4, 32, 32, 1)))


def test_profile_steps_writes_trace(tmp_path):
    """profile_steps=1 traces one post-compile train step into
    log_dir/<model>/profile (jax.profiler xplane dump, SURVEY.md §5)."""
    import glob

    cfg = apply_overrides(_tiny_cfg(tmp_path, epochs=1), ["profile_steps=1"])
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    tr, va, te = _loaders()
    trainer.fit(tr, va, te, log=lambda *a: None)
    dumps = glob.glob(f"{tmp_path}/runs/unet/profile/**/*.xplane.pb", recursive=True)
    assert dumps, "no profiler dump written"
    assert trainer._profiled


def test_seed_reproducibility(tmp_path):
    cfg = _tiny_cfg(tmp_path, epochs=1)
    losses = []
    for _ in range(2):
        trainer = Trainer(cfg, mesh=create_mesh(1, 1))
        tr, va, te = _loaders()
        _, history = trainer.fit(tr, va, te, log=lambda *a: None)
        losses.append(history["train_loss"][0])
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
