"""On-device non-finite-update guard (TrainConfig.skip_nonfinite_updates).

The reference has no failure handling around bad batches — a NaN loss
back-propagates into the torch weights silently and the run is ruined
(SURVEY.md §5). The guard reverts the WHOLE state update (params, Adam
moments, BN stats, EMA) via a predicated select inside the jitted step when
the loss or any gradient leaf is non-finite: no per-step host sync, so the
async dispatch pipeline is untouched; skipped steps are counted on device
and surfaced once per epoch (Trainer.last_skipped_steps + a fit log line)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.train.trainer import Trainer


def _cfg(tmp_path, *overrides):
    return apply_overrides(
        TrainConfig(),
        ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
         "seed=0", f"save_dir={tmp_path}/ckpt", f"log_dir={tmp_path}/runs",
         "epochs=1", "snapshot_every=100", "optimizer.lr=0.003",
         *overrides],
    )


def _leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _batches(poison_step=None, n=3):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        xb = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
        yb = (rng.uniform(size=(4, 32, 32, 1)) > 0.5).astype(np.float32)
        if i == poison_step:
            xb[0, 0, 0, 0] = np.nan
        out.append((xb, yb))
    return out


def test_guard_skips_poisoned_step_and_recovers(tmp_path):
    trainer = Trainer(_cfg(tmp_path, "skip_nonfinite_updates=true"),
                      mesh=create_mesh(1, 1))
    state = trainer.init_state()
    step = trainer._get_step("train", state)
    clean, poisoned, clean2 = _batches(poison_step=1)

    state, loss, ok = step(state, *clean)
    assert bool(ok) and np.isfinite(float(loss))
    p_before = _leaves(state.params)
    m_before = _leaves(state.opt_state)
    step_before = int(state.step)

    state, loss, ok = step(state, *poisoned)
    assert not bool(ok)
    # update fully reverted: params AND optimizer moments untouched...
    for a, b in zip(_leaves(state.params), p_before):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(_leaves(state.opt_state), m_before):
        np.testing.assert_array_equal(a, b)
    # ...but the step counter advanced (batch consumed, LR schedule on time)
    assert int(state.step) == step_before + 1

    # the run continues: the next clean batch trains normally
    state, loss, ok = step(state, *clean2)
    assert bool(ok) and np.isfinite(float(loss))
    assert all(np.all(np.isfinite(a)) for a in _leaves(state.params))
    changed = any(not np.array_equal(a, b)
                  for a, b in zip(_leaves(state.params), p_before))
    assert changed


def test_guard_off_matches_reference_poisoning(tmp_path):
    """Default off = reference semantics: the NaN propagates into params."""
    trainer = Trainer(_cfg(tmp_path), mesh=create_mesh(1, 1))
    state = trainer.init_state()
    step = trainer._get_step("train", state)
    _, poisoned, _ = _batches(poison_step=1)
    state, loss, ok = step(state, *poisoned)
    assert bool(ok)  # guard off: ok is constant True
    assert not np.isfinite(float(loss))
    assert any(not np.all(np.isfinite(a)) for a in _leaves(state.params))


def test_guard_does_not_change_clean_trajectory(tmp_path):
    """On clean data the guard is numerically invisible up to compilation
    noise: the extra isfinite/select ops change XLA's fusion choices, so the
    two programs can differ by f32 rounding (~1e-8 observed) but nothing
    more — the select itself passes values through untouched."""
    runs = {}
    for flag in ("true", "false"):
        trainer = Trainer(
            _cfg(tmp_path, f"skip_nonfinite_updates={flag}",
                 f"save_dir={tmp_path}/ckpt_{flag}"),
            mesh=create_mesh(1, 1),
        )
        state = trainer.init_state()
        step = trainer._get_step("train", state)
        for b in _batches():
            state, loss, ok = step(state, *b)
        runs[flag] = (_leaves(state.params), float(loss))
    np.testing.assert_allclose(runs["true"][1], runs["false"][1], rtol=1e-6)
    for a, b in zip(runs["true"][0], runs["false"][0]):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)


def test_guard_composes_with_accumulation(tmp_path):
    """accum_steps>1: a NaN micro-batch poisons the summed gradient; the
    whole accumulated update must be skipped."""
    trainer = Trainer(
        _cfg(tmp_path, "skip_nonfinite_updates=true", "accum_steps=2"),
        mesh=create_mesh(1, 1),
    )
    state = trainer.init_state()
    step = trainer._get_step("train", state)
    clean, poisoned, _ = _batches(poison_step=1)
    state, loss, ok = step(state, *clean)
    assert bool(ok)
    p_before = _leaves(state.params)
    state, loss, ok = step(state, *poisoned)
    assert not bool(ok)
    for a, b in zip(_leaves(state.params), p_before):
        np.testing.assert_array_equal(a, b)


def test_epoch_counts_skipped_steps(tmp_path):
    """train_one_epoch excludes skipped steps from the loss mean and surfaces
    the count; fit logs a warning line."""
    class ListLoader:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

    trainer = Trainer(_cfg(tmp_path, "skip_nonfinite_updates=true"),
                      mesh=create_mesh(1, 1))
    state = trainer.init_state()
    loader = ListLoader(_batches(poison_step=1))
    state, mean_loss = trainer.train_one_epoch(state, loader)
    assert trainer.last_skipped_steps == 1
    assert np.isfinite(mean_loss)  # the poisoned step's NaN is excluded
