"""Structured pruning workflow tests (reference prune.py intent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eelunet_tpu.prune import (
    apply_masks,
    compute_prune_masks,
    finetune_pruned,
    global_sparsity,
    sparsity_report,
)


def _toy_params(rng):
    return {
        "conv1": {"kernel": jnp.array(rng.standard_normal((3, 3, 4, 8)), jnp.float32),
                  "bias": jnp.zeros((8,))},
        "dense": {"kernel": jnp.array(rng.standard_normal((16, 16)), jnp.float32)},
    }


def test_masks_zero_lowest_l2_channels(rng):
    params = _toy_params(rng)
    # make channels 2 and 5 tiny so they must be pruned at amount=0.25
    k = np.array(params["conv1"]["kernel"])  # writable copy
    k[..., 2] *= 1e-4
    k[..., 5] *= 1e-4
    params["conv1"]["kernel"] = jnp.array(k)

    masks, _ = compute_prune_masks(params, amount=0.25)
    m = np.asarray(masks["conv1"]["kernel"])
    assert m[..., 2].sum() == 0 and m[..., 5].sum() == 0
    assert m.sum() == 3 * 3 * 4 * 6  # 6 of 8 channels kept
    # dense kernels and biases untouched
    assert np.all(np.asarray(masks["dense"]["kernel"]) == 1)
    assert np.all(np.asarray(masks["conv1"]["bias"]) == 1)


def test_apply_and_report(rng):
    params = _toy_params(rng)
    masks, plan = compute_prune_masks(params, amount=0.5)
    pruned = apply_masks(params, masks)
    rep = sparsity_report(pruned)
    assert abs(rep["conv1/kernel"] - 0.5) < 1e-6
    assert 0.0 < global_sparsity(pruned) < 1.0


def test_amount_zero_is_identity(rng):
    params = _toy_params(rng)
    masks, _ = compute_prune_masks(params, amount=0.0)
    for leaf in jax.tree_util.tree_leaves(masks):
        assert np.all(np.asarray(leaf) == 1)


def test_pruned_model_still_runs_and_finetunes(tmp_path):
    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.data.pipeline import DataLoader
    from eelunet_tpu.data.synthetic import SyntheticDataset
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(
        TrainConfig(),
        ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
         "seed=0", f"save_dir={tmp_path}/ckpt", f"log_dir={tmp_path}/runs"],
    )
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    ds = SyntheticDataset(n=8, image_size=(32, 32))
    loader = DataLoader(ds, batch_size=4)
    state = trainer.init_state(steps_per_epoch=2)

    masks, _ = compute_prune_masks(state.params, amount=0.3)
    state = state.replace(params=apply_masks(state.params, masks))
    s0 = global_sparsity(state.params)
    assert s0 > 0.1

    m = trainer.evaluate(state, loader)
    assert np.isfinite(m["dice"])

    state = finetune_pruned(trainer, state, masks, loader, loader, epochs=1, log=lambda *a: None)
    # masks survived finetuning: pruned channels stay exactly zero
    assert abs(global_sparsity(state.params) - s0) < 0.02
