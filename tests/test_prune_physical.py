"""Physical channel removal: slim Unet must reproduce the bias-zeroed masked
model exactly, with the expected ~(1-a)^2 conv-param shrink."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eelunet_tpu.models.unet import Unet
from eelunet_tpu.prune import apply_masks, compute_prune_masks
from eelunet_tpu.prune_physical import (
    l2_keep_indices,
    load_slim,
    param_count,
    physical_prune_unet,
    save_slim,
    slim_unet,
)


@pytest.fixture(scope="module")
def unet_setup():
    model = Unet()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    return model, params, x


def test_l2_keep_indices_rounding_and_order():
    k = np.zeros((3, 3, 2, 8), np.float32)
    k[..., :] = np.arange(1, 9)  # channel c has norm ~ (c+1)
    keep = l2_keep_indices(k, 0.25)  # drop round(2) lowest = channels 0,1
    assert keep.tolist() == [2, 3, 4, 5, 6, 7]
    assert l2_keep_indices(k, 0.0).tolist() == list(range(8))


def test_l2_keep_indices_round_to():
    k = np.zeros((3, 3, 2, 8), np.float32)
    k[..., :] = np.arange(1, 9)
    # amount=0.3 -> drop round(2.4)=2, keep 6; round_to=4 rounds keep up to 8.
    assert len(l2_keep_indices(k, 0.3, round_to=4)) == 8
    assert len(l2_keep_indices(k, 0.3, round_to=2)) == 6
    assert len(l2_keep_indices(k, 0.3, round_to=3)) == 6


def test_round_to_consistency_masks_vs_slice(unet_setup):
    """round_to must produce identical channel sets in the mask path and the
    physical slice (the finetune precedes the slice)."""
    model, params, x = unet_setup
    masks, _ = compute_prune_masks(params, 0.3, zero_bias=True, round_to=64)
    masked = apply_masks(params, masks)
    want = model.apply({"params": masked}, x).seg
    slim_params, widths = physical_prune_unet(masked, 0.3, round_to=64)
    got = slim_unet(widths).apply({"params": slim_params}, x).seg
    assert widths["up_widths"] == (384, 192, 128, 64)  # lane-aligned keeps
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_sliced_matches_bias_zeroed_masked(unet_setup):
    model, params, x = unet_setup
    amount = 0.3
    masks, _ = compute_prune_masks(params, amount, zero_bias=True)
    masked = apply_masks(params, masks)
    want = model.apply({"params": masked}, x).seg

    slim_params, widths = physical_prune_unet(masked, amount)
    slim = slim_unet(widths)
    got = slim.apply({"params": slim_params}, x).seg

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_bias_leak_without_zero_bias(unet_setup):
    """Documents WHY zero_bias is required: torch-semantics masks (weights
    only) leave bias constants flowing through ReLU, so slicing changes the
    function."""
    model, params, x = unet_setup
    masks, _ = compute_prune_masks(params, 0.3, zero_bias=False)
    masked = apply_masks(params, masks)
    want = model.apply({"params": masked}, x).seg
    slim_params, widths = physical_prune_unet(masked, 0.3)
    got = slim_unet(widths).apply({"params": slim_params}, x).seg
    assert not np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_param_shrink(unet_setup):
    _, params, _ = unet_setup
    slim_params, widths = physical_prune_unet(params, 0.3)
    ratio = param_count(slim_params) / param_count(params)
    # Conv params scale by ~(1-0.3)^2 = 0.49 (first conv keeps 3 inputs).
    assert 0.4 < ratio < 0.6
    assert widths["bottleneck_widths"] == (717, 717)
    assert widths["up_widths"] == (358, 179, 90, 45)


def test_predictor_autodetects_slim(tmp_path, unet_setup):
    """Predictor.load and the CLIs detect slim checkpoints by widths.json."""
    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.inference import Predictor
    from eelunet_tpu.prune_physical import is_slim_checkpoint

    _, params, x = unet_setup
    masks, _ = compute_prune_masks(params, 0.5, zero_bias=True)
    slim_params, widths = physical_prune_unet(apply_masks(params, masks), 0.5)
    path = save_slim(str(tmp_path / "slim"), slim_params, widths)
    assert is_slim_checkpoint(path) and not is_slim_checkpoint(str(tmp_path))

    pred = Predictor(ModelConfig(name="unet"))
    pred.load(path)
    want = jax.nn.sigmoid(slim_unet(widths).apply({"params": slim_params}, x).seg)
    got = pred.predict_proba(np.asarray(x))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_slim_roundtrip(tmp_path, unet_setup):
    model, params, x = unet_setup
    masks, _ = compute_prune_masks(params, 0.5, zero_bias=True)
    slim_params, widths = physical_prune_unet(apply_masks(params, masks), 0.5)
    want = slim_unet(widths).apply({"params": slim_params}, x).seg

    save_slim(str(tmp_path / "slim"), slim_params, widths)
    model2, params2, bstats2 = load_slim(str(tmp_path / "slim"))
    assert bstats2 == {}
    got = model2.apply({"params": params2}, x).seg
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_slim_finetune_via_trainer(tmp_path, unet_setup):
    """model.slim_init: the Trainer builds the slim module and resumes its
    weights — finetuning runs at slim-model speed (same trajectory as masked
    finetune, since the slice is exact)."""
    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.data.pipeline import DataLoader
    from eelunet_tpu.data.synthetic import SyntheticDataset
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    _, params, _ = unet_setup
    masks, _ = compute_prune_masks(params, 0.5, zero_bias=True)
    slim_params, widths = physical_prune_unet(apply_masks(params, masks), 0.5)
    path = save_slim(str(tmp_path / "slim"), slim_params, widths)

    cfg = apply_overrides(
        TrainConfig(),
        [
            "model.name=unet",
            f"model.slim_init={path}",
            "data.image_size=[32,32]",
            "data.batch_size=4",
            "epochs=1",
            "seed=0",
            f"save_dir={tmp_path}/ckpt",
            f"log_dir={tmp_path}/runs",
            "snapshot_every=100",
        ],
    )
    trainer = Trainer(cfg, mesh=create_mesh(1, 1, devices=jax.devices()[:1]))
    state = trainer.init_state()
    # weights actually came from the slim checkpoint
    got = state.params["ConvBlock_0"]["TorchConv_0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), slim_params["ConvBlock_0"]["TorchConv_0"]["Conv_0"]["kernel"], atol=1e-7
    )
    ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    state, loss = trainer.train_one_epoch(state, loader)
    assert np.isfinite(loss)


# ------------------------------------------------------------------------------
# EELUnet physical pruning (fused add-groups, interleave maps, shift quarters,
# BN gamma/beta zeroing — see prune_physical.py EELUnet section)
# ------------------------------------------------------------------------------


@pytest.fixture(scope="module")
def eelunet_setup():
    from eelunet_tpu.models.eelunet import EELUnet

    model = EELUnet()
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x)
    # Randomize params AND batch_stats: with init values (BN beta=0, mean=0)
    # the BN leak this machinery guards against would be invisible.
    rng = np.random.default_rng(11)

    def jitter(a):
        return a + jnp.asarray(rng.normal(size=a.shape) * 0.05, a.dtype)

    params = jax.tree_util.tree_map(jitter, variables["params"])
    bstats = jax.tree_util.tree_map(jitter, variables["batch_stats"])
    bstats = jax.tree_util.tree_map(lambda a: jnp.abs(a) + 0.25, bstats)
    return model, params, bstats, x


def test_eelunet_sliced_matches_masked(eelunet_setup):
    from eelunet_tpu.prune_physical import (
        eelunet_prune_masks,
        physical_prune_eelunet,
        slim_eelunet,
    )

    model, params, bstats, x = eelunet_setup
    amount, round_to = 0.3, 4
    masks, keeps = eelunet_prune_masks(params, amount, round_to)
    masked = apply_masks(params, masks)
    want = model.apply({"params": masked, "batch_stats": bstats}, x, train=False).seg

    slim_params, slim_bs, widths = physical_prune_eelunet(masked, bstats, amount, round_to)
    slim = slim_eelunet(widths)
    got = slim.apply({"params": slim_params, "batch_stats": slim_bs}, x, train=False).seg
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)

    # the deep-supervision aux heads must match too
    want_aux = model.apply({"params": masked, "batch_stats": bstats}, x, train=False).aux
    got_aux = slim.apply({"params": slim_params, "batch_stats": slim_bs}, x, train=False).aux
    for g, w_ in zip(got_aux, want_aux):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=3e-5, rtol=1e-4)


def test_eelunet_quarter_preservation(eelunet_setup):
    """Groups feeding shifted_channel keep equal counts per channel quarter,
    so each kept channel stays in its original shift segment."""
    from eelunet_tpu.prune_physical import eelunet_groups, eelunet_keep_sets

    _, params, _, _ = eelunet_setup
    keeps = eelunet_keep_sets(params, 0.3, round_to=4)
    for g in eelunet_groups():
        if not g.quarter:
            continue
        keep = keeps[g.name]
        # derive original size from any producer kernel via the group name
        c = {"e3a": 256, "e4a": 512, "bna": 1024, "eu4ct": 512, "eu3ct": 256,
             "ec4a": 512, "ec3a": 256, "u4ct": 512, "u3ct": 256,
             "d4a": 512, "d3a": 256}[g.name]
        q = c // 4
        per_quarter = [np.sum((keep >= j * q) & (keep < (j + 1) * q)) for j in range(4)]
        assert len(set(per_quarter)) == 1, (g.name, per_quarter)


def test_eelunet_param_shrink_and_roundtrip(tmp_path, eelunet_setup):
    from eelunet_tpu.prune_physical import (
        load_slim,
        physical_prune_eelunet,
        save_slim,
        slim_eelunet,
    )

    model, params, bstats, x = eelunet_setup
    slim_params, slim_bs, widths = physical_prune_eelunet(params, bstats, 0.5, round_to=4)
    ratio = param_count(slim_params) / param_count(params)
    assert 0.25 < ratio < 0.55  # CAPMLP token internals stay full-width
    assert widths["d4sum"] == widths["e4"] and widths["d1sum"] == widths["e1"]

    want = slim_eelunet(widths).apply(
        {"params": slim_params, "batch_stats": slim_bs}, x, train=False
    ).seg
    save_slim(str(tmp_path / "eslim"), slim_params, widths, batch_stats=slim_bs, model_name="eelunet")
    model2, params2, bstats2 = load_slim(str(tmp_path / "eslim"))
    got = model2.apply({"params": params2, "batch_stats": bstats2}, x, train=False).seg
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_cli_evaluate_slim_uint8_feed_matches_float(tmp_path, unet_setup, synthetic_tree):
    """Regression: the slim evaluate path bypasses Trainer._device_batches, so
    cli.evaluate must apply the device-side preprocess chain itself — with the
    default uint8 feed, raw 0-255 batches once reached the slim model
    un-normalized and every metric silently shifted."""
    from eelunet_tpu.cli import evaluate as cli_evaluate

    _, params, _ = unet_setup
    masks, _ = compute_prune_masks(params, 0.5, zero_bias=True)
    slim_params, widths = physical_prune_unet(apply_masks(params, masks), 0.5)
    ckpt = save_slim(str(tmp_path / "slim"), slim_params, widths)

    common = [
        "--model_type", "unet", "--data_dir", synthetic_tree, "--image_size", "64",
        "--batch_size", "4", "--checkpoint", ckpt,
        "--save_dir", str(tmp_path / "ckpts"),
    ]
    m_u8 = cli_evaluate.main(common)  # data.uint8_feed defaults true
    m_f32 = cli_evaluate.main(common + ["--set", "data.uint8_feed=false"])
    for k in m_f32:
        np.testing.assert_allclose(m_u8[k], m_f32[k], atol=1e-3, err_msg=k)
