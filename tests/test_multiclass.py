"""Multi-class segmentation mode (model.out_channels > 1) — beyond-reference
(the reference is binary-only; its commented `nn.CrossEntropyLoss` alternative
at train.py:303 is the closest anchor). Covers: softmax heads, CE/macro-dice
losses (torch cross-checked), confusion-matrix metrics vs a numpy oracle, id
masks through the folder dataset + device preprocess, argmax inference, and a
tiny end-to-end training run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eelunet_tpu import losses as L
from eelunet_tpu import metrics as M
from eelunet_tpu.config import TrainConfig, apply_overrides


def _rand_probs(rng, b, h, w, c):
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _rand_ids(rng, b, h, w, c):
    return rng.integers(0, c, (b, h, w, 1)).astype(np.float32)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def test_ce_loss_matches_torch_nll():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    probs = _rand_probs(rng, 2, 8, 8, 4)
    ids = _rand_ids(rng, 2, 8, 8, 4)
    got = float(L.ce_loss(jnp.asarray(probs), jnp.asarray(ids)))
    # torch NLL on log-probabilities == categorical CE on probabilities
    tp = torch.from_numpy(probs).permute(0, 3, 1, 2).log()
    tt = torch.from_numpy(ids[..., 0]).long()
    want = float(F.nll_loss(tp, tt))
    assert abs(got - want) < 1e-5


def test_multiclass_dice_matches_numpy():
    rng = np.random.default_rng(1)
    c = 3
    probs = _rand_probs(rng, 2, 8, 8, c)
    ids = _rand_ids(rng, 2, 8, 8, c)
    onehot = np.eye(c, dtype=np.float32)[ids[..., 0].astype(int)]
    p = probs.reshape(2, -1, c)
    t = onehot.reshape(2, -1, c)
    inter = (p * t).sum(1)
    score = (2 * inter + 1) / (p.sum(1) + t.sum(1) + 1)
    want = 1.0 - score.mean()
    got = float(L.multiclass_dice_loss(jnp.asarray(probs), jnp.asarray(ids)))
    assert abs(got - want) < 1e-6


def test_multiclass_dice_perfect_prediction_near_zero():
    rng = np.random.default_rng(2)
    ids = _rand_ids(rng, 1, 16, 16, 3)
    onehot = np.eye(3, dtype=np.float32)[ids[..., 0].astype(int)]
    loss = float(L.multiclass_dice_loss(jnp.asarray(onehot), jnp.asarray(ids)))
    assert loss < 0.01
    assert float(L.ce_loss(jnp.asarray(onehot), jnp.asarray(ids))) < 1e-4


def test_multiclass_losses_grad_safe_at_saturation():
    rng = np.random.default_rng(3)
    ids = _rand_ids(rng, 1, 8, 8, 3)
    onehot = jnp.asarray(np.eye(3, dtype=np.float32)[np.asarray(ids)[..., 0].astype(int)])

    g = jax.grad(lambda p: L.ce_dice_loss(p, jnp.asarray(ids)))(onehot)
    assert np.all(np.isfinite(np.asarray(g)))


def test_resolve_loss_name_multiclass():
    assert L.resolve_loss_name("auto", "eelunet", 3) == "edge_ce_dice"
    assert L.resolve_loss_name("auto", "egeunet", 3) == "gt_ce_dice"
    assert L.resolve_loss_name("auto", "unet", 3) == "ce_dice"
    assert L.resolve_loss_name("auto", "unet", 1) == "bce_dice"
    assert L.resolve_loss_name("ce", "unet", 3) == "ce"


def test_edge_ce_dice_supervises_foreground_pyramid():
    """The aux pyramid gets the binary foreground mask (class != 0)."""
    rng = np.random.default_rng(4)
    c = 3
    probs = _rand_probs(rng, 1, 16, 16, c)
    ids = _rand_ids(rng, 1, 16, 16, c)
    aux = tuple(
        jnp.asarray(rng.uniform(0.01, 0.99, (1, 16 // s, 16 // s, 1)).astype(np.float32))
        for s in (16, 8, 4, 2, 1)
    )
    got = float(L.edge_ce_dice_loss(aux, jnp.asarray(probs), jnp.asarray(ids)))
    fg = (ids > 0.5).astype(np.float32)
    want = float(L.ce_dice_loss(jnp.asarray(probs), jnp.asarray(ids)))
    targets = L._pyramid_targets(jnp.asarray(fg))
    want += sum(
        w * float(L.bce_dice_loss(p, t))
        for p, t, w in zip(aux, targets, L._DS_WEIGHTS)
    )
    assert abs(got - want) < 1e-5


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def test_multiclass_metrics_vs_numpy_oracle():
    rng = np.random.default_rng(5)
    c = 4
    probs = _rand_probs(rng, 3, 32, 32, c)
    ids = _rand_ids(rng, 3, 32, 32, c)
    acc = M.update_metrics_multiclass(jnp.asarray(probs), jnp.asarray(ids))
    got = {k: float(v) for k, v in M.finalize_metrics_multiclass(acc).items()}

    pred = probs.argmax(-1).reshape(-1)
    true = ids[..., 0].astype(int).reshape(-1)
    conf = np.zeros((c, c))
    np.add.at(conf, (true, pred), 1)
    np.testing.assert_allclose(np.asarray(acc.confusion), conf)

    tp = np.diag(conf)
    fn = conf.sum(1) - tp
    fp = conf.sum(0) - tp
    iou = tp / (tp + fp + fn + 1e-7)
    dice = 2 * tp / (2 * tp + fp + fn + 1e-7)
    assert abs(got["miou"] - iou.mean()) < 1e-5
    assert abs(got["mdice"] - dice.mean()) < 1e-5
    assert abs(got["iou"] - iou[1:].mean()) < 1e-5
    assert abs(got["dice"] - dice[1:].mean()) < 1e-5
    assert abs(got["pixel_accuracy"] - tp.sum() / conf.sum()) < 1e-5
    assert set(got) == set(M.METRIC_NAMES)


def test_multiclass_metrics_perfect_prediction():
    rng = np.random.default_rng(6)
    ids = _rand_ids(rng, 2, 16, 16, 3)
    onehot = np.eye(3, dtype=np.float32)[ids[..., 0].astype(int)]
    acc = M.update_metrics_multiclass(jnp.asarray(onehot), jnp.asarray(ids))
    got = M.finalize_metrics_multiclass(acc)
    assert float(got["miou"]) > 0.999
    assert float(got["pixel_accuracy"]) > 0.999
    assert float(got["boundary_f1"]) > 0.999


def test_per_class_metrics_drilldown():
    rng = np.random.default_rng(8)
    c = 3
    probs = _rand_probs(rng, 2, 16, 16, c)
    ids = _rand_ids(rng, 2, 16, 16, c)
    acc = M.update_metrics_multiclass(jnp.asarray(probs), jnp.asarray(ids))
    pc = M.per_class_metrics(acc)
    assert all(v.shape == (c,) for v in pc.values())
    # macro scalars are the means of the per-class vectors
    got = M.finalize_metrics_multiclass(acc)
    assert abs(float(got["miou"]) - pc["iou"].mean()) < 1e-5
    assert abs(float(got["iou"]) - pc["iou"][1:].mean()) < 1e-5
    assert pc["support"].sum() == 2 * 16 * 16


def test_multiclass_accum_is_summable():
    rng = np.random.default_rng(7)
    c = 3
    p1, p2 = (_rand_probs(rng, 2, 8, 8, c) for _ in range(2))
    t1, t2 = (_rand_ids(rng, 2, 8, 8, c) for _ in range(2))
    a = M.update_metrics_multiclass(jnp.asarray(p1), jnp.asarray(t1))
    b = M.update_metrics_multiclass(jnp.asarray(p2), jnp.asarray(t2))
    both = M.update_metrics_multiclass(
        jnp.asarray(np.concatenate([p1, p2])), jnp.asarray(np.concatenate([t1, t2]))
    )
    s = a + b
    np.testing.assert_allclose(np.asarray(s.confusion), np.asarray(both.confusion))
    np.testing.assert_allclose(float(s.samples), float(both.samples))


# ---------------------------------------------------------------------------
# Model heads + registry
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["unet", "unext_s", "malunet", "egeunet"])
def test_softmax_heads_sum_to_one(name):
    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.registry import create_model, seg_probabilities

    model, meta = create_model(ModelConfig(name=name, out_channels=3))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    probs = seg_probabilities(model.apply(variables, x, train=False), meta)
    assert probs.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# Data path: id masks end-to-end
# ---------------------------------------------------------------------------


def test_folder_dataset_multiclass_ids_roundtrip(tmp_path):
    from eelunet_tpu.data.dataset import SegmentationFolderDataset
    from eelunet_tpu.data.synthetic import write_synthetic_tree

    root = write_synthetic_tree(str(tmp_path), n_train=2, n_test=2,
                                image_size=(24, 24), num_classes=3)
    ds = SegmentationFolderDataset(root, "train", (16, 16), multiclass=True)
    _, y = ds[0]
    vals = set(np.unique(y).tolist())
    assert vals <= {0.0, 1.0, 2.0}  # ids survive NEAREST resize unscaled

    # uint8 feed: ids pass through as raw bytes
    ds8 = SegmentationFolderDataset(root, "train", (16, 16), multiclass=True,
                                    as_uint8=True)
    _, y8 = ds8[0]
    assert y8.dtype == np.uint8
    assert set(np.unique(y8).tolist()) <= {0, 1, 2}


def test_preprocess_keeps_multiclass_ids():
    from eelunet_tpu.config import DataConfig
    from eelunet_tpu.data.augment import make_input_preprocess

    pre, _ = make_input_preprocess(DataConfig(), num_classes=3)
    imgs = jnp.zeros((2, 8, 8, 3), jnp.uint8)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 3, (2, 8, 8, 1)), jnp.uint8)
    _, labels = pre(imgs, ids)
    np.testing.assert_allclose(np.asarray(labels), np.asarray(ids, np.float32))

    # binary path unchanged: 0/255 -> 0/1
    pre1, _ = make_input_preprocess(DataConfig(), num_classes=1)
    _, lab1 = pre1(imgs, ids * 0 + 255)
    np.testing.assert_allclose(np.asarray(lab1), 1.0)


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------


def test_predictor_multiclass_argmax():
    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.inference import Predictor

    pred = Predictor(ModelConfig(name="unext_s", out_channels=3), bucket_batches=False)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    probs = pred.predict_proba(u8)
    assert probs.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    mask = pred.predict(u8)
    assert mask.shape == (2, 32, 32, 1)
    np.testing.assert_array_equal(mask[..., 0], probs.argmax(-1))


def test_predictor_multiclass_tiled_probs_normalized():
    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.inference import Predictor

    pred = Predictor(ModelConfig(name="unext_s", out_channels=3), bucket_batches=False)
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (1, 40, 56, 3), dtype=np.uint8)
    probs = pred.predict_proba_tiled(u8, tile=32, overlap=8)
    assert probs.shape == (1, 40, 56, 3)
    # blended softmax stays a distribution (each tile sums to 1; the ramp
    # blend is a convex combination per pixel)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    mask = pred.predict_tiled(u8, tile=32, overlap=8)
    assert set(np.unique(mask).tolist()) <= {0.0, 1.0, 2.0}


# ---------------------------------------------------------------------------
# End-to-end training
# ---------------------------------------------------------------------------


def test_multiclass_train_e2e(tmp_path):
    from eelunet_tpu.data.pipeline import DataLoader
    from eelunet_tpu.data.synthetic import SyntheticDataset
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(TrainConfig(), [
        "model.name=unext_s",
        "model.out_channels=3",
        "data.image_size=[32,32]",
        "data.batch_size=4",
        "epochs=3",
        "seed=0",
        f"save_dir={tmp_path}/ckpt",
        f"log_dir={tmp_path}/runs",
        "snapshot_every=100",
        "optimizer.lr=0.003",
    ])
    tr_ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0, num_classes=3)
    te_ds = SyntheticDataset(n=4, image_size=(32, 32), seed=1, num_classes=3)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    assert trainer.loss_name == "ce_dice"
    state, history = trainer.fit(
        DataLoader(tr_ds, 4, shuffle=True, seed=0),
        DataLoader(te_ds, 4),
        DataLoader(te_ds, 4),
        log=lambda *a: None,
    )
    assert history["train_loss"][-1] < history["train_loss"][0]
    assert all(np.isfinite(history["train_loss"]))
    m = [x for x in history["metrics"] if x][-1]
    assert set(m) >= set(M.METRIC_NAMES)
    # the easy 3-class blobs should be nearly solved in 3 epochs; a broken
    # argmax/confusion path would show up as ~0 or NaN here
    assert m["pixel_accuracy"] > 0.6
    assert 0.0 <= m["miou"] <= 1.0
