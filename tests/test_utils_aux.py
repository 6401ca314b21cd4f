"""Auxiliary subsystem tests: logging, visualization, profiling, seeding,
checkpoint policy, hysteresis cap."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest


def test_metric_logger_writes_jsonl_and_tb(tmp_path):
    from eelunet_tpu.train.logging import MetricLogger

    run_dir = str(tmp_path / "run")
    logger = MetricLogger(run_dir)
    logger.log_epoch(1, 0.5, 0.6, {"dice": 0.9, "miou": 0.8, "mdice": 0.85, "boundary_f1": 0.7})
    logger.close()
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["Loss/train"] == 0.5
    assert rec["Metrics/Dice"] == 0.9
    assert rec["Metrics/Boundary F1"] == 0.7


def test_best_tracker_policy():
    from eelunet_tpu.train.checkpoint import BestTracker

    t = BestTracker()
    tags = t.update({"iou": 0.5, "dice": 0.6, "miou": 0.5, "mdice": 0.6, "boundary_f1": 0.3}, val_loss=1.0)
    assert set(tags) == {"best_iou", "best_dice", "best_miou", "best_mdice", "best_boundary_f1", "best"}
    # no improvement -> nothing saved
    assert t.update({"iou": 0.4, "dice": 0.5, "miou": 0.4, "mdice": 0.5, "boundary_f1": 0.2}, val_loss=2.0) == []
    # partial improvement
    tags = t.update({"iou": 0.7, "dice": 0.5, "miou": 0.4, "mdice": 0.5, "boundary_f1": 0.2}, val_loss=0.9)
    assert set(tags) == {"best_iou", "best"}


def test_feature_grid_and_image_save(tmp_path):
    from eelunet_tpu.utils.visualize import save_feature_grid, save_image

    fm = np.random.default_rng(0).standard_normal((1, 8, 8, 16)).astype(np.float32)
    p1 = str(tmp_path / "grid.png")
    save_feature_grid(fm, p1, num_cols=4)
    assert os.path.getsize(p1) > 0

    p2 = str(tmp_path / "img.png")
    save_image(np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32), p2)
    assert os.path.getsize(p2) > 0


def test_edge_seg_contribution():
    from eelunet_tpu.utils.visualize import edge_seg_contribution

    seg = np.array([[0.9, 0.1], [0.5, 0.5]], np.float32)
    edge = np.array([[0.1, 0.9], [0.5, 0.5]], np.float32)
    out = edge_seg_contribution(seg, edge)
    assert abs(out["seg_out_contribution"] - out["edge_out_contribution"]) < 1e-6
    assert out["equal_elements"] == 50.0


def test_step_timer():
    from eelunet_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t.start()
    x = jnp.sum(jnp.ones((8, 8)))
    dt = t.stop(x)
    assert dt > 0 and t.images_per_sec(4) > 0


def test_set_seed_reproducible():
    from eelunet_tpu.utils.seeding import set_seed

    s1, k1 = set_seed(42)
    s2, k2 = set_seed(42)
    assert s1 == s2 == 42
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_hysteresis_max_iters_caps_growth():
    from eelunet_tpu.ops.edge import hysteresis_thresholding

    strong = np.zeros((1, 16, 16, 1), np.float32)
    strong[0, 8, 0, 0] = 1.0
    weak = np.ones_like(strong)
    full = np.asarray(hysteresis_thresholding(jnp.array(strong), jnp.array(weak)))
    capped = np.asarray(hysteresis_thresholding(jnp.array(strong), jnp.array(weak), max_iters=2))
    assert capped.sum() < full.sum()  # growth stopped early
    assert full.sum() == full.size    # all-weak floods fully when connected


def test_capture_intermediates_replaces_forward_png_dumps():
    """The reference writes PNGs in forward (EELUnet.py:389-462); here
    intermediates come from flax's capture mechanism with zero hot-loop cost."""
    import jax

    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.registry import create_model

    model, meta = create_model(ModelConfig(name="unet"))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mods = model.apply(variables, x, train=False, capture_intermediates=True, mutable=["intermediates"])
    inter = mods["intermediates"]
    assert len(inter) > 0  # per-submodule outputs captured
