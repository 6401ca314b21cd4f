"""Predictor API tests: checkpoint round-trip through the library surface."""

import numpy as np
import pytest

from eelunet_tpu.config import ModelConfig, TrainConfig, apply_overrides
from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.data.synthetic import SyntheticDataset
from eelunet_tpu.inference import Predictor
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.train.trainer import Trainer


def test_predictor_batch_bucketing():
    """Ragged batch sizes share power-of-two executables (serving traffic
    must not compile one forward per distinct tail size), and bucketed
    results equal the unbucketed ones exactly (padding rows discarded)."""
    pred = Predictor(ModelConfig(name="unet"), bucket_batches=True)
    flat = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    flat.params = pred.params  # same weights
    rng = np.random.default_rng(0)
    x7 = rng.standard_normal((7, 32, 32, 3)).astype(np.float32)
    for b in (3, 5, 7):
        got = pred.predict_proba(x7[:b])
        want = flat.predict_proba(x7[:b])
        assert got.shape == (b, 32, 32, 1)
        np.testing.assert_allclose(got, want, atol=1e-6)
    # sizes 3/5/7 bucket to two executables (batch 4 and batch 8)
    assert pred._forward._cache_size() == 2
    assert flat._forward._cache_size() == 3


def test_predictor_accepts_uint8():
    """uint8 serving input (scaled + ImageNet-normalized on device) matches
    host-normalized float input on the same weights — the 4x-smaller
    transfer path is a pure bandwidth optimization."""
    pred = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(
        pred.predict_proba(u8), pred.predict_proba(f32), atol=1e-5
    )


def test_predictor_multichip_mesh_matches_single():
    """Batch-parallel serving on a 4-device data mesh: outputs equal the
    single-device predictor, and buckets round to equal per-chip shards."""
    import jax

    from eelunet_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices (virtual CPU mesh)")
    mesh = create_mesh(4, 1)
    sharded = Predictor(ModelConfig(name="unet"), mesh=mesh, bucket_batches=True)
    single = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    single.params = jax.device_get(sharded.params)  # same weights
    rng = np.random.default_rng(7)
    for b in (3, 6):  # non-multiples of 4: pad to 4 and 8
        u8 = rng.integers(0, 256, (b, 32, 32, 3), dtype=np.uint8)
        got = sharded.predict_proba(u8)
        assert got.shape == (b, 32, 32, 1)
        np.testing.assert_allclose(got, single.predict_proba(u8), atol=1e-5)


def test_predictor_matches_trainer_eval(tmp_path):
    cfg = apply_overrides(
        TrainConfig(),
        ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
         "seed=0", f"save_dir={tmp_path}/ckpt", f"log_dir={tmp_path}/runs",
         "epochs=1", "snapshot_every=100", "optimizer.lr=0.003"],
    )
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
    loader = DataLoader(ds, batch_size=4)
    state, _ = trainer.fit(loader, loader, loader, log=lambda *a: None)
    path = trainer.ckpt.save("predictor_test", state)

    pred = Predictor(ModelConfig(name="unet"), checkpoint=path)
    x = np.stack([ds[i][0] for i in range(4)])
    probs = pred.predict_proba(x)
    assert probs.shape == (4, 32, 32, 1)
    assert 0.0 <= probs.min() and probs.max() <= 1.0

    masks = pred.predict(x)
    assert set(np.unique(masks)).issubset({0.0, 1.0})

    # untrained predictor differs from the restored one (weights actually loaded)
    fresh = Predictor(ModelConfig(name="unet"))
    probs_fresh = fresh.predict_proba(x)
    assert not np.allclose(probs, probs_fresh)


def test_predict_tiled_matches_full_when_tile_covers():
    """A tile >= the image is one window: tiled == plain forward exactly
    (the blend weight normalizes to 1 everywhere)."""
    pred = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        pred.predict_proba_tiled(x, tile=32, overlap=8),
        pred.predict_proba(x),
        atol=1e-6,
    )


def test_predict_tiled_native_resolution():
    """Non-divisible native sizes are fully covered (shifted last window),
    outputs are valid probabilities at the INPUT resolution, and uint8
    input takes the device-normalize path like predict_proba."""
    pred = Predictor(ModelConfig(name="unet"), bucket_batches=True)
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (1, 50, 70, 3), dtype=np.uint8)
    probs = pred.predict_proba_tiled(u8, tile=32, overlap=8)
    assert probs.shape == (1, 50, 70, 1)
    assert np.isfinite(probs).all()
    assert 0.0 <= probs.min() and probs.max() <= 1.0
    masks = pred.predict_tiled(u8, tile=32, overlap=8)
    assert set(np.unique(masks)).issubset({0.0, 1.0})

    # smaller-than-tile image: reflect-padded up, cropped back
    small = rng.integers(0, 256, (1, 20, 24, 3), dtype=np.uint8)
    out = pred.predict_proba_tiled(small, tile=32, overlap=8)
    assert out.shape == (1, 20, 24, 1)

    # blend normalization: identical probability tiles must reconstruct
    # exactly (weighted average of equal values is that value) — seams
    # introduce no scaling artifacts
    win = Predictor._blend_window(32, 8)
    assert win.shape == (32, 32, 1)
    assert float(win.max()) <= 1.0 and float(win.min()) > 0.0
    ys = Predictor._tile_origins(50, 32, 24)
    assert ys[0] == 0 and ys[-1] == 50 - 32  # shifted last window
    cover = np.zeros(50)
    for y in ys:
        cover[y : y + 32] += 1
    assert (cover >= 1).all()


def test_predict_tiled_rejects_bad_overlap():
    pred = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    x = np.zeros((1, 32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="overlap"):
        pred.predict_proba_tiled(x, tile=32, overlap=32)


def test_predict_mask_wire_matches_host_threshold():
    """The device-side mask program (uint8 wire) must produce exactly the
    host path's values: {0,1} thresholded probabilities for binary models.
    The wire format is the serving fast path (4x fewer readback bytes —
    docs/PERF.md serving section)."""
    from eelunet_tpu.inference import _probs_to_mask

    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    pred = Predictor(ModelConfig(name="unet"), bucket_batches=True)
    wire = pred.predict_mask_wire(x)
    assert wire.dtype == np.uint8 and wire.shape == (3, 32, 32, 1)
    want = _probs_to_mask(pred.predict_proba(x), pred.threshold)
    np.testing.assert_array_equal(wire.astype(np.float32), want)
    # predict() keeps its float32 {0,1} contract on top of the wire
    out = pred.predict(x)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, want)
    # a non-default threshold flows through as a traced argument
    want_lo = _probs_to_mask(pred.predict_proba(x), 0.25)
    np.testing.assert_array_equal(
        pred.predict_mask_wire(x, threshold=0.25).astype(np.float32), want_lo
    )


def test_predict_mask_wire_multiclass_argmax():
    """Multi-class mode: the mask wire carries argmax class ids (uint8),
    matching the host argmax (cli.predict id-mask semantics)."""
    rng = np.random.default_rng(12)
    x = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    pred = Predictor(ModelConfig(name="unet", out_channels=4), bucket_batches=False)
    wire = pred.predict_mask_wire(x)
    assert wire.dtype == np.uint8 and wire.shape == (2, 32, 32, 1)
    want = np.argmax(pred.predict_proba(x), axis=-1)[..., None]
    np.testing.assert_array_equal(wire.astype(np.int64), want)


def test_proba_wire_dtype_bf16_close_and_f32_default():
    """proba_wire_dtype: 'auto' keeps an f32 wire for f32 models (bit-exact);
    forcing 'bfloat16' still RETURNS float32 but rounds through bf16 on the
    wire (<=0.4% relative on probabilities)."""
    rng = np.random.default_rng(13)
    x = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    f32 = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    assert f32._proba_wire is None  # auto on an f32 model
    bf = Predictor(ModelConfig(name="unet"), bucket_batches=False,
                   proba_wire_dtype="bfloat16")
    a, b = f32.predict_proba(x), bf.predict_proba(x)
    assert a.dtype == b.dtype == np.float32
    np.testing.assert_allclose(a, b, atol=4e-3)
    with pytest.raises(ValueError, match="proba_wire_dtype"):
        Predictor(ModelConfig(name="unet"), proba_wire_dtype="int8")
