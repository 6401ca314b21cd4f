"""StableHLO export artifacts (eelunet_tpu/export.py): a deserialized
program must reproduce the live Predictor bit-for-bit on the same uint8
input, pad ragged batches to the next bucket, and carry its own weights
(two different checkpoints -> different artifact outputs)."""

from __future__ import annotations

import numpy as np
import pytest

from eelunet_tpu.config import ModelConfig
from eelunet_tpu.export import ExportedModel, export_model
from eelunet_tpu.inference import Predictor


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("art") / "unet32")
    # cpu-only export: the test env has no tpu lowering target
    export_model(ModelConfig(name="unet"), None, (32, 32), (2, 4), out,
                 platforms=("cpu",))
    return out


def test_exported_matches_live_predictor(artifact):
    exported = ExportedModel(artifact)
    # fresh Predictor with the SAME seed-0 init as export_model's
    pred = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    got = exported.predict_proba(u8)
    want = pred.predict_proba(u8)
    assert got.shape == (2, 32, 32, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ragged_batch_pads_to_bucket(artifact):
    exported = ExportedModel(artifact)
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    out3 = exported.predict_proba(u8)          # pads to the b=4 bucket
    assert out3.shape == (3, 32, 32, 1)
    np.testing.assert_allclose(out3, exported.predict_proba(np.concatenate(
        [u8, np.zeros((1, 32, 32, 3), np.uint8)]))[:3], atol=0)
    with pytest.raises(ValueError, match="largest exported bucket"):
        exported.predict_proba(rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8))


def test_meta_describes_artifact(artifact):
    m = ExportedModel(artifact).meta
    assert m["model"] == "unet"
    assert m["image_size"] == [32, 32]
    assert m["batch_sizes"] == [2, 4]


def test_weights_are_baked_in(tmp_path):
    """Exports from different weights differ: the artifact carries the
    checkpoint, not an init convention."""
    import jax

    from eelunet_tpu.registry import create_model

    out = str(tmp_path / "reinit")
    export_model(ModelConfig(name="unet"), None, (32, 32), (2,), out,
                 platforms=("cpu",))
    a = ExportedModel(out)
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)

    pred = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    model, _ = create_model(ModelConfig(name="unet"))
    vs = model.init(jax.random.PRNGKey(123), np.zeros((1, 32, 32, 3), np.float32))
    pred.params = vs["params"]
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std
    assert not np.allclose(a.predict_proba(u8), pred.predict_proba(f32), atol=1e-3)


def test_quantized_export(tmp_path):
    """--quantize int8 bakes the W8A8 conv rewrite into the artifact: it
    loads Python-model-free, stays close to the dense artifact's output,
    and is tagged in meta.json."""
    import json
    import os

    dense_dir, quant_dir = str(tmp_path / "dense"), str(tmp_path / "quant")
    export_model(ModelConfig(name="unet"), None, (32, 32), (2,), dense_dir,
                 platforms=("cpu",))
    export_model(ModelConfig(name="unet"), None, (32, 32), (2,), quant_dir,
                 platforms=("cpu",), quantize="int8")
    meta = json.load(open(os.path.join(quant_dir, "meta.json")))
    assert meta["quantize"] == "int8"

    dense, quant = ExportedModel(dense_dir), ExportedModel(quant_dir)
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    dp, qp = dense.predict_proba(u8), quant.predict_proba(u8)
    assert qp.shape == dp.shape
    assert float(np.abs(qp - dp).max()) < 0.1
    assert not np.array_equal(qp, dp)  # the rewrite is actually in the program

    with pytest.raises(ValueError, match="quantize"):
        export_model(ModelConfig(name="unet"), None, (32, 32), (2,),
                     str(tmp_path / "bad"), platforms=("cpu",), quantize="int4")
