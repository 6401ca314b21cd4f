"""int8 PTQ path (eelunet_tpu/quantize.py): jaxpr rewrite correctness,
family coverage, Predictor wiring, and trained-model mask agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eelunet_tpu.config import ModelConfig
from eelunet_tpu.quantize import quantize_fn
from eelunet_tpu.registry import create_model, seg_probabilities


def _fwd_fn(model, meta, variables):
    bs = variables.get("batch_stats", {})

    def fwd(params, images):
        v = {"params": params}
        if bs:
            v["batch_stats"] = bs
        return seg_probabilities(model.apply(v, images, train=False), meta)

    return fwd


def test_quantized_conv_exact_on_grid():
    """Inputs already on the int8 grid round-trip losslessly: the quantized
    conv must equal the float conv bit-for-bit (scales absmax/127, values
    integer multiples)."""

    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (1, 8, 8, 4)).astype(np.float32)
    x.flat[0] = 127.0  # pin the absmax so s_x = 1
    k = rng.integers(-127, 128, (3, 3, 4, 6)).astype(np.float32)
    k[0, 0, 0, :] = 127.0  # per-cout absmax = 127 -> s_k = 1

    def conv(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    stats = {}
    got = quantize_fn(conv, stats=stats)(jnp.asarray(x), jnp.asarray(k))
    want = conv(jnp.asarray(x), jnp.asarray(k))
    assert stats["quantized_convs"] == 1
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantized_dot_exact_on_grid():
    """Dense-shaped dot_general (nn.Dense / token-MLP matmuls) quantizes
    losslessly on the int8 grid, like the conv path."""
    rng = np.random.default_rng(7)
    a = rng.integers(-127, 128, (5, 16)).astype(np.float32)
    a.flat[0] = 127.0
    b = rng.integers(-127, 128, (16, 7)).astype(np.float32)
    b[0, :] = 127.0  # per-column absmax -> s = 1
    stats = {}
    got = quantize_fn(lambda x, w: x @ w, stats=stats)(jnp.asarray(a), jnp.asarray(b))
    assert stats == {"quantized_dots": 1}
    np.testing.assert_array_equal(np.asarray(got), a @ b)


def test_batched_dots_not_rewritten():
    """einsum-style contractions with batch dims replay dense (only the
    Dense shape is eligible)."""
    rng = np.random.default_rng(8)
    a = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 16, 7)), jnp.float32)
    stats = {}
    got = quantize_fn(lambda x, w: jnp.einsum("bij,bjk->bik", x, w), stats=stats)(a, b)
    assert stats.get("quantized_dots", 0) == 0
    np.testing.assert_allclose(
        np.asarray(got), np.einsum("bij,bjk->bik", np.asarray(a), np.asarray(b)),
        rtol=1e-5,
    )


def test_remat_convs_are_quantized():
    """jax.checkpoint wraps the body in a remat2 call — the rewrite must
    recurse into it, not silently replay dense."""

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)
    stats = {}
    got = quantize_fn(jax.checkpoint(conv), stats=stats)(x, k)
    assert stats.get("quantized_convs", 0) == 1
    want = quantize_fn(conv)(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_precision_pinned_matmuls_stay_exact():
    """Ops that pin HIGH/HIGHEST precision opt OUT of quantization — the
    low-rank FFT high-pass relies on exact x - lowpass(x) cancellation
    (ops/fft.py pins HIGHEST; CLAUDE.md precision rule), and int8 noise in
    eelunet's edge branch would corrupt the enhancement signal."""
    from eelunet_tpu.ops.fft import high_pass_fft_lowrank

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 2)), jnp.float32)
    stats = {}
    got = quantize_fn(lambda a: high_pass_fft_lowrank(a, 20), stats=stats)(x)
    assert stats.get("quantized_dots", 0) == 0
    ref = high_pass_fft_lowrank(x, 20)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # explicitly pinned dots are skipped even in plain matmuls
    a = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 7)), jnp.float32)
    st = {}
    quantize_fn(
        lambda p, q: jnp.matmul(p, q, precision=jax.lax.Precision.HIGHEST), stats=st
    )(a, b)
    assert st.get("quantized_dots", 0) == 0


def test_grouped_convs_not_rewritten():
    """Depthwise convs (feature_group_count > 1) stay dense — they are
    bandwidth-bound and the rewrite would buy nothing."""

    def dwconv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4,
        )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 4)), jnp.float32)
    stats = {}
    got = quantize_fn(dwconv, stats=stats)(x, k)
    assert stats.get("quantized_convs", 0) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(dwconv(x, k)), rtol=1e-6)


@pytest.mark.parametrize("name", ["unet", "unext_s", "egeunet", "malunet"])
def test_families_quantize(name):
    """Every family's forward survives the rewrite with >0 convs quantized
    and probabilities close to the dense forward (random weights — trained
    agreement is covered below)."""
    model, meta = create_model(ModelConfig(name=name))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 32, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = _fwd_fn(model, meta, variables)
    stats = {}
    got = np.asarray(jax.jit(quantize_fn(fwd, stats=stats))(variables["params"], x))
    ref = np.asarray(fwd(variables["params"], x))
    assert stats["quantized_convs"] > 0
    assert np.isfinite(got).all()
    assert got.min() >= 0.0 and got.max() <= 1.0
    # dynamic W8A8 with per-tensor activation scales: loose bound by design
    assert float(np.abs(got - ref).max()) < 0.15


def test_predictor_quantize_wiring():
    from eelunet_tpu.inference import Predictor

    with pytest.raises(ValueError, match="quantize"):
        Predictor(ModelConfig(name="unet"), quantize="int4")

    dense = Predictor(ModelConfig(name="unet"), bucket_batches=False)
    quant = Predictor(ModelConfig(name="unet"), bucket_batches=False, quantize="int8")
    quant.params = dense.params
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    qp = quant.predict_proba(u8)
    dp = dense.predict_proba(u8)
    assert qp.shape == dp.shape
    assert float(np.abs(qp - dp).max()) < 0.1
    # the rewrite actually changed the computation (int8 rounding is visible
    # at f32 resolution)
    assert not np.array_equal(qp, dp)


def test_quantize_trained_mask_agreement(tmp_path):
    """On a TRAINED model the int8 masks must agree with dense masks almost
    everywhere — the deployment-facing accuracy statement."""
    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.data.pipeline import DataLoader
    from eelunet_tpu.data.synthetic import SyntheticDataset
    from eelunet_tpu.inference import Predictor
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(
        TrainConfig(),
        ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
         "epochs=2", "seed=0", f"save_dir={tmp_path}/ckpt", f"log_dir={tmp_path}/runs",
         "snapshot_every=100", "optimizer.lr=0.003"],
    )
    ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
    loader = DataLoader(ds, batch_size=4)
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state, _ = trainer.fit(loader, loader, loader, log=lambda *a: None)
    path = trainer.ckpt.save("quant_test", state)

    dense = Predictor(ModelConfig(name="unet"), checkpoint=path, bucket_batches=False)
    quant = Predictor(
        ModelConfig(name="unet"), checkpoint=path, bucket_batches=False, quantize="int8"
    )
    x = np.stack([ds[i][0] for i in range(8)])
    md, mq = dense.predict(x), quant.predict(x)
    agreement = float((md == mq).mean())
    assert agreement > 0.98, f"mask agreement {agreement}"
