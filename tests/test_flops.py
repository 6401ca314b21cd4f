"""Analytic FLOP counter (utils/flops.py) — hand-computed golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eelunet_tpu.utils import flops as F


def test_dense_flops():
    fn = lambda a, b: a @ b
    a = jnp.zeros((4, 64, 128))
    b = jnp.zeros((128, 256))
    got = F.count_matmul_flops(fn, a, b)
    assert got == 2 * 4 * 64 * 128 * 256


def test_conv_flops():
    def fn(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    x = jnp.zeros((2, 32, 32, 16))
    k = jnp.zeros((3, 3, 16, 32))
    got = F.count_matmul_flops(fn, x, k)
    assert got == 2 * (2 * 32 * 32 * 32) * (3 * 3 * 16)


def test_depthwise_conv_flops():
    def fn(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=16,
        )

    x = jnp.zeros((1, 8, 8, 16))
    k = jnp.zeros((3, 3, 1, 16))
    got = F.count_matmul_flops(fn, x, k)
    assert got == 2 * (1 * 8 * 8 * 16) * (3 * 3 * 1)


def test_scan_multiplies():
    w = jnp.zeros((32, 32))

    def fn(x):
        def body(c, _):
            return c @ w, None
        out, _ = jax.lax.scan(body, x, None, length=5)
        return out

    got = F.count_matmul_flops(fn, jnp.zeros((4, 32)))
    assert got == 5 * 2 * 4 * 32 * 32


def test_model_flops_scale_with_resolution():
    f64 = F.model_forward_flops("unet", 64, batch=1, dtype="float32")
    f128 = F.model_forward_flops("unet", 128, batch=1, dtype="float32")
    assert f64 > 1e9  # 31M-param conv net at 64^2 is >1 GFLOP
    assert f128 == pytest.approx(4 * f64, rel=0.01)  # fully convolutional
    fb4 = F.model_forward_flops("unet", 64, batch=4, dtype="float32")
    assert fb4 == pytest.approx(4 * f64, rel=1e-6)


def test_eelunet_flops_counts_mlps_and_convs():
    f = F.model_forward_flops("eelunet", 64, batch=1)
    assert f > F.model_forward_flops("unext_s", 64, batch=1)


def test_peak_table():
    assert F.peak_flops_for("TPU v5e") == 197e12
    assert F.peak_flops_for("TPU v5 lite chip") == 197e12
    assert F.peak_flops_for("Quantum Abacus") is None
    assert F.mfu_pct(100.0, 1e12, "TPU v5e") == pytest.approx(100 * 1e14 / 197e12)
    assert F.mfu_pct(100.0, 1e12, "???") is None
