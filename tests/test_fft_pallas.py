"""Pallas high-pass kernels vs the XLA low-rank and jnp-FFT golden paths.

Reference behavior: HighFourierTransform (EELUnet.py:144-191). Interpret mode
runs the exact kernel logic on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eelunet_tpu.models.eelunet import high_pass_fft_reference
from eelunet_tpu.ops.fft import high_pass_fft_lowrank
from eelunet_tpu.ops.fft_pallas import high_pass_fft_pallas, pallas_supported


def _rand(shape, seed=0, dtype=jnp.float32):
    x = np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    return jnp.asarray(x, dtype)


@pytest.mark.parametrize(
    "shape,mask_range",
    [
        ((2, 32, 32, 16), 20),   # m clamps to 16, 2m == H
        ((1, 64, 64, 8), 20),    # m = 20 < H/2
        ((2, 16, 32, 8), 4),     # non-square, small mask
        ((1, 32, 48, 4), 6),     # W*C not a power of two (48*4 = 192... pad)
    ],
)
def test_pallas_matches_lowrank_f32(shape, mask_range):
    if not pallas_supported(shape):
        pytest.skip("shape not tiled by the Pallas path")
    x = _rand(shape)
    got = high_pass_fft_pallas(x, mask_range, True)
    want = high_pass_fft_lowrank(x, mask_range)
    assert got.shape == x.shape and got.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-4)


def test_pallas_matches_reference_fft():
    x = _rand((2, 32, 32, 8), seed=3)
    got = high_pass_fft_pallas(x, 10, True)
    want = high_pass_fft_reference(x, 10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-3)


def test_pallas_bf16_close_to_f32():
    x32 = _rand((1, 64, 64, 16), seed=5)
    want = np.asarray(high_pass_fft_lowrank(x32, 20))
    got = np.asarray(high_pass_fft_pallas(x32.astype(jnp.bfloat16), 20, True), np.float32)
    # bf16 matmuls with f32 accumulation: same tolerance class as the
    # XLA bf16 low-rank path (~0.3% relative on the low-pass component).
    err = np.abs(got - want)
    scale = np.abs(want) + np.abs(np.asarray(x32)).mean()
    assert (err / scale).max() < 0.05


@pytest.mark.parametrize(
    "shape,mask_range",
    [
        ((1, 32, 32, 8), 8),
        ((2, 16, 32, 8), 4),    # non-square
        ((1, 32, 32, 4), 20),   # joint clamp: 2m == H
    ],
)
def test_pallas_grad_matches_lowrank_grad(shape, mask_range):
    """The analytic VJP (adjoint low-rank chain on the saved spectrum) must
    match jax.grad of the XLA low-rank path."""
    if not pallas_supported(shape):
        pytest.skip("shape not tiled by the Pallas path")
    x = _rand(shape, seed=7)

    def f_pallas(v):
        return jnp.sum(high_pass_fft_pallas(v, mask_range, True) ** 2)

    def f_lowrank(v):
        return jnp.sum(high_pass_fft_lowrank(v, mask_range) ** 2)

    gp = np.asarray(jax.grad(f_pallas)(x))
    gl = np.asarray(jax.grad(f_lowrank)(x))
    np.testing.assert_allclose(gp, gl, atol=1e-4, rtol=1e-3)


def test_pallas_grad_weighted_cotangent():
    """Non-uniform cotangents exercise the u = g z/|z| path (a sum-of-squares
    loss alone can hide transposition mistakes)."""
    x = _rand((1, 32, 32, 8), seed=9)
    wgt = _rand((1, 32, 32, 8), seed=10)

    gp = np.asarray(jax.grad(lambda v: jnp.sum(wgt * high_pass_fft_pallas(v, 8, True)))(x))
    gl = np.asarray(jax.grad(lambda v: jnp.sum(wgt * high_pass_fft_lowrank(v, 8)))(x))
    np.testing.assert_allclose(gp, gl, atol=1e-4, rtol=1e-3)


def test_bwd_kernels_match_xla_adjoint():
    """The backward kernel pair (B1 contract / B2 expand) must reproduce the
    XLA analytic adjoint bit-for-tolerance on the same saved spectrum."""
    from eelunet_tpu.ops.fft_pallas import (
        _highpass_bwd_impl,
        _highpass_bwd_pallas,
        _highpass_fwd,
    )

    for shape, m, seed in (((2, 32, 32, 8), 8, 11), ((1, 16, 64, 8), 4, 12)):
        x = _rand(shape, seed=seed)
        g = _rand(shape, seed=seed + 100)
        _, (s_r, s_i) = _highpass_fwd(x, m, True)
        want = np.asarray(_highpass_bwd_impl(x, s_r, s_i, g, m))
        got = np.asarray(_highpass_bwd_pallas(x, s_r, s_i, g, m, True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_pallas_supported_predicate():
    assert pallas_supported((8, 512, 512, 64))
    assert pallas_supported((8, 256, 256, 128))
    assert not pallas_supported((1, 7, 64, 3))      # H not tileable
    assert not pallas_supported((1, 64, 13, 3))     # W*C=39 not lane-aligned


def test_pallas_4d_operand_path_matches_lowrank(rng):
    """The 4D-operand kernel variant (lane-aligned channels consume NHWC
    blocks directly, skipping the XLA-level (B,H,W*C) reshape) must match the
    low-rank reference exactly like the 3D path does."""
    import numpy as np

    from eelunet_tpu.ops import fft_pallas as fp
    from eelunet_tpu.ops.fft import high_pass_fft_lowrank

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 128)), jnp.float32)
    want = np.asarray(high_pass_fft_lowrank(x, 8))
    out, s_r, s_i = fp._fwd_core(x, *fp._fwd_factor_args(x, 8), 8, True)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
    # and the 4D condition actually holds for this shape (c == 128)
    assert x.shape[-1] % fp._LANE == 0
