"""Edge-enhancement preprocessing toolbox tests (ops/enhance.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eelunet_tpu.ops import enhance as EN


def _img_with_square(h=48, w=48):
    x = np.full((1, h, w, 3), 0.2, np.float32)
    x[:, 12:36, 12:36, :] = 0.8
    return x


def test_edge_brighten_runs_and_brightens():
    x = _img_with_square()
    out = np.asarray(EN.edge_brighten(jnp.array(x), alpha=0.3))
    assert out.shape == x.shape
    assert out.max() <= 1.0 and out.min() >= 0.0
    assert out.sum() >= x.sum()  # brightening only adds


def test_per_channel_canny_enhance_shape_and_range():
    x = _img_with_square()
    out = np.asarray(EN.per_channel_canny_enhance(jnp.array(x)))
    assert out.shape == x.shape
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_sobel_magnitude_peaks_at_edges():
    x = _img_with_square()
    mag = np.asarray(EN.sobel_magnitude(jnp.array(x)))[0, :, :, 0]
    assert mag[24, 12] > mag[24, 24]  # edge response > interior
    assert mag[24, 2] < 1e-6          # flat background (float-rounding noise)


def test_laplacian_zero_on_flat():
    x = np.full((1, 16, 16, 3), 0.5, np.float32)
    lap = np.asarray(EN.laplacian(jnp.array(x)))
    assert np.abs(lap[:, 2:-2, 2:-2]).max() < 1e-6


def test_hsv_value_channel():
    x = np.zeros((1, 4, 4, 3), np.float32)
    x[..., 0] = 0.3
    x[..., 1] = 0.7
    x[..., 2] = 0.5
    v = np.asarray(EN.rgb_to_hsv_value(jnp.array(x)))
    np.testing.assert_allclose(v, 0.7)


def test_hsv_hue_sobel_runs():
    x = _img_with_square()
    out = np.asarray(EN.hsv_hue_sobel(jnp.array(x)))
    assert out.shape == (1, 48, 48, 1)
    assert np.all(np.isfinite(out))


def test_morph_close_fills_gap():
    x = np.zeros((1, 16, 16, 1), np.float32)
    x[0, 8, 2:7, 0] = 1.0
    x[0, 8, 9:14, 0] = 1.0  # 2px gap at cols 7-8
    closed = np.asarray(EN._morph_close(jnp.array(x), 5))
    assert closed[0, 8, 7, 0] == 1.0 and closed[0, 8, 8, 0] == 1.0
