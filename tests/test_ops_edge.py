"""Edge-op library tests: stage-by-stage golden checks vs independent
numpy/scipy implementations and the reference's documented semantics
(utils/tools.py:126-419)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from eelunet_tpu.ops import edge as E


def test_rgb_to_grayscale(rng):
    x = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(E.rgb_to_grayscale(jnp.array(x)))
    want = 0.299 * x[..., :1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gaussian_kernel_normalized():
    k = E.gaussian_kernel(5, 1.0)
    assert k.shape == (5, 5)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[2, 2] == k.max()
    np.testing.assert_allclose(k, k.T, atol=1e-7)


def test_gaussian_blur_vs_scipy(rng):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    x = rng.uniform(size=(1, 16, 16, 1)).astype(np.float32)
    got = np.asarray(E.gaussian_blur(jnp.array(x)))[0, :, :, 0]
    k = E.gaussian_kernel(5, 1.0)
    want = scipy_ndimage.convolve(x[0, :, :, 0], k[::-1, ::-1], mode="constant")
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sobel_gradients_vertical_edge():
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[:, :, 4:, :] = 1.0
    gx, gy = E.sobel_gradients(jnp.array(x))
    gx, gy = np.asarray(gx), np.asarray(gy)
    assert np.abs(gx[0, 4, 6, 0]) == 0  # interior of flat region (cols 5-7 all 1)
    assert np.abs(gx[0, 4, 3, 0]) == 4  # step response on each side of the edge
    assert np.abs(gx[0, 4, 4, 0]) == 4
    assert np.abs(gy[0, 4, 3, 0]) < 1e-6  # horizontal gradient only


def test_nms_keeps_ridge():
    """A 1px-wide vertical ridge survives NMS; its shoulders don't."""
    mag = np.zeros((1, 9, 9, 1), np.float32)
    mag[0, :, 4, 0] = 1.0
    mag[0, :, 3, 0] = 0.4
    mag[0, :, 5, 0] = 0.4
    ang = np.zeros((1, 9, 9, 1), np.float32)  # gradient along x
    out = np.asarray(E.non_max_suppression(jnp.array(mag), jnp.array(ang)))
    assert np.all(out[0, :, 4, 0] == 1.0)
    assert np.all(out[0, :, 3, 0] == 0.0)
    assert np.all(out[0, :, 5, 0] == 0.0)


def test_canny_on_disk_mask():
    """Canny of a binary disk yields a thin closed ring near the circle."""
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - 32) ** 2 + (xx - 32) ** 2) < 18**2).astype(np.float32)[None, :, :, None]
    edges = np.asarray(E.canny_edge(jnp.array(mask)))
    assert edges.sum() > 0
    rr = np.sqrt((yy - 32) ** 2 + (xx - 32) ** 2)
    on = edges[0, :, :, 0] > 0
    # all edge pixels within a few px of the true circle
    assert np.all(np.abs(rr[on] - 18) < 4)


def test_hysteresis_connects_weak_to_strong():
    strong = np.zeros((1, 16, 16, 1), np.float32)
    weak = np.zeros_like(strong)
    strong[0, 8, 2, 0] = 1.0
    weak[0, 8, 3:10, 0] = 1.0       # chain touching the strong pixel
    weak[0, 2, 12:14, 0] = 1.0      # isolated weak pixels far away
    out = np.asarray(E.hysteresis_thresholding(jnp.array(strong), jnp.array(weak)))
    assert np.all(out[0, 8, 2:10, 0] == 1.0)   # chain absorbed
    assert np.all(out[0, 2, 12:14, 0] == 0.0)  # isolated weak dropped


def test_hysteresis_no_strong_is_empty():
    strong = np.zeros((1, 8, 8, 1), np.float32)
    weak = np.ones_like(strong)
    out = np.asarray(E.hysteresis_thresholding(jnp.array(strong), jnp.array(weak)))
    assert out.sum() == 0


def test_canny_improve_jits_and_runs():
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - 16) ** 2 + (xx - 16) ** 2) < 9**2).astype(np.float32)[None, :, :, None]
    edges = np.asarray(E.canny_edge_improve(jnp.array(mask)))
    assert edges.shape == mask.shape
    assert 0 < edges.sum() < mask.size  # neither empty nor flooded


def test_generate_edge_label_localizes_boundary():
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - 32) ** 2 + (xx - 32) ** 2) < 20**2).astype(np.float32)[None, :, :, None]
    lbl = np.asarray(E.generate_edge_label(jnp.array(mask)))
    rr = np.sqrt((yy - 32) ** 2 + (xx - 32) ** 2)
    on = lbl[0, :, :, 0] > 0
    assert on.sum() > 0
    assert np.all(np.abs(rr[on] - 20) < 5)
