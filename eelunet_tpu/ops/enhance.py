"""Edge-enhancement preprocessing toolbox — batched device versions of the
reference's per-image OpenCV exploration scripts (augmentation/canny.py,
RGB_canny.py, Sobel.py, Sobel_gradient.py, hsv.py).

All functions take NHWC float batches in [0,1] and are jit-safe. The
reference's GrabCut seeding (augmentation/Grabcut.py) is a 0-byte stub
upstream and intentionally not reproduced.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from eelunet_tpu.ops.edge import (
    canny_edge_improve,
    gaussian_blur,
    rgb_to_grayscale,
    sobel_gradients,
)


def _morph_close(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Binary morphological close: dilate then erode with a k x k kernel
    (augmentation/canny.py's cv2.morphologyEx MORPH_CLOSE)."""
    pads = [(0, 0), ((k - 1) // 2, k // 2), ((k - 1) // 2, k // 2), (0, 0)]
    dil = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), pads)
    ero = jax.lax.reduce_window(dil, jnp.inf, jax.lax.min, (1, k, k, 1), (1, 1, 1, 1), pads)
    return ero


@partial(jax.jit, static_argnames=("close_k",))
def edge_brighten(images: jnp.ndarray, alpha: float = 0.3, close_k: int = 10) -> jnp.ndarray:
    """Gaussian blur -> Canny -> morphological close -> masked edge-brightening
    fusion (augmentation/canny.py:9-62 pipeline, batched)."""
    gray = rgb_to_grayscale(gaussian_blur(images))
    edges = canny_edge_improve(gray, 5.0 / 255.0, 200.0 / 255.0)
    closed = _morph_close(edges, close_k)
    brightened = jnp.clip(images * (1.0 + alpha), 0.0, 1.0)
    return jnp.where(closed > 0.5, brightened, images)


@jax.jit
def per_channel_canny_enhance(
    images: jnp.ndarray,
    thresholds: Tuple[Tuple[float, float], ...] = ((0.17, 0.59), (0.2, 0.63), (0.23, 0.67)),
    gain: float = 20.0,
    mix: Tuple[float, float] = (0.7, 0.3),
) -> jnp.ndarray:
    """Per-RGB-channel Canny with per-channel thresholds, then weighted fusion
    of the edge-amplified channel back into the image
    (augmentation/RGB_canny.py: per-channel cv2.Canny + aug_image_with_edge)."""
    outs = []
    for c, (lo, hi) in enumerate(thresholds):
        ch = images[..., c : c + 1]
        edges = canny_edge_improve(ch, lo, hi)
        amplified = jnp.clip(ch + edges * gain / 255.0 * gain, 0.0, 1.0)
        outs.append(mix[0] * ch + mix[1] * amplified)
    return jnp.clip(jnp.concatenate(outs, axis=-1), 0.0, 1.0)


@jax.jit
def sobel_magnitude(images: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude of the grayscale image
    (augmentation/Sobel.py:8-18)."""
    gray = rgb_to_grayscale(images)
    gx, gy = sobel_gradients(gray)
    return jnp.sqrt(gx * gx + gy * gy)


@jax.jit
def laplacian(images: jnp.ndarray) -> jnp.ndarray:
    """3x3 Laplacian of the grayscale image (augmentation/Sobel.py's
    cv2.Laplacian)."""
    gray = rgb_to_grayscale(images)
    k = jnp.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], gray.dtype)
    return jax.lax.conv_general_dilated(
        gray, k[:, :, None, None], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def rgb_to_hsv_value(images: jnp.ndarray) -> jnp.ndarray:
    """The HSV V channel == max over RGB (what augmentation/hsv.py:8-13
    actually indexes, despite its 'hue' label)."""
    return jnp.max(images, axis=-1, keepdims=True)


@jax.jit
def hsv_value_canny(images: jnp.ndarray, low: float = 180.0 / 255.0, high: float = 220.0 / 255.0) -> jnp.ndarray:
    """Canny on the HSV V channel (augmentation/hsv.py)."""
    return canny_edge_improve(rgb_to_hsv_value(images), low, high)


@jax.jit
def hsv_hue_sobel(images: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude of the HSV hue channel
    (augmentation/Sobel_gradient.py:8-20)."""
    r, g, b = images[..., 0:1], images[..., 1:2], images[..., 2:3]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = mx - mn + 1e-8
    h = jnp.where(
        mx == r, (g - b) / delta % 6.0,
        jnp.where(mx == g, (b - r) / delta + 2.0, (r - g) / delta + 4.0),
    ) / 6.0
    gx, gy = sobel_gradients(h)
    return jnp.sqrt(gx * gx + gy * gy)
