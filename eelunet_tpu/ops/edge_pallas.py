"""Fused Pallas TPU kernel for the Canny hot path.

One kernel fuses grayscale -> 5x5 Gaussian blur (separable) -> Sobel ->
squared-magnitude -> direction-quantized NMS -> double threshold, replacing
five XLA ops with one VMEM-resident pass (reference pipeline:
utils/tools.py:319-355 runs these as separate conv/pad kernels).

Design notes (see /opt/skills/guides/pallas_guide.md):
- Grid (N, H-tiles). The image is pre-padded by the total receptive radius
  (4 rows) on the host so every slab DMA is static-size and in-bounds; each
  program manually DMAs its (TILE_H + 8, W) slab HBM->VMEM (overlapping
  windows can't be expressed with BlockSpec index maps).
- W rides the lane dimension; all stencil taps are zero-fill row/col shifts
  (concat + slice), which Mosaic lowers to cheap vector shifts.
- No transcendentals: gradient-direction buckets come from |gy| vs
  tan(22.5/67.5)*|gx| comparisons (monotonic in the angle, so identical to
  the reference's atan2-degree quantization), and all magnitude comparisons
  run on mag^2.
- Per-stage zero-padding semantics of the reference are preserved by masking
  out-of-image rows after the blur and after the Sobel stage.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eelunet_tpu.ops.edge import gaussian_kernel

_HALO = 4  # blur(2) + sobel(1) + nms(1)
_TAN22 = float(np.tan(np.deg2rad(22.5)))
_TAN67 = float(np.tan(np.deg2rad(67.5)))


def _g5(sigma: float) -> np.ndarray:
    """1D factor of the normalized 5x5 Gaussian (separable: K = g g^T)."""
    k2 = gaussian_kernel(5, sigma)
    # k2 = outer(g, g) with sum(g) == 1, so g = k2[2, :] / sqrt(k2[2, 2]).
    g = k2[2, :] / np.sqrt(k2[2, 2])
    return g.astype(np.float32)


def _sr(a, d):
    """Row shift with zero fill: out[i] = a[i+d] (d in [-2, 2])."""
    h = a.shape[0]
    z = jnp.zeros((abs(d), a.shape[1]), a.dtype)
    if d == 0:
        return a
    if d > 0:
        return jnp.concatenate([a[d:], z], axis=0)
    return jnp.concatenate([z, a[:d]], axis=0)


def _sc(a, d):
    """Col shift with zero fill: out[:, j] = a[:, j+d]."""
    z = jnp.zeros((a.shape[0], abs(d)), a.dtype)
    if d == 0:
        return a
    if d > 0:
        return jnp.concatenate([a[:, d:], z], axis=1)
    return jnp.concatenate([z, a[:, :d]], axis=1)


def _canny_kernel(x_hbm, out_ref, slab, sem, *, tile_h, w, h, g, low2, high2, hysteresis):
    t = pl.program_id(1)
    i = pl.program_id(0)

    copy = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(t * tile_h, tile_h + 2 * _HALO), :],
        slab,
        sem,
    )
    copy.start()
    copy.wait()
    x = slab[:, :]

    # Validity of each slab row w.r.t. the ORIGINAL image: slab row r holds
    # padded row t*tile_h + r == original row t*tile_h + r - 4.
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2 * _HALO, w), 0)
    orig = t * tile_h + row - _HALO
    valid = (orig >= 0) & (orig < h)

    # --- separable 5-tap Gaussian (zero-fill, then re-mask) ---
    tmp = sum(g[d + 2] * _sr(x, d) for d in range(-2, 3))
    blur = sum(g[d + 2] * _sc(tmp, d) for d in range(-2, 3))
    blur = jnp.where(valid, blur, 0.0)

    # --- Sobel (correlation), zero-fill shifts == per-stage zero padding ---
    dx = _sc(blur, 1) - _sc(blur, -1)
    gx = _sr(dx, -1) + 2.0 * dx + _sr(dx, 1)
    dy = _sr(blur, 1) - _sr(blur, -1)
    gy = _sc(dy, -1) + 2.0 * dy + _sc(dy, 1)
    gx = jnp.where(valid, gx, 0.0)
    gy = jnp.where(valid, gy, 0.0)

    mag2 = gx * gx + gy * gy

    # --- direction buckets without atan2 ---
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    b0 = ay < _TAN22 * ax
    b90 = ay >= _TAN67 * ax
    same_sign = gx * gy > 0.0
    b45 = (~b0) & (~b90) & same_sign
    b135 = (~b0) & (~b90) & (~same_sign)

    # --- NMS on mag^2 (comparisons monotonic) ---
    left = _sc(mag2, -1)
    right = _sc(mag2, 1)
    up = _sr(mag2, -1)
    down = _sr(mag2, 1)
    up_left = _sr(left, -1)
    up_right = _sr(right, -1)
    down_left = _sr(left, 1)
    down_right = _sr(right, 1)

    keep = (
        (b0 & (mag2 >= left) & (mag2 >= right))
        | (b45 & (mag2 >= up_right) & (mag2 >= down_left))
        | (b90 & (mag2 >= up) & (mag2 >= down))
        | (b135 & (mag2 >= up_left) & (mag2 >= down_right))
    )

    if hysteresis:
        strong = keep & (mag2 >= high2)
        weak = keep & (mag2 >= low2) & (mag2 < high2)
        out = jnp.where(strong, 2.0, jnp.where(weak, 1.0, 0.0))
    else:
        # canny_edge semantics: weak edges kept unconditionally (tools.py:349-355)
        out = (keep & (mag2 >= low2)).astype(jnp.float32)

    out_ref[0] = out[_HALO : _HALO + tile_h, :]


@functools.partial(
    jax.jit, static_argnames=("low_threshold", "high_threshold", "gaussian_sigma", "tile_h", "interpret")
)
def fused_canny(
    binary_mask: jnp.ndarray,
    low_threshold: float = 0.2,
    high_threshold: float = 0.8,
    gaussian_sigma: float = 1.0,
    tile_h: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Canny edge detection on (N,H,W,1) float input in [0,1].

    Bit-compatible with ``ops.edge.canny_edge`` (the XLA reference path);
    tested against it. Weak edges are kept unconditionally, matching
    canny_edge_torch (tools.py:319-355).
    """
    n, h, w, c = binary_mask.shape
    assert c == 1, "fused_canny expects single-channel masks"
    x = binary_mask[..., 0].astype(jnp.float32)
    tile_h = min(tile_h, h)
    n_tiles = -(-h // tile_h)
    pad_h = n_tiles * tile_h - h
    x = jnp.pad(x, [(0, 0), (_HALO, _HALO + pad_h), (0, 0)])

    g = tuple(float(v) for v in _g5(gaussian_sigma))

    kernel = functools.partial(
        _canny_kernel,
        tile_h=tile_h,
        w=w,
        h=h,
        g=g,
        low2=float(low_threshold) ** 2,
        high2=float(high_threshold) ** 2,
        hysteresis=False,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile_h, w), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tile_h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x)
    return out[:, :h, :, None]


def fused_canny_auto(binary_mask: jnp.ndarray, **kw) -> jnp.ndarray:
    """fused_canny with interpret-mode fallback off-TPU (tests run on CPU)."""
    interpret = jax.default_backend() != "tpu"
    return fused_canny(binary_mask, interpret=interpret, **kw)
