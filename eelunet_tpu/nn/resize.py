"""Bilinear resize with exact PyTorch semantics (both align_corners modes).

``jax.image.resize`` has no ``align_corners`` option, but the reference models
lean on ``F.interpolate(..., mode='bilinear', align_corners=True)`` heavily
(egeunet.py:353-385, malunet.py:305-322) and on the default
``align_corners=False`` in unext.py:296-323. This module implements both as a
gather + lerp, which XLA fuses well on TPU (NHWC: H, W are the leading spatial
axes, gathers stay out of the lane dimension).
"""

from __future__ import annotations

import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """Source sampling coordinates for each output index (float32, clipped)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_size - 1) / (out_size - 1)
        src = i * scale
    else:
        scale = in_size / out_size
        src = (i + 0.5) * scale - 0.5
    return jnp.clip(src, 0.0, float(in_size - 1))


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int, *, align_corners: bool = False) -> jnp.ndarray:
    """Bilinearly resize an NHWC tensor to (out_h, out_w).

    Bit-matches ``torch.nn.functional.interpolate(mode='bilinear')`` for both
    ``align_corners`` settings (PyTorch clamps source coordinates to the valid
    range, i.e. edge replication).
    """
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    ys = _source_coords(out_h, h, align_corners)
    xs = _source_coords(out_w, w, align_corners)

    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wy = (ys - y0.astype(jnp.float32))[:, None, None]  # (out_h, 1, 1)

    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wx = (xs - x0.astype(jnp.float32))[:, None]        # (out_w, 1)

    # Gather rows then columns; take() along a single axis lowers to cheap
    # XLA gathers that fuse with the lerp.
    rows0 = jnp.take(xf, y0, axis=-3)
    rows1 = jnp.take(xf, y1, axis=-3)
    rows = rows0 * (1.0 - wy) + rows1 * wy            # (..., out_h, w, C)

    cols0 = jnp.take(rows, x0, axis=-2)
    cols1 = jnp.take(rows, x1, axis=-2)
    out = cols0 * (1.0 - wx) + cols1 * wx             # (..., out_h, out_w, C)
    return out.astype(dtype)


def upsample2x_bilinear(x: jnp.ndarray, *, align_corners: bool = False) -> jnp.ndarray:
    """2x bilinear upsampling of an NHWC tensor (F.interpolate scale_factor=2)."""
    return resize_bilinear(x, x.shape[-3] * 2, x.shape[-2] * 2, align_corners=align_corners)
