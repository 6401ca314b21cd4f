"""Offline feature-map / image visualization (reference utils/tools.py:12-123).

The reference calls ``visualize_feature_maps`` TEN times inside
``EELUnet.forward``, writing PNGs on every forward pass (EELUnet.py:389-462).
Here visualization is an offline utility over intermediates captured with
flax's ``capture_intermediates`` — zero cost in the hot loop:

    out, mods = model.apply(vars, x, train=False, capture_intermediates=True,
                            mutable=["intermediates"])
    save_feature_grid(mods["intermediates"]["enc1"]["__call__"][0], "enc1.png")

Uses matplotlib when available, else raw-PNG via PIL.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def _to_grid(fm: np.ndarray, num_cols: int = 8, max_maps: int = 64) -> np.ndarray:
    """(H, W, C) or (1, H, W, C) feature maps -> tiled grayscale grid."""
    fm = np.asarray(fm)
    if fm.ndim == 4:
        fm = fm[0]
    h, w, c = fm.shape
    c = min(c, max_maps)
    rows = math.ceil(c / num_cols)
    grid = np.zeros((rows * h, num_cols * w), np.float32)
    for i in range(c):
        ch = fm[:, :, i]
        lo, hi = ch.min(), ch.max()
        ch = (ch - lo) / (hi - lo + 1e-8)
        r, col = divmod(i, num_cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = ch
    return grid


def save_feature_grid(fm, save_path: str, num_cols: int = 8, title: Optional[str] = None):
    """Save a channel grid PNG of a feature map (tools.py:12-75 equivalent)."""
    grid = _to_grid(fm, num_cols)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(10, 10 * grid.shape[0] / max(grid.shape[1], 1)))
        plt.imshow(grid, cmap="viridis")
        if title:
            plt.title(title)
        plt.axis("off")
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    except ImportError:
        from PIL import Image

        Image.fromarray((grid * 255).astype(np.uint8), mode="L").save(save_path)


def save_image(img, save_path: str):
    """Save an (H,W,C) or (H,W) array in [0,1] as PNG (tools.py:158-209)."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    if np.issubdtype(arr.dtype, np.floating):
        if arr.max() > 1.0:
            arr = arr / 255.0
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    mode = "L" if arr.ndim == 2 else "RGB"
    Image.fromarray(arr, mode=mode).save(save_path)


def edge_seg_contribution(seg_out: np.ndarray, edge_out: np.ndarray) -> dict:
    """Diagnostic: which branch wins max(seg, edge) per pixel
    (calculate_contribution, tools.py:422-470)."""
    seg_out = np.asarray(seg_out)
    edge_out = np.asarray(edge_out)
    if seg_out.shape != edge_out.shape:
        raise ValueError(f"shape mismatch: {seg_out.shape} vs {edge_out.shape}")
    mx = np.maximum(seg_out, edge_out)
    total = seg_out.size
    seg_n = float((seg_out == mx).sum())
    edge_n = float((edge_out == mx).sum())
    eq_n = float((seg_out == edge_out).sum())
    overlap = max(seg_n + edge_n - total, 0.0)
    seg_n -= overlap / 2
    edge_n -= overlap / 2
    return {
        "seg_out_contribution": 100.0 * seg_n / total,
        "edge_out_contribution": 100.0 * edge_n / total,
        "equal_elements": 100.0 * eq_n / total,
    }
