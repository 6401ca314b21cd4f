"""On-device evaluation metrics — TPU-native rebuild of reference evaluate.py.

The reference accumulates confusion counts on device but computes boundary F1
per-sample on the host with cv2 (evaluate.py:102-109 — a device->host
round-trip per image). Here everything is batched device math: erosion is an
iterated 3x3 min-filter expressed as one ``reduce_window`` min over a
(2d+1)x(2d+1) square (exact for binary masks, identical to ``cv2.erode`` with
its default +inf border), and the metric reduction is a pure function of
summable counts so it composes with ``psum`` across a data-parallel mesh.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7  # evaluate.py:111


class MetricAccum(NamedTuple):
    """Summable accumulator: add across batches (and psum across devices)."""

    tp: jnp.ndarray
    tn: jnp.ndarray
    fp: jnp.ndarray
    fn: jnp.ndarray
    boundary_f1_sum: jnp.ndarray
    samples: jnp.ndarray

    def __add__(self, other: "MetricAccum") -> "MetricAccum":
        return MetricAccum(*(a + b for a, b in zip(self, other)))

    @staticmethod
    def zeros() -> "MetricAccum":
        z = jnp.zeros((), jnp.float32)
        return MetricAccum(z, z, z, z, z, z)


def erode_binary(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """Binary erosion by an iterated 3x3 ones kernel == one (2d+1)^2 min-pool.

    Matches cv2.erode(mask*255, ones(3,3), iterations=d) for binary input
    (evaluate.py:36-38): the default cv2 morphology border value is +inf, which
    is exactly reduce_window's init value for padding.
    """
    k = 2 * iterations + 1
    return jax.lax.reduce_window(
        mask.astype(jnp.float32),
        jnp.inf,
        jax.lax.min,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (iterations, iterations), (iterations, iterations), (0, 0)],
    )


def seg2bnd(mask: jnp.ndarray, dilation_ratio: float = 0.02) -> jnp.ndarray:
    """Boundary extraction (evaluate.py:25-41): mask - erode(mask).

    ``mask``: (B,H,W,1) in {0,1}. Erosion iterations = round(mean(H,W)*ratio).
    """
    h, w = mask.shape[1], mask.shape[2]
    d = max(int(round((h + w) / 2.0 * dilation_ratio)), 1)
    m = (mask > 0.5).astype(jnp.float32)
    eroded = erode_binary(m, d)
    return (m - eroded) > 0.5


def boundary_f1_batch(gt: jnp.ndarray, pred: jnp.ndarray, dilation_ratio: float = 0.02) -> jnp.ndarray:
    """Per-sample Boundary F1 (evaluate.py:43-60), fully vectorized. -> (B,)"""
    gt_b = seg2bnd(gt, dilation_ratio)
    pred_b = seg2bnd(pred, dilation_ratio)
    axes = (1, 2, 3)
    tp = jnp.sum(gt_b & pred_b, axis=axes).astype(jnp.float32)
    precision = tp / (jnp.sum(pred_b, axis=axes) + EPS)
    recall = tp / (jnp.sum(gt_b, axis=axes) + EPS)
    denom = precision + recall
    return jnp.where(denom == 0, 0.0, 2.0 * precision * recall / jnp.where(denom == 0, 1.0, denom))


def update_metrics(
    seg_prob: jnp.ndarray,
    labels: jnp.ndarray,
    threshold: float = 0.5,
    dilation_ratio: float = 0.02,
) -> MetricAccum:
    """One batch worth of metric state (evaluate.py:92-109)."""
    preds = (seg_prob > threshold).astype(jnp.float32)
    t = (labels > 0.5).astype(jnp.float32)
    p = preds.reshape(-1)
    lbl = t.reshape(-1)
    tp = jnp.sum(p * lbl)
    tn = jnp.sum((1 - p) * (1 - lbl))
    fp = jnp.sum(p * (1 - lbl))
    fn = jnp.sum((1 - p) * lbl)
    bf1 = jnp.sum(boundary_f1_batch(t, preds, dilation_ratio))
    n = jnp.asarray(preds.shape[0], jnp.float32)
    return MetricAccum(tp, tn, fp, fn, bf1, n)


def finalize_metrics(acc: MetricAccum) -> Dict[str, jnp.ndarray]:
    """Closed-form scalar metrics (evaluate.py:111-124)."""
    tp, tn, fp, fn = acc.tp, acc.tn, acc.fp, acc.fn
    pixel_accuracy = (tp + tn) / (tp + tn + fp + fn + EPS)
    precision = tp / (tp + fp + EPS)
    recall = tp / (tp + fn + EPS)
    f1 = 2 * precision * recall / (precision + recall + EPS)
    iou = tp / (tp + fp + fn + EPS)
    dice_fg = 2 * tp / (2 * tp + fp + fn + EPS)
    dice_bg = 2 * tn / (2 * tn + fp + fn + EPS)
    mdice = (dice_fg + dice_bg) / 2
    iou_bg = tn / (tn + fp + fn + EPS)
    miou = (iou + iou_bg) / 2
    boundary_f1 = acc.boundary_f1_sum / (acc.samples + EPS)
    return {
        "pixel_accuracy": pixel_accuracy,
        "precision": precision,
        "recall": recall,
        "f1_score": f1,
        "iou": iou,
        "dice": dice_fg,
        "miou": miou,
        "boundary_f1": boundary_f1,
        "mdice": mdice,
    }


METRIC_NAMES: Tuple[str, ...] = (
    "pixel_accuracy", "precision", "recall", "f1_score", "iou",
    "dice", "miou", "boundary_f1", "mdice",
)
