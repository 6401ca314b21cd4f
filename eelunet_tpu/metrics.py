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
import numpy as np

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


# ---------------------------------------------------------------------------
# Multi-class metrics (model.out_channels > 1) — beyond-reference (the
# reference evaluates binary masks only, evaluate.py:92-124). A C x C
# confusion matrix is the summable state; scalar names/semantics mirror the
# binary family so checkpoint best-tags (train/checkpoint.py BEST_METRICS)
# and TB scalar names work unchanged:
#   iou/dice/precision/recall/f1: macro over FOREGROUND classes (1..C-1),
#     the multi-class analogue of the binary foreground scores;
#   miou/mdice: macro over ALL classes incl. background — matching the
#     binary convention mIoU = mean(fg, bg);
#   boundary_f1: on the binary foreground mask (pred != 0 vs true != 0).
# ---------------------------------------------------------------------------


class MetricAccumMC(NamedTuple):
    """Summable multi-class state: add across batches, psum across devices."""

    confusion: jnp.ndarray        # (C, C) float32; rows = true, cols = pred
    boundary_f1_sum: jnp.ndarray
    samples: jnp.ndarray

    def __add__(self, other: "MetricAccumMC") -> "MetricAccumMC":
        return MetricAccumMC(*(a + b for a, b in zip(self, other)))

    @staticmethod
    def zeros(num_classes: int) -> "MetricAccumMC":
        z = jnp.zeros((), jnp.float32)
        return MetricAccumMC(jnp.zeros((num_classes, num_classes), jnp.float32), z, z)


def update_metrics_multiclass(
    seg_prob: jnp.ndarray,
    labels: jnp.ndarray,
    dilation_ratio: float = 0.02,
) -> MetricAccumMC:
    """One batch of multi-class metric state.

    ``seg_prob``: (B,H,W,C) softmax probabilities; ``labels``: (B,H,W,1)
    class ids (float or int). Prediction is the argmax class (no threshold
    — the multi-class counterpart of evaluate.py:92's 0.5 binarization)."""
    c = seg_prob.shape[-1]
    pred = jnp.argmax(seg_prob, axis=-1)                       # (B,H,W)
    true = jnp.round(labels[..., 0]).astype(jnp.int32)
    true = jnp.clip(true, 0, c - 1)
    flat = (true * c + pred).reshape(-1)
    confusion = jnp.bincount(flat, length=c * c).reshape(c, c).astype(jnp.float32)
    fg_pred = (pred > 0).astype(jnp.float32)[..., None]
    fg_true = (true > 0).astype(jnp.float32)[..., None]
    bf1 = jnp.sum(boundary_f1_batch(fg_true, fg_pred, dilation_ratio))
    n = jnp.asarray(seg_prob.shape[0], jnp.float32)
    return MetricAccumMC(confusion, bf1, n)


def per_class_metrics(acc: MetricAccumMC) -> Dict[str, np.ndarray]:
    """Per-class iou/dice/precision/recall vectors (host numpy) from the
    confusion matrix — the drill-down behind the macro scalars."""
    conf = np.asarray(acc.confusion)
    tp = np.diag(conf)
    fn = conf.sum(1) - tp
    fp = conf.sum(0) - tp
    return {
        "iou": tp / (tp + fp + fn + EPS),
        "dice": 2 * tp / (2 * tp + fp + fn + EPS),
        "precision": tp / (tp + fp + EPS),
        "recall": tp / (tp + fn + EPS),
        "support": conf.sum(1),
    }


def finalize_metrics_multiclass(acc: MetricAccumMC) -> Dict[str, jnp.ndarray]:
    """Scalar metrics from the confusion matrix (names == METRIC_NAMES)."""
    conf = acc.confusion
    tp = jnp.diagonal(conf)                       # (C,)
    fn = jnp.sum(conf, axis=1) - tp               # true row minus diagonal
    fp = jnp.sum(conf, axis=0) - tp               # pred col minus diagonal
    iou_c = tp / (tp + fp + fn + EPS)
    dice_c = 2 * tp / (2 * tp + fp + fn + EPS)
    prec_c = tp / (tp + fp + EPS)
    rec_c = tp / (tp + fn + EPS)
    f1_c = 2 * prec_c * rec_c / (prec_c + rec_c + EPS)
    total = jnp.sum(conf)
    return {
        "pixel_accuracy": jnp.sum(tp) / (total + EPS),
        "precision": jnp.mean(prec_c[1:]),
        "recall": jnp.mean(rec_c[1:]),
        "f1_score": jnp.mean(f1_c[1:]),
        "iou": jnp.mean(iou_c[1:]),
        "dice": jnp.mean(dice_c[1:]),
        "miou": jnp.mean(iou_c),
        "boundary_f1": acc.boundary_f1_sum / (acc.samples + EPS),
        "mdice": jnp.mean(dice_c),
    }
