"""Loss family — exact functional equivalents of reference utils/Loss.py.

All losses take **probabilities** (not logits), matching the reference's
``nn.BCELoss``-on-sigmoid convention (Loss.py:45-55). Tensors are NHWC with a
trailing channel of 1. Every function is jit/vmap/grad-safe (static shapes, no
data-dependent Python control flow).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from eelunet_tpu.nn.layers import max_pool2d

# torch.nn.BCELoss semantics, replicated EXACTLY (verified per-step against
# the reference by tools/trajectory_parity.py — a softer eps-clip fork the
# trained trajectories whenever outputs saturate):
#   forward:  -(t*max(log p, -100) + (1-t)*max(log1p(-p), -100))
#             (aten binary_cross_entropy clamps each log term at -100)
#   backward: (p - t) / max(p*(1-p), 1e-12)
#             (aten binary_cross_entropy_backward, EPSILON=1e-12)
# The custom VJP is what keeps this gradient-safe: plain autodiff of the
# clamped forward is NaN at p in {0, 1} (0 * inf through the max), and
# sigmoid saturates to exactly those in bf16 (|x|>9) and f32 (|x|>17) —
# observed as a step-7 NaN on TPU before the clamp existed. torch's own
# backward formula is finite everywhere (|grad| <= 1e12), so matching it
# gives bit-parity AND safety.
_BCE_LOG_CLAMP = -100.0
_BCE_GRAD_EPS = 1e-12
_PROB_EPS = 1e-7  # multi-class ce_loss only (no torch counterpart upstream)


@jax.custom_vjp
def _bce_elem(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    log_p = jnp.maximum(jnp.log(p), _BCE_LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log1p(-p), _BCE_LOG_CLAMP)
    return -(t * log_p + (1.0 - t) * log_1p)


def _bce_elem_fwd(p, t):
    return _bce_elem(p, t), (p, t)


def _bce_elem_bwd(res, g):
    p, t = res
    grad_p = g * (p - t) / jnp.maximum(p * (1.0 - p), _BCE_GRAD_EPS)
    return grad_p, jnp.zeros_like(t)


_bce_elem.defvjp(_bce_elem_fwd, _bce_elem_bwd)


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample soft Dice, smooth=1 (Loss.py:28-42)."""
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    score = (2.0 * inter + 1.0) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + 1.0)
    return 1.0 - jnp.mean(score)


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on probabilities — exact ``nn.BCELoss``
    (Loss.py:45-55) including its -100 log clamp and 1e-12 gradient
    denominator clamp (see the _bce_elem note)."""
    return jnp.mean(_bce_elem(pred.astype(jnp.float32), target.astype(jnp.float32)))


def bce_dice_loss(pred: jnp.ndarray, target: jnp.ndarray, wb: float = 1.0, wd: float = 1.0) -> jnp.ndarray:
    """wd*dice + wb*bce (Loss.py:59-73)."""
    return wd * dice_loss(pred, target) + wb * bce_loss(pred, target)


_DS_WEIGHTS = (0.1, 0.2, 0.3, 0.4, 0.5)  # deep-supervision weights (Loss.py:108-113)


def _pyramid_targets(target: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Max-pooled target pyramid at 1/16, 1/8, 1/4, 1/2, 1/1 (Loss.py:102-106)."""
    return (
        max_pool2d(target, 16),
        max_pool2d(target, 8),
        max_pool2d(target, 4),
        max_pool2d(target, 2),
        target,
    )


def edge_bce_dice_loss(
    aux: Sequence[jnp.ndarray],
    out: jnp.ndarray,
    target: jnp.ndarray,
    wb: float = 1.0,
    wd: float = 1.0,
    lambda_edge: float = 1.0,
) -> jnp.ndarray:
    """The EELUnet training criterion (Loss.py:92-113; selected train.py:305).

    ``aux`` is the 5-tuple of multiscale sigmoid heads at 1/16..1/1 resolution.
    Despite the reference's naming, supervision targets are max-pooled masks,
    not Canny edge maps. ``lambda_edge`` scales the deep-supervision sum (the
    reference parses this flag but never uses it, train.py:231; honored here
    with default 1.0 == reference behavior).
    """
    main = bce_dice_loss(out, target, wb, wd)
    targets = _pyramid_targets(target)
    ds = sum(w * bce_dice_loss(p, t, wb, wd) for p, t, w in zip(aux, targets, _DS_WEIGHTS))
    return main + lambda_edge * ds


def edge_dice_loss(aux, out, target, lambda_edge: float = 1.0) -> jnp.ndarray:
    """Dice-only pyramid variant (Loss.py:115-135)."""
    main = dice_loss(out, target)
    targets = _pyramid_targets(target)
    ds = sum(w * dice_loss(p, t) for p, t, w in zip(aux, targets, _DS_WEIGHTS))
    return main + lambda_edge * ds


def edge_bce_loss(aux, out, target, lambda_edge: float = 1.0) -> jnp.ndarray:
    """BCE-only pyramid variant (Loss.py:137-157)."""
    main = bce_loss(out, target)
    targets = _pyramid_targets(target)
    ds = sum(w * bce_loss(p, t) for p, t, w in zip(aux, targets, _DS_WEIGHTS))
    return main + lambda_edge * ds


def gt_bce_dice_loss(
    aux: Sequence[jnp.ndarray],
    out: jnp.ndarray,
    target: jnp.ndarray,
    wb: float = 1.0,
    wd: float = 1.0,
    lambda_edge: float = 1.0,
) -> jnp.ndarray:
    """EGE-UNet criterion: aux maps are already full-res (Loss.py:76-89)."""
    main = bce_dice_loss(out, target, wb, wd)
    ds = sum(w * bce_dice_loss(p, target, wb, wd) for p, w in zip(aux, _DS_WEIGHTS))
    return main + lambda_edge * ds


def focal_loss(pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss on probabilities (Loss.py:197-219)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    bce = _bce_elem(p, t)  # F.binary_cross_entropy semantics (Loss.py:211)
    pt = jnp.where(t == 1.0, p, 1.0 - p)
    return jnp.mean(alpha * (1.0 - pt) ** gamma * bce)


def chamfer_points_budget(h: int, w: int) -> int:
    """Default top-k point budget for ``chamfer_loss``: scales with the
    perimeter (edge pixel counts grow ~O(h+w) for smooth contours), floored at
    1024 so small maps are always exact. 64^2 -> 1024, 512^2 -> 2048,
    1024^2 -> 4096 (a 4096^2 f32 distance matrix is 64 MiB/sample)."""
    return min(h * w, max(1024, 2 * (h + w)))


def chamfer_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    threshold: float = 0.5,
    squared: bool = False,
    max_points: Optional[int] = None,
) -> jnp.ndarray:
    """Normalized bidirectional Chamfer distance between binary edge maps.

    TPU-native re-expression of Loss.py:222-297: the reference's
    ``torch.nonzero`` produces dynamic shapes and a per-sample Python loop,
    which cannot compile under jit. Here each map contributes its ``max_points``
    strongest pixels via top_k (a fixed-shape op); masked distances make absent
    points inert. Samples with no edge pixels on either side contribute 0, as
    in the reference (Loss.py:268-269).

    TRUNCATION BOUND: a map with more than ``max_points`` above-threshold
    pixels contributes only its k strongest (ties broken by flat index —
    deterministic but arbitrary on binary maps), so the result then DIVERGES
    from the reference's dense computation. ``max_points=None`` scales the
    budget with resolution (``chamfer_points_budget``), which covers typical
    contour maps; pass an explicit budget (or verify against
    ``chamfer_loss_dense``) for pathologically dense edge maps.
    """
    if pred.ndim == 4:
        pred = pred[..., 0]
        target = target[..., 0]
    b, h, w = pred.shape
    n = h * w
    k = min(max_points, n) if max_points is not None else chamfer_points_budget(h, w)

    ys = (jnp.arange(n, dtype=jnp.float32) // w) / (h - 1)
    xs = (jnp.arange(n, dtype=jnp.float32) % w) / (w - 1)
    coords = jnp.stack([ys, xs], axis=-1)  # (n, 2)

    def extract(m):
        flat = m.reshape(b, n)
        vals, idx = jax.lax.top_k(flat, k)
        valid = vals > threshold
        pts = coords[idx]  # (b, k, 2)
        return pts, valid

    p_pts, p_valid = extract(pred.astype(jnp.float32))
    t_pts, t_valid = extract(target.astype(jnp.float32))

    diff = p_pts[:, :, None, :] - t_pts[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    if squared:
        dist = dist * dist

    big = jnp.asarray(1e9, jnp.float32)
    masked = jnp.where(p_valid[:, :, None] & t_valid[:, None, :], dist, big)

    min_p = jnp.min(masked, axis=2)  # (b, k) nearest target for each pred point
    min_t = jnp.min(masked, axis=1)  # (b, k) nearest pred for each target point

    def masked_mean(d, valid):
        cnt = jnp.sum(valid, axis=1)
        s = jnp.sum(jnp.where(valid, d, 0.0), axis=1)
        return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 0.0)

    any_pair = (jnp.sum(p_valid, 1) > 0) & (jnp.sum(t_valid, 1) > 0)
    sample = jnp.where(any_pair, masked_mean(min_p, p_valid) + masked_mean(min_t, t_valid), 0.0)
    return jnp.mean(sample)


def chamfer_loss_dense(pred_np, target_np, threshold: float = 0.5, squared: bool = False):
    """Host-side EXACT dense Chamfer over all edge pixels — the reference's
    per-sample computation (Loss.py:242-297) in numpy, dynamic shapes and all.
    Golden oracle for ``chamfer_loss``'s truncation bound; not jittable.
    """
    import numpy as np

    pred_np = np.asarray(pred_np)
    target_np = np.asarray(target_np)
    if pred_np.ndim == 4:
        pred_np = pred_np[..., 0]
        target_np = target_np[..., 0]
    b, h, w = pred_np.shape
    out = []
    for i in range(b):
        py, px = np.nonzero(pred_np[i] > threshold)
        ty, tx = np.nonzero(target_np[i] > threshold)
        if len(py) == 0 or len(ty) == 0:
            out.append(0.0)  # Loss.py:268-269
            continue
        p = np.stack([py / (h - 1), px / (w - 1)], -1)
        t = np.stack([ty / (h - 1), tx / (w - 1)], -1)
        d = np.sqrt(((p[:, None, :] - t[None, :, :]) ** 2).sum(-1) + 1e-12)
        if squared:
            d = d * d
        out.append(d.min(1).mean() + d.min(0).mean())
    return float(np.mean(out))


def compute_distance_map(target_np):
    """Boundary distance map of a binary mask — host-side utility
    (Loss.py:9-25: binary_erosion boundary + distance transform of its
    complement). Unused by any training path, kept for API parity; requires
    scipy.
    """
    import numpy as np
    from scipy.ndimage import binary_erosion, distance_transform_edt

    target_bool = np.asarray(target_np).astype(bool)
    eroded = binary_erosion(target_bool, structure=np.ones((3, 3)))
    boundary = target_bool ^ eroded
    return distance_transform_edt(~boundary)


# ---------------------------------------------------------------------------
# Multi-class losses (out_channels > 1) — beyond-reference. The reference is
# binary-only; its commented `criterion = nn.CrossEntropyLoss()` alternative
# (train.py:303) is the closest anchor. Convention mirrors the binary family:
# predictions are PROBABILITIES (softmax applied in the model / registry),
# targets are integer class-index maps (B,H,W,1) in [0, C).
# ---------------------------------------------------------------------------


def _one_hot_target(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B,H,W,1) class ids (float or int) -> (B,H,W,C) one-hot float32."""
    ids = jnp.round(target[..., 0]).astype(jnp.int32)
    return jax.nn.one_hot(ids, num_classes, dtype=jnp.float32)


def ce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean categorical cross-entropy on probabilities: -mean log p[true].

    ``pred``: (B,H,W,C) softmax probabilities; ``target``: (B,H,W,1) class
    ids. Gradient-safe at saturation like ``bce_loss`` (p clipped away from
    0/1 so both the log value and its derivative stay finite)."""
    p = jnp.clip(pred.astype(jnp.float32), _PROB_EPS, 1.0 - _PROB_EPS)
    onehot = _one_hot_target(target, pred.shape[-1])
    log_p = jnp.maximum(jnp.log(p), _BCE_LOG_CLAMP)
    return -jnp.mean(jnp.sum(onehot * log_p, axis=-1))


def multiclass_dice_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Macro soft Dice over ALL classes (background included), smooth=1.

    Per sample and class: 1 - (2*sum(p_c*t_c)+1)/(sum(p_c)+sum(t_c)+1), the
    per-class analogue of ``dice_loss`` (Loss.py:28-42), averaged over the
    batch and the class axis. Including the background keeps the loss
    symmetric with the binary family's mdice convention (metrics.py)."""
    b, c = pred.shape[0], pred.shape[-1]
    onehot = _one_hot_target(target, c)
    p = pred.astype(jnp.float32).reshape(b, -1, c)
    t = onehot.reshape(b, -1, c)
    inter = jnp.sum(p * t, axis=1)                       # (B, C)
    score = (2.0 * inter + 1.0) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + 1.0)
    return 1.0 - jnp.mean(score)


def ce_dice_loss(pred: jnp.ndarray, target: jnp.ndarray, wb: float = 1.0, wd: float = 1.0) -> jnp.ndarray:
    """wd*multiclass_dice + wb*ce — the multi-class ``bce_dice_loss``."""
    return wd * multiclass_dice_loss(pred, target) + wb * ce_loss(pred, target)


def _foreground_target(target: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,1) class ids -> (B,H,W,1) binary foreground (class != 0) map.

    The EELUnet/EGE-UNet aux heads are architectural 1-channel sigmoid maps
    (EELUnet.py:194-226, egeunet.py:196-205) independent of out_channels;
    under multi-class training they supervise against the foreground mask."""
    return (target > 0.5).astype(jnp.float32)


def edge_ce_dice_loss(
    aux: Sequence[jnp.ndarray],
    out: jnp.ndarray,
    target: jnp.ndarray,
    wb: float = 1.0,
    wd: float = 1.0,
    lambda_edge: float = 1.0,
) -> jnp.ndarray:
    """Multi-class EELUnet criterion: ce_dice main head + the binary
    deep-supervision pyramid (Loss.py:92-113 shape) on the foreground mask."""
    main = ce_dice_loss(out, target, wb, wd)
    fg = _foreground_target(target)
    targets = _pyramid_targets(fg)
    ds = sum(w * bce_dice_loss(p, t, wb, wd) for p, t, w in zip(aux, targets, _DS_WEIGHTS))
    return main + lambda_edge * ds


def gt_ce_dice_loss(
    aux: Sequence[jnp.ndarray],
    out: jnp.ndarray,
    target: jnp.ndarray,
    wb: float = 1.0,
    wd: float = 1.0,
    lambda_edge: float = 1.0,
) -> jnp.ndarray:
    """Multi-class EGE-UNet criterion: full-res 1-channel gt_pre maps
    (Loss.py:76-89 shape) supervise the foreground mask."""
    main = ce_dice_loss(out, target, wb, wd)
    fg = _foreground_target(target)
    ds = sum(w * bce_dice_loss(p, fg, wb, wd) for p, w in zip(aux, _DS_WEIGHTS))
    return main + lambda_edge * ds


# ---------------------------------------------------------------------------
# Registry + model dispatch (replaces the name-keyed if-chain train.py:62-84)
# ---------------------------------------------------------------------------

LOSS_REGISTRY: Dict[str, Callable] = {
    "dice": lambda aux, out, t, cfg: dice_loss(out, t),
    "bce": lambda aux, out, t, cfg: bce_loss(out, t),
    "bce_dice": lambda aux, out, t, cfg: bce_dice_loss(out, t, cfg.wb, cfg.wd),
    "gt_bce_dice": lambda aux, out, t, cfg: gt_bce_dice_loss(aux, out, t, cfg.wb, cfg.wd, cfg.lambda_edge),
    "edge_bce_dice": lambda aux, out, t, cfg: edge_bce_dice_loss(aux, out, t, cfg.wb, cfg.wd, cfg.lambda_edge),
    "edge_dice": lambda aux, out, t, cfg: edge_dice_loss(aux, out, t, cfg.lambda_edge),
    "edge_bce": lambda aux, out, t, cfg: edge_bce_loss(aux, out, t, cfg.lambda_edge),
    "focal": lambda aux, out, t, cfg: focal_loss(out, t),
    # Multi-class family (model.out_channels > 1; probabilities are softmax)
    "ce": lambda aux, out, t, cfg: ce_loss(out, t),
    "mc_dice": lambda aux, out, t, cfg: multiclass_dice_loss(out, t),
    "ce_dice": lambda aux, out, t, cfg: ce_dice_loss(out, t, cfg.wb, cfg.wd),
    "edge_ce_dice": lambda aux, out, t, cfg: edge_ce_dice_loss(aux, out, t, cfg.wb, cfg.wd, cfg.lambda_edge),
    "gt_ce_dice": lambda aux, out, t, cfg: gt_ce_dice_loss(aux, out, t, cfg.wb, cfg.wd, cfg.lambda_edge),
}

# Default criterion per model family when LossConfig.name == "auto".
# The reference hardcodes edge_BceDiceLoss for all models (train.py:305), but
# its calculate_loss would crash for 2-output models with a 3-arg criterion;
# these defaults are the working intent.
AUTO_LOSS = {
    "eelunet": "edge_bce_dice",
    "egeunet": "gt_bce_dice",
    "unet": "bce_dice",
    "unet++": "bce_dice",
    "unext": "bce_dice",
    "unext_s": "bce_dice",
    "malunet": "bce_dice",
}


# Multi-class auto criteria: softmax-CE + macro-dice main head; models with
# aux heads keep their binary foreground deep supervision (the aux maps are
# 1-channel by architecture regardless of out_channels).
AUTO_LOSS_MULTICLASS = {
    "eelunet": "edge_ce_dice",
    "egeunet": "gt_ce_dice",
}


def resolve_loss_name(loss_name: str, model_name: str, out_channels: int = 1) -> str:
    if loss_name != "auto":
        return loss_name
    if out_channels > 1:
        return AUTO_LOSS_MULTICLASS.get(model_name, "ce_dice")
    return AUTO_LOSS.get(model_name, "bce_dice")
