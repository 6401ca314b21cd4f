"""On-device metrics vs the cv2/numpy golden path (reference evaluate.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eelunet_tpu import metrics as M


def _golden_confusion(pred, label):
    p = pred.reshape(-1) > 0.5
    t = label.reshape(-1) > 0.5
    tp = np.sum(p & t)
    tn = np.sum(~p & ~t)
    fp = np.sum(p & ~t)
    fn = np.sum(~p & t)
    return tp, tn, fp, fn


def _golden_seg2bnd(mask, dilation_ratio=0.02):
    """Independent numpy reimplementation of evaluate.py:25-41 (erosion by an
    iterated 3x3 min filter with +inf border)."""
    h, w = mask.shape
    d = max(int(round((h + w) / 2 * dilation_ratio)), 1)
    m = (mask > 0.5).astype(np.float32)
    padded = np.pad(m, d, constant_values=np.inf)
    k = 2 * d + 1
    out = np.ones_like(m)
    eroded = np.min(
        np.lib.stride_tricks.sliding_window_view(padded, (k, k)), axis=(2, 3)
    )
    return (m - np.minimum(eroded, 1.0)) > 0.5


def _golden_boundary_f1(gt, pred):
    gb = _golden_seg2bnd(gt)
    pb = _golden_seg2bnd(pred)
    tp = np.logical_and(gb, pb).sum()
    precision = tp / (pb.sum() + 1e-7)
    recall = tp / (gb.sum() + 1e-7)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.float32)


def test_confusion_and_scalars(rng):
    pred = rng.uniform(size=(3, 32, 32, 1)).astype(np.float32)
    label = (rng.uniform(size=(3, 32, 32, 1)) > 0.5).astype(np.float32)
    acc = M.update_metrics(jnp.array(pred), jnp.array(label))
    tp, tn, fp, fn = _golden_confusion(pred > 0.5, label)
    assert int(acc.tp) == tp and int(acc.tn) == tn
    assert int(acc.fp) == fp and int(acc.fn) == fn
    out = M.finalize_metrics(acc)
    eps = 1e-7
    assert abs(float(out["iou"]) - tp / (tp + fp + fn + eps)) < 1e-6
    assert abs(float(out["mdice"]) - 0.5 * (2 * tp / (2 * tp + fp + fn + eps) + 2 * tn / (2 * tn + fp + fn + eps))) < 1e-6


def test_erode_matches_golden():
    m = _blob(64, 64, 32, 32, 15)[None, :, :, None]
    for it in (1, 2, 3):
        got = np.asarray(M.erode_binary(jnp.array(m), it))[0, :, :, 0]
        padded = np.pad(m[0, :, :, 0], it, constant_values=np.inf)
        k = 2 * it + 1
        want = np.min(np.lib.stride_tricks.sliding_window_view(padded, (k, k)), axis=(2, 3))
        np.testing.assert_allclose(got, np.minimum(want, 1.0))


def test_boundary_f1_matches_golden():
    gt = _blob(64, 64, 32, 32, 18)
    pred = _blob(64, 64, 34, 30, 17)
    got = float(M.boundary_f1_batch(jnp.array(gt[None, :, :, None]), jnp.array(pred[None, :, :, None]))[0])
    want = _golden_boundary_f1(gt, pred)
    assert abs(got - want) < 1e-5


def test_boundary_f1_empty_masks():
    z = np.zeros((1, 32, 32, 1), np.float32)
    got = float(M.boundary_f1_batch(jnp.array(z), jnp.array(z))[0])
    assert got == 0.0


def _load_cv2_golden():
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "cv2_boundary.npz")
    return np.load(path)


@pytest.mark.parametrize("case", ["d1", "d2", "d3", "border"])
def test_boundary_f1_vs_vendored_cv2_golden(case):
    """cv2.erode-derived goldens are VENDORED (tests/golden/cv2_boundary.npz,
    regenerate with gen_cv2_goldens.py) so this never skips when cv2 is
    absent. Covers erosion iteration counts 1-3 and a border-touching blob."""
    g = _load_cv2_golden()
    gt, pred = g[f"{case}_gt"], g[f"{case}_pred"]
    gb = np.asarray(M.seg2bnd(jnp.array(gt[None, :, :, None])))[0, :, :, 0] > 0.5
    pb = np.asarray(M.seg2bnd(jnp.array(pred[None, :, :, None])))[0, :, :, 0] > 0.5
    np.testing.assert_array_equal(gb, g[f"{case}_gt_bnd"])
    np.testing.assert_array_equal(pb, g[f"{case}_pred_bnd"])
    got = float(M.boundary_f1_batch(jnp.array(gt[None, :, :, None]), jnp.array(pred[None, :, :, None]))[0])
    assert abs(got - float(g[f"{case}_f1"])) < 1e-5


def test_boundary_f1_vs_live_cv2():
    """Cross-check against a LIVE cv2 when present (guards against the
    vendored file going stale vs a new OpenCV)."""
    cv2 = pytest.importorskip("cv2")
    gt = _blob(64, 64, 32, 32, 18)
    pred = _blob(64, 64, 34, 30, 17)

    def cv2_seg2bnd(mask, ratio=0.02):
        h, w = mask.shape
        d = max(int(round(np.mean([h, w]) * ratio)), 1)
        kernel = np.ones((3, 3), np.uint8)
        mu = (mask * 255).astype(np.uint8)
        eroded = cv2.erode(mu, kernel, iterations=d)
        return (mu - eroded) > 0

    gb, pb = cv2_seg2bnd(gt), cv2_seg2bnd(pred)
    tp = np.logical_and(gb, pb).sum()
    precision = tp / (pb.sum() + 1e-7)
    recall = tp / (gb.sum() + 1e-7)
    want = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    got = float(M.boundary_f1_batch(jnp.array(gt[None, :, :, None]), jnp.array(pred[None, :, :, None]))[0])
    assert abs(got - want) < 1e-5


def test_accum_is_summable(rng):
    pred = rng.uniform(size=(4, 16, 16, 1)).astype(np.float32)
    label = (rng.uniform(size=(4, 16, 16, 1)) > 0.5).astype(np.float32)
    whole = M.update_metrics(jnp.array(pred), jnp.array(label))
    halves = M.update_metrics(jnp.array(pred[:2]), jnp.array(label[:2])) + M.update_metrics(
        jnp.array(pred[2:]), jnp.array(label[2:])
    )
    for a, b in zip(whole, halves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
