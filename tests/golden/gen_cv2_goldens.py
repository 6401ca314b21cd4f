"""Regenerate the vendored cv2 golden arrays for the boundary-F1 metric.

The on-device boundary extraction (metrics.seg2bnd) must match OpenCV's
``cv2.erode`` semantics (reference evaluate.py:25-41). CI environments may
lack cv2, so the golden values are vendored as ``cv2_boundary.npz``; run this
script (needs cv2) to regenerate after changing the cases below.

    python tests/golden/gen_cv2_goldens.py
"""

import os

import numpy as np


def blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.float32)


# (name, gt, pred) — sizes chosen so erosion iterations d = round(0.02*mean(H,W))
# cover d=1 (64), d=2 (96) and d=3 (128); one pair touches the image border.
CASES = [
    ("d1", blob(64, 64, 32, 32, 18), blob(64, 64, 34, 30, 17)),
    ("d2", blob(96, 96, 48, 48, 30), blob(96, 96, 44, 52, 28)),
    ("d3", blob(128, 128, 64, 64, 44), blob(128, 128, 70, 58, 40)),
    ("border", blob(64, 64, 4, 4, 12), blob(64, 64, 6, 2, 12)),
]


def cv2_seg2bnd(mask, ratio=0.02):
    import cv2

    h, w = mask.shape
    d = max(int(round(np.mean([h, w]) * ratio)), 1)
    kernel = np.ones((3, 3), np.uint8)
    mu = (mask * 255).astype(np.uint8)
    eroded = cv2.erode(mu, kernel, iterations=d)
    return (mu - eroded) > 0


def f1(gb, pb):
    tp = np.logical_and(gb, pb).sum()
    precision = tp / (pb.sum() + 1e-7)
    recall = tp / (gb.sum() + 1e-7)
    return 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)


def main():
    out = {}
    for name, gt, pred in CASES:
        gb, pb = cv2_seg2bnd(gt), cv2_seg2bnd(pred)
        out[f"{name}_gt"] = gt
        out[f"{name}_pred"] = pred
        out[f"{name}_gt_bnd"] = gb
        out[f"{name}_pred_bnd"] = pb
        out[f"{name}_f1"] = np.float64(f1(gb, pb))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cv2_boundary.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: " + ", ".join(f"{n}_f1={out[n + '_f1']:.6f}" for n, _, _ in CASES))


if __name__ == "__main__":
    main()
