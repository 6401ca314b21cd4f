"""Boundary-F1 implementation divergence: cv2.erode vs device reduce_window
on IDENTICAL trained predictions (VERDICT r4 #3).

The 0.5% trained-weights roundtrip gate (tools/import_roundtrip.py) excludes
boundary_f1 on the assertion that cv2-vs-device erosion tie-breaking on
single-pixel boundaries differs. This harness replaces the assertion with a
measurement: for each retained trained torch checkpoint x image size, the
torch reference produces ONE set of thresholded predictions (evaluate.py:92
semantics), and boundary F1 is computed over those same arrays twice —

  (a) reference path: per-sample cv2.erode seg2bnd + boundary_f1_score
      (evaluate.py:25-60), averaged over samples like evaluate.py:102-109;
  (b) device path: eelunet_tpu.metrics.boundary_f1_batch (iterated 3x3
      min-pool erosion via reduce_window, metrics.py:42-90).

Any delta here is METRIC implementation, not model compute path (the preds
are bit-identical by construction). Prints a per-cell table plus one JSON
line with the max relative delta — the number that decides whether
boundary_f1 joins the roundtrip gate.

    python tools/boundary_f1_sweep.py --sizes 64 128 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tools")

CKPTS = [
    ("eelunet", "checkpoints/ref_torch_r4_60ep/eelunet_ref_seed7686.pth", "eelunet_60ep"),
    ("eelunet", "checkpoints/ref_torch_r4/eelunet_ref_seed7686.pth", "eelunet_30ep"),
    ("unet", "checkpoints/ref_torch_r4/unet_ref_seed7686.pth", "unet"),
    ("unext", "checkpoints/ref_torch_r4/unext_ref_seed7686.pth", "unext"),
    ("unext_s", "checkpoints/ref_torch_r4/unext_s_ref_seed7686.pth", "unext_s"),
    ("egeunet", "checkpoints/ref_torch_r4/egeunet_ref_seed7686.pth", "egeunet"),
    ("malunet", "checkpoints/ref_torch_r4/malunet_ref_seed7686.pth", "malunet"),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[64, 128, 256])
    p.add_argument("--n_test", type=int, default=32)
    p.add_argument("--data_seed", type=int, default=7686)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args(argv)

    import torch

    import jax.numpy as jnp

    from reference_accuracy_bench import MODEL_ZOO, wrap_eval_model
    from reference_loader import load_reference_module

    from eelunet_tpu.data.synthetic import SyntheticDataset
    from eelunet_tpu.metrics import boundary_f1_batch

    torch.set_num_threads(1)
    ref_eval = load_reference_module("evaluate")

    rows = []
    print("| ckpt | size | d(iters) | cv2 bf1 | device bf1 | rel delta | px flips |")
    print("|---|---|---|---|---|---|---|")
    for fam, ckpt, tag in CKPTS:
        if not os.path.exists(ckpt):
            print(f"| {tag} | - | - | MISSING {ckpt} | | | |")
            continue
        module_name, build, dispatch, logits_head = MODEL_ZOO[fam]
        tm = build(load_reference_module(module_name))
        tm.load_state_dict(torch.load(ckpt, map_location="cpu"))
        tm.eval()
        tm = wrap_eval_model(tm, logits_head)
        # output dispatch, evaluate.py:84-89: edge models return (seg, edges),
        # gt models return (gt_pre, out)
        unpack = {"edge": lambda o: o[0], "gt": lambda o: o[1]}.get(
            dispatch, lambda o: o)
        for size in args.sizes:
            ds = SyntheticDataset(
                n=args.n_test, image_size=(size, size),
                seed=args.data_seed + 100000, difficulty="hard",
            )
            preds_list, gts_list = [], []
            for i0 in range(0, args.n_test, args.batch_size):
                xs, ys = zip(*[ds[i] for i in range(i0, min(i0 + args.batch_size, args.n_test))])
                x = torch.from_numpy(np.stack(xs).transpose(0, 3, 1, 2))
                with torch.no_grad():
                    out = unpack(tm(x))
                preds_list.append((out.numpy() > 0.5).astype(np.float32))
                gts_list.append((np.stack(ys).transpose(0, 3, 1, 2) > 0.5).astype(np.float32))
            preds = np.concatenate(preds_list)  # (N,1,H,W) identical arrays for both paths
            gts = np.concatenate(gts_list)

            # (a) reference cv2 path, per sample (evaluate.py:102-109)
            cv2_scores = [
                float(ref_eval.boundary_f1_score(gts[i, 0], preds[i, 0]))
                for i in range(preds.shape[0])
            ]
            bf1_cv2 = float(np.mean(cv2_scores))

            # (b) device path on the SAME arrays (NHWC)
            dev_scores = np.asarray(boundary_f1_batch(
                jnp.asarray(gts.transpose(0, 2, 3, 1)),
                jnp.asarray(preds.transpose(0, 2, 3, 1)),
            ))
            bf1_dev = float(np.mean(dev_scores))

            # also count boundary-pixel disagreements between the two seg2bnd
            # paths (the hypothesized tie-break site)
            d = max(int(round(size * 0.02)), 1)
            flips = 0
            from eelunet_tpu.metrics import seg2bnd as dev_seg2bnd
            for arrs in (preds, gts):
                b_dev = np.asarray(dev_seg2bnd(jnp.asarray(arrs.transpose(0, 2, 3, 1))))
                for i in range(arrs.shape[0]):
                    b_cv2 = ref_eval.seg2bnd(arrs[i, 0])
                    flips += int(np.sum(b_cv2 != b_dev[i, :, :, 0]))

            rel = abs(bf1_dev - bf1_cv2) / max(abs(bf1_cv2), 1e-7)
            rows.append({"ckpt": tag, "size": size, "d": d, "cv2": bf1_cv2,
                         "device": bf1_dev, "rel": rel, "pixel_flips": flips})
            print(f"| {tag} | {size} | {d} | {bf1_cv2:.6f} | {bf1_dev:.6f} "
                  f"| {rel * 100:.4f}% | {flips} |", flush=True)

    max_rel = max((r["rel"] for r in rows), default=0.0)
    verdict = "GATE-OK" if max_rel <= 0.005 else "EXCEEDS"
    print(f"\nmax rel delta across {len(rows)} cells: {max_rel * 100:.4f}% -> {verdict}")
    print(json.dumps({"harness": "boundary_f1_sweep", "n_test": args.n_test,
                      "rows": rows, "max_rel": max_rel, "verdict": verdict}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
