"""Trained-weights importer round trip: torch reference ckpt -> cli.import_torch
-> cli.evaluate on TPU vs the reference's own evaluate() on the same pixels.

Extends tests/test_torch_parity.py::test_reference_evaluate_metric_parity
(shared RANDOM-ish weights, scrubbed CPU) to GENUINELY TRAINED weights on the
real device, for EVERY importable family: the .pth comes from
tools/reference_accuracy_bench.py --save_ckpt (the torch reference trained
with its own protocol — train.py:305,312,315 — on the hard synthetic task),
so borderline pixels are real, not synthetic.

Data: the same draws the head-to-head harness evaluates on
(SyntheticDataset(seed=data_seed+100000, difficulty="hard")), materialized as
a PNG tree (n_train=0 keeps the RNG stream identical) — BOTH frameworks read
the same uint8 pixels, so any metric gap is compute-path, not data.

    python tools/import_roundtrip.py --model_type eelunet \
        --checkpoint checkpoints/ref_torch/eelunet_ref_seed7686.pth

Prints a 9-metric torch-vs-TPU table with relative deltas plus one JSON line;
exit code 1 if dice/iou/miou/mdice/boundary_f1 disagree by >0.5% relative AND
>0.005 absolute (the north-star clause; the absolute arm covers degenerate
rows where a near-zero metric turns pixel dust into percent-scale ratios).
boundary_f1 is gated since round 5: the cv2-vs-device erosion paths were
measured pixel-exact on identical predictions (boundary_f1_sweep_r5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tools")

KEYS = ("pixel_accuracy", "precision", "recall", "f1_score", "iou",
        "dice", "miou", "boundary_f1", "mdice")
# boundary_f1 joined the gate in round 5: tools/boundary_f1_sweep.py measured
# the cv2.erode-vs-reduce_window implementations PIXEL-EXACT on identical
# trained predictions (21 cells = 7 ckpts x {64,128,256}^2: 0 boundary-pixel
# flips, max rel delta 7.8e-8 = f32-vs-f64 accumulation dust;
# docs/results/boundary_f1_sweep_r5.txt). Any roundtrip bf1 delta is
# therefore model-compute-path pred flips — the same source the dice/iou
# clauses already gate — not metric divergence.
GATED = ("iou", "dice", "miou", "mdice", "boundary_f1")


def write_mosaic_tree(root, n_test, image_size, base, seed):
    """Materialize a test tree whose frames are (image_size/base)^2 grids of
    hard samples drawn at ``base`` resolution (same PNG conventions as
    data/synthetic.write_synthetic_tree; fresh draws from ``seed``)."""
    from PIL import Image

    from eelunet_tpu.data.synthetic import make_hard_sample

    rng = np.random.default_rng(seed)
    k, rem = divmod(image_size, base)
    assert rem == 0, (image_size, base)
    img_dir = os.path.join(root, "test", "images")
    mask_dir = os.path.join(root, "test", "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    for i in range(n_test):
        img = np.zeros((image_size, image_size, 3), np.float32)
        mask = np.zeros((image_size, image_size), np.float32)
        for r in range(k):
            for c in range(k):
                im, mk = make_hard_sample(rng, base, base)
                img[r * base:(r + 1) * base, c * base:(c + 1) * base] = im
                mask[r * base:(r + 1) * base, c * base:(c + 1) * base] = mk[..., 0]
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i:04d}.png"))
        Image.fromarray((mask * 255).astype(np.uint8), mode="L").save(
            os.path.join(mask_dir, f"{i:04d}.png"))
    return root


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="eelunet",
                   help="any importable family (reference_accuracy_bench zoo)")
    p.add_argument("--checkpoint", required=True, help="trained reference .pth")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--init_image_size", type=int, default=0,
                   help="image size for the import-side model init/validation "
                   "(params are resolution-independent; 64 reuses the cached "
                   "init compile when evaluating at 256/512). 0 = image_size")
    p.add_argument("--n_test", type=int, default=32)
    p.add_argument("--mosaic_base", type=int, default=0,
                   help="when >0, compose each image_size frame as a grid of "
                   "(image_size/mosaic_base)^2 hard samples generated at "
                   "mosaic_base resolution. Feature scale is RELATIVE in the "
                   "synthetic task (make_hard_sample sizes bodies by h,w), so "
                   "a ckpt trained at 64^2 collapses on plain 256^2 draws; "
                   "the mosaic keeps local statistics at the training scale "
                   "while the METRICS run at production geometry — boundary "
                   "erosion d=round(0.02*size)=5/10 (evaluate.py:33-38), the "
                   "regime the reference's published numbers live in")
    p.add_argument("--data_seed", type=int, default=7686,
                   help="harness seed; test data uses data_seed+100000")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dtype", default="float32",
                   help="eelunet_tpu eval dtype (float32 for the parity gate; "
                   "bfloat16 measures the product config's drift)")
    p.add_argument("--workdir", default="", help="keep artifacts here")
    args = p.parse_args(argv)

    import torch

    from reference_accuracy_bench import MODEL_ZOO, wrap_eval_model
    from reference_loader import load_reference_module

    from eelunet_tpu.cli import evaluate as cli_evaluate
    from eelunet_tpu.cli import import_torch as cli_import
    from eelunet_tpu.cli.common import make_folder_dataset
    from eelunet_tpu.config import DataConfig
    from eelunet_tpu.data.pipeline import DataLoader as JaxLoader
    from eelunet_tpu.data.synthetic import write_synthetic_tree

    wd = args.workdir or tempfile.mkdtemp(prefix="roundtrip_")
    tree = os.path.join(wd, "data")
    if args.mosaic_base:
        write_mosaic_tree(tree, args.n_test, args.image_size,
                          args.mosaic_base, seed=args.data_seed + 100000)
    else:
        write_synthetic_tree(
            tree, n_train=0, n_test=args.n_test,
            image_size=(args.image_size, args.image_size),
            seed=args.data_seed + 100000, difficulty="hard",
        )

    out_dir = os.path.join(wd, "imported")
    cli_import.main([
        "--model_type", args.model_type, "--checkpoint", args.checkpoint,
        "--output", out_dir,
        "--image_size", str(args.init_image_size or args.image_size),
        "--save_dir", os.path.join(wd, "ckpts"),
        "--set", f"model.dtype={args.dtype}",
    ])
    ours = cli_evaluate.main([
        "--model_type", args.model_type, "--data_dir", tree,
        "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--checkpoint", out_dir, "--save_dir", os.path.join(wd, "ckpts"),
        "--set", f"model.dtype={args.dtype}",
    ])

    # Reference side: the SAME float pixels the CLI's device chain consumed
    # (uint8_feed=False reproduces the uint8 path <=1e-6, test_uint8_feed.py).
    module_name, build, _dispatch, logits_head = MODEL_ZOO[args.model_type]
    ref_eval = load_reference_module("evaluate")
    tm = build(load_reference_module(module_name))
    tm.load_state_dict(torch.load(args.checkpoint, map_location="cpu"))
    tm.eval()
    tm = wrap_eval_model(tm, logits_head)
    d = DataConfig(data_dir=tree, image_size=(args.image_size, args.image_size),
                   uint8_feed=False)
    loader = JaxLoader(make_folder_dataset(d, "test"), args.batch_size,
                       drop_remainder=False)
    tb = [
        (torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
         torch.from_numpy(np.ascontiguousarray(y.transpose(0, 3, 1, 2))))
        for x, y in loader
    ]
    with torch.no_grad():
        ref = ref_eval.evaluate(tm, tb, torch.device("cpu"))
    ref = dict(zip(KEYS, (float(v) for v in ref)))

    print(f"\n| metric | torch (CPU f32) | eelunet_tpu ({args.dtype}) | rel delta | abs delta |")
    print("|---|---|---|---|---|")
    fails = []
    for k in KEYS:
        t, o = ref[k], float(ours[k])
        rel = abs(o - t) / max(abs(t), 1e-7)
        print(f"| {k} | {t:.4f} | {o:.4f} | {rel * 100:.3f}% | {abs(o - t):.2e} |")
        # Gate: <=0.5% relative OR <=0.005 absolute (0.5% of the metric's
        # [0,1] full scale). The absolute arm exists for DEGENERATE rows —
        # when a checkpoint collapses on a geometry (e.g. a 64^2-trained
        # model on plain 256^2 draws, where synthetic feature scale is
        # relative), dice ~0.01 makes the relative gate amplify a handful of
        # borderline-pixel flips into percent-scale "failures" while the
        # frameworks actually agree to ~2e-4 absolute. Non-degenerate rows
        # (the meaningful evidence) still face the strict relative clause.
        if k in GATED and rel > 0.005 and abs(o - t) > 0.005:
            fails.append((k, t, o, rel))
    verdict = "PASS" if not fails else f"FAIL {fails}"
    print(f"\nnorth-star gate (dice/iou/miou/mdice/boundary_f1 <= 0.5% rel or <= 0.005 abs): {verdict}")
    print(json.dumps({
        "harness": "import_roundtrip", "model": args.model_type,
        "checkpoint": args.checkpoint,
        "image_size": args.image_size, "n_test": args.n_test,
        "mosaic_base": args.mosaic_base,
        "dtype": args.dtype, "torch": ref,
        "tpu": {k: float(ours[k]) for k in KEYS},
        "gate": verdict.split()[0],
    }))
    return 0 if not fails else 1


if __name__ == "__main__":
    sys.exit(main())
