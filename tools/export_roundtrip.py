"""Reverse trained-weights roundtrip: TPU-trained checkpoint ->
cli.export_torch -> the REFERENCE's own evaluate() vs cli.evaluate here,
identical pixels.

Why this direction exists (round 5): the synthetic task's feature scale is
relative to image size, so the reference checkpoints — trainable on this
1-core host only at 64^2/128^2 — collapse at 256^2/512^2 and leave the
forward roundtrip gate (tools/import_roundtrip.py) in a degenerate regime at
production geometry for the flagship. Training at 256^2/512^2 is cheap on
the TPU side, and export_state_dict (the exact inverse of the importer,
tests/test_torch_export.py) drops those weights into the upstream stack —
so the NON-degenerate production-geometry parity evidence comes from
TPU-trained weights evaluated by BOTH frameworks. Same 9-metric table, same
0.5%-rel/0.005-abs gate, boundary F1 at erosion d=5 (256^2) / d=10 (512^2)
(evaluate.py:33-38).

    python tools/export_roundtrip.py --model_type eelunet --image_size 256 \
        --epochs 30
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
GATED = ("iou", "dice", "miou", "mdice", "boundary_f1")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="eelunet")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--n_train", type=int, default=160)
    p.add_argument("--n_test", type=int, default=32)
    p.add_argument("--data_seed", type=int, default=7686)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--train_dtype", default="bfloat16",
                   help="training dtype (product config); the parity eval "
                   "itself runs f32 on both sides")
    p.add_argument("--checkpoint", default="",
                   help="skip training, reuse this orbax checkpoint")
    p.add_argument("--workdir", default="")
    args = p.parse_args(argv)

    import torch

    from reference_accuracy_bench import MODEL_ZOO, wrap_eval_model
    from reference_loader import load_reference_module

    from eelunet_tpu.cli import evaluate as cli_evaluate
    from eelunet_tpu.cli import export_torch as cli_export
    from eelunet_tpu.cli import train as cli_train
    from eelunet_tpu.cli.common import make_folder_dataset
    from eelunet_tpu.config import DataConfig
    from eelunet_tpu.data.pipeline import DataLoader as JaxLoader
    from eelunet_tpu.data.synthetic import write_synthetic_tree

    wd = args.workdir or tempfile.mkdtemp(prefix="export_rt_")
    tree = os.path.join(wd, "data")
    write_synthetic_tree(
        tree, n_train=args.n_train, n_test=args.n_test,
        image_size=(args.image_size, args.image_size),
        seed=args.data_seed, difficulty="hard",
    )
    # test images must be FRESH draws, not the train stream's tail: rewrite
    # the test split from the head-to-head protocol seed
    import shutil

    shutil.rmtree(os.path.join(tree, "test"))
    write_synthetic_tree(
        tree, n_train=0, n_test=args.n_test,
        image_size=(args.image_size, args.image_size),
        seed=args.data_seed + 100000, difficulty="hard",
    )

    ckpt = args.checkpoint
    if not ckpt:
        save_dir = os.path.join(wd, "ckpts")
        cli_train.main([
            "--model_type", args.model_type, "--data_dir", tree,
            "--image_size", str(args.image_size),
            "--batch_size", str(args.batch_size),
            "--epochs", str(args.epochs), "--seed", str(args.data_seed),
            "--save_dir", save_dir,
            "--log_dir", os.path.join(wd, "runs"),
            "--set", f"optimizer.lr={args.lr}",
            "--set", f"model.dtype={args.train_dtype}",
            "--set", f"eval_every={args.epochs}",
            "--set", "snapshot_every=1000000",
        ])
        ckpt = os.path.join(save_dir, args.model_type, f"{args.model_type}_best_dice")

    pth = os.path.join(wd, f"{args.model_type}_exported.pth")
    cli_export.main([
        "--model_type", args.model_type, "--checkpoint", ckpt,
        "--output", pth, "--image_size", "64",
        "--save_dir", os.path.join(wd, "ckpts"),
    ])

    # our side, f32 parity dtype (same pixels through the folder loader)
    ours = cli_evaluate.main([
        "--model_type", args.model_type, "--data_dir", tree,
        "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--checkpoint", ckpt, "--save_dir", os.path.join(wd, "ckpts"),
        "--set", "model.dtype=float32",
    ])

    # reference side: load the EXPORTED .pth into the reference torch model
    module_name, build, _dispatch, logits_head = MODEL_ZOO[args.model_type]
    ref_eval = load_reference_module("evaluate")
    tm = build(load_reference_module(module_name))
    tm.load_state_dict(torch.load(pth, map_location="cpu"))
    tm.eval()
    tm = wrap_eval_model(tm, logits_head)
    torch.set_num_threads(1)
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

    print(f"\n| metric | torch (exported ckpt, CPU f32) | eelunet_tpu (f32) | rel delta | abs delta |")
    print("|---|---|---|---|---|")
    fails = []
    for k in KEYS:
        t, o = ref[k], float(ours[k])
        rel = abs(o - t) / max(abs(t), 1e-7)
        print(f"| {k} | {t:.4f} | {o:.4f} | {rel * 100:.3f}% | {abs(o - t):.2e} |")
        if k in GATED and rel > 0.005 and abs(o - t) > 0.005:
            fails.append((k, t, o, rel))
    verdict = "PASS" if not fails else f"FAIL {fails}"
    print(f"\nnorth-star gate (dice/iou/miou/mdice/boundary_f1 <= 0.5% rel or <= 0.005 abs): {verdict}")
    print(json.dumps({
        "harness": "export_roundtrip", "model": args.model_type,
        "image_size": args.image_size, "epochs": args.epochs,
        "n_train": args.n_train, "n_test": args.n_test, "lr": args.lr,
        "train_dtype": args.train_dtype, "checkpoint": ckpt,
        "torch": ref, "tpu": {k: float(ours[k]) for k in KEYS},
        "gate": verdict.split()[0],
    }))
    return 0 if not fails else 1


if __name__ == "__main__":
    sys.exit(main())
