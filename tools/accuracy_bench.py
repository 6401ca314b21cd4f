"""3-seed accuracy benchmark on the HARD synthetic task.

The reference's only published accuracy numbers are 3 fixed-seed runs on its
(unavailable) tooth dataset — mIoU 0.956-0.961, mDice 0.978-0.980, boundary-F1
0.737-0.740 (train.py:240-242). This harness reproduces that protocol on the
in-repo hard synthetic task (data/synthetic.make_hard_sample), which is tuned
to NOT saturate: textured low-contrast foreground, thin protrusions,
unlabeled distractors and label noise put the ceiling meaningfully below
dice 1.0, so model-wiring regressions become visible as accuracy drops.

    python tools/accuracy_bench.py --model_type eelunet --seeds 7686 6716 6345 \
        --epochs 30 --image_size 256

Prints a per-seed markdown table plus one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run_seed(model: str, seed: int, image_size: int, epochs: int,
             n_train: int, n_test: int, batch_size: int, dtype: str, lr: float,
             device_cache: bool = True, extra_set=(), num_classes: int = 1):
    # Unique scratch per process: two concurrent benches sharing a fixed
    # save_dir race orbax's constant-named .orbax-checkpoint-tmp staging dir
    # (observed as a tensorstore OCDBT NOT_FOUND mid-commit when a driver
    # double-launched this tool).
    scratch = tempfile.mkdtemp(prefix="acc_bench_")
    try:
        return _run_seed_in(scratch, model, seed, image_size, epochs, n_train,
                            n_test, batch_size, dtype, lr, device_cache,
                            extra_set, num_classes)
    finally:
        # also on error/interrupt paths: never leak the per-run scratch dir
        shutil.rmtree(scratch, ignore_errors=True)


def _run_seed_in(scratch, model, seed, image_size, epochs, n_train, n_test,
                 batch_size, dtype, lr, device_cache, extra_set, num_classes):
    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.data.pipeline import DataLoader
    from eelunet_tpu.data.synthetic import SyntheticDataset
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(TrainConfig(), [
        f"model.name={model}",
        f"model.dtype={dtype}",
        f"model.out_channels={num_classes if num_classes > 1 else 1}",
        f"data.image_size=[{image_size},{image_size}]",
        f"data.batch_size={batch_size}",
        f"seed={seed}",
        f"epochs={epochs}",
        f"optimizer.lr={lr}",
        f"eval_every={epochs}",  # evaluate once, at the end
        "snapshot_every=1000000",
        f"save_dir={scratch}/ckpt",
        f"log_dir={scratch}/runs",
        *extra_set,
    ])
    tr_ds = SyntheticDataset(n=n_train, image_size=(image_size, image_size),
                             seed=seed, difficulty="hard",
                             num_classes=num_classes)
    te_ds = SyntheticDataset(n=n_test, image_size=(image_size, image_size),
                             seed=seed + 100000, difficulty="hard",
                             num_classes=num_classes)
    if device_cache:
        # batches are bit-identical to the streamed loader (same shuffle
        # keying, tests/test_device_cache.py); epochs run compute-bound
        from eelunet_tpu.data.device_cache import DeviceCache, DeviceCachedLoader

        tr_c, te_c = DeviceCache(tr_ds), DeviceCache(te_ds)
        tr = DeviceCachedLoader(tr_c, batch_size, shuffle=True, seed=seed)
        va = DeviceCachedLoader(te_c, batch_size)
        te = DeviceCachedLoader(te_c, batch_size)
        tr_eval = DeviceCachedLoader(tr_c, batch_size)
    else:
        tr = DataLoader(tr_ds, batch_size, shuffle=True, seed=seed, num_workers=2)
        va = DataLoader(te_ds, batch_size, num_workers=2)
        te = DataLoader(te_ds, batch_size, num_workers=2)
        tr_eval = DataLoader(tr_ds, batch_size, num_workers=2)
    trainer = Trainer(cfg)
    state, history = trainer.fit(tr, va, te, log=lambda *a: None)
    final = [m for m in history["metrics"] if m][-1]
    final["train_loss"] = history["train_loss"][-1]
    if num_classes > 1:
        # per-class drill-down behind the macro scalars (metrics.per_class_metrics)
        from eelunet_tpu import metrics as M

        _, accum = trainer.evaluate(state, te, return_accum=True)
        pc = M.per_class_metrics(accum)
        final["per_class_iou"] = [round(float(v), 4) for v in pc["iou"]]
        final["per_class_dice"] = [round(float(v), 4) for v in pc["dice"]]
        final["per_class_support"] = [int(v) for v in pc["support"]]
    # train-set eval, mirroring tools/reference_accuracy_bench.py: separates
    # "failed to learn" from "learned but doesn't generalize"
    tr_m = trainer.evaluate(state, tr_eval)
    final["train_miou"] = tr_m["miou"]
    final["train_dice"] = tr_m["dice"]
    if getattr(state, "ema_params", None) is not None:
        # EMA weights evaluated with the same eval step (incl. tta if set)
        ema_m = trainer.evaluate(state.replace(params=state.ema_params), te)
        final.update({f"ema_{k}": v for k, v in ema_m.items()})
    return final


def main(argv=None):
    p = argparse.ArgumentParser(description="3-seed hard-synthetic accuracy benchmark")
    p.add_argument("--model_type", default="eelunet")
    p.add_argument("--seeds", type=int, nargs="+", default=[7686, 6716, 6345])  # train.py:240-242
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--n_train", type=int, default=160)
    p.add_argument("--n_test", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--num_classes", type=int, default=1,
                   help=">1 flips every surface to multi-class mode "
                   "(softmax head, id masks, ce/mc-dice loss, confusion "
                   "metrics) and swaps in the multi-class synthetic task")
    p.add_argument("--no_device_cache", action="store_true",
                   help="stream batches from host instead of HBM residency")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   dest="extra_set",
                   help="extra dotted config overrides, e.g. "
                   "--set data.random_flip=true --set tta=true "
                   "--set optimizer.ema_decay=0.999")
    args = p.parse_args(argv)

    rows = []
    for seed in args.seeds:
        m = run_seed(args.model_type, seed, args.image_size, args.epochs,
                     args.n_train, args.n_test, args.batch_size, args.dtype,
                     args.lr, device_cache=not args.no_device_cache,
                     extra_set=args.extra_set, num_classes=args.num_classes)
        rows.append((seed, m))
        extra = (f" | ema: miou={m['ema_miou']:.4f} bf1={m['ema_boundary_f1']:.4f}"
                 if "ema_miou" in m else "")
        print(f"seed {seed}: miou={m['miou']:.4f} mdice={m['mdice']:.4f} "
              f"dice={m['dice']:.4f} boundary_f1={m['boundary_f1']:.4f}{extra}", flush=True)

    print("\n| seed | mIoU | mDice | dice | boundary F1 |")
    print("|---|---|---|---|---|")
    for seed, m in rows:
        print(f"| {seed} | {m['miou']:.4f} | {m['mdice']:.4f} | {m['dice']:.4f} | {m['boundary_f1']:.4f} |")
    summary = {
        "model": args.model_type,
        "image_size": args.image_size,
        "epochs": args.epochs,
        "n_train": args.n_train,
        "n_test": args.n_test,
        "batch_size": args.batch_size,
        "lr": args.lr,
        "dtype": args.dtype,
        "num_classes": args.num_classes,
        "overrides": list(args.extra_set),
        "seeds": {str(s): {k: (v if isinstance(v, list) else round(float(v), 4))
                           for k, v in m.items()} for s, m in rows},
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
