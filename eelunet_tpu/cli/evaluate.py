"""Evaluation entry point (reference evaluate.py:126-203): loads a checkpoint
(or warns and evaluates untrained, evaluate.py:172-176) and prints the 9
metrics."""

from __future__ import annotations

import os
from datetime import datetime

from eelunet_tpu.cli.common import base_parser, load_config, make_folder_dataset
from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.train.trainer import Trainer


def main(argv=None):
    p = base_parser("Evaluate segmentation model and output metrics")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--checkpoint", type=str, default="")
    args = p.parse_args(argv)
    cfg = load_config(args)

    d = cfg.data
    ds = make_folder_dataset(d, args.split, cfg.model.out_channels)
    # Never drop tail samples during evaluation — metrics must cover the
    # whole split (the reference's loader doesn't drop either, evaluate.py:147).
    loader = DataLoader(ds, d.batch_size, num_workers=d.num_workers, drop_remainder=False)

    from eelunet_tpu.prune_physical import evaluate_params, is_slim_checkpoint, load_slim

    if args.checkpoint and is_slim_checkpoint(args.checkpoint):
        from eelunet_tpu.cli.common import wants_raw_images

        if wants_raw_images(d):
            raise ValueError(
                "add_canny_edge/canny_enhance are not supported on the slim "
                "(physically pruned) evaluate path; evaluate the dense model."
            )
        # Physically pruned unet: rebuild the slim module from widths.json.
        import jax.numpy as jnp

        from eelunet_tpu.registry import MODEL_REGISTRY

        dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else None
        model, params, bstats = load_slim(args.checkpoint, cfg.model.out_channels, dtype=dtype)
        print(f"Loaded slim (physically pruned) weights from {args.checkpoint}")
        print(f"Evaluation date: {datetime.now().strftime('%Y%m%d_%H%M%S')}")
        print(f"Model: {cfg.model.name} (slim)")
        meta = MODEL_REGISTRY["eelunet" if type(model).__name__ == "EELUnet" else "unet"]
        # The slim path bypasses Trainer._device_batches, so apply the same
        # device-side input chain here — with data.uint8_feed (default) the
        # loader yields raw uint8 that must be scaled/normalized on device.
        from eelunet_tpu.data.augment import make_input_preprocess

        pre, _ = make_input_preprocess(d, num_classes=cfg.model.out_channels)
        batches = (pre(x, y) for x, y in loader)
        m = evaluate_params(model, meta, params, batches, cfg.threshold,
                            batch_stats=bstats, tta=cfg.tta)
        acc = None  # slim path: scalars only (evaluate_params finalizes inside)
    else:
        mesh = create_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis, cfg.mesh.spatial_axis)
        trainer = Trainer(cfg, mesh=mesh)
        state = trainer.init_state()

        if args.checkpoint and os.path.exists(args.checkpoint):
            state = trainer.ckpt.restore_params(args.checkpoint, state)
            print(f"Loaded model weights from {args.checkpoint}")
        elif args.checkpoint:
            print(f"Checkpoint not found at {args.checkpoint}. Evaluating untrained model.")

        print(f"Evaluation date: {datetime.now().strftime('%Y%m%d_%H%M%S')}")
        print(f"Model: {cfg.model.name}")
        if cfg.model.out_channels > 1:
            m, acc = trainer.evaluate(state, loader, return_accum=True)
        else:
            m, acc = trainer.evaluate(state, loader), None
    print("Evaluation Metrics:")
    print(f"Pixel Accuracy: {m['pixel_accuracy']:.4f}")
    print(f"Precision: {m['precision']:.4f}")
    print(f"Recall: {m['recall']:.4f}")
    print(f"F1 Score: {m['f1_score']:.4f}")
    print(f"IoU (foreground): {m['iou']:.4f}")
    print(f"Dice Coefficient (foreground): {m['dice']:.4f}")
    print(f"Mean IoU: {m['miou']:.4f}")
    print(f"Boundary F1 Score: {m['boundary_f1']:.4f}")
    print(f"mDice: {m['mdice']:.4f}")
    if acc is not None:
        # multi-class drill-down: per-class rows behind the macro scalars
        from eelunet_tpu.metrics import per_class_metrics

        pc = per_class_metrics(acc)
        print("Per-class metrics:")
        print("| class | IoU | Dice | precision | recall | support |")
        for c in range(len(pc["iou"])):
            print(
                f"| {c} | {pc['iou'][c]:.4f} | {pc['dice'][c]:.4f} | "
                f"{pc['precision'][c]:.4f} | {pc['recall'][c]:.4f} | "
                f"{int(pc['support'][c])} |"
            )
    return m


if __name__ == "__main__":
    main()
