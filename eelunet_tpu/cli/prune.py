"""Pruning entry point — working version of the reference's broken prune.py.

Flow (prune.py:178-304 intent): load pretrained -> evaluate original ->
L2-structured channel pruning per conv -> sparsity report -> evaluate pruned
-> masked finetune at lr/10 -> evaluate finetuned -> comparison table -> save.
"""

from __future__ import annotations

import os

from eelunet_tpu.cli.common import base_parser, build_loaders, load_config
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.prune import (
    apply_masks,
    compute_prune_masks,
    finetune_pruned,
    global_sparsity,
    sparsity_report,
)
from eelunet_tpu.train.trainer import Trainer


def main(argv=None):
    p = base_parser("Structured channel pruning + finetune")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--prune_amount", type=float, default=0.3)
    p.add_argument("--finetune_epochs", type=int, default=5)
    p.add_argument(
        "--out",
        type=str,
        default="",
        help="checkpoint destination: a tag saved under save_dir/<model>/ "
        "(default pruned_<pct>), or a path (anything containing a path "
        "separator / absolute path) saved verbatim",
    )
    p.add_argument(
        "--physical",
        action="store_true",
        help="after finetune, physically remove the pruned channels "
        "(unet only) and save a slim checkpoint (params + widths.json)",
    )
    p.add_argument(
        "--prune_round_to",
        type=int,
        default=0,
        help="round KEPT channel counts up to this multiple (0 = auto with "
        "--physical: 64 for unet, 32 for eelunet — measured optima; "
        "misaligned slim models run SLOWER than unpruned ones, and eelunet's "
        "full-resolution 64-wide stages never shrink at 64. 1 otherwise)",
    )
    args = p.parse_args(argv)
    cfg = load_config(args)
    if args.physical and cfg.model.name not in ("unet", "eelunet"):
        p.error("--physical supports model_type unet/eelunet (see prune_physical.py docs)")
    if args.prune_round_to == 0:
        args.prune_round_to = (32 if cfg.model.name == "eelunet" else 64) if args.physical else 1

    mesh = create_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis, cfg.mesh.spatial_axis)
    trainer = Trainer(cfg, mesh=mesh)
    train_loader, val_loader, test_loader = build_loaders(cfg)
    state = trainer.init_state(steps_per_epoch=max(len(train_loader), 1))
    state = trainer.ckpt.restore_params(args.checkpoint, state)

    print("== original ==")
    m0 = trainer.evaluate(state, test_loader)
    print({k: round(v, 4) for k, v in m0.items()})

    # Physical removal needs masks that zero the whole channel (kernel+bias,
    # and BN gamma/beta for eelunet) so slicing is exact (prune_physical.py);
    # the default mask path matches torch ln_structured (weights only).
    if args.physical and cfg.model.name == "eelunet":
        from eelunet_tpu.prune_physical import eelunet_prune_masks

        masks, _keeps = eelunet_prune_masks(state.params, args.prune_amount, args.prune_round_to)
        plan = None
    else:
        masks, plan = compute_prune_masks(
            state.params, args.prune_amount, zero_bias=args.physical, round_to=args.prune_round_to
        )
    state = state.replace(params=apply_masks(state.params, masks))
    print(f"== pruned (amount={args.prune_amount}) ==")
    for name, frac in sparsity_report(state.params).items():
        print(f"  {name}: {frac:.1%} zero")
    print(f"global sparsity: {global_sparsity(state.params):.1%}")
    m1 = trainer.evaluate(state, test_loader)
    print({k: round(v, 4) for k, v in m1.items()})

    state = finetune_pruned(trainer, state, masks, train_loader, val_loader, epochs=args.finetune_epochs)
    print("== finetuned ==")
    m2 = trainer.evaluate(state, test_loader)
    print({k: round(v, 4) for k, v in m2.items()})

    print("\nmetric          original   pruned  finetuned")
    for k in ("iou", "dice", "miou", "mdice", "boundary_f1"):
        print(f"{k:14s}  {m0[k]:8.4f} {m1[k]:8.4f}  {m2[k]:8.4f}")

    if args.out and (os.path.isabs(args.out) or os.sep in args.out):
        path = trainer.ckpt.save_to(os.path.abspath(args.out), state)
    else:
        tag = args.out or f"pruned_{int(args.prune_amount * 100)}"
        path = trainer.ckpt.save(tag, state)
    print(f"Saved pruned+finetuned checkpoint to {path}")

    if args.physical:
        from eelunet_tpu.prune_physical import (
            evaluate_params,
            param_count,
            physical_prune_eelunet,
            physical_prune_unet,
            save_slim,
            slim_eelunet,
            slim_unet,
        )

        # Masked finetune keeps pruned channels exactly zero (kernel+bias+BN)
        # — slicing them out is a pure re-indexing of the same function.
        n0 = param_count(state.params)
        slim_bs = None
        if cfg.model.name == "eelunet":
            slim_params, slim_bs, widths = physical_prune_eelunet(
                state.params, state.batch_stats, args.prune_amount, args.prune_round_to
            )
            model = slim_eelunet(
                widths, out_channels=cfg.model.out_channels, mask_range=cfg.model.fft_mask_range
            )
        else:
            slim_params, widths = physical_prune_unet(
                state.params, args.prune_amount, round_to=args.prune_round_to
            )
            model = slim_unet(widths, out_channels=cfg.model.out_channels)
        n1 = param_count(slim_params)
        print(f"== physical ==\nparams: {n0 / 1e6:.2f}M -> {n1 / 1e6:.2f}M ({n1 / n0:.1%})")
        m3 = evaluate_params(
            model, trainer.meta, slim_params, trainer._device_batches(test_loader),
            cfg.threshold, batch_stats=slim_bs,
        )
        print({k: round(v, 4) for k, v in m3.items()})
        slim_path = save_slim(
            path + "_slim", slim_params, widths, batch_stats=slim_bs, model_name=cfg.model.name
        )
        print(f"Saved slim checkpoint to {slim_path}")


if __name__ == "__main__":
    main()
