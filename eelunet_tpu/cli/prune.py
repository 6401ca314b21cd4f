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
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)
    cfg = load_config(args)

    mesh = create_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis)
    trainer = Trainer(cfg, mesh=mesh)
    train_loader, val_loader, test_loader = build_loaders(cfg)
    state = trainer.init_state(steps_per_epoch=max(len(train_loader), 1))
    state = trainer.ckpt.restore_params(args.checkpoint, state)

    print("== original ==")
    m0 = trainer.evaluate(state, test_loader)
    print({k: round(v, 4) for k, v in m0.items()})

    masks, plan = compute_prune_masks(state.params, args.prune_amount)
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

    tag = args.out or f"pruned_{int(args.prune_amount * 100)}"
    path = trainer.ckpt.save(tag, state)
    print(f"Saved pruned+finetuned checkpoint to {path}")


if __name__ == "__main__":
    main()
