"""Import a reference PyTorch checkpoint (.pth state_dict) into an orbax
checkpoint consumable by cli.evaluate / cli.predict / cli.train --resume.

The reference's only persisted artifact is ``torch.save(model.state_dict())``
(train.py:157-180,195-197); this maps those weights onto the flax trees
(models/torch_port.py handles all layout conversions, including the EELUnet
interleave->concat bridge permutation) and wraps them in a fresh TrainState —
optimizer moments start at zero, matching the reference's own resume
semantics, which never saved optimizer state (SURVEY.md §5).

Usage:
  python -m eelunet_tpu.cli.import_torch --model_type eelunet \
      --checkpoint /path/eelunet_best.pth --output ckpts/eelunet_imported
"""

from __future__ import annotations

import jax.numpy as jnp

from eelunet_tpu.cli.common import base_parser, load_config
from eelunet_tpu.models.torch_port import (
    load_torch_checkpoint,
    port_state_dict,
    validate_against_model,
)
from eelunet_tpu.train.trainer import Trainer


def main(argv=None):
    p = base_parser("Import a reference PyTorch .pth checkpoint")
    p.add_argument("--checkpoint", type=str, required=True, help="reference .pth path")
    p.add_argument("--output", type=str, required=True, help="orbax checkpoint dir to write")
    args = p.parse_args(argv)
    cfg = load_config(args)

    name = cfg.model.name
    sd = load_torch_checkpoint(args.checkpoint)
    variables = port_state_dict(name, sd)
    validate_against_model(
        name, variables,
        image_size=cfg.data.image_size[0], in_channels=cfg.model.in_channels,
    )

    trainer = Trainer(cfg)
    state = trainer.init_state()
    to_dev = lambda tree: jnp.asarray(tree) if hasattr(tree, "shape") else tree
    import jax

    state = state.replace(
        params=jax.tree_util.tree_map(to_dev, variables["params"]),
        batch_stats=jax.tree_util.tree_map(to_dev, variables["batch_stats"]),
    )
    path = trainer.ckpt.save_to(args.output, state)
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"Imported {name} ({n / 1e6:.2f}M params) from {args.checkpoint} -> {path}")
    return path


if __name__ == "__main__":
    main()
