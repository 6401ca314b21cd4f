"""Export an eelunet_tpu checkpoint as a reference-compatible PyTorch .pth.

    python -m eelunet_tpu.cli.export_torch --model_type eelunet \
        --checkpoint checkpoints/eelunet/eelunet_best_dice \
        --output eelunet_for_torch.pth

The inverse of cli.import_torch (models/torch_port.export_state_dict): the
.pth drops straight into the reference stack via `load_state_dict`
(evaluate.py:172-176, test.py:82-86) — the migration-OUT path the reference
never had. Weights trained here (any resolution/precision; params are
resolution-independent) evaluate bit-comparably in torch: round-trip
identity is pinned by tests/test_torch_export.py, trained-checkpoint metric
parity by tools/export_roundtrip.py.

torch is only needed when available at export time; with --numpy the
artifact is written as an .npz of the same names for torch-free hosts
(`torch.load`-able after `np.load` + `torch.from_numpy` on the consumer).
"""

from __future__ import annotations

import os

import numpy as np

from eelunet_tpu.cli.common import base_parser, load_config
from eelunet_tpu.models.torch_port import export_state_dict
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.train.trainer import Trainer


def main(argv=None):
    p = base_parser("Export checkpoint as reference PyTorch state_dict")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="orbax checkpoint dir (params [+ batch_stats])")
    p.add_argument("--output", type=str, required=True, help=".pth (or .npz) path")
    p.add_argument("--numpy", action="store_true",
                   help="write an .npz of the same tensor names instead of "
                   "a torch-pickled .pth (no torch dependency)")
    args = p.parse_args(argv)
    cfg = load_config(args)

    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state = trainer.init_state()
    if not os.path.exists(args.checkpoint):
        raise FileNotFoundError(f"checkpoint not found: {args.checkpoint}")
    state = trainer.ckpt.restore_params(args.checkpoint, state)

    to_np = lambda t: np.asarray(t, dtype=np.float32)
    import jax

    variables = {
        "params": jax.tree_util.tree_map(to_np, state.params),
        "batch_stats": jax.tree_util.tree_map(to_np, state.batch_stats),
    }
    sd = export_state_dict(cfg.model.name, variables)

    if args.numpy or args.output.endswith(".npz"):
        np.savez(args.output, **sd)
    else:
        import torch

        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   args.output)
    n = sum(int(np.asarray(v).size) for v in sd.values())
    print(f"Exported {cfg.model.name} ({n / 1e6:.2f}M params) "
          f"from {args.checkpoint} -> {args.output}")
    return args.output


if __name__ == "__main__":
    main()
