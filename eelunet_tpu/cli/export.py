"""Export a checkpoint as a Python-model-free StableHLO artifact.

    python -m eelunet_tpu.cli.export --model_type eelunet \
        --checkpoint checkpoints/eelunet/eelunet_best_dice \
        --image_size 512 --batch_sizes 1,8,16 --output exported/eelunet512

The artifact (eelunet_tpu/export.py) embeds weights + preprocessing and
runs with jax alone via `ExportedModel`. The reference has no export path —
test.py re-imports the torch model class for every inference run.
"""

from __future__ import annotations

from eelunet_tpu.cli.common import base_parser, load_config


def main(argv=None):
    p = base_parser("Export serialized StableHLO inference artifact")
    p.add_argument("--checkpoint", type=str, default="",
                   help="orbax checkpoint dir; empty exports fresh-init weights")
    p.add_argument("--batch_sizes", type=str, default="1,8")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--platforms", type=str, default="tpu,cpu")
    p.add_argument("--quantize", type=str, default="", choices=["", "int8"],
                   help="int8: bake W8A8 dynamic-scale convs into the artifact")
    args = p.parse_args(argv)
    cfg = load_config(args)

    from eelunet_tpu.export import export_model

    out = export_model(
        cfg.model,
        args.checkpoint or None,
        cfg.data.image_size,
        [int(b) for b in args.batch_sizes.split(",")],
        args.output,
        cfg.data.normalize_mean,
        cfg.data.normalize_std,
        [s.strip() for s in args.platforms.split(",") if s.strip()],
        quantize=args.quantize or None,
    )
    import os

    files = sorted(os.listdir(out))
    print(f"exported {cfg.model.name} -> {out}: {', '.join(files)}")


if __name__ == "__main__":
    main()
