"""Training entry point (reference train.py:217-319).

    python -m eelunet_tpu.cli.train --model_type eelunet --data_dir /data/tooth \
        --set epochs=100 --set optimizer.lr=1e-4
"""

from __future__ import annotations

import numpy as np

from eelunet_tpu.cli.common import base_parser, build_loaders, load_config
from eelunet_tpu.config import config_to_json
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.train.trainer import Trainer


def main(argv=None):
    p = base_parser("Train segmentation model with edge supervision (TPU-native)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--lambda_edge", type=float, default=None)
    p.add_argument("--resume", type=str, default=None, help="checkpoint path for full-state resume")
    p.add_argument(
        "--summary",
        action="store_true",
        help="print a per-layer shape/param table at startup (the reference "
        "always runs torchsummary.summary, train.py:291; gated here because "
        "tabulate-tracing big models costs seconds)",
    )
    args = p.parse_args(argv)

    ov = []
    if args.epochs is not None:
        ov.append(f"epochs={args.epochs}")
    if args.lr is not None:
        ov.append(f"optimizer.lr={args.lr}")
    if args.log_dir is not None:
        ov.append(f"log_dir={args.log_dir}")
    if args.lambda_edge is not None:
        ov.append(f"loss.lambda_edge={args.lambda_edge}")
    if args.resume is not None:
        ov.append(f"resume_from={args.resume}")
    args.set = list(args.set) + ov
    cfg = load_config(args)

    # Multi-host: wire the processes together FIRST (before any jax.devices()
    # call caches the local backend), then resolve one seed for all hosts —
    # the per-process batch slices only partition the global batch if every
    # host shuffles in the same order (SURVEY.md §2.8 comm-backend plan).
    from eelunet_tpu.parallel.distributed import init_distributed, is_primary, sync_seed

    distributed = init_distributed()
    say = print if is_primary() else (lambda *a, **k: None)
    if distributed:
        import jax

        say(
            f"Distributed runtime: {jax.process_count()} processes, "
            f"{len(jax.devices())} devices total"
        )

    if cfg.seed is None or distributed:
        seed = sync_seed(cfg.seed)
        if cfg.seed is None:
            say(f"Using seed: {seed}")  # reference set_seed (train.py:24-27)
        from eelunet_tpu.config import apply_overrides

        cfg = apply_overrides(cfg, [f"seed={seed}"])

    say(config_to_json(cfg))
    mesh = create_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis, cfg.mesh.spatial_axis)
    say(f"Mesh: {dict(mesh.shape)} over {mesh.devices.size} device(s)")

    trainer = Trainer(cfg, mesh=mesh)
    if args.summary:
        from eelunet_tpu.utils.summary import model_summary

        h, w = cfg.data.image_size
        say(model_summary(trainer.model, (1, h, w, cfg.model.in_channels)))
    train_loader, val_loader, test_loader = build_loaders(cfg)
    say(f"Criterion: {trainer.loss_name}")
    trainer.fit(train_loader, val_loader, test_loader)


if __name__ == "__main__":
    main()
