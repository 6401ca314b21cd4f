"""Inference + PNG mask export (reference test.py:33-128).

Differences from the reference, normalized: the reference thresholds raw
outputs at 0.5 without applying sigmoid for logit-output models (test.py:
117-118 — wrong for unet/unext); here ``seg_probabilities`` handles the
output convention per model. Masks are written as L-mode PNGs ``pred_{i}.png``
into a timestamped directory, as in test.py:98-127.
"""

from __future__ import annotations

import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from eelunet_tpu.cli.common import base_parser, load_config, make_folder_dataset
from eelunet_tpu.data.pipeline import DataLoader, prefetch_to_device
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.registry import seg_probabilities
from eelunet_tpu.train.trainer import Trainer


def save_mask(pred01: np.ndarray, path: str, multiclass: bool = False):
    """Binary (H,W) array -> {0,255} L-mode PNG (test.py:23-31); multi-class
    class-id maps are stored as raw ids (the loadable inverse of the
    multiclass folder-dataset convention)."""
    from PIL import Image

    arr = pred01 if multiclass else pred01 * 255
    Image.fromarray(arr.astype(np.uint8), mode="L").save(path)


def _predict_tiled(args, cfg):
    """--tile mode: native-resolution masks via Predictor.predict_proba_tiled.

    Images are NOT resized to data.image_size — each is decoded at its
    original resolution and swept by fixed-shape overlapping tiles, so the
    exported mask matches the source image pixel-for-pixel (the reference
    can only emit masks at the training size, test.py:48-51)."""
    from eelunet_tpu.cli.common import wants_raw_images
    from eelunet_tpu.data.dataset import SegmentationFolderDataset
    from eelunet_tpu.inference import Predictor

    if wants_raw_images(cfg.data):
        raise ValueError(
            "add_canny_edge/canny_enhance are not supported with --tile "
            "(the augment chain runs at the training resolution); predict "
            "without tiling or disable the augment flags."
        )
    d = cfg.data
    ds = SegmentationFolderDataset(
        d.data_dir, args.split, image_size=None, as_uint8=True,
        normalize_mean=d.normalize_mean, normalize_std=d.normalize_std,
    )
    predictor = Predictor(
        cfg.model, checkpoint=args.checkpoint, threshold=cfg.threshold, tta=cfg.tta,
        normalize_mean=tuple(d.normalize_mean), normalize_std=tuple(d.normalize_std),
        quantize=args.quantize or None,
    )
    out_dir = os.path.join(
        args.results_dir, f"{cfg.model.name}_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
    )
    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(ds)):
        image, _ = ds[i]
        mask = predictor.predict_tiled(
            image[None], tile=args.tile, overlap=args.tile_overlap
        )
        save_mask(mask[0, :, :, 0], os.path.join(out_dir, f"pred_{i}.png"),
                  multiclass=cfg.model.out_channels > 1)
    print(f"Saved {len(ds)} native-resolution masks to {out_dir}")
    return out_dir


def main(argv=None):
    p = base_parser("Run inference and export predicted masks as PNGs")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument(
        "--tile", type=int, default=0,
        help="sliding-window inference at NATIVE image resolution with this "
        "tile size (0 = off, resize to data.image_size like the reference). "
        "One compiled executable serves every input size.",
    )
    p.add_argument("--tile_overlap", type=int, default=64,
                   help="overlap between adjacent tiles (blended seam-free)")
    p.add_argument("--quantize", type=str, default="", choices=["", "int8"],
                   help="int8: W8A8 dynamic-scale convs (eelunet_tpu.quantize)")
    args = p.parse_args(argv)
    cfg = load_config(args)

    if not os.path.exists(args.checkpoint):
        raise FileNotFoundError(f"Checkpoint not found: {args.checkpoint}")  # test.py:86

    if args.tile:
        return _predict_tiled(args, cfg)

    from eelunet_tpu.prune_physical import is_slim_checkpoint, load_slim

    if is_slim_checkpoint(args.checkpoint):
        from eelunet_tpu.cli.common import wants_raw_images

        if wants_raw_images(cfg.data):
            # Same guard as cli.evaluate: the canny augments append a 4th
            # input channel, but slim checkpoints store 3-channel models —
            # fail clearly instead of deep inside a conv shape mismatch.
            raise ValueError(
                "add_canny_edge/canny_enhance are not supported on the slim "
                "(physically pruned) predict path; predict with the dense model."
            )
        # Physically pruned unet: rebuild the slim module from widths.json.
        from eelunet_tpu.registry import MODEL_REGISTRY

        dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else None
        model, params, batch_stats = load_slim(args.checkpoint, cfg.model.out_channels, dtype=dtype)
        meta = MODEL_REGISTRY["eelunet" if type(model).__name__ == "EELUnet" else "unet"]
    else:
        mesh = create_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis, cfg.mesh.spatial_axis)
        trainer = Trainer(cfg, mesh=mesh)
        state = trainer.init_state()
        state = trainer.ckpt.restore_params(args.checkpoint, state)
        model, meta = trainer.model, trainer.meta
        params, batch_stats = state.params, state.batch_stats

    d = cfg.data
    ds = make_folder_dataset(d, args.split, cfg.model.out_channels)
    loader = DataLoader(ds, d.batch_size, num_workers=d.num_workers, drop_remainder=False)

    from eelunet_tpu.data.augment import make_input_preprocess

    preprocess, _ = make_input_preprocess(d)

    out_dir = os.path.join(args.results_dir, f"{cfg.model.name}_{datetime.now().strftime('%Y%m%d_%H%M%S')}")
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def forward(params, batch_stats, images):
        # uint8 scale / augment chain / normalize, by batch dtype — one
        # fused executable with the forward (dummy labels: images-only path).
        images, _ = preprocess(images, jnp.zeros((1, 1, 1, 1), jnp.float32))
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def fwd(x):
            return seg_probabilities(model.apply(variables, x, train=False), meta)

        if args.quantize == "int8":
            from eelunet_tpu.quantize import quantize_fn

            fwd = quantize_fn(fwd)

        from eelunet_tpu.registry import predict_probabilities

        return predict_probabilities(fwd, images, tta=cfg.tta)

    from eelunet_tpu.inference import _probs_to_mask

    i = 0
    for images, _ in loader:
        probs = np.asarray(forward(params, batch_stats, images))
        preds = _probs_to_mask(probs, cfg.threshold)
        for b in range(preds.shape[0]):
            save_mask(preds[b, :, :, 0], os.path.join(out_dir, f"pred_{i}.png"),
                      multiclass=cfg.model.out_channels > 1)
            i += 1
    print(f"Saved {i} masks to {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
