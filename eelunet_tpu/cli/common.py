"""Shared CLI plumbing: argparse -> TrainConfig with dotted overrides."""

from __future__ import annotations

import argparse
import os
from typing import Tuple

from eelunet_tpu.config import TrainConfig, apply_overrides, config_from_json
from eelunet_tpu.data.dataset import SegmentationFolderDataset, train_val_split
from eelunet_tpu.data.pipeline import DataLoader


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", type=str, default="", help="JSON config file")
    p.add_argument("--model_type", type=str, default=None,
                   choices=["unet", "eelunet", "unet++", "unetpp", "egeunet",
                            "unext", "unext_s", "malunet"])
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--save_dir", type=str, default=None,
                   help="checkpoint root (train.py:229); used by every CLI "
                   "that saves or resolves tagged checkpoints")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted config override, e.g. --set optimizer.lr=3e-4")
    return p


def load_config(args) -> TrainConfig:
    if args.config:
        with open(args.config) as f:
            cfg = config_from_json(f.read())
    else:
        cfg = TrainConfig()
    ov = list(args.set)
    if args.model_type is not None:
        ov.append(f"model.name={args.model_type}")
    if args.data_dir is not None:
        ov.append(f"data.data_dir={args.data_dir}")
    if args.batch_size is not None:
        ov.append(f"data.batch_size={args.batch_size}")
    if args.image_size is not None:
        ov.append(f"data.image_size=[{args.image_size},{args.image_size}]")
    if args.seed is not None:
        ov.append(f"seed={args.seed}")
    if getattr(args, "save_dir", None) is not None:
        ov.append(f"save_dir={args.save_dir}")
    cfg = apply_overrides(cfg, ov)
    # Flip the persistent XLA compilation cache on before any CLI compiles —
    # repeat invocations of the same program load instead of recompiling
    # (minutes per train-step graph on remote-compile rigs, docs/PERF.md).
    from eelunet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(cfg.compile_cache)
    return cfg


def wants_raw_images(d) -> bool:
    """True when a device-side augmentation is enabled — the host dataset then
    yields raw [0,1] RGB and normalization moves into the augment chain
    (data/augment.make_augment_fn)."""
    return bool(d.add_canny_edge or d.canny_enhance)


def make_folder_dataset(d, split: str, num_classes: int = 1) -> SegmentationFolderDataset:
    """Dataset for one split, honoring the augmentation flags' raw-image
    requirement, the uint8 device feed, and multi-class id masks
    (num_classes = model.out_channels). Used by every CLI so the flags
    behave identically in train/evaluate/predict."""
    return SegmentationFolderDataset(
        d.data_dir, split, d.image_size, d.normalize_mean, d.normalize_std,
        normalize=not wants_raw_images(d),
        as_uint8=bool(getattr(d, "uint8_feed", False)),
        multiclass=num_classes > 1,
    )


def build_loaders(cfg: TrainConfig) -> Tuple[DataLoader, DataLoader, DataLoader]:
    """train/val/test loaders with the reference's 90/10 split of the train
    dir and a separate test dir (train.py:255-265)."""
    d = cfg.data
    num_classes = cfg.model.out_channels
    if d.packed:
        if num_classes > 1 and not d.uint8_feed:
            raise ValueError(
                "multi-class packed datasets need data.uint8_feed (default): "
                "the packed float path applies the binary /255 mask scale, "
                "while uint8 masks pass class ids through to the device "
                "preprocess unscaled"
            )
        if wants_raw_images(d) and not d.uint8_feed:
            raise ValueError(
                "add_canny_edge/canny_enhance need raw images; the packed "
                "float path serves normalized tensors. Enable data.uint8_feed "
                "(default) — packed memmaps are pre-normalization uint8, so "
                "the device augment chain applies — or use the PNG tree "
                "(data.packed=false)."
            )
        from eelunet_tpu.data.packed import PackedDataset

        full = PackedDataset(d.data_dir, "train", d.normalize_mean, d.normalize_std,
                             as_uint8=d.uint8_feed)
        test = PackedDataset(d.data_dir, "test", d.normalize_mean, d.normalize_std,
                             as_uint8=d.uint8_feed)
    else:
        full = make_folder_dataset(d, "train", num_classes)
        test = make_folder_dataset(d, "test", num_classes)
    seed = cfg.seed if cfg.seed is not None else 0
    tr_idx, va_idx = train_val_split(len(full), d.val_fraction, seed)
    # Multi-host: the train loader yields this process's slice of each global
    # batch (same shuffled order on every host — seed must be synced, see
    # cli.train). Val/test loaders stay unsharded: every host runs the full
    # split on replicated batches, so tail batches and metric sums are exact
    # without cross-host reassembly.
    from eelunet_tpu.parallel.distributed import process_shard_spec

    if d.device_cache and process_shard_spec() is None:
        # Whole-dataset HBM residency: batches are on-device gathers
        # (data/device_cache.py). Multi-host keeps the per-process slices
        # of the threaded loader below.
        from eelunet_tpu.data.device_cache import DeviceCache, DeviceCachedLoader

        full_c = DeviceCache(full, d.device_cache_max_gb)
        test_c = DeviceCache(test, d.device_cache_max_gb)
        mkc = lambda c, idx, shuffle: DeviceCachedLoader(
            c, d.batch_size, shuffle=shuffle, seed=seed,
            drop_remainder=d.drop_remainder and shuffle, indices=idx,
        )
        return (
            mkc(full_c, tr_idx, True),
            mkc(full_c, va_idx, False),
            mkc(test_c, None, False),
        )

    mk = lambda ds, idx, shuffle: DataLoader(
        ds, d.batch_size, shuffle=shuffle, seed=seed,
        drop_remainder=(d.drop_remainder and shuffle) or (shuffle and process_shard_spec() is not None),
        num_workers=d.num_workers, indices=idx,
        process_shard=process_shard_spec() if shuffle else None,
    )
    return (
        mk(full, tr_idx, True),
        mk(full, va_idx, False),
        mk(test, None, False),
    )
