"""Pack a ToothDataset-style PNG tree into memmap arrays for fast epochs.

    python -m eelunet_tpu.cli.pack --data_dir /data/tooth --out /data/tooth_packed \
        --image_size 256

Training then consumes it with ``--set data.data_dir=<out> --set
data.packed=true``.
"""

from __future__ import annotations

import argparse

from eelunet_tpu.data.packed import pack_dataset


def main(argv=None):
    p = argparse.ArgumentParser(description="Pack dataset into memmaps")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--splits", type=str, default="train,test")
    p.add_argument("--multiclass", action="store_true",
                   help="masks hold class ids (model.out_channels > 1): "
                   "resize with NEAREST and keep ids unscaled")
    args = p.parse_args(argv)

    for split in args.splits.split(","):
        pack_dataset(args.data_dir, args.out, split,
                     (args.image_size, args.image_size), multiclass=args.multiclass)
        print(f"packed {split} -> {args.out}")


if __name__ == "__main__":
    main()
