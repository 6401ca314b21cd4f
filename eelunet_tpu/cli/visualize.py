"""Feature-map visualization CLI (reference utils/tools.py:12-123).

The reference writes feature-map PNG grids from INSIDE ``EELUnet.forward`` on
every call (EELUnet.py:389-462) — a debug side effect in the hot loop. Here
the same artifacts are produced offline on demand: load a checkpoint (or
visualize the untrained init, mirroring evaluate.py:172-176), run one sample
through the model with flax ``capture_intermediates``, and write one
channel-grid PNG per captured module output, plus the input image, the
probability map, and the thresholded mask. For models with auxiliary heads
the seg-vs-edge contribution diagnostic (tools.py:422-470) is printed.
"""

from __future__ import annotations

import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from eelunet_tpu.cli.common import base_parser, load_config, make_folder_dataset
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.registry import seg_probabilities
from eelunet_tpu.train.trainer import Trainer
from eelunet_tpu.utils.visualize import edge_seg_contribution, save_feature_grid, save_image


def _walk_intermediates(tree: dict, prefix: str = ""):
    """Yield (dotted_module_path, output) for every captured ``__call__``.

    flax nests intermediates as ``{module: {..., "__call__": (out, ...)}}``;
    a module called N times has N entries in the tuple."""
    for key, value in sorted(tree.items()):
        if key == "__call__":
            if not prefix:
                continue  # root output: already rendered as probabilities/mask
            for i, out in enumerate(value):
                name = prefix if len(value) == 1 else f"{prefix}~call{i}"
                yield name, out
        elif isinstance(value, dict):
            yield from _walk_intermediates(value, f"{prefix}.{key}" if prefix else key)


def _feature_arrays(output):
    """Flatten one captured output into nameable (suffix, array) feature maps.

    Outputs may be arrays, tuples, or ModelOutput pytrees; only spatial
    feature maps ((B,H,W,C) or (H,W,C)) are visualizable as channel grids."""
    leaves = jax.tree_util.tree_leaves(output)
    arrays = [a for a in leaves if hasattr(a, "ndim") and a.ndim in (3, 4)]
    if len(arrays) == 1:
        return [("", arrays[0])]
    return [(f"_out{i}", a) for i, a in enumerate(arrays)]


def main(argv=None):
    p = base_parser("Dump per-module feature-map grids for one sample")
    p.add_argument("--checkpoint", type=str, default="",
                   help="optional; without it the untrained init is visualized")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--index", type=int, default=0, help="sample index within the split")
    p.add_argument("--results_dir", type=str, default="visualizations")
    p.add_argument("--modules", type=str, default="",
                   help="comma-separated substring filters on dotted module "
                   "paths (e.g. 'enc1,edge'); default: everything at --max_depth")
    p.add_argument("--max_depth", type=int, default=1,
                   help="module-tree depth to visualize (1 = top-level blocks, "
                   "the reference's granularity; higher descends into submodules)")
    p.add_argument("--num_cols", type=int, default=8)
    args = p.parse_args(argv)
    cfg = load_config(args)

    mesh = create_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis, cfg.mesh.spatial_axis)
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()
    if args.checkpoint and os.path.exists(args.checkpoint):
        state = trainer.ckpt.restore_params(args.checkpoint, state)
        print(f"Loaded model weights from {args.checkpoint}")
    elif args.checkpoint:
        print(f"Checkpoint not found at {args.checkpoint}. Visualizing untrained model.")

    ds = make_folder_dataset(cfg.data, args.split, cfg.model.out_channels)
    if not 0 <= args.index < len(ds):
        raise IndexError(f"--index {args.index} out of range for split "
                         f"{args.split!r} ({len(ds)} samples)")
    image, _ = ds[args.index]
    images = jnp.asarray(image[None])

    from eelunet_tpu.data.augment import make_input_preprocess

    preprocess, _ = make_input_preprocess(cfg.data)
    model, meta = trainer.model, trainer.meta

    @jax.jit
    def forward(params, batch_stats, images):
        x, _ = preprocess(images, jnp.zeros((1, 1, 1, 1), jnp.float32))
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mods = model.apply(variables, x, train=False,
                                capture_intermediates=True, mutable=["intermediates"])
        return out, mods["intermediates"]

    out, intermediates = forward(state.params, state.batch_stats, images)

    out_dir = os.path.join(
        args.results_dir, f"{cfg.model.name}_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
    )
    os.makedirs(out_dir, exist_ok=True)

    # Input (un-normalized uint8 feed renders directly; float feeds are
    # ImageNet-normalized — render the raw dataset pixels instead).
    raw = np.asarray(image)
    save_image(raw if raw.dtype == np.uint8 else np.clip(
        raw * np.asarray(cfg.data.normalize_std) + np.asarray(cfg.data.normalize_mean), 0, 1
    ), os.path.join(out_dir, "input.png"))

    probs = np.asarray(seg_probabilities(out, meta))[0]
    if cfg.model.out_channels > 1:
        save_image(probs.max(axis=-1), os.path.join(out_dir, "probabilities.png"))
        mask = probs.argmax(axis=-1).astype(np.float32) / max(cfg.model.out_channels - 1, 1)
    else:
        save_image(probs[:, :, 0], os.path.join(out_dir, "probabilities.png"))
        mask = (probs[:, :, 0] > cfg.threshold).astype(np.float32)
    save_image(mask, os.path.join(out_dir, "mask.png"))

    filters = [f for f in args.modules.split(",") if f]
    n = 0
    for name, captured in _walk_intermediates(intermediates):
        depth = name.count(".") + 1
        if filters:
            if not any(f in name for f in filters):
                continue
        elif depth > args.max_depth:
            continue
        for suffix, fm in _feature_arrays(captured):
            fname = name.replace(".", "_") + suffix + ".png"
            save_feature_grid(np.asarray(fm), os.path.join(out_dir, fname),
                              num_cols=args.num_cols, title=name + suffix)
            n += 1

    if out.aux and out.aux[-1].shape == out.seg.shape:
        contrib = edge_seg_contribution(
            np.asarray(seg_probabilities(out, meta)), np.asarray(out.aux[-1])
        )
        print("seg/edge contribution (tools.py:422-470): "
              f"seg {contrib['seg_out_contribution']:.1f}%  "
              f"edge {contrib['edge_out_contribution']:.1f}%  "
              f"equal {contrib['equal_elements']:.1f}%")

    print(f"Saved input/probabilities/mask + {n} feature grids to {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
