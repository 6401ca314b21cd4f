"""Migrate an interleave-era EELUnet checkpoint to the concat-bridge format.

    python -m eelunet_tpu.cli.migrate --checkpoint <old_ckpt_dir> --out <new_dir>

The skip-bridge layout changed from interleaved [d0,e0,d1,e1,...] to
concatenated [d...|e...] input channels (models/eelunet.py layout note;
reference FeatureInterleaveBridge, EELUnet.py:127-141). Checkpoints saved
before that change load shape-compatibly but mis-predict; this tool applies
the EXACT cin permutation (``migrate_interleaved_checkpoint``) to the four
dec-stage conv kernels and re-saves the full state with the format-2 marker.
Full train state (opt_state/step/rng) is preserved; Adam moments for the
four remapped kernels are permuted identically.
"""

from __future__ import annotations

import argparse
import os


def _permute_matching_leaves(tree, migrate_fn):
    """Apply the dec-kernel permutation to any subtree shaped like params
    (used for params AND each Adam-moment copy inside opt_state)."""
    if not isinstance(tree, dict):
        return tree
    if all(f"dec{i}" in tree for i in (1, 2, 3, 4)):
        try:
            return migrate_fn(tree)
        except (KeyError, TypeError):
            return tree
    return tree


def main(argv=None):
    p = argparse.ArgumentParser(description="Migrate interleave-era EELUnet checkpoint")
    p.add_argument("--checkpoint", type=str, required=True, help="old checkpoint dir")
    p.add_argument("--out", type=str, required=True, help="destination dir")
    args = p.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    from eelunet_tpu.models.eelunet import migrate_interleaved_checkpoint
    from eelunet_tpu.train.checkpoint import write_format_meta

    src = os.path.abspath(args.checkpoint)
    dst = os.path.abspath(args.out)
    meta = os.path.join(src, "framework_meta.json")
    if os.path.exists(meta):
        raise SystemExit(
            f"{src} already carries framework_meta.json — it was saved with the "
            "concat bridge and needs no migration."
        )

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(src)
    tree["params"] = migrate_interleaved_checkpoint(tree["params"])
    # Adam moments (mu/nu) mirror the param tree: permute them identically so
    # resumed finetuning stays consistent with the remapped kernels.
    tree["opt_state"] = jax.tree_util.tree_map(
        lambda sub: _permute_matching_leaves(sub, migrate_interleaved_checkpoint),
        tree["opt_state"],
        is_leaf=lambda sub: isinstance(sub, dict)
        and all(f"dec{i}" in sub for i in (1, 2, 3, 4)),
    )
    ckptr.save(dst, tree, force=True)
    ckptr.wait_until_finished()
    write_format_meta(dst)
    print(f"Migrated {src} -> {dst} (concat-bridge format 2)")


if __name__ == "__main__":
    main()
