"""Physical structured channel removal for the vanilla U-Net.

The mask path (prune.py) reproduces torch ``ln_structured`` semantics —
zeroed weights stay in the tensors, so compute doesn't shrink. This module
actually REMOVES the pruned channels, producing a slimmer Unet whose params
and FLOPs drop ~(1-amount)^2 on the conv stack.

Cross-layer dependency tracking: removing conv L's output channels slices the
input axis of every consumer of L. For the vanilla Unet (models/unet.py) the
wiring is a fixed graph including the center-crop + channel-concat skips
(reference Unet.py:48-56,76-95); the groups below encode it. Consumers of a
concat see their input index space as [up_features | skip_features] with
ORIGINAL offsets.

Exactness: physical removal is bit-equivalent to masking ONLY if the pruned
channels' biases are zeroed too (a masked-out conv channel still emits its
bias, and after ReLU that constant leaks into consumers — including through
padding-affected borders, where it cannot be folded into consumer biases).
Use ``compute_prune_masks(..., zero_bias=True)`` for the masking/finetune
preceding a physical slice; slicing then removes exactly-zero channels and
the slim model reproduces the masked model bit-for-bit (tested).

Other model families keep the mask path: EELUnet's interleave bridges pair
channels positionally across branches and its token-MLPs fix token_dim, so
physical removal there changes the function class, not just the wiring.
(The reference's prune.py targeted a single model and crashed, SURVEY §2.1.)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Sequence, Tuple

import jax
import numpy as np

# -- wiring spec ---------------------------------------------------------------
# Each group: one producer conv (its cout axis defines the channel set) and
# the consumers that read those channels on their cin axis. Concat consumers
# carry the ORIGINAL channel offset of this group inside the concatenated
# input. Paths are (module..., leaf-module) under params; kernels live at
# [...]["Conv_0" | "ConvTranspose_0"]["kernel"].
_CB = lambda i, j: ("ConvBlock_%d" % i, "TorchConv_%d" % j, "Conv_0")
_UP = lambda i: ("UpConvBlock_%d" % i, "TorchConvTranspose_0", "ConvTranspose_0")
_FINAL = ("TorchConv_0", "Conv_0")

# (group_name, producer, [(consumer, offset)])
UNET_GROUPS: List[Tuple[str, tuple, List[Tuple[tuple, int]]]] = [
    ("enc1_mid", _CB(0, 0), [(_CB(0, 1), 0)]),
    ("enc1", _CB(0, 1), [(_CB(1, 0), 0), (_CB(8, 0), 64)]),
    ("enc2_mid", _CB(1, 0), [(_CB(1, 1), 0)]),
    ("enc2", _CB(1, 1), [(_CB(2, 0), 0), (_CB(7, 0), 128)]),
    ("enc3_mid", _CB(2, 0), [(_CB(2, 1), 0)]),
    ("enc3", _CB(2, 1), [(_CB(3, 0), 0), (_CB(6, 0), 256)]),
    ("enc4_mid", _CB(3, 0), [(_CB(3, 1), 0)]),
    ("enc4", _CB(3, 1), [(_CB(4, 0), 0), (_CB(5, 0), 512)]),
    ("bot_mid", _CB(4, 0), [(_CB(4, 1), 0)]),
    ("bot", _CB(4, 1), [(_UP(0), 0)]),
    ("up4", _UP(0), [(_CB(5, 0), 0)]),
    ("dec4_mid", _CB(5, 0), [(_CB(5, 1), 0)]),
    ("dec4", _CB(5, 1), [(_UP(1), 0)]),
    ("up3", _UP(1), [(_CB(6, 0), 0)]),
    ("dec3_mid", _CB(6, 0), [(_CB(6, 1), 0)]),
    ("dec3", _CB(6, 1), [(_UP(2), 0)]),
    ("up2", _UP(2), [(_CB(7, 0), 0)]),
    ("dec2_mid", _CB(7, 0), [(_CB(7, 1), 0)]),
    ("dec2", _CB(7, 1), [(_UP(3), 0)]),
    ("up1", _UP(3), [(_CB(8, 0), 0)]),
    ("dec1_mid", _CB(8, 0), [(_CB(8, 1), 0)]),
    ("dec1", _CB(8, 1), [(_FINAL, 0)]),
]


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


def l2_keep_indices(kernel: np.ndarray, amount: float, round_to: int = 1) -> np.ndarray:
    """Indices of output channels kept by L2-structured pruning: drop the
    ``round(amount * cout)`` lowest-norm channels (torch ln_structured
    rounding, prune.py:251-253). Order-preserving.

    ``round_to``: round the KEPT count up to a multiple (dropping fewer
    channels). TPU-critical — misaligned channel counts break XLA's conv
    tiling onto the (8,128) vector registers; measured: a 30% prune with raw
    counts (717/358/179/90/45) ran 0.63x the UNPRUNED model's speed, while
    lane-aligned counts run faster than fraction-of-FLOPs would predict
    (docs/PERF.md)."""
    cout = kernel.shape[-1]
    k = int(round(amount * cout))
    keep_n = cout - k
    if round_to > 1:
        keep_n = min(cout, -(-keep_n // round_to) * round_to)
    k = cout - keep_n
    if k <= 0:
        return np.arange(cout)
    norms = np.sqrt((np.asarray(kernel, np.float64) ** 2).sum(axis=tuple(range(kernel.ndim - 1))))
    drop = set(np.argsort(norms, kind="stable")[:k].tolist())
    return np.asarray([i for i in range(cout) if i not in drop], np.int64)


def physical_prune_unet(params, amount: float, round_to: int = 1) -> Tuple[Any, Dict[str, Any]]:
    """Slice the lowest-L2 ``amount`` fraction of channels out of every
    prunable conv of a vanilla Unet param tree.

    Returns (slim param tree, widths dict) where widths are the constructor
    kwargs for a matching ``models.unet.Unet``. Pass the same ``round_to`` to
    ``compute_prune_masks`` so the masked-finetune channel sets match.
    """
    from flax.core import unfreeze

    p = jax.tree_util.tree_map(np.asarray, unfreeze(params))

    keep: Dict[str, np.ndarray] = {}
    for name, producer, _ in UNET_GROUPS:
        keep[name] = l2_keep_indices(_get(p, producer)["kernel"], amount, round_to)

    # Producer slice: kernel cout + bias (bias zeroed first — see module doc).
    for name, producer, _ in UNET_GROUPS:
        leaf = _get(p, producer)
        leaf["kernel"] = np.ascontiguousarray(leaf["kernel"][..., keep[name]])
        leaf["bias"] = np.ascontiguousarray(leaf["bias"][keep[name]])

    # Consumer slice: gather kept input indices per consumer across all the
    # groups feeding it (concat offsets are in ORIGINAL channel space).
    consumer_idx: Dict[tuple, List[Tuple[int, np.ndarray]]] = {}
    for name, _, consumers in UNET_GROUPS:
        for consumer, offset in consumers:
            consumer_idx.setdefault(consumer, []).append((offset, keep[name] + offset))
    for consumer, parts in consumer_idx.items():
        idx = np.concatenate([ix for _, ix in sorted(parts, key=lambda t: t[0])])
        leaf = _get(p, consumer)
        leaf["kernel"] = np.ascontiguousarray(leaf["kernel"][..., idx, :])

    widths = {
        "enc_widths": tuple(
            (len(keep[f"enc{i}_mid"]), len(keep[f"enc{i}"])) for i in range(1, 5)
        ),
        "bottleneck_widths": (len(keep["bot_mid"]), len(keep["bot"])),
        "up_widths": tuple(len(keep[f"up{i}"]) for i in (4, 3, 2, 1)),
        "dec_widths": tuple(
            (len(keep[f"dec{i}_mid"]), len(keep[f"dec{i}"])) for i in (4, 3, 2, 1)
        ),
    }
    return p, widths


def slim_unet(widths: Dict[str, Any], out_channels: int = 1, dtype=None):
    """Construct a Unet module matching ``physical_prune_unet`` widths."""
    from eelunet_tpu.models.unet import Unet

    def t2(pairs):
        return tuple(tuple(int(x) for x in pair) for pair in pairs)

    return Unet(
        out_channels=out_channels,
        enc_widths=t2(widths["enc_widths"]),
        bottleneck_widths=tuple(int(x) for x in widths["bottleneck_widths"]),
        up_widths=tuple(int(x) for x in widths["up_widths"]),
        dec_widths=t2(widths["dec_widths"]),
        dtype=dtype,
    )


def evaluate_params(model, meta, params, batches, threshold: float = 0.5) -> Dict[str, float]:
    """Full-metric evaluation of a bare (model, params) pair — same math as
    Trainer.evaluate (evaluate.py:62-124) without requiring a TrainState."""
    import jax.numpy as jnp

    from eelunet_tpu import metrics as M
    from eelunet_tpu.registry import seg_probabilities

    params = jax.tree_util.tree_map(jnp.asarray, params)

    @jax.jit
    def step(images, labels):
        out = model.apply({"params": params}, images, train=False)
        return M.update_metrics(seg_probabilities(out, meta), labels, threshold)

    acc = None
    for images, labels in batches:
        batch_acc = step(images, labels)
        acc = batch_acc if acc is None else acc + batch_acc
    if acc is None:
        return {k: 0.0 for k in M.METRIC_NAMES}
    return {k: float(v) for k, v in M.finalize_metrics(acc).items()}


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def save_slim(path: str, params, widths: Dict[str, Any]) -> str:
    """Persist slim params (orbax) + widths sidecar (JSON)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), jax.tree_util.tree_map(np.asarray, params), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "widths.json"), "w") as f:
        json.dump(widths, f, indent=2)
    return path


def is_slim_checkpoint(path: str) -> bool:
    """Slim checkpoints (save_slim) carry a widths.json sidecar — used by the
    CLIs to auto-detect physically pruned models behind --checkpoint."""
    return os.path.isfile(os.path.join(path, "widths.json"))


def load_slim(path: str, out_channels: int = 1, dtype=None):
    """Load a slim checkpoint -> (model, params)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "widths.json")) as f:
        widths = json.load(f)
    model = slim_unet(widths, out_channels=out_channels, dtype=dtype)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))["params"]
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"), target=template)
    return model, params
