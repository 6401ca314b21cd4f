"""Eval-time BatchNorm folding: absorb BN affines into adjacent conv weights.

Motivation (measured, docs/PERF.md round 5): batch_stats ride the jitted
forward as ARGUMENTS (harness contract — weights as jaxpr constants lose
22%), so XLA cannot constant-fold the eval-mode BN affine; the elementwise
normalize costs a real +4.8% of the eelunet 512^2 b16 headline
(130.1 -> 136.4 img/s ceiling, tools/infer_levers_ab.py). Folding is the
classic deploy-time transform: for conv -> BN(eval),

    y = (Wx + b - mean) / sqrt(var + eps) * scale + beta
      = (W * k) x + ((b - mean) * k + beta),      k = scale / sqrt(var + eps)

so the BN op disappears from the graph entirely (models are built with
``bn_folded=True``, which skips the BN call sites).

Scope: structure-driven over the flax param tree, covering the repo's
conv+BN block shapes (nn/layers.ConvBlock, models/eelunet.{MlpConvBlock,
UpConvBN, MlpUpConvBlock}; EELUnet.py:335-374):

- ``TorchConv_i`` -> ``BatchNorm_i``      (ConvBlock, MlpConvBlock 1st pair)
- ``ChannelAwarePatchedMLP_0``'s final 1x1 conv -> trailing ``BatchNorm_i``
  (MlpConvBlock 2nd pair, MlpUpConvBlock)
- ``TorchConvTranspose_0`` -> ``BatchNorm_0`` (UpConvBN)

NOT folded — and kept live in the graph — is any BN with no producing conv
in its module (the flagship's ``bottleneck_bn``, EELUnet.py:255-261: a BN
*before* a SAME-padded conv; folding forward would leak the affine into
the padding zeros). unet has no BN; other families' norms (LN/GN, BN in
non-block layouts) are out of scope and raise.

Exactness (same function, refactored floats) is pinned by
tests/test_bnfold.py; the +4.8% is re-measured end-to-end in bench.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

EPS = 1e-5  # nn/layers.BatchNorm epsilon (torch BatchNorm2d default)

FOLDABLE_MODELS = ("eelunet", "unet", "unext", "unext_s")  # unet: no BN -> no-op fold

# Families whose conv->BN pairs are NAMED modules at the model root rather
# than auto-numbered siblings (models/unext.py:163-203: encoderN -> ebnN,
# decoderN -> dbnN; the BN output feeds max_pool/relu/upsample — all safe
# to fold through, the rewrite is an exact affine refactor of the conv).
# egeunet's Down blocks and the eelunet bottleneck are BN->conv (pre-conv:
# the affine would leak into SAME padding) and malunet uses GroupNorm —
# neither is foldable.
NAMED_PAIRS = {
    "unext": [(f"encoder{i}", f"ebn{i}") for i in (1, 2, 3)]
    + [(f"decoder{i}", f"dbn{i}") for i in (1, 2, 3, 4)],
}
NAMED_PAIRS["unext_s"] = NAMED_PAIRS["unext"]


def _is_bn_wrapper(node) -> bool:
    return (
        isinstance(node, dict)
        and isinstance(node.get("BatchNorm_0"), dict)
        and "scale" in node["BatchNorm_0"]
    )


def _final_conv_dir(capmlp: Dict[str, Any]) -> str:
    """The CAPMLP block's LAST op is its highest-numbered TorchConv
    (models/eelunet.py:105-113: TorchConv_0 = token embed, TorchConv_1 =
    output 1x1)."""
    idx = sorted(int(k.split("_")[1]) for k in capmlp if k.startswith("TorchConv_"))
    return f"TorchConv_{idx[-1]}"


def find_fold_pairs(params: Dict[str, Any]) -> Tuple[List[Tuple[str, str]], List[str]]:
    """Walk the tree; return ([(conv_dir_path, bn_wrapper_path)], [skipped_bn])."""
    pairs: List[Tuple[str, str]] = []
    skipped: List[str] = []

    def walk(node: Dict[str, Any], path: str):
        for name, child in node.items():
            if not isinstance(child, dict):
                continue
            sub = f"{path}/{name}" if path else name
            m = re.fullmatch(r"BatchNorm_(\d+)", name)
            if m and _is_bn_wrapper(child):
                i = int(m.group(1))
                if f"TorchConv_{i}" in node:
                    pairs.append((f"{path}/TorchConv_{i}" if path else f"TorchConv_{i}", sub))
                elif "ChannelAwarePatchedMLP_0" in node:
                    cap = node["ChannelAwarePatchedMLP_0"]
                    conv = f"ChannelAwarePatchedMLP_0/{_final_conv_dir(cap)}"
                    pairs.append((f"{path}/{conv}" if path else conv, sub))
                elif "TorchConvTranspose_0" in node and i == 0:
                    pairs.append(
                        (f"{path}/TorchConvTranspose_0" if path else "TorchConvTranspose_0", sub))
                else:
                    skipped.append(sub)
                continue
            if _is_bn_wrapper(child):
                # named BN with no producing conv sibling (bottleneck_bn)
                skipped.append(sub)
                continue
            walk(child, sub)

    walk(params, "")
    return pairs, skipped


def _get(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def _del(tree, path):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    del node[parts[-1]]


def fold_bn_eval(model_name: str, params: Dict[str, Any],
                 batch_stats: Dict[str, Any]):
    """Return (params', batch_stats', n_folded) with every foldable BN
    absorbed into its producing conv and its entries REMOVED from both
    trees — matching the structure of a model built with ``bn_folded=True``.
    Unfoldable BNs (bottleneck_bn) keep their params/stats and stay live."""
    if model_name not in FOLDABLE_MODELS:
        raise ValueError(
            f"BN folding is implemented for {FOLDABLE_MODELS}, not "
            f"'{model_name}' (other families' norms are LN/GN or non-block "
            f"BN layouts)")
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    pairs, _skipped = find_fold_pairs(params)
    pairs += [(c, b) for c, b in NAMED_PAIRS.get(model_name, ())
              if b in params and c in params]
    for conv_dir, bn_dir in pairs:
        bnp = _get(params, bn_dir)["BatchNorm_0"]
        bns = _get(batch_stats, bn_dir)["BatchNorm_0"]
        k = bnp["scale"] / np.sqrt(bns["var"] + EPS)
        beta = bnp["bias"]
        mean = bns["mean"]
        conv = _get(params, conv_dir)
        inner = conv.get("Conv_0") or conv.get("ConvTranspose_0")
        kern = np.asarray(inner["kernel"], np.float32)
        bias = np.asarray(inner["bias"], np.float32)
        inner["kernel"] = (kern * k).astype(kern.dtype)
        inner["bias"] = ((bias - mean) * k + beta).astype(bias.dtype)
        _del(params, bn_dir)
        _del(batch_stats, bn_dir)
    # prune now-empty batch_stats dirs (e.g. blocks whose only stats were BN)
    def prune(node):
        for key in list(node.keys()):
            if isinstance(node[key], dict):
                prune(node[key])
                if not node[key]:
                    del node[key]
    prune(batch_stats)
    return params, batch_stats, len(pairs)
