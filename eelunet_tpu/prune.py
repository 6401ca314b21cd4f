"""L2-structured channel pruning workflow.

Working TPU-native version of the reference's broken prune.py (it imports the
deleted models.EdgeUnet and calls an undefined criterion, prune.py:12,227).
Intended flow reproduced (prune.py:234-304): load pretrained -> evaluate ->
per-conv L2-structured channel pruning (``prune.ln_structured(amount, n=2,
dim=0)`` == zero the ``amount`` fraction of output channels with the smallest
L2 norms, per conv) -> sparsity report -> evaluate pruned -> masked finetune
at lr/10 -> evaluate -> 3-way comparison table.

Masks are a 0/1 pytree multiplied into the params; finetuning re-applies the
mask after every optimizer step (torch keeps masks via forward pre-hooks; here
the mask application is fused into the jitted train step).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_conv_kernel(path, p) -> bool:
    """Structured pruning targets every Conv2d weight (prune.py:251-253):
    flax conv kernels are rank-4 (kh, kw, cin, cout) named 'kernel'."""
    last = path[-1]
    key = getattr(last, "key", getattr(last, "name", None))
    return key == "kernel" and hasattr(p, "ndim") and p.ndim == 4


def compute_prune_masks(
    params, amount: float, zero_bias: bool = False, round_to: int = 1
) -> Tuple[Any, Dict[str, float]]:
    """Per-conv masks zeroing the lowest-L2 ``amount`` fraction of output
    channels. Returns (mask pytree, per-layer sparsity report).

    ``zero_bias=False`` matches torch ``ln_structured`` exactly (weights only;
    a pruned channel still emits its bias). ``zero_bias=True`` masks the
    sibling bias too, making the channel's output exactly zero — the
    precondition for physical removal (prune_physical.py). ``round_to``
    rounds kept counts up to a multiple (see l2_keep_indices: misaligned
    channel counts are slower than not pruning on TPU)."""
    report: Dict[str, float] = {}
    keep_by_parent: Dict[tuple, jnp.ndarray] = {}

    def make_mask(path, p):
        if not _is_conv_kernel(path, p):
            return None  # second pass fills biases / non-conv leaves
        cout = p.shape[-1]
        k = int(round(amount * cout))  # torch ln_structured rounds
        if round_to > 1:
            keep_n = min(cout, -(-(cout - k) // round_to) * round_to)
            k = cout - keep_n
        if k <= 0:
            return jnp.ones_like(p)
        norms = jnp.sqrt(jnp.sum(jnp.asarray(p, jnp.float32) ** 2, axis=(0, 1, 2)))
        order = jnp.argsort(norms)
        keep = jnp.ones((cout,), p.dtype).at[order[:k]].set(0.0)
        name = "/".join(str(getattr(q, "key", getattr(q, "name", q))) for q in path)
        report[name] = float(k) / cout
        keep_by_parent[tuple(str(q) for q in path[:-1])] = keep
        return jnp.broadcast_to(keep, p.shape)

    masks = jax.tree_util.tree_map_with_path(make_mask, params)

    def fill(path, mask, p):
        if mask is not None:
            return mask
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", None))
        parent = tuple(str(q) for q in path[:-1])
        if zero_bias and key == "bias" and parent in keep_by_parent:
            return keep_by_parent[parent].astype(p.dtype)
        return jnp.ones_like(p)

    masks = jax.tree_util.tree_map_with_path(fill, masks, params, is_leaf=lambda x: x is None)
    return masks, report


def apply_masks(params, masks):
    return jax.tree_util.tree_map(lambda p, m: p * m, params, masks)


def sparsity_report(params) -> Dict[str, float]:
    """Fraction of exactly-zero weights per conv (prune.py:256-259)."""
    out: Dict[str, float] = {}

    def visit(path, p):
        if _is_conv_kernel(path, p):
            name = "/".join(str(getattr(q, "key", getattr(q, "name", q))) for q in path)
            out[name] = float(jnp.mean((p == 0).astype(jnp.float32)))
        return p

    jax.tree_util.tree_map_with_path(visit, params)
    return out


def global_sparsity(params) -> float:
    zeros = sum(float(jnp.sum((p == 0).astype(jnp.float32))) for p in jax.tree_util.tree_leaves(params))
    total = sum(p.size for p in jax.tree_util.tree_leaves(params))
    return zeros / max(total, 1)


def finetune_pruned(trainer, state, masks, train_loader, val_loader, epochs: int = 5, log=print):
    """Masked finetune at lr/10 (prune.py:276-278): scale updates by re-masking
    params after each epoch's steps. The mask re-application runs jitted."""
    import optax

    from eelunet_tpu.train.state import build_optimizer

    # Rebuild the optimizer at lr/10 over the masked params.
    cfg = trainer.cfg.optimizer
    cfg10 = type(cfg)(**{**cfg.__dict__, "lr": cfg.lr / 10.0})
    tx = build_optimizer(cfg10, max(len(train_loader), 1))
    state = state.replace(
        params=apply_masks(state.params, masks),
        opt_state=tx.init(apply_masks(state.params, masks)),
        tx=tx,
    )

    remask = jax.jit(lambda p: apply_masks(p, masks))
    step = trainer._get_step("train", state)
    for epoch in range(epochs):
        total, n = 0.0, 0
        for images, labels in trainer._device_batches(train_loader):
            state, loss, _ok = step(state, images, labels)
            # re-mask after every update, like torch's pruning forward hooks
            state = state.replace(params=remask(state.params))
            total += float(loss)
            n += 1
        val_loss = trainer.val_one_epoch(state, val_loader)
        log(f"[finetune {epoch + 1}/{epochs}] train={total / max(n, 1):.4f} val={val_loss:.4f}")
    return state
