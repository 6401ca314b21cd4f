"""Model summary (reference startup torchsummary.summary, train.py:291) via
flax tabulate — per-layer output shapes and parameter counts without an extra
device forward pass."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def model_summary(model, input_shape=(1, 256, 256, 3), depth: int = 2) -> str:
    from flax import linen as nn

    tab = nn.tabulate(
        model,
        jax.random.PRNGKey(0),
        depth=depth,
        compute_flops=False,
        compute_vjp_flops=False,
    )
    return tab(jnp.zeros(input_shape, jnp.float32), train=False)


def param_count(variables) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
