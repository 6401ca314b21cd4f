"""Parameter initializers matching PyTorch defaults and the reference's
custom ``_init_weights`` schemes (egeunet.py:308-321, malunet.py:266-279,
unext.py:44-57).

Flax kernel layout is ``(kh, kw, cin/groups, cout)`` for Conv and
``(in, out)`` for Dense; fan computations below account for that.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_conv_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    fan_in = kh*kw*(cin/groups) = prod(shape[:-1]) in flax layout.
    """
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """PyTorch Conv/Linear bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_init(key, shape, dtype=jnp.float32):
    """PyTorch Linear default (flax Dense layout (in, out))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_normal_fan_out(groups: int = 1):
    """``nn.init``-style kaiming normal over fan_out//groups, as used by the
    reference's _init_weights: std = sqrt(2 / (kh*kw*cout/groups))."""

    def init(key, shape, dtype=jnp.float32):
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_out = receptive * shape[-1] // groups
        std = math.sqrt(2.0 / fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init


def trunc_normal(std: float = 0.02):
    """timm trunc_normal_: N(0, std) truncated to +-2*std."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def conv1d_normal_init(key, shape, dtype=jnp.float32):
    """Reference Conv1d init: N(0, sqrt(2/(k*cout))) (egeunet.py:313-315)."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    n = receptive * shape[-1]
    return math.sqrt(2.0 / n) * jax.random.normal(key, shape, dtype)


zeros = jax.nn.initializers.zeros
ones = jax.nn.initializers.ones
