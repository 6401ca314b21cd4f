"""Analytic FLOP counting + MFU accounting.

Counts the matmul/conv FLOPs of any jittable function by walking its jaxpr —
the numerator of MFU (model-FLOPs utilization): elementwise/normalization ops
are excluded on purpose, since the MXU floor is set by the contraction FLOPs
alone (the "How to Scale Your Model" convention). Backend-independent and
trace-only (no compile), so it runs identically on CPU tests and the TPU
bench.

Peak-rate table for MFU%: dense bf16 FLOP/s per chip, keyed on
``jax.devices()[0].device_kind``. Sources: Google Cloud TPU public specs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

# Dense bf16 peak FLOP/s per chip (public TPU specs).
PEAK_BF16_FLOPS: Dict[str, float] = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
    "TPU7x": 2307e12,
}


def peak_flops_for(device_kind: str) -> Optional[float]:
    # Longest prefix first: "TPU v5p" must win over "TPU v5", or v5p chips
    # would match the v5e rate and overstate MFU ~2.3x.
    for k in sorted(PEAK_BF16_FLOPS, key=len, reverse=True):
        if device_kind.lower().startswith(k.lower()):
            return PEAK_BF16_FLOPS[k]
    return None


def _conv_flops(eqn) -> float:
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    dn = eqn.params["dimension_numbers"]
    fgc = eqn.params.get("feature_group_count", 1)
    bgc = eqn.params.get("batch_group_count", 1)
    # rhs_spec: (out_c_dim, in_c_dim, *spatial_dims) as INDEX positions
    rhs_spec = dn.rhs_spec
    cin_per_group = rhs[rhs_spec[1]]
    k_spatial = np.prod([rhs[d] for d in rhs_spec[2:]], dtype=np.float64)
    out_elems = np.prod(out, dtype=np.float64)
    del fgc, bgc  # cin_per_group already reflects grouping
    return float(2.0 * out_elems * k_spatial * cin_per_group)


def _dot_flops(eqn) -> float:
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    k = np.prod([lhs[d] for d in lc], dtype=np.float64)
    b = np.prod([lhs[d] for d in lb], dtype=np.float64)
    m = np.prod([s for i, s in enumerate(lhs) if i not in set(lc) | set(lb)], dtype=np.float64)
    n = np.prod([s for i, s in enumerate(rhs) if i not in set(rc) | set(rb)], dtype=np.float64)
    return float(2.0 * b * m * n * k)


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # trip count is dynamic; count one body iteration (documented
            # undercount — none of the benched models carry while loops)
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(_jaxpr_flops(b.jaxpr) for b in branches)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key)
                if inner is not None:
                    total += _jaxpr_flops(getattr(inner, "jaxpr", inner))
                    break
    return total


def count_matmul_flops(fn, *args, **kwargs) -> float:
    """Total conv+dot FLOPs of one call of ``fn(*args, **kwargs)`` (2*MACs)."""
    import jax

    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return _jaxpr_flops(jaxpr.jaxpr)


def model_forward_flops(model_name: str, image: int, batch: int = 1, dtype: str = "bfloat16") -> float:
    """Forward-pass matmul FLOPs for one registry model at a resolution."""
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.registry import create_model

    model, _ = create_model(ModelConfig(name=model_name, dtype=dtype))
    x = jnp.zeros((batch, image, image, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3), jnp.float32)), jax.random.PRNGKey(0)
    )
    # eval_shape variables are abstract; make_jaxpr only needs avals, so build
    # zero trees with the right structure/shapes.
    import jax.tree_util as jtu

    zeros = jtu.tree_map(lambda a: jnp.zeros(a.shape, a.dtype), variables)
    return count_matmul_flops(
        lambda vs, im: model.apply(vs, im, train=False), zeros, x
    )


def mfu_pct(images_per_sec: float, flops_per_image: float, device_kind: str) -> Optional[float]:
    peak = peak_flops_for(device_kind)
    if not peak:
        return None
    return 100.0 * images_per_sec * flops_per_image / peak
