"""Post-training int8 quantization of the inference forward (W8A8 convs).

The reference has no quantization story (pruning is its only compression,
prune.py); this is a beyond-reference deployment feature designed for the
TPU's int8 MXU path, which runs at 2x the bf16 MACs/cycle on v5e-class
chips. Instead of rewriting every model family with quantized modules, the
pass operates below flax at the jaxpr level: the traced forward is replayed
through a small interpreter that rewrites every eligible
``conv_general_dilated`` equation into

    x_q  = round(x / s_x)            # dynamic per-tensor activation scale
    k_q  = round(k / s_k)            # per-output-channel kernel scales
    y    = conv(x_q, k_q) -> int32   # MXU int8 pass
    out  = y * (s_x * s_k)           # dequantize, f32

Dense-shaped ``dot_general`` equations (the token-MLP matmuls of the
UNeXt/MALUNet families and nn.Dense layers generally) get the same
treatment with per-output-feature rhs scales.

Symmetric quantization, scales from absmax (activation scales computed on
device per call — no calibration set needed; the reduce is trivial next to
the conv). Depthwise/grouped convs (feature_group_count > 1) stay in the
original dtype: they are bandwidth-bound, not MXU-bound, and per-group
scale bookkeeping buys nothing. Bias adds and BN affines are separate
equations downstream of the conv and replay untouched (XLA fuses them into
the dequantize multiply).

Use via ``Predictor(..., quantize="int8")`` or ``cli.predict --quantize int8``.
Accuracy cost is measured in tests/test_quantize.py (probability deltas) and
docs/PERF.md (trained-model metric deltas).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.extend.core import Literal

_QINT_MAX = 127.0


def _map(f, *xs):
    return list(map(f, *xs))
# Primitives whose sub-jaxprs we recurse into looking for convs. Anything
# else with a sub-jaxpr (scan bodies, custom_vjp rules, pallas calls) is
# replayed as-is: the model forwards keep their convs at the top level or
# directly under pjit, and rewriting inside custom-gradient rules would
# change semantics the author pinned deliberately.
_RECURSE = ("pjit", "closed_call", "core_call", "remat", "remat2", "checkpoint")

_FLOAT_DTYPES = (jnp.float32, jnp.bfloat16, jnp.float16)


def _quantized_conv(x, k, params: Dict[str, Any]):
    """Replay one conv equation with int8 operands and int32 accumulation."""
    f32 = jnp.float32
    xs = jnp.max(jnp.abs(x.astype(f32))) / _QINT_MAX
    xs = jnp.maximum(xs, jnp.finfo(f32).tiny)
    xq = jnp.clip(jnp.round(x.astype(f32) / xs), -_QINT_MAX, _QINT_MAX).astype(jnp.int8)
    # kernel layout from the equation's dimension_numbers: reduce over all
    # axes except the output-feature axis for per-channel scales
    dn = params["dimension_numbers"]
    out_feature_axis = dn.rhs_spec[0]  # O position in the rhs layout
    reduce_axes = tuple(i for i in range(k.ndim) if i != out_feature_axis)
    ks = jnp.max(jnp.abs(k.astype(f32)), axis=reduce_axes, keepdims=True) / _QINT_MAX
    ks = jnp.maximum(ks, jnp.finfo(f32).tiny)
    kq = jnp.clip(jnp.round(k.astype(f32) / ks), -_QINT_MAX, _QINT_MAX).astype(jnp.int8)

    clean = dict(params)
    clean["preferred_element_type"] = jnp.int32
    y = jax.lax.conv_general_dilated_p.bind(xq, kq, **clean)

    # dequantize: broadcast the per-cout scale along the output feature axis
    out_axis = dn.out_spec[1]  # C position in the out layout
    shape = [1] * y.ndim
    shape[out_axis] = y.shape[out_axis]
    return (y.astype(f32) * xs * ks.reshape(shape)).astype(x.dtype)


def _pins_precision(prec) -> bool:
    """True when the equation explicitly pins HIGH/HIGHEST precision — the
    author saying "this op's exactness matters" (e.g. the low-rank FFT
    high-pass DFT factors, ops/fft.py: bf16 MXU passes corrupt the
    x - lowpass(x) cancellation; int8 would too). Such ops are never
    quantized."""
    if prec is None:
        return False
    elems = prec if isinstance(prec, tuple) else (prec,)
    return any(
        p in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH) for p in elems
    )


def _eligible(eqn, invals) -> bool:
    if eqn.primitive.name != "conv_general_dilated":
        return False
    if _pins_precision(eqn.params.get("precision")):
        return False
    x, k = invals
    if x.dtype not in _FLOAT_DTYPES or k.dtype not in _FLOAT_DTYPES:
        return False
    if eqn.params.get("feature_group_count", 1) != 1:
        return False  # depthwise/grouped: bandwidth-bound, keep dense dtype
    if eqn.params.get("batch_group_count", 1) != 1:
        return False
    return True


def _dot_eligible(eqn, invals) -> bool:
    """nn.Dense-shaped dot_generals: float operands, no batch dims, one
    contracting axis per side. Covers the token-MLP matmuls; exotic
    contractions (einsum-style multi-axis) replay dense."""
    if eqn.primitive.name != "dot_general":
        return False
    lhs, rhs = invals
    if lhs.dtype not in _FLOAT_DTYPES or rhs.dtype not in _FLOAT_DTYPES:
        return False
    if _pins_precision(eqn.params.get("precision")):
        return False
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    if lb or rb or len(lc) != 1 or len(rc) != 1:
        return False
    # tiny contractions gain nothing and lose precision
    return lhs.shape[lc[0]] >= 8


def _quantized_dot(lhs, rhs, params: Dict[str, Any]):
    """Replay one Dense-shaped dot_general with int8 operands."""
    f32 = jnp.float32
    (lc,), (rc,) = params["dimension_numbers"][0]
    ls = jnp.max(jnp.abs(lhs.astype(f32))) / _QINT_MAX
    ls = jnp.maximum(ls, jnp.finfo(f32).tiny)
    lq = jnp.clip(jnp.round(lhs.astype(f32) / ls), -_QINT_MAX, _QINT_MAX).astype(jnp.int8)
    # per-output-feature scales: reduce over the contracted rhs axis only
    rs = jnp.max(jnp.abs(rhs.astype(f32)), axis=rc, keepdims=True) / _QINT_MAX
    rs = jnp.maximum(rs, jnp.finfo(f32).tiny)
    rq = jnp.clip(jnp.round(rhs.astype(f32) / rs), -_QINT_MAX, _QINT_MAX).astype(jnp.int8)

    clean = dict(params)
    clean["preferred_element_type"] = jnp.int32
    y = jax.lax.dot_general_p.bind(lq, rq, **clean)

    # output layout: lhs free axes then rhs free axes — rhs scales (with the
    # contracted axis squeezed) broadcast over the trailing rhs-free block
    rhs_free_scale = jnp.squeeze(rs, axis=rc)
    shape = (1,) * (lhs.ndim - 1) + rhs_free_scale.shape
    return (y.astype(f32) * ls * rhs_free_scale.reshape(shape)).astype(lhs.dtype)


def _eval_sub(sub, invals, stats):
    """Recurse into a sub-jaxpr param (ClosedJaxpr or open Jaxpr — remat
    stores the latter)."""
    if hasattr(sub, "consts"):
        return _eval_jaxpr_quantized(sub.jaxpr, sub.consts, *invals, stats=stats)
    return _eval_jaxpr_quantized(sub, [], *invals, stats=stats)


def _eval_jaxpr_quantized(jaxpr, consts, *args, stats=None):
    env: Dict[Any, Any] = {}

    def read(var):
        return var.val if isinstance(var, Literal) else env[var]

    def write(var, val):
        env[var] = val

    _map(write, jaxpr.constvars, consts)
    _map(write, jaxpr.invars, args)

    for eqn in jaxpr.eqns:
        invals = _map(read, eqn.invars)
        if _eligible(eqn, invals):
            outs = [_quantized_conv(invals[0], invals[1], eqn.params)]
            if stats is not None:
                stats["quantized_convs"] = stats.get("quantized_convs", 0) + 1
        elif _dot_eligible(eqn, invals):
            outs = [_quantized_dot(invals[0], invals[1], eqn.params)]
            if stats is not None:
                stats["quantized_dots"] = stats.get("quantized_dots", 0) + 1
        elif eqn.primitive.name in _RECURSE and "jaxpr" in eqn.params:
            outs = _eval_sub(eqn.params["jaxpr"], invals, stats)
        elif "call_jaxpr" in eqn.params:
            # custom_jvp/custom_vjp calls carry their primal as call_jaxpr
            # and cannot be re-bound from params (the callables are not
            # stored). Inference never differentiates through this path, so
            # replaying the primal is exact.
            outs = _eval_sub(eqn.params["call_jaxpr"], invals, stats)
        else:
            outs = eqn.primitive.bind(*invals, **eqn.params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        _map(write, eqn.outvars, outs)

    return _map(read, jaxpr.outvars)


def quantize_fn(fn: Callable, *, stats: dict = None) -> Callable:
    """Wrap ``fn`` (any jittable array->pytree function) so every eligible
    conv runs as an int8 MXU conv with dynamic scales. Tracing happens per
    call — wrap the result in ``jax.jit`` (as Predictor does) so the rewrite
    cost is paid once per shape. ``stats`` (optional dict) receives a
    ``quantized_convs`` count at trace time for tests/telemetry."""

    def wrapped(*args):
        flat_args, in_tree = jax.tree_util.tree_flatten(args)
        closed, out_shape = jax.make_jaxpr(
            lambda *fa: fn(*jax.tree_util.tree_unflatten(in_tree, fa)),
            return_shape=True,
        )(*flat_args)
        out_flat = _eval_jaxpr_quantized(closed.jaxpr, closed.consts, *flat_args, stats=stats)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(out_shape), out_flat
        )

    return wrapped
