"""Flax-upgrade tripwire for _TorchExactBatchNorm (ADVICE r4).

The subclass re-uses flax.linen.normalization private helpers
(_compute_stats/_normalize/_canonicalize_axes) and overrides ONLY the
running-var update with torch's Bessel-corrected (N/(N-1)) batch variance
(aten/native/Normalization.cpp; nn/layers.py:98). If a flax upgrade changes
those helpers' semantics, parity would silently drift — this test pins the
contract against stock nn.BatchNorm so the change fails loudly instead:

- train mode: normalized OUTPUT identical to stock (normalization inherits
  the biased batch variance in both), running_mean update identical, and
  running_var update differs from stock by exactly the n/(n-1) factor on the
  batch-var term;
- eval mode: identical outputs given identical batch_stats.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from eelunet_tpu.nn.layers import _TorchExactBatchNorm

KW = dict(use_running_average=None, momentum=0.9, epsilon=1e-5, axis=-1)


def _init_and_apply(mod, x):
    variables = mod.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y, mut = mod.apply(variables, x, use_running_average=False,
                       mutable=["batch_stats"])
    return variables, y, mut["batch_stats"]


def test_train_mode_matches_stock_except_bessel():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    n = 4 * 8 * 8  # reduction count over NHW

    v_ours, y_ours, bs_ours = _init_and_apply(_TorchExactBatchNorm(**KW), x)
    v_stock, y_stock, bs_stock = _init_and_apply(nn.BatchNorm(**KW), x)

    # Same init structure and values (zeros mean / ones var / scale / bias).
    assert jax.tree_util.tree_structure(v_ours) == jax.tree_util.tree_structure(v_stock)

    # Normalization output is inherited unchanged (biased batch var in both).
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_stock),
                               atol=1e-6)
    # Running mean update is inherited unchanged.
    np.testing.assert_allclose(np.asarray(bs_ours["mean"]),
                               np.asarray(bs_stock["mean"]), atol=1e-7)
    # Running var: ours = m*1 + (1-m)*var*n/(n-1), stock = m*1 + (1-m)*var.
    m = KW["momentum"]
    var_stock_term = (np.asarray(bs_stock["var"]) - m) / (1 - m)
    expect = m + (1 - m) * var_stock_term * (n / (n - 1))
    np.testing.assert_allclose(np.asarray(bs_ours["var"]), expect, rtol=1e-6)
    # And it is a REAL divergence at this n (the thing the subclass exists for).
    assert float(np.max(np.abs(np.asarray(bs_ours["var"])
                               - np.asarray(bs_stock["var"])))) > 1e-6


def test_eval_mode_identical_to_stock():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    stats = {
        "batch_stats": {
            "mean": jnp.asarray(rng.standard_normal(3).astype(np.float32)),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, 3).astype(np.float32)),
        },
        "params": {
            "scale": jnp.asarray(rng.uniform(0.5, 2.0, 3).astype(np.float32)),
            "bias": jnp.asarray(rng.standard_normal(3).astype(np.float32)),
        },
    }
    y_ours = _TorchExactBatchNorm(**KW).apply(stats, x, use_running_average=True)
    y_stock = nn.BatchNorm(**KW).apply(stats, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_stock),
                               atol=1e-7)


def test_axis_name_guard():
    """Cross-replica stat sync would corrupt the Bessel n (ADVICE r4)."""
    import pytest

    x = jnp.zeros((2, 4, 4, 3), jnp.float32)
    mod = _TorchExactBatchNorm(axis_name="data", **KW)
    with pytest.raises(AssertionError, match="cross-replica"):
        mod.init(jax.random.PRNGKey(0), x, use_running_average=False)
