"""Eval-time BN folding (bnfold.fold_bn_eval): exactness + structure.

The fold is the +4.8%-headline transform (docs/PERF.md round 5): conv-
adjacent BN affines absorbed into conv weights, BN call sites compiled out
via the blocks' ``bn_folded`` flag. These tests pin that the folded model
is the SAME FUNCTION (refactored floats) and that the stripped tree matches
the flag-model's own init structure, so Predictor/bench can't drift.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eelunet_tpu.bnfold import find_fold_pairs, fold_bn_eval
from eelunet_tpu.registry import _build


def _randomized_bn(variables, rng):
    """Give every BN non-trivial scale/bias/mean/var (init values are
    identity-like and would hide broken fold math)."""

    def scramble(path, leaf):
        keys = [str(getattr(k, "key", k)) for k in path]
        if "BatchNorm_0" in keys:
            name = keys[-1]
            if name in ("scale", "var"):
                return jnp.asarray(rng.uniform(0.5, 1.8, leaf.shape), leaf.dtype)
            if name in ("bias", "mean"):
                return jnp.asarray(rng.standard_normal(leaf.shape) * 0.3, leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(scramble, variables)


def test_eelunet_fold_is_same_function():
    model = _build("eelunet")()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 48, 48, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = _randomized_bn(variables, rng)

    out0 = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)

    params2, bstats2, n = fold_bn_eval(
        "eelunet", variables["params"], variables["batch_stats"])
    # 6 ConvBlocks x2 + 6 MlpConvBlocks x2 + 4 UpConvBN + 4 MlpUpConvBlock
    assert n == 32, n
    # bottleneck_bn stays live: params+stats retained
    assert "bottleneck_bn" in params2 and "bottleneck_bn" in bstats2

    folded = model.clone(bn_folded=True)
    out1 = jax.jit(lambda v, x: folded.apply(v, x, train=False))(
        {"params": params2, "batch_stats": bstats2}, x)

    np.testing.assert_allclose(np.asarray(out1.seg), np.asarray(out0.seg),
                               atol=2e-5, rtol=2e-5)
    for a, b in zip(out1.aux, out0.aux):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_folded_tree_matches_flag_model_structure():
    model = _build("eelunet")()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params2, bstats2, _ = fold_bn_eval(
        "eelunet", variables["params"], variables["batch_stats"])
    want = jax.eval_shape(
        lambda k: model.clone(bn_folded=True).init(k, x, train=False),
        jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(want["params"])
            == jax.tree_util.tree_structure(
                jax.tree_util.tree_map(jnp.asarray, params2)))
    assert (jax.tree_util.tree_structure(want["batch_stats"])
            == jax.tree_util.tree_structure(
                jax.tree_util.tree_map(jnp.asarray, bstats2)))


def test_unet_fold_is_noop_and_others_raise():
    model = _build("unet")()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    pairs, skipped = find_fold_pairs(variables["params"])
    assert pairs == [] and skipped == []
    _, _, n = fold_bn_eval("unet", variables["params"],
                           variables.get("batch_stats", {}))
    assert n == 0
    with pytest.raises(ValueError, match="BN folding"):
        fold_bn_eval("malunet", {}, {})


def test_unext_s_fold_is_same_function():
    """Named-pair map (encoderN->ebnN, decoderN->dbnN): BN feeds
    max_pool/relu/upsample — fold must still be the exact affine refactor."""
    model = _build("unext_s")()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = _randomized_bn(variables, rng)

    out0 = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    params2, bstats2, n = fold_bn_eval(
        "unext_s", variables["params"], variables["batch_stats"])
    assert n == 7, n  # ebn1-3 + dbn1-4; no other BN in the family
    assert bstats2 == {}  # every stat was a folded BN's

    folded = model.clone(bn_folded=True)
    out1 = jax.jit(lambda v, x: folded.apply(v, x, train=False))(
        {"params": params2}, x)
    np.testing.assert_allclose(np.asarray(out1.seg), np.asarray(out0.seg),
                               atol=2e-5, rtol=2e-5)


def test_bn_folded_train_asserts():
    model = _build("eelunet")(bn_folded=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(AssertionError, match="eval-only"):
        model.init(jax.random.PRNGKey(0), x, train=True)
