"""Model zoo tests: parameter-count parity with the measured reference sizes,
output-contract shapes, jit-compilability, and gradient flow.

Reference measured sizes (SURVEY.md §0 / BASELINE.md): Unet 31.03M,
EELUnet 26.26M, EGEUNet 0.044M, MALUNet 0.178M, UNext 1.47M, UNext_S 0.25M.
Parameter-count equality at this precision is a strong architectural parity
check (every layer's shape must match).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eelunet_tpu.config import ModelConfig
from eelunet_tpu.registry import MODEL_REGISTRY, create_model, seg_probabilities

PARAM_COUNTS = {
    "unet": 31.03,
    "eelunet": 26.26,
    "egeunet": 0.044,
    "malunet": 0.178,
    "unext": 1.47,
    "unext_s": 0.25,
}

_CACHE = {}


def _init(name, hw=64):
    key = (name, hw)
    if key not in _CACHE:
        model, meta = create_model(ModelConfig(name=name))
        x = jnp.zeros((2, hw, hw, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        _CACHE[key] = (model, meta, variables, x)
    return _CACHE[key]


@pytest.mark.parametrize("name", sorted(PARAM_COUNTS))
def test_param_count_parity(name):
    model, meta, variables, _ = _init(name)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"])) / 1e6
    assert abs(n - PARAM_COUNTS[name]) < 0.005, f"{name}: {n:.4f}M != {PARAM_COUNTS[name]}M"


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_contract(name):
    model, meta, variables, x = _init(name)
    out = model.apply(variables, x, train=False)
    b, h, w, _ = x.shape
    assert out.seg.shape == (b, h, w, 1)
    assert out.seg.dtype == jnp.float32
    if meta.has_aux:
        assert len(out.aux) == 5
    if not meta.seg_is_logits:
        v = np.asarray(out.seg)
        assert v.min() >= 0.0 and v.max() <= 1.0


def test_eelunet_aux_scales():
    """Deep-supervision heads at 1/16,1/8,1/4,1/2,1/1 (EELUnet.py:471)."""
    model, meta, variables, x = _init("eelunet")
    out = model.apply(variables, x, train=False)
    hw = x.shape[1]
    assert [a.shape[1] for a in out.aux] == [hw // 16, hw // 8, hw // 4, hw // 2, hw]


def test_egeunet_aux_fullres():
    """EGE-UNet gt_pre maps are upsampled to full res (egeunet.py:353-382)."""
    model, meta, variables, x = _init("egeunet")
    out = model.apply(variables, x, train=False)
    assert all(a.shape == out.seg.shape for a in out.aux)


@pytest.mark.parametrize("name", ["unet", "eelunet"])
def test_jit_and_grad(name):
    model, meta, variables, x = _init(name)

    @jax.jit
    def loss_fn(params):
        out = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, x, train=False)
        return jnp.mean(seg_probabilities(out, meta))

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # At least some gradient signal reaches the first encoder conv.
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_train_mode_mutates_batch_stats():
    model, meta, variables, x = _init("unet")  # unet has no BN -> no batch_stats
    assert "batch_stats" not in variables

    model, meta, variables, x = _init("eelunet")
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after))
    assert changed


def test_unknown_model_rejected():
    with pytest.raises(ValueError):
        create_model(ModelConfig(name="nope"))
