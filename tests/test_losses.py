"""Loss parity tests: closed-form values + PyTorch cross-checks.

The torch cross-checks re-derive the reference formulas independently
(per-sample flatten dice with smooth=1, BCE on probabilities, max-pool target
pyramid with weights .1-.5) — utils/Loss.py:28-157.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eelunet_tpu import losses as L

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(shape, rng, lo=0.02, hi=0.98):
    return rng.uniform(lo, hi, shape).astype(np.float32)


def _torch_dice(pred, target):
    smooth = 1.0
    b = pred.shape[0]
    p = torch.from_numpy(pred).reshape(b, -1)
    t = torch.from_numpy(target).reshape(b, -1)
    inter = (p * t).sum(1)
    score = (2 * inter + smooth) / (p.sum(1) + t.sum(1) + smooth)
    return float(1 - score.sum() / b)


def _torch_bce(pred, target):
    return float(F.binary_cross_entropy(torch.from_numpy(pred), torch.from_numpy(target)))


def test_dice_closed_form():
    pred = np.ones((2, 4, 4, 1), np.float32)
    target = np.ones((2, 4, 4, 1), np.float32)
    assert abs(float(L.dice_loss(jnp.array(pred), jnp.array(target)))) < 1e-6
    # all-wrong prediction: dice score = smooth/(16+16+smooth)
    target0 = np.zeros_like(target)
    want = 1.0 - 1.0 / (16 + 0 + 1)
    got = float(L.dice_loss(jnp.array(pred), jnp.array(target0)))
    assert abs(got - want) < 1e-6


def test_dice_vs_torch(rng):
    pred = _rand((3, 8, 8, 1), rng)
    target = (rng.uniform(size=(3, 8, 8, 1)) > 0.5).astype(np.float32)
    got = float(L.dice_loss(jnp.array(pred), jnp.array(target)))
    assert abs(got - _torch_dice(pred, target)) < 1e-5


def test_bce_vs_torch(rng):
    pred = _rand((3, 8, 8, 1), rng)
    target = (rng.uniform(size=(3, 8, 8, 1)) > 0.5).astype(np.float32)
    got = float(L.bce_loss(jnp.array(pred), jnp.array(target)))
    assert abs(got - _torch_bce(pred, target)) < 1e-5


def test_bce_dice_weights(rng):
    pred = _rand((2, 8, 8, 1), rng)
    target = (rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)
    wb, wd = 0.7, 1.3
    got = float(L.bce_dice_loss(jnp.array(pred), jnp.array(target), wb, wd))
    want = wd * _torch_dice(pred, target) + wb * _torch_bce(pred, target)
    assert abs(got - want) < 1e-5


def test_edge_bce_dice_pyramid(rng):
    """Full deep-supervision criterion vs independent torch computation
    (Loss.py:92-113)."""
    target = (rng.uniform(size=(2, 32, 32, 1)) > 0.5).astype(np.float32)
    out = _rand((2, 32, 32, 1), rng)
    aux = [_rand((2, 32 // k, 32 // k, 1), rng) for k in (16, 8, 4, 2, 1)]

    got = float(L.edge_bce_dice_loss([jnp.array(a) for a in aux], jnp.array(out), jnp.array(target)))

    t = torch.from_numpy(target).permute(0, 3, 1, 2)
    want = _torch_dice(out, target) + _torch_bce(out, target)
    for a, k, w in zip(aux, (16, 8, 4, 2, 1), (0.1, 0.2, 0.3, 0.4, 0.5)):
        tk = F.max_pool2d(t, kernel_size=k, stride=k).permute(0, 2, 3, 1).numpy() if k > 1 else target
        want += w * (_torch_dice(a, tk) + _torch_bce(a, tk))
    assert abs(got - want) < 1e-4


def test_gt_bce_dice(rng):
    target = (rng.uniform(size=(2, 16, 16, 1)) > 0.5).astype(np.float32)
    out = _rand((2, 16, 16, 1), rng)
    aux = [_rand((2, 16, 16, 1), rng) for _ in range(5)]
    got = float(L.gt_bce_dice_loss([jnp.array(a) for a in aux], jnp.array(out), jnp.array(target)))
    want = _torch_dice(out, target) + _torch_bce(out, target)
    for a, w in zip(aux, (0.1, 0.2, 0.3, 0.4, 0.5)):
        want += w * (_torch_dice(a, target) + _torch_bce(a, target))
    assert abs(got - want) < 1e-4


def test_bce_saturated_value_parity_vs_torch(rng):
    """nn.BCELoss forward parity AT SATURATION: exact p in {0, 1}, subnormal
    and near-saturated probabilities — the -100 log-clamp region where an
    eps-clip implementation diverges (aten binary_cross_entropy; caught live
    by tools/trajectory_parity.py on egeunet's saturated init)."""
    # 2e-38 is the smallest NORMAL-range probe: XLA flushes f32 subnormals
    # (p < 1.18e-38) to zero before the log, so that sliver of the clamp
    # region reads -100 here vs torch's exact log — reachable only from
    # logits in (-103, -87), far past where either framework's sigmoid is
    # numerically meaningful. Everything >= the min normal float matches.
    pred = np.array([0.0, 1.0, 1e-20, 1 - 1e-7, 0.5, 2e-38, 1e-44],
                    np.float32).reshape(1, -1, 1, 1)
    target = np.array([1.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1.0],
                      np.float32).reshape(1, -1, 1, 1)
    got = float(L.bce_loss(jnp.array(pred), jnp.array(target)))
    want = _torch_bce(pred, target)
    assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)


def test_bce_saturated_gradient_parity_vs_torch(rng):
    """Backward parity incl. torch's 1e-12 denominator clamp: gradients at
    exact/near saturation must match aten binary_cross_entropy_backward and
    contain no NaN/inf (the custom-VJP guarantee)."""
    import jax

    pred = np.array([0.0, 1.0, 1e-20, 1 - 1e-6, 0.5, 0.25],
                    np.float32).reshape(1, -1, 1, 1)
    target = np.array([1.0, 0.0, 1.0, 0.0, 1.0, 0.0],
                      np.float32).reshape(1, -1, 1, 1)
    got = np.asarray(jax.grad(
        lambda p: L.bce_loss(p, jnp.array(target)))(jnp.array(pred)))
    tp = torch.from_numpy(pred).requires_grad_(True)
    F.binary_cross_entropy(tp, torch.from_numpy(target)).backward()
    want = tp.grad.numpy()
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.0)


def test_bce_dice_grad_finite_at_saturation(rng):
    """The training criterion path (edge_bce_dice) stays finite when heads
    saturate to exactly 0/1 — the TPU bf16 failure mode the VJP guards."""
    import jax

    out = np.zeros((2, 16, 16, 1), np.float32)  # all exactly 0
    out[0, :8] = 1.0                            # and exactly 1
    target = (rng.uniform(size=(2, 16, 16, 1)) > 0.5).astype(np.float32)
    aux = [np.full((2, 16 // k, 16 // k, 1), v, np.float32)
           for k, v in ((16, 0.0), (8, 1.0), (4, 0.0), (2, 1.0), (1, 0.5))]
    g = jax.grad(lambda o: L.edge_bce_dice_loss(
        [jnp.array(a) for a in aux], o, jnp.array(target)))(jnp.array(out))
    assert np.all(np.isfinite(np.asarray(g)))


def test_focal_vs_torch(rng):
    pred = _rand((2, 8, 8, 1), rng)
    target = (rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)
    got = float(L.focal_loss(jnp.array(pred), jnp.array(target)))
    p, t = torch.from_numpy(pred), torch.from_numpy(target)
    bce = F.binary_cross_entropy(p, t, reduction="none")
    pt = torch.where(t == 1, p, 1 - p)
    want = float((0.25 * (1 - pt) ** 2 * bce).mean())
    assert abs(got - want) < 1e-5


def test_chamfer_matches_dense_reference(rng):
    """Chamfer loss vs a dense numpy implementation of Loss.py:242-297."""
    b, h, w = 2, 16, 16
    pred = np.zeros((b, h, w), np.float32)
    target = np.zeros((b, h, w), np.float32)
    for i in range(b):
        pred[i, rng.integers(0, h, 10), rng.integers(0, w, 10)] = 1.0
        target[i, rng.integers(0, h, 10), rng.integers(0, w, 10)] = 1.0

    def np_chamfer(pred, target):
        total = 0.0
        for i in range(b):
            pc = np.argwhere(pred[i] > 0.5).astype(np.float32)
            tc = np.argwhere(target[i] > 0.5).astype(np.float32)
            if len(pc) == 0 or len(tc) == 0:
                continue
            pc /= [h - 1, w - 1]
            tc /= [h - 1, w - 1]
            d = np.linalg.norm(pc[:, None] - tc[None], axis=2)
            total += d.min(1).mean() + d.min(0).mean()
        return total / b

    got = float(L.chamfer_loss(jnp.array(pred), jnp.array(target)))
    assert abs(got - np_chamfer(pred, target)) < 1e-4


def test_chamfer_beyond_1024_points_matches_dense(rng):
    """Round-1 weakness: the fixed max_points=1024 silently truncated maps
    with more edge pixels. The auto-scaled budget (chamfer_points_budget)
    must reproduce the dense reference when edge pixels exceed 1024."""
    b, h, w = 1, 64, 64
    pred = (rng.random((b, h, w)) < 0.4).astype(np.float32)   # ~1600 points
    target = (rng.random((b, h, w)) < 0.4).astype(np.float32)
    assert pred.sum() > 1024 and target.sum() > 1024
    exact = L.chamfer_loss_dense(pred, target)
    got_full = float(L.chamfer_loss(jnp.array(pred), jnp.array(target), max_points=h * w))
    assert abs(got_full - exact) < 1e-4
    # truncated run is finite and documented-divergent, not wrong-shaped
    got_trunc = float(L.chamfer_loss(jnp.array(pred), jnp.array(target), max_points=256))
    assert np.isfinite(got_trunc)


def test_chamfer_auto_budget_scales():
    assert L.chamfer_points_budget(64, 64) == 1024
    assert L.chamfer_points_budget(512, 512) == 2048
    assert L.chamfer_points_budget(1024, 1024) == 4096
    assert L.chamfer_points_budget(8, 8) == 64  # capped at n


def test_chamfer_dense_oracle_matches_jax_on_contours(rng):
    """chamfer_loss_dense is itself validated against the jittable path in the
    exact regime (few points, k >= count)."""
    b, h, w = 2, 32, 32
    pred = np.zeros((b, h, w), np.float32)
    target = np.zeros((b, h, w), np.float32)
    pred[:, 10, 5:20] = 1.0
    target[:, 12, 8:25] = 1.0
    exact = L.chamfer_loss_dense(pred, target)
    got = float(L.chamfer_loss(jnp.array(pred), jnp.array(target)))
    assert abs(got - exact) < 1e-5


def test_loss_registry_auto():
    assert L.resolve_loss_name("auto", "eelunet") == "edge_bce_dice"
    assert L.resolve_loss_name("auto", "egeunet") == "gt_bce_dice"
    assert L.resolve_loss_name("auto", "unet") == "bce_dice"
    assert L.resolve_loss_name("dice", "eelunet") == "dice"
