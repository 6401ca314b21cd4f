"""EELUnet building-block parity tests vs independent torch/numpy math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eelunet_tpu.models.eelunet import high_pass_fft, shifted_channel
from eelunet_tpu.nn.layers import center_crop, interleave_channels, max_pool2d

torch = pytest.importorskip("torch")


def test_high_pass_fft_vs_torch(rng):
    """HighFourierTransform (EELUnet.py:144-191): fft2 -> fftshift -> zero
    centered box -> ifft -> abs."""
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(high_pass_fft(jnp.array(x), mask_range=5))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    mask = torch.ones(32, 32)
    mask[16 - 5 : 16 + 5, 16 - 5 : 16 + 5] = 0
    dft = torch.fft.fftshift(torch.fft.fft2(xt)) * mask
    want = torch.abs(torch.fft.ifft2(torch.fft.ifftshift(dft))).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_high_pass_fft_lowrank_matches_reference(rng):
    """The low-rank MXU formulation (ops/fft.py) vs the literal jnp.fft path,
    including odd sizes where the mask clamp is JOINT across axes
    (m = min(mask_range, min(h//2, w//2)), EELUnet.py:155-157)."""
    from eelunet_tpu.models.eelunet import high_pass_fft_reference

    for shape, m in [((1, 30, 26, 2), 20), ((2, 32, 32, 3), 5), ((1, 17, 23, 1), 7)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        a = np.asarray(high_pass_fft(x, m))
        b = np.asarray(high_pass_fft_reference(x, m))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_high_pass_fft_removes_dc():
    x = jnp.ones((1, 16, 16, 1))  # pure DC
    out = np.asarray(high_pass_fft(x, mask_range=2))
    assert np.abs(out).max() < 1e-5


def test_shifted_channel_vs_torch(rng):
    """ShiftedChannel (EELUnet.py:83-97): quarters rolled +-1 along H/W."""
    x = rng.standard_normal((2, 6, 7, 8)).astype(np.float32)
    got = np.asarray(shifted_channel(jnp.array(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    s = 2  # C//4
    want = torch.cat(
        [
            xt[:, :s].roll(1, 2),
            xt[:, s : 2 * s].roll(-1, 2),
            xt[:, 2 * s : 3 * s].roll(1, 3),
            xt[:, 3 * s :],
        ],
        dim=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_interleave_channels_order():
    """FeatureInterleaveBridge: [a0,b0,a1,b1,...] (EELUnet.py:127-141)."""
    a = jnp.zeros((1, 2, 2, 3)).at[..., :].set(jnp.array([0.0, 2.0, 4.0]))
    b = jnp.zeros((1, 2, 2, 3)).at[..., :].set(jnp.array([1.0, 3.0, 5.0]))
    out = np.asarray(interleave_channels(a, b))
    np.testing.assert_allclose(out[0, 0, 0], [0, 1, 2, 3, 4, 5])


def test_max_pool_vs_torch(rng):
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    for k in (2, 4, 8, 16):
        got = np.asarray(max_pool2d(jnp.array(x), k))
        want = (
            torch.nn.functional.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), k, k)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want)


def test_center_crop():
    x = jnp.arange(36, dtype=jnp.float32).reshape(1, 6, 6, 1)
    out = np.asarray(center_crop(x, 4, 4))
    assert out.shape == (1, 4, 4, 1)
    assert out[0, 0, 0, 0] == 7.0  # top=1, left=1


def test_batchnorm_matches_torch(rng):
    """Train-mode BN: biased batch variance, running-stat update momentum 0.1
    (torch convention == flax momentum 0.9)."""
    from eelunet_tpu.nn.layers import BatchNorm

    x = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), train=False)
    out, mutated = bn.apply(variables, jnp.array(x), train=True, mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(3)
    tbn.train()
    want = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(mutated["batch_stats"])[0]),
        tbn.running_mean.numpy(),
        atol=1e-5,
    )
