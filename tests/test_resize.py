"""Bilinear resize parity vs torch F.interpolate (both align_corners modes) —
the hard-parts item from SURVEY.md §7."""

import numpy as np
import jax.numpy as jnp
import pytest

from eelunet_tpu.nn.resize import resize_bilinear, upsample2x_bilinear

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 8), (16, 16)), ((8, 8), (256, 256)), ((7, 5), (13, 11)), ((16, 16), (8, 8)), ((1, 1), (4, 4))],
)
def test_resize_matches_torch(align, in_hw, out_hw, rng):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.array(x), *out_hw, align_corners=align))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="bilinear", align_corners=align)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample2x(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    got = np.asarray(upsample2x_bilinear(jnp.array(x), align_corners=True))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
