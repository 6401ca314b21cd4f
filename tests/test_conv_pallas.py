"""Pallas blocked 3x3 conv (ops/conv_pallas.py) vs the XLA conv oracle.

Interpret mode on CPU (the suite's scrubbed env); the compiled-TPU A/B lives
in tools/conv3x3_ab.py and its verdict in docs/PERF.md. f32 accumulation in
both paths -> tolerance is pure summation-order noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eelunet_tpu.ops.conv_pallas import conv3x3_pallas, conv3x3_reference


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale)


@pytest.mark.parametrize(
    "b,h,w,cin,cout,relu",
    [
        (2, 32, 64, 8, 16, False),     # tiny smoke
        (1, 16, 128, 128, 64, True),   # the dec1 shape family (scaled down)
        (2, 24, 40, 3, 32, False),     # enc1: RGB in, non-128 W
    ],
)
def test_matches_xla(rng, b, h, w, cin, cout, relu):
    x = _rand(rng, (b, h, w, cin))
    wk = _rand(rng, (3, 3, cin, cout), 0.1)
    scale = _rand(rng, (cout,))
    shift = _rand(rng, (cout,))
    got = conv3x3_pallas(x, wk, scale, shift, relu=relu, tile_h=8,
                         interpret=True)
    want = conv3x3_reference(x, wk, scale, shift, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_no_affine_no_relu(rng):
    x = _rand(rng, (1, 16, 32, 4))
    wk = _rand(rng, (3, 3, 4, 8), 0.2)
    got = conv3x3_pallas(x, wk, tile_h=8, interpret=True)
    want = conv3x3_reference(x, wk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_bf16_io_f32_accum(rng):
    x = _rand(rng, (1, 16, 32, 16)).astype(jnp.bfloat16)
    wk = _rand(rng, (3, 3, 16, 16), 0.1).astype(jnp.bfloat16)
    got = conv3x3_pallas(x, wk, tile_h=8, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = conv3x3_reference(x, wk)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05)


def test_bad_tile_raises(rng):
    x = _rand(rng, (1, 20, 32, 4))
    wk = _rand(rng, (3, 3, 4, 8))
    with pytest.raises(ValueError, match="tile_h"):
        conv3x3_pallas(x, wk, tile_h=16, interpret=True)
