"""SPMD-partitioned Pallas high-pass (fft_pallas.high_pass_fft_pallas_sharded).

The custom_partitioning wrapper must run the kernel pair on LOCAL batch
shards under a data-parallel mesh (no gather), match the XLA low-rank path
numerically (fwd and grad), and compose with value_and_grad + optimizer
updates inside a jitted, batch-sharded train step. Kernels run in interpret
mode on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eelunet_tpu.ops.fft import high_pass_fft_lowrank
from eelunet_tpu.ops.fft_pallas import high_pass_fft_pallas_sharded
from eelunet_tpu.parallel.mesh import create_mesh


def _mesh_data():
    return create_mesh(-1, 1)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_sharded_fwd_matches_lowrank():
    mesh = _mesh_data()
    x = _rand((8, 32, 32, 8))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    got = jax.jit(lambda v: high_pass_fft_pallas_sharded(v, 8, True))(xs)
    want = high_pass_fft_lowrank(jnp.asarray(x), 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-4)
    # batch sharding must survive the op (no forced replication of the result)
    assert got.sharding.spec[0] == "data"


def test_sharded_grad_matches_lowrank():
    mesh = _mesh_data()
    x = _rand((8, 16, 32, 8), seed=3)
    wgt = _rand((8, 16, 32, 8), seed=4)
    sh = NamedSharding(mesh, P("data", None, None, None))
    xs = jax.device_put(x, sh)
    ws = jax.device_put(wgt, sh)

    gp = jax.jit(
        jax.grad(lambda v, w: jnp.sum(w * high_pass_fft_pallas_sharded(v, 4, True)))
    )(xs, ws)
    gl = jax.grad(lambda v: jnp.sum(jnp.asarray(wgt) * high_pass_fft_lowrank(v, 4)))(
        jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gl), atol=1e-4, rtol=1e-3)
    assert gp.sharding.spec[0] == "data"


def test_sharded_no_gather_in_hlo():
    """The partitioned forward must not all-gather the full-resolution input:
    each device computes its local batch shard (the custom_partitioning
    contract; cf. the jax custom_partitioning FFT example)."""
    mesh = _mesh_data()
    x = jax.device_put(
        _rand((8, 32, 32, 8)), NamedSharding(mesh, P("data", None, None, None))
    )
    txt = (
        jax.jit(lambda v: high_pass_fft_pallas_sharded(v, 8, True))
        .lower(x)
        .compile()
        .as_text()
    )
    assert "all-gather" not in txt, "input was gathered across the mesh"


def test_sharded_inside_train_step(tmp_path):
    """A jitted, batch-sharded train step (value_and_grad + optax update)
    through the sharded high-pass matches the same step on one device —
    mirrors how Trainer embeds the op for multi-device TPU meshes."""
    import optax
    from flax import linen as nn

    from eelunet_tpu.models.eelunet import high_pass_fft
    from eelunet_tpu.parallel.mesh import batch_sharding, replicated_sharding

    class Tiny(nn.Module):
        impl: str = "lowrank"

        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (3, 3), padding="SAME")(x)
            h = high_pass_fft(h, 4, self.impl)
            return nn.Conv(1, (1, 1))(h)

    x = _rand((8, 16, 16, 3), seed=5)
    y = (_rand((8, 16, 16, 1), seed=6) > 0).astype(np.float32)
    tx = optax.adam(1e-3)

    results = []
    for mesh, impl in (
        (create_mesh(1, 1, devices=jax.devices()[:1]), "pallas"),
        (_mesh_data(), "pallas_sharded"),
    ):
        model = Tiny(impl=impl)
        import os

        os.environ["EELUNET_PALLAS_INTERPRET"] = "1"
        try:
            params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
            opt = tx.init(params)

            def step(params, opt, xb, yb):
                def loss_fn(p):
                    pred = model.apply(p, xb)
                    return jnp.mean((pred - yb) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt = tx.update(grads, opt, params)
                return optax.apply_updates(params, updates), opt, loss

            jstep = jax.jit(step)
            params = jax.device_put(params, replicated_sharding(mesh))
            opt = jax.device_put(opt, replicated_sharding(mesh))
            xb = jax.device_put(x, batch_sharding(mesh))
            yb = jax.device_put(y, batch_sharding(mesh))
            losses = []
            for _ in range(3):
                params, opt, loss = jstep(params, opt, xb, yb)
                losses.append(float(loss))
            results.append(losses)
        finally:
            os.environ.pop("EELUNET_PALLAS_INTERPRET", None)

    np.testing.assert_allclose(results[0], results[1], rtol=2e-4)


def test_unsupported_shape_falls_back():
    """Forced pallas impls on untiled shapes fall back to lowrank instead of
    raising (e.g. odd spatial dims from non-power-of-two inputs)."""
    from eelunet_tpu.models.eelunet import high_pass_fft

    x = jnp.asarray(_rand((1, 7, 13, 3), seed=8))
    for impl in ("pallas", "pallas_sharded"):
        got = high_pass_fft(x, 4, impl)
        want = high_pass_fft_lowrank(x, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
