"""Random-flip training augmentation + flip test-time augmentation.

Both are beyond-reference knobs (the reference transform is Resize+ToTensor
only, train.py:249-252, and its evaluation is single-forward). Contracts:
flips must transform image and mask JOINTLY and be deterministic per
(rng, step); TTA must equal the mean of the four manually un-flipped
forwards and be exactly invariant for a flip-symmetric function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eelunet_tpu.config import TrainConfig, apply_overrides
from eelunet_tpu.data.augment import random_flip_batch
from eelunet_tpu.data.pipeline import DataLoader
from eelunet_tpu.data.synthetic import SyntheticDataset
from eelunet_tpu.parallel.mesh import create_mesh
from eelunet_tpu.registry import tta_probabilities
from eelunet_tpu.train.trainer import Trainer


def test_random_flip_joint_and_deterministic(rng):
    x = jnp.asarray(rng.standard_normal((8, 6, 10, 3)), jnp.float32)
    y = jnp.asarray((rng.uniform(size=(8, 6, 10, 1)) > 0.5), jnp.float32)
    key = jax.random.PRNGKey(3)
    fx, fy = random_flip_batch(key, x, y)
    fx2, fy2 = random_flip_batch(key, x, y)
    np.testing.assert_array_equal(np.asarray(fx), np.asarray(fx2))  # deterministic
    np.testing.assert_array_equal(np.asarray(fy), np.asarray(fy2))

    # every sample is one of the 4 orientations, image and mask matching
    variants_seen = set()
    for b in range(8):
        found = None
        for fh in (False, True):
            for fw in (False, True):
                xi = np.asarray(x[b])
                yi = np.asarray(y[b])
                if fh:
                    xi, yi = xi[::-1], yi[::-1]
                if fw:
                    xi, yi = xi[:, ::-1], yi[:, ::-1]
                if np.array_equal(np.asarray(fx[b]), xi):
                    assert np.array_equal(np.asarray(fy[b]), yi), \
                        "mask must flip with its image"
                    found = (fh, fw)
        assert found is not None, f"sample {b} is not a flip of its input"
        variants_seen.add(found)
    assert len(variants_seen) > 1, "p=0.5 flips should produce >1 orientation in 8 samples"

    # different key -> (almost surely) different flip pattern
    gx, _ = random_flip_batch(jax.random.PRNGKey(4), x, y)
    assert not np.array_equal(np.asarray(gx), np.asarray(fx))


def test_tta_probabilities_math(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)

    # arbitrary non-equivariant function
    def fwd(img):
        roll = jnp.roll(img[..., :1], 1, axis=1)
        return jax.nn.sigmoid(img[..., :1] * 2.0 + roll)

    got = np.asarray(tta_probabilities(fwd, x))
    manual = (
        np.asarray(fwd(x))
        + np.asarray(jnp.flip(fwd(jnp.flip(x, 1)), 1))
        + np.asarray(jnp.flip(fwd(jnp.flip(x, 2)), 2))
        + np.asarray(jnp.flip(fwd(jnp.flip(x, (1, 2))), (1, 2)))
    ) / 4.0
    np.testing.assert_allclose(got, manual, rtol=1e-6)

    # flip-equivariant fwd (pointwise) -> TTA is exactly the plain forward
    point = lambda img: jax.nn.sigmoid(img[..., :1])
    np.testing.assert_allclose(
        np.asarray(tta_probabilities(point, x)), np.asarray(point(x)), rtol=1e-6
    )


def _cfg(tmp_path, **over):
    ov = ["model.name=unet", "data.image_size=[32,32]", "data.batch_size=4",
          "seed=0", f"save_dir={tmp_path}/ckpt", f"log_dir={tmp_path}/runs",
          "epochs=1", "snapshot_every=100", "data.num_workers=0"]
    ov += [f"{k}={v}" for k, v in over.items()]
    return apply_overrides(TrainConfig(), ov)


def test_train_with_random_flip_and_tta_eval(tmp_path):
    """e2e: random_flip trains (finite loss, different first-step loss than
    unflipped since flips change batches) and tta evaluation runs + differs
    from plain eval on an untrained (non-equivariant) model."""
    ds = SyntheticDataset(n=8, image_size=(32, 32), seed=0)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)

    t_plain = Trainer(_cfg(tmp_path, **{"data.random_flip": "false"}), mesh=create_mesh(1, 1))
    t_flip = Trainer(_cfg(tmp_path, **{"data.random_flip": "true"}), mesh=create_mesh(1, 1))
    s_plain = t_plain.init_state()
    s_flip = t_flip.init_state()

    # TTA eval first (the train steps below DONATE their input states):
    # runs, and differs from plain eval for an untrained (non-equivariant) net
    m_plain = t_plain.evaluate(s_plain, loader)
    t_tta = Trainer(_cfg(tmp_path, tta="true"), mesh=create_mesh(1, 1))
    m_tta = t_tta.evaluate(s_plain, loader)
    assert set(m_tta) == set(m_plain)
    assert any(m_tta[k] != m_plain[k] for k in m_tta)

    batch = next(iter(loader))
    xb, yb = jnp.asarray(batch[0]), jnp.asarray(batch[1])
    _, l_plain, _ = t_plain._get_step("train", s_plain)(s_plain, xb, yb)
    _, l_flip, _ = t_flip._get_step("train", s_flip)(s_flip, xb, yb)
    assert np.isfinite(float(l_plain)) and np.isfinite(float(l_flip))
    # same init, same batch; flipped inputs change the loss (u8 synthetic
    # content is not flip-symmetric)
    assert float(l_plain) != float(l_flip)
