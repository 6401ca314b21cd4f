"""On-device augmentations — batched equivalents of the reference's per-image
PIL/OpenCV transforms (augmentation/AddCannyEdge.py:8-41,
augmentation/CannyEnhance.py:7-44).

The reference runs cv2.Canny per image on the host inside __getitem__; here the
whole batch goes through the device Canny pipeline in one jitted call, after
the host->device transfer. Both transforms are off by default, matching the
commented-out call sites (ToothDataset.py:52-55).

Note: the transforms operate on *unnormalized* [0,1] RGB; apply them before
ImageNet normalization. ``make_augment_fn`` builds the full device-side input
chain (augment -> normalize) from a DataConfig; when either flag is on, the
host datasets are built with ``normalize=False`` (cli/common.py) and the
trainer/predictor run this chain right after the host->device transfer.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from eelunet_tpu.ops.edge import canny_edge_improve, rgb_to_grayscale

# cv2.Canny(100, 200) thresholds on a 0-255 scale -> [0,1] scale.
_CV2_LOW = 100.0 / 255.0
_CV2_HIGH = 200.0 / 255.0


@jax.jit
def add_canny_edge(images: jnp.ndarray) -> jnp.ndarray:
    """Append a Canny edge map as a 4th channel (AddCannyEdge.py:8-41).

    images: (N,H,W,3) in [0,1] -> (N,H,W,4).
    """
    gray = rgb_to_grayscale(images)
    edges = canny_edge_improve(gray, _CV2_LOW, _CV2_HIGH)
    return jnp.concatenate([images, edges], axis=-1)


@partial(jax.jit, static_argnames=("alpha",))
def canny_enhance(
    images: jnp.ndarray,
    alpha: float = 0.2,
    edge_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Blend a colored edge overlay into the image (CannyEnhance.py:7-44):
    out = image*1.0 + overlay*alpha, where overlay paints ``edge_color`` at
    edge pixels (cv2.addWeighted semantics, clipped to [0,1])."""
    gray = rgb_to_grayscale(images)
    edges = canny_edge_improve(gray, _CV2_LOW, _CV2_HIGH)
    color = jnp.asarray(edge_color, images.dtype).reshape(1, 1, 1, 3)
    overlay = edges * color
    return jnp.clip(images + alpha * overlay, 0.0, 1.0)


def normalize_imagenet(
    images: jnp.ndarray,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
) -> jnp.ndarray:
    """ImageNet normalization on device (ToothDataset.py:60)."""
    m = jnp.asarray(mean, images.dtype).reshape(1, 1, 1, -1)
    s = jnp.asarray(std, images.dtype).reshape(1, 1, 1, -1)
    return (images - m) / s


def random_flip_batch(key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray):
    """Per-sample random horizontal/vertical flips, applied jointly to image
    and mask (label-preserving for segmentation). Device-side and jit-safe:
    both orientations are computed and selected per sample, so shapes stay
    static. The reference has no training-time augmentation (its transform
    is Resize+ToTensor only, train.py:249-252) — this is a beyond-reference
    knob (``DataConfig.random_flip``), off by default.
    """
    kh, kw = jax.random.split(key)
    b = images.shape[0]
    fh = jax.random.bernoulli(kh, 0.5, (b,))
    fw = jax.random.bernoulli(kw, 0.5, (b,))

    def sel(flag, flipped, plain):
        return jnp.where(flag.reshape((b,) + (1,) * (plain.ndim - 1)), flipped, plain)

    images = sel(fh, jnp.flip(images, 1), images)
    labels = sel(fh, jnp.flip(labels, 1), labels)
    images = sel(fw, jnp.flip(images, 2), images)
    labels = sel(fw, jnp.flip(labels, 2), labels)
    return images, labels


def make_augment_fn(data_cfg):
    """Build the jitted device-side input chain for a DataConfig, or None.

    Returns a function (N,H,W,3) raw [0,1] RGB -> model-ready input:
    canny_enhance blend, then the AddCannyEdge 4th channel, then ImageNet
    normalization of the RGB channels. The edge channel stays unnormalized —
    it is already a {0,1} map (the reference normalizes with 3-channel stats,
    ToothDataset.py:58-61, so a 4th channel was never normalizable there
    either; divergence documented in README.md).
    """
    enhance = bool(data_cfg.canny_enhance)
    add_edge = bool(data_cfg.add_canny_edge)
    if not (enhance or add_edge):
        return None
    alpha = float(data_cfg.canny_enhance_alpha)
    mean = tuple(data_cfg.normalize_mean)
    std = tuple(data_cfg.normalize_std)

    @jax.jit
    def augment(images: jnp.ndarray) -> jnp.ndarray:
        if enhance:
            images = canny_enhance(images, alpha)
        if add_edge:
            images = add_canny_edge(images)
        rgb = normalize_imagenet(images[..., :3], mean, std)
        if add_edge:
            return jnp.concatenate([rgb, images[..., 3:]], axis=-1)
        return rgb

    return augment


def make_input_preprocess(data_cfg, num_classes: int = 1):
    """Jitted device-side (images, labels) preprocess covering every host
    dataset mode; dtype (static under jit) selects the path:

    - uint8 images (``DataConfig.uint8_feed``): u8 -> f32/255, then the
      augment chain or plain ImageNet normalization. Matches the
      host-side float formula (dataset.py:75-78) to f32 rounding (<=1e-6,
      XLA fma fusion) with 4x fewer H2D bytes —
      the measured epoch-overhead driver on the axon tunnel (docs/PERF.md).
    - float images + augmentations on: raw [0,1] RGB -> augment chain
      (which normalizes), the pre-uint8-feed raw path.
    - float images, no augmentations: already normalized on host; identity.

    ``num_classes > 1`` (multi-class mode): uint8 labels are CLASS IDS, not
    a 0/255 binary mask — they cast to float without the /255 scale.

    Returns ``(preprocess, has_augment)``; callers may skip the call for
    float batches when ``has_augment`` is False (identity dispatch).
    """
    augment = make_augment_fn(data_cfg)
    mean = tuple(data_cfg.normalize_mean)
    std = tuple(data_cfg.normalize_std)

    @jax.jit
    def preprocess(images: jnp.ndarray, labels: jnp.ndarray):
        if labels.dtype == jnp.uint8:
            labels = labels.astype(jnp.float32)
            if num_classes == 1:
                labels = labels / 255.0
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
            images = augment(images) if augment is not None else normalize_imagenet(images, mean, std)
        elif augment is not None:
            images = augment(images)
        return images, labels

    return preprocess, augment is not None
