"""EELUnet — the flagship edge-enhanced U-Net (reference models/EELUnet.py:228-471).

4-level U-Net (64->1024 ch) where enc3/enc4/bottleneck/dec3/dec4 use
tokenized-MLP conv blocks; an auxiliary edge decoder runs from the bottleneck
in parallel with the main decoder and is *added* into each main decoder stage;
five PredictionGuidedRefinement heads emit sigmoid maps at 1/16..1/1 scales for
deep supervision; skips fuse decoder and encoder features channel-wise
(FeatureInterleaveBridge, EELUnet.py:127-141 — see the layout note below);
final LayerNorm + 1x1 conv + sigmoid. 26.26M params.

TPU-native design notes:
- NHWC; the per-pixel token MLP (ChannelAwarePatchedMLP) is a Dense over the
  channel axis — a large batched matmul that maps straight onto the MXU, with
  no permute/reshape round-trips (the reference permutes NCHW->tokens->NCHW,
  EELUnet.py:119-121).
- The FFT high-pass mask is a compile-time constant; fft2 runs over the two
  spatial axes of the NHWC layout.
- The debug ``visualize_feature_maps`` PNG dumps living inside the reference
  forward (EELUnet.py:389-462) become an optional ``capture_intermediates``
  flag via flax's standard mechanism — no side effects in the hot loop.
- Bridge channel layout: the reference interleaves decoder/encoder channels
  [d0,e0,d1,e1,...] (FeatureInterleaveBridge); here they are concatenated
  [d... | e...]. The two are the SAME function class — a fixed permutation of
  the consumer conv's input-channel indexing maps one to the other exactly,
  and conv kernel init is iid over cin, so the init distribution is unchanged.
  TPU-measured: the interleaved order costs +25 ms/step at 512^2 training
  (+9.4%) because its backward de-interleave is a lane-crossing relayout,
  while concat's backward is two contiguous channel slices (docs/PERF.md).
  ``nn.layers.interleave_channels`` remains for the op-level parity tests.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eelunet_tpu.nn.layers import (
    BatchNorm,
    ChannelLayerNorm,
    ConvBlock,
    TorchConv,
    TorchConvTranspose,
    TorchDense,
    avg_pool_global,
    center_crop,
    max_pool2d,
)
from eelunet_tpu.registry import ModelOutput

Dtype = Any


class ChannelAttention(nn.Module):
    """SE-style squeeze-excite (EELUnet.py:8-80)."""

    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = avg_pool_global(x)
        w = TorchConv(c // self.reduction, (1, 1), padding=0, dtype=self.dtype)(w)
        w = nn.relu(w)
        w = TorchConv(c, (1, 1), padding=0, dtype=self.dtype)(w)
        return x * jax.nn.sigmoid(w)


def shifted_channel(x: jnp.ndarray, shift_ratio: float = 0.25) -> jnp.ndarray:
    """Roll three channel quarters by +-1 px along H/W (EELUnet.py:83-97).

    NHWC axes: H=1, W=2. jnp.roll on a channel slice is a cheap lax.rev-free
    concatenation XLA handles without relayout.
    """
    c = x.shape[-1]
    s = int(c * shift_ratio)
    return jnp.concatenate(
        [
            jnp.roll(x[..., :s], 1, axis=1),
            jnp.roll(x[..., s : 2 * s], -1, axis=1),
            jnp.roll(x[..., 2 * s : 3 * s], 1, axis=2),
            x[..., 3 * s :],
        ],
        axis=-1,
    )


class ChannelAwarePatchedMLP(nn.Module):
    """Tokenized-MLP block (EELUnet.py:101-123).

    shift -> 1x1 conv to token_dim -> channel attention -> per-pixel MLP
    (token_dim -> 4*token_dim -> out) -> 1x1 conv. The reference reshapes to
    (B, H*W, C) for the MLP; in NHWC a Dense over the trailing axis is the
    same computation without data movement.
    """

    features: int
    token_dim: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = shifted_channel(x)
        x = TorchConv(self.token_dim, (1, 1), padding=0, dtype=self.dtype)(x)
        x = ChannelAttention(dtype=self.dtype)(x)
        x = TorchDense(self.token_dim * 4, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = TorchDense(self.features, dtype=self.dtype)(x)
        x = TorchConv(self.features, (1, 1), padding=0, dtype=self.dtype)(x)
        return x


def high_pass_fft_reference(x: jnp.ndarray, mask_range: int = 20) -> jnp.ndarray:
    """FFT high-pass filter (HighFourierTransform, EELUnet.py:144-191),
    literal jnp.fft formulation — kept as the golden path for tests.

    fft2 over spatial axes -> fftshift -> zero a centered (2m x 2m) box ->
    ifft -> |.|. The mask is a static constant folded at compile time.
    """
    h, w = x.shape[1], x.shape[2]
    crow, ccol = h // 2, w // 2
    m = min(mask_range, min(crow, ccol))
    mask = jnp.ones((h, w), jnp.float32)
    mask = mask.at[crow - m : crow + m, ccol - m : ccol + m].set(0.0)
    mask = mask[None, :, :, None]

    dft = jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2))
    dft = jnp.fft.fftshift(dft, axes=(1, 2))
    dft = dft * mask
    dft = jnp.fft.ifftshift(dft, axes=(1, 2))
    out = jnp.abs(jnp.fft.ifft2(dft, axes=(1, 2)))
    return out.astype(x.dtype)


def high_pass_fft(x: jnp.ndarray, mask_range: int = 20, impl: str = "auto") -> jnp.ndarray:
    """HighFourierTransform via the low-rank MXU formulation (ops/fft.py):
    identical result up to float rounding, ~3x faster EELUnet forward at
    512^2 (TPU FFTs were ~70% of runtime).

    impl="auto": on TPU in bf16 the fused Pallas path (ops/fft_pallas.py)
    additionally removes the full-resolution f32 intermediates and
    fusion-seam relayouts around the skinny matmuls; f32 keeps the XLA path
    for exact-parity tests. impl="lowrank" pins the XLA path — use it for
    multi-chip spatially/batch-sharded runs, where XLA auto-partitions the
    matmul formulation but would gather+replicate a pallas_call.
    EELUNET_HIGHPASS overrides impl (escape hatch / A-B measurement)."""
    import os

    from eelunet_tpu.ops.fft import high_pass_fft_lowrank
    from eelunet_tpu.ops.fft_pallas import (
        high_pass_fft_pallas,
        high_pass_fft_pallas_sharded,
        pallas_supported,
    )

    impl = os.environ.get("EELUNET_HIGHPASS", impl)
    # EELUNET_PALLAS_INTERPRET=1 runs the kernels in interpret mode (CPU
    # multi-device tests of the sharded path; no effect on TPU runs).
    interpret = os.environ.get("EELUNET_PALLAS_INTERPRET") == "1"
    if impl in ("pallas", "pallas_sharded") and not pallas_supported(x.shape):
        return high_pass_fft_lowrank(x, mask_range)
    if impl == "pallas_sharded":
        # custom_partitioning wrapper: batch-sharded meshes run the kernels
        # on local shards instead of gather+replicate (fft_pallas.py).
        return high_pass_fft_pallas_sharded(x, mask_range, interpret)
    use_pallas = impl == "pallas" or (
        impl == "auto"
        and x.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and pallas_supported(x.shape)
    )
    if use_pallas:
        return high_pass_fft_pallas(x, mask_range, interpret)
    return high_pass_fft_lowrank(x, mask_range)


def migrate_interleaved_checkpoint(params):
    """Exact migration of EELUnet params trained with the INTERLEAVED bridge
    (pre-concat, commits before the bridge layout change) to the current
    concat-ordered bridge.

    The bridge change is a fixed permutation of each dec_i first-conv's
    input-channel indexing: interleaved cin order [d0,e0,d1,e1,...] becomes
    [d0..dC-1 | e0..eC-1], so ``conv(interleave(a,b), K_old) ==
    conv(concat(a,b), K_new)`` with ``K_new = concat(K_old[..., 0::2, :],
    K_old[..., 1::2, :], axis=-2)``. All other parameters are unaffected.
    Returns a new param tree; the input is not mutated (tree_map rebuilds
    the containers; only the four dec kernels are replaced)."""
    out = jax.tree_util.tree_map(lambda x: x, params)
    for mod in ("dec1", "dec2", "dec3", "dec4"):
        leaf = out[mod]["TorchConv_0"]["Conv_0"]
        k = leaf["kernel"]
        leaf["kernel"] = jnp.concatenate([k[..., 0::2, :], k[..., 1::2, :]], axis=-2)
    return out


class PredictionGuidedRefinement(nn.Module):
    """1x1 head -> gate features with sigmoid(gt_pre) (EELUnet.py:194-203)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        gt_pre = TorchConv(1, (1, 1), padding=0, dtype=self.dtype)(x)
        # Sigmoid in f32: bf16 sigmoid saturates to exact 0/1 at |x|>~9,
        # which starves the deep-supervision BCE of gradient signal.
        g32 = jax.nn.sigmoid(gt_pre.astype(jnp.float32))
        g = g32.astype(x.dtype)
        return x + x * g, g32


class MlpConvBlock(nn.Module):
    """conv3x3 -> BN -> ReLU -> CAPMLP -> BN -> ReLU (EELUnet.py:347-359).

    ``features_mid`` overrides the conv3x3 width (physically pruned models,
    prune_physical.py); default = ``features``.
    """

    features: int
    features_mid: Optional[int] = None
    dtype: Optional[Dtype] = None
    bn_folded: bool = False  # see nn/layers.ConvBlock.bn_folded

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = not (self.bn_folded and not train)
        x = TorchConv(self.features_mid or self.features, (3, 3), dtype=self.dtype)(x)
        if bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = ChannelAwarePatchedMLP(self.features, dtype=self.dtype)(x)
        if bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        return x


class UpConvBN(nn.Module):
    """ConvTranspose(k2,s2) -> BN (EELUnet.py:361-366)."""

    features: int
    dtype: Optional[Dtype] = None
    bn_folded: bool = False  # see nn/layers.ConvBlock.bn_folded

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConvTranspose(self.features, dtype=self.dtype)(x)
        if not (self.bn_folded and not train):
            x = BatchNorm(dtype=self.dtype)(x, train)
        return x


class MlpUpConvBlock(nn.Module):
    """ConvTranspose(k2,s2) -> CAPMLP -> BN (EELUnet.py:368-374).

    ``features_mid`` overrides the transposed-conv width (physically pruned
    models); default = ``features``.
    """

    features: int
    features_mid: Optional[int] = None
    dtype: Optional[Dtype] = None
    bn_folded: bool = False  # see nn/layers.ConvBlock.bn_folded

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConvTranspose(self.features_mid or self.features, dtype=self.dtype)(x)
        x = ChannelAwarePatchedMLP(self.features, dtype=self.dtype)(x)
        if not (self.bn_folded and not train):
            x = BatchNorm(dtype=self.dtype)(x, train)
        return x


class EELUnet(nn.Module):
    out_channels: int = 1
    mask_range: int = 20
    # "auto" | "pallas" | "lowrank" — see high_pass_fft. Pin "lowrank" when
    # sharding activations across chips (XLA partitions matmuls, not kernels).
    highpass_impl: str = "auto"
    # Physically pruned models carry per-group channel widths as a sorted
    # tuple of (group_name, size) — see prune_physical.EELUNET group names.
    # None = reference widths (EELUnet.py:237-333). The final dec1 output
    # stays 64-wide in pruned models (the channels-last LayerNorm normalizes
    # over it, so slicing there would change the function).
    widths: Optional[Tuple[Tuple[str, int], ...]] = None
    dtype: Optional[Dtype] = None
    # True = weights were pre-folded by bnfold.fold_bn_eval: every
    # conv-adjacent BN call site vanishes from the eval graph (+4.8% at the
    # 512^2 b16 headline, docs/PERF.md round 5). bottleneck_bn stays live
    # (BN-before-conv would leak its affine into SAME padding). Eval-only.
    bn_folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> ModelOutput:
        assert not (self.bn_folded and train), "bn_folded models are eval-only"
        dt = self.dtype
        wd = dict(self.widths or ())
        w = lambda name, default: wd.get(name, default)

        # Encoder (EELUnet.py:237-252, forward 387-407)
        enc1 = ConvBlock(w("e1", 64), use_bn=True, features_mid=w("e1a", 64), dtype=dt, bn_folded=self.bn_folded, name="enc1")(x, train)
        enc2 = ConvBlock(w("e2", 128), use_bn=True, features_mid=w("e2a", 128), dtype=dt, bn_folded=self.bn_folded, name="enc2")(max_pool2d(enc1, 2), train)
        enc3 = MlpConvBlock(w("e3", 256), features_mid=w("e3a", 256), dtype=dt, bn_folded=self.bn_folded, name="enc3")(max_pool2d(enc2, 2), train)
        enc4 = MlpConvBlock(w("e4", 512), features_mid=w("e4a", 512), dtype=dt, bn_folded=self.bn_folded, name="enc4")(max_pool2d(enc3, 2), train)

        # Bottleneck: BN -> conv3x3 512->1024 -> ReLU -> CAPMLP -> ReLU (255-261)
        b = max_pool2d(enc4, 2)
        b = BatchNorm(dtype=dt, name="bottleneck_bn")(b, train)
        b = TorchConv(w("bna", 1024), (3, 3), dtype=dt, name="bottleneck_conv")(b)
        b = nn.relu(b)
        b = ChannelAwarePatchedMLP(w("bot", 1024), dtype=dt, name="bottleneck_mlp")(b)
        bottleneck = nn.relu(b)

        bottleneck, edge_5 = PredictionGuidedRefinement(dtype=dt, name="pred5")(bottleneck)

        # Auxiliary edge branch, sequential from the bottleneck (300-328, 415-418)
        e4 = MlpUpConvBlock(w("eu4", 512), features_mid=w("eu4ct", 512), dtype=dt, bn_folded=self.bn_folded, name="edge_up4")(bottleneck, train)
        edge_dec4 = MlpConvBlock(w("d4sum", 512), features_mid=w("ec4a", 512), dtype=dt, bn_folded=self.bn_folded, name="edge_conv4")(e4, train)
        e3 = MlpUpConvBlock(w("eu3", 256), features_mid=w("eu3ct", 256), dtype=dt, bn_folded=self.bn_folded, name="edge_up3")(edge_dec4, train)
        edge_dec3 = MlpConvBlock(w("d3sum", 256), features_mid=w("ec3a", 256), dtype=dt, bn_folded=self.bn_folded, name="edge_conv3")(e3, train)
        e2 = UpConvBN(w("eu2", 128), dtype=dt, bn_folded=self.bn_folded, name="edge_up2")(edge_dec3, train)
        e2 = high_pass_fft(e2, self.mask_range, self.highpass_impl)
        edge_dec2 = ConvBlock(w("d2sum", 128), use_bn=True, features_mid=w("ec2a", 128), dtype=dt, bn_folded=self.bn_folded, name="edge_conv2")(e2, train)
        e1 = UpConvBN(w("eu1", 64), dtype=dt, bn_folded=self.bn_folded, name="edge_up1")(edge_dec2, train)
        e1 = high_pass_fft(e1, self.mask_range, self.highpass_impl)
        edge_dec1 = ConvBlock(w("d1sum", 64), use_bn=True, features_mid=w("ec1a", 64), dtype=dt, bn_folded=self.bn_folded, name="edge_conv1")(e1, train)

        # Main decoder (421-460): upconv -> +edge -> interleave skip -> block
        dec4 = MlpUpConvBlock(w("d4sum", 512), features_mid=w("u4ct", 512), dtype=dt, bn_folded=self.bn_folded, name="upconv4")(bottleneck, train)
        dec4 = dec4 + edge_dec4
        dec4 = jnp.concatenate([dec4, center_crop(enc4, dec4.shape[1], dec4.shape[2])], axis=-1)
        dec4 = MlpConvBlock(w("d4", 512), features_mid=w("d4a", 512), dtype=dt, bn_folded=self.bn_folded, name="dec4")(dec4, train)

        dec3, edge_4 = PredictionGuidedRefinement(dtype=dt, name="pred4")(dec4)
        dec3 = MlpUpConvBlock(w("d3sum", 256), features_mid=w("u3ct", 256), dtype=dt, bn_folded=self.bn_folded, name="upconv3")(dec3, train)
        dec3 = dec3 + edge_dec3
        dec3 = jnp.concatenate([dec3, center_crop(enc3, dec3.shape[1], dec3.shape[2])], axis=-1)
        dec3 = MlpConvBlock(w("d3", 256), features_mid=w("d3a", 256), dtype=dt, bn_folded=self.bn_folded, name="dec3")(dec3, train)

        dec2, edge_3 = PredictionGuidedRefinement(dtype=dt, name="pred3")(dec3)
        dec2 = UpConvBN(w("d2sum", 128), dtype=dt, bn_folded=self.bn_folded, name="upconv2")(dec2, train)
        dec2 = dec2 + edge_dec2
        dec2 = jnp.concatenate([dec2, center_crop(enc2, dec2.shape[1], dec2.shape[2])], axis=-1)
        dec2 = ConvBlock(w("d2", 128), use_bn=True, features_mid=w("d2a", 128), dtype=dt, bn_folded=self.bn_folded, name="dec2")(dec2, train)

        dec1, edge_2 = PredictionGuidedRefinement(dtype=dt, name="pred2")(dec2)
        dec1 = UpConvBN(w("d1sum", 64), dtype=dt, bn_folded=self.bn_folded, name="upconv1")(dec1, train)
        dec1 = dec1 + edge_dec1
        dec1 = jnp.concatenate([dec1, center_crop(enc1, dec1.shape[1], dec1.shape[2])], axis=-1)
        dec1 = ConvBlock(64, use_bn=True, features_mid=w("d1a", 64), dtype=dt, bn_folded=self.bn_folded, name="dec1")(dec1, train)

        seg, edge_1 = PredictionGuidedRefinement(dtype=dt, name="pred1")(dec1)

        # final: channels-first LayerNorm + 1x1 conv + sigmoid (330-333, 467-469)
        seg = ChannelLayerNorm(dtype=dt, name="final_ln")(seg)
        seg = TorchConv(self.out_channels, (1, 1), padding=0, dtype=dt, name="final_conv")(seg)
        # sigmoid for the binary reference head (EELUnet.py:469); softmax over
        # the class axis in multi-class mode (out_channels > 1, beyond-ref)
        seg = seg.astype(jnp.float32)
        seg = jax.nn.sigmoid(seg) if self.out_channels == 1 else jax.nn.softmax(seg, axis=-1)

        return ModelOutput(seg=seg, aux=(edge_5, edge_4, edge_3, edge_2, edge_1))
