"""Vanilla 4-level U-Net (reference models/Unet.py:4-98).

Textbook U-Net: conv blocks WITHOUT batch norm (Unet.py:33-40), transposed-conv
upsampling (Unet.py:42-46), center-crop + channel-concat skips (Unet.py:48-56,
76-95), 1x1 final conv, returns raw logits (Unet.py:97-98). 31.03M params.

TPU-native notes: NHWC throughout; with SAME-padded 3x3 convs the crop is a
no-op at power-of-two sizes but kept for parity at odd sizes.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn
import jax.numpy as jnp

from eelunet_tpu.nn.layers import ConvBlock, UpConvBlock, TorchConv, center_crop, max_pool2d
from eelunet_tpu.registry import ModelOutput


class Unet(nn.Module):
    out_channels: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> ModelOutput:
        dt = self.dtype
        enc1 = ConvBlock(64, use_bn=False, dtype=dt)(x)
        enc2 = ConvBlock(128, use_bn=False, dtype=dt)(max_pool2d(enc1, 2))
        enc3 = ConvBlock(256, use_bn=False, dtype=dt)(max_pool2d(enc2, 2))
        enc4 = ConvBlock(512, use_bn=False, dtype=dt)(max_pool2d(enc3, 2))
        bottleneck = ConvBlock(1024, use_bn=False, dtype=dt)(max_pool2d(enc4, 2))

        dec4 = UpConvBlock(512, use_bn=False, dtype=dt)(bottleneck)
        skip4 = center_crop(enc4, dec4.shape[1], dec4.shape[2])
        dec4 = ConvBlock(512, use_bn=False, dtype=dt)(jnp.concatenate([dec4, skip4], axis=-1))

        dec3 = UpConvBlock(256, use_bn=False, dtype=dt)(dec4)
        skip3 = center_crop(enc3, dec3.shape[1], dec3.shape[2])
        dec3 = ConvBlock(256, use_bn=False, dtype=dt)(jnp.concatenate([dec3, skip3], axis=-1))

        dec2 = UpConvBlock(128, use_bn=False, dtype=dt)(dec3)
        skip2 = center_crop(enc2, dec2.shape[1], dec2.shape[2])
        dec2 = ConvBlock(128, use_bn=False, dtype=dt)(jnp.concatenate([dec2, skip2], axis=-1))

        dec1 = UpConvBlock(64, use_bn=False, dtype=dt)(dec2)
        skip1 = center_crop(enc1, dec1.shape[1], dec1.shape[2])
        dec1 = ConvBlock(64, use_bn=False, dtype=dt)(jnp.concatenate([dec1, skip1], axis=-1))

        logits = TorchConv(self.out_channels, (1, 1), padding=0, dtype=dt)(dec1)
        return ModelOutput(seg=logits.astype(jnp.float32))
