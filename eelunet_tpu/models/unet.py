"""Vanilla 4-level U-Net (reference models/Unet.py:4-98).

Textbook U-Net: conv blocks WITHOUT batch norm (Unet.py:33-40), transposed-conv
upsampling (Unet.py:42-46), center-crop + channel-concat skips (Unet.py:48-56,
76-95), 1x1 final conv, returns raw logits (Unet.py:97-98). 31.03M params.

TPU-native notes: NHWC throughout; with SAME-padded 3x3 convs the crop is a
no-op at power-of-two sizes but kept for parity at odd sizes.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn
import jax.numpy as jnp

from eelunet_tpu.nn.layers import ConvBlock, UpConvBlock, TorchConv, center_crop, max_pool2d
from eelunet_tpu.registry import ModelOutput


class Unet(nn.Module):
    """Vanilla U-Net. The width tuples default to the reference sizes
    (Unet.py:58-74); a physically pruned model (prune_physical.py) carries
    slimmed per-conv counts — (mid, out) per ConvBlock, out per upconv."""

    out_channels: int = 1
    enc_widths: Tuple[Tuple[int, int], ...] = ((64, 64), (128, 128), (256, 256), (512, 512))
    bottleneck_widths: Tuple[int, int] = (1024, 1024)
    up_widths: Tuple[int, ...] = (512, 256, 128, 64)
    dec_widths: Tuple[Tuple[int, int], ...] = ((512, 512), (256, 256), (128, 128), (64, 64))
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> ModelOutput:
        dt = self.dtype
        ew, bw, uw, dw = self.enc_widths, self.bottleneck_widths, self.up_widths, self.dec_widths
        enc1 = ConvBlock(ew[0][1], use_bn=False, features_mid=ew[0][0], dtype=dt)(x)
        enc2 = ConvBlock(ew[1][1], use_bn=False, features_mid=ew[1][0], dtype=dt)(max_pool2d(enc1, 2))
        enc3 = ConvBlock(ew[2][1], use_bn=False, features_mid=ew[2][0], dtype=dt)(max_pool2d(enc2, 2))
        enc4 = ConvBlock(ew[3][1], use_bn=False, features_mid=ew[3][0], dtype=dt)(max_pool2d(enc3, 2))
        bottleneck = ConvBlock(bw[1], use_bn=False, features_mid=bw[0], dtype=dt)(max_pool2d(enc4, 2))

        dec4 = UpConvBlock(uw[0], use_bn=False, dtype=dt)(bottleneck)
        skip4 = center_crop(enc4, dec4.shape[1], dec4.shape[2])
        dec4 = ConvBlock(dw[0][1], use_bn=False, features_mid=dw[0][0], dtype=dt)(
            jnp.concatenate([dec4, skip4], axis=-1)
        )

        dec3 = UpConvBlock(uw[1], use_bn=False, dtype=dt)(dec4)
        skip3 = center_crop(enc3, dec3.shape[1], dec3.shape[2])
        dec3 = ConvBlock(dw[1][1], use_bn=False, features_mid=dw[1][0], dtype=dt)(
            jnp.concatenate([dec3, skip3], axis=-1)
        )

        dec2 = UpConvBlock(uw[2], use_bn=False, dtype=dt)(dec3)
        skip2 = center_crop(enc2, dec2.shape[1], dec2.shape[2])
        dec2 = ConvBlock(dw[2][1], use_bn=False, features_mid=dw[2][0], dtype=dt)(
            jnp.concatenate([dec2, skip2], axis=-1)
        )

        dec1 = UpConvBlock(uw[3], use_bn=False, dtype=dt)(dec2)
        skip1 = center_crop(enc1, dec1.shape[1], dec1.shape[2])
        dec1 = ConvBlock(dw[3][1], use_bn=False, features_mid=dw[3][0], dtype=dt)(
            jnp.concatenate([dec1, skip1], axis=-1)
        )

        logits = TorchConv(self.out_channels, (1, 1), padding=0, dtype=dt)(dec1)
        return ModelOutput(seg=logits.astype(jnp.float32))
