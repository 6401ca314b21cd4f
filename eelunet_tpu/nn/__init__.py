from eelunet_tpu.nn.resize import resize_bilinear, upsample2x_bilinear
from eelunet_tpu.nn.layers import (
    ConvBlock,
    UpConvBlock,
    ChannelLayerNorm,
    center_crop,
    max_pool2d,
    interleave_channels,
)

__all__ = [
    "resize_bilinear",
    "upsample2x_bilinear",
    "ConvBlock",
    "UpConvBlock",
    "ChannelLayerNorm",
    "center_crop",
    "max_pool2d",
    "interleave_channels",
]
