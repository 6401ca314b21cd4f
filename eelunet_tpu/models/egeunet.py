"""EGE-UNet (reference models/egeunet.py:217-391). 0.044M params.

6-stage tiny encoder (c_list 8,16,24,32,48,64) with Grouped multi-axis
Hadamard Product Attention (GHPA) blocks in the deep stages; decoder with
per-stage 1-channel gt_pre deep-supervision heads, sigmoid-gated Merge skips
(weights 0.1..0.5, egeunet.py:352-381); every gt_pre bilinearly upsampled
(align_corners=True) to full resolution before return. Returns
ModelOutput(seg=sigmoid(out), aux=(5 sigmoid gt_pre maps, low->high stage)).

The duplicated ``EGEUNet_Large`` class in the reference (egeunet.py:393-567) is
byte-identical dead code and intentionally not reproduced.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eelunet_tpu.nn import init as tinit
from eelunet_tpu.nn.layers import BatchNorm, ChannelLayerNorm, GroupNorm4, TorchConv, max_pool2d
from eelunet_tpu.nn.resize import resize_bilinear, upsample2x_bilinear
from eelunet_tpu.registry import ModelOutput

Dtype = Any


def _gelu(x):
    return nn.gelu(x, approximate=False)


class KaimingConv(nn.Module):
    """Conv2d with the reference's _init_weights: kaiming-normal over
    fan_out//groups, zero bias (egeunet.py:316-321)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME_TORCH"
    feature_group_count: int = 1
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    padding_mode: str = "zeros"
    conv1d_init: bool = False  # use the reference's Conv1d init (no groups division)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        if self.padding == "SAME_TORCH":
            dh, dw = self.kernel_dilation
            pad = [((kh - 1) * dh // 2,) * 2, ((kw - 1) * dw // 2,) * 2]
        elif isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding
        if self.padding_mode == "reflect" and pad != [(0, 0), (0, 0)]:
            x = jnp.pad(x, [(0, 0), pad[0], pad[1], (0, 0)], mode="reflect")
            pad = [(0, 0), (0, 0)]
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            feature_group_count=self.feature_group_count,
            kernel_dilation=self.kernel_dilation,
            use_bias=self.use_bias,
            kernel_init=(tinit.conv1d_normal_init if self.conv1d_init
                         else tinit.kaiming_normal_fan_out(self.feature_group_count)),
            bias_init=tinit.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class GHPA(nn.Module):
    """Grouped multi-axis Hadamard Product Attention (egeunet.py:96-160).

    Channels are chunked into 4 groups. Three groups are Hadamard-multiplied
    with learnable parameter grids bilinearly resized (align_corners=True) to
    the group's (axis-permuted) shape and passed through small grouped-conv
    stacks; the fourth gets a depthwise path. A channels-first LayerNorm + a
    depthwise tail mix the groups back together.

    Axis bookkeeping vs the reference's NCHW permutes: our tensors are NHWC,
    and the three "views" are (H,W), (C,H) [reference's zx on x2 permuted to
    (B,W,C,H)], and (C,W) [zy on x3 permuted to (B,H,C,W)].
    """

    features: int
    grid: Tuple[int, int] = (8, 8)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cg = x.shape[-1] // 4  # c_dim_in
        gx, gy = self.grid
        h, w = x.shape[1], x.shape[2]
        dt = self.dtype

        x = ChannelLayerNorm(name="norm1", dtype=dt)(x)
        x1, x2, x3, x4 = jnp.split(x, 4, axis=-1)

        # ---- xy group: params (1, gx, gy, cg) resized to (H, W) ----
        params_xy = self.param("params_xy", tinit.ones, (1, gx, gy, cg), jnp.float32)
        pxy = resize_bilinear(params_xy, h, w, align_corners=True)
        pxy = KaimingConv(cg, (3, 3), feature_group_count=cg, dtype=dt, name="conv_xy_dw")(pxy)
        pxy = _gelu(pxy)
        pxy = KaimingConv(cg, (1, 1), padding=0, dtype=dt, name="conv_xy_pw")(pxy)
        x1 = x1 * pxy

        # ---- zx group: reference params (1,1,cg,gx) -> interp to (cg,H),
        # conv1d over length H with cg channels; multiplies x2 viewed (B,W,C,H).
        # In NHWC we build the (1, cg, H, 1)-shaped modulation and broadcast:
        # value depends on (channel, H) only.
        # Stored as an (cg, gx) "image" with one channel; F.interpolate in the
        # reference resizes (1,1,cg,gx) -> (1,1,cg,H): per-channel 1D curves
        # over gx samples stretched to H samples (rows cg->cg is identity).
        params_zx = self.param("params_zx", tinit.ones, (1, cg, gx, 1), jnp.float32)
        pzx = resize_bilinear(params_zx, cg, h, align_corners=True)  # (1, cg, H, 1)
        # conv1d(cg channels, k3, groups=cg) over length H:
        pzx = pzx.transpose(0, 2, 3, 1)  # (1, H, 1, cg)
        pzx = KaimingConv(cg, (3, 1), feature_group_count=cg, conv1d_init=True, dtype=dt, name="conv_zx_dw")(pzx)
        pzx = _gelu(pzx)
        pzx = KaimingConv(cg, (1, 1), padding=0, dtype=dt, name="conv_zx_pw")(pzx)
        # (1, H, 1, cg) broadcasts over B and W of (B, H, W, cg)
        x2 = x2 * pzx

        # ---- zy group: params (1,1,cg,gy) -> (cg, W) modulation ----
        params_zy = self.param("params_zy", tinit.ones, (1, cg, gy, 1), jnp.float32)
        pzy = resize_bilinear(params_zy, cg, w, align_corners=True)  # (1, cg, W, 1)
        pzy = pzy.transpose(0, 2, 3, 1)  # (1, W, 1, cg)
        pzy = KaimingConv(cg, (3, 1), feature_group_count=cg, conv1d_init=True, dtype=dt, name="conv_zy_dw")(pzy)
        pzy = _gelu(pzy)
        pzy = KaimingConv(cg, (1, 1), padding=0, dtype=dt, name="conv_zy_pw")(pzy)
        pzy = pzy.transpose(0, 2, 1, 3)  # (1, 1, W, cg) broadcasts over B and H
        x3 = x3 * pzy

        # ---- dw group (egeunet.py:119-123) ----
        x4 = KaimingConv(cg, (1, 1), padding=0, dtype=dt, name="dw_pw")(x4)
        x4 = _gelu(x4)
        x4 = KaimingConv(cg, (3, 3), feature_group_count=cg, dtype=dt, name="dw_dw")(x4)

        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        x = ChannelLayerNorm(name="norm2", dtype=dt)(x)
        # ldw tail (egeunet.py:128-132)
        cin = x.shape[-1]
        x = KaimingConv(cin, (3, 3), feature_group_count=cin, dtype=dt, name="ldw_dw")(x)
        x = _gelu(x)
        x = KaimingConv(self.features, (1, 1), padding=0, dtype=dt, name="ldw_pw")(x)
        return x


class ConvLayer(nn.Module):
    """ConvNeXt-ish k7 depthwise reflect-pad block (egeunet.py:163-183)."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = KaimingConv(self.dim, (7, 7), feature_group_count=self.dim,
                        padding_mode="reflect", dtype=dt, name="conv1")(x)
        x = BatchNorm(dtype=dt, name="norm1")(x, train)
        x = KaimingConv(4 * self.dim, (1, 1), padding=0, dtype=dt, name="conv2")(x)
        x = _gelu(x)
        x = KaimingConv(self.dim, (1, 1), padding=0, dtype=dt, name="conv3")(x)
        x = BatchNorm(dtype=dt, name="norm2")(x, train)
        x = _gelu(x)
        return x


class Down(nn.Module):
    """BN + conv k2 s2 (egeunet.py:186-193)."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train)
        return KaimingConv(self.dim, (2, 2), strides=(2, 2), padding=0, dtype=self.dtype, name="conv")(x)


class ImagePredictionGenerator(nn.Module):
    """1x1 head + sigmoid gating; returns raw gt_pre (egeunet.py:196-205)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        gt_pre = KaimingConv(1, (1, 1), padding=0, dtype=self.dtype, name="conv")(x)
        x = x + x * jax.nn.sigmoid(gt_pre)
        return x, gt_pre.astype(jnp.float32)


def merge(x1, x2, gt_pre, w):
    """x1 + x2 + sigmoid(gt_pre)*x2*w (egeunet.py:208-214)."""
    return x1 + x2 + jax.nn.sigmoid(gt_pre) * x2 * w


class EGEUNet(nn.Module):
    num_classes: int = 1
    c_list: Tuple[int, ...] = (8, 16, 24, 32, 48, 64)
    bridge: bool = True   # reference flag; the GAB bridge is commented out upstream
    gt_ds: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> ModelOutput:
        dt = self.dtype
        c = self.c_list

        # Encoder (egeunet.py:323-346)
        out = KaimingConv(c[0], (3, 3), dtype=dt, name="encoder1")(x)
        out = _gelu(Down(c[0], dtype=dt, name="down1")(GroupNorm4(dtype=dt, name="ebn1")(out), train))
        t1 = out  # H/2
        out = KaimingConv(c[1], (3, 3), dtype=dt, name="encoder2")(out)
        out = _gelu(Down(c[1], dtype=dt, name="down2")(GroupNorm4(dtype=dt, name="ebn2")(out), train))
        t2 = out  # H/4
        out = KaimingConv(c[2], (3, 3), dtype=dt, name="encoder3_conv")(out)
        out = ConvLayer(c[2], dtype=dt, name="encoder3_block")(out, train)
        out = _gelu(Down(c[2], dtype=dt, name="down3")(GroupNorm4(dtype=dt, name="ebn3")(out), train))
        t3 = out  # H/8
        out = GHPA(c[3], dtype=dt, name="encoder4")(out)
        out = _gelu(max_pool2d(GroupNorm4(dtype=dt, name="ebn4")(out), 2))
        t4 = out  # H/16
        out = GHPA(c[4], dtype=dt, name="encoder5")(out)
        out = _gelu(max_pool2d(GroupNorm4(dtype=dt, name="ebn5")(out), 2))
        t5 = out  # H/32
        out = GHPA(c[5], dtype=dt, name="encoder6")(out)
        out = _gelu(out)

        # Decoder (egeunet.py:348-385)
        out = GHPA(c[4], dtype=dt, name="decoder1")(out)
        out = _gelu(GroupNorm4(dtype=dt, name="dbn1")(out))
        out, gt_pre5 = ImagePredictionGenerator(dtype=dt, name="pred1")(out)
        out = merge(out, t5, gt_pre5, 0.1)
        gt_pre5_full = resize_bilinear(gt_pre5, gt_pre5.shape[1] * 32, gt_pre5.shape[2] * 32, align_corners=True)

        out = GHPA(c[3], dtype=dt, name="decoder2")(out)
        out = _gelu(upsample2x_bilinear(GroupNorm4(dtype=dt, name="dbn2")(out), align_corners=True))
        out, gt_pre4 = ImagePredictionGenerator(dtype=dt, name="pred2")(out)
        out = merge(out, t4, gt_pre4, 0.2)
        gt_pre4_full = resize_bilinear(gt_pre4, gt_pre4.shape[1] * 16, gt_pre4.shape[2] * 16, align_corners=True)

        out = GHPA(c[2], dtype=dt, name="decoder3")(out)
        out = _gelu(upsample2x_bilinear(GroupNorm4(dtype=dt, name="dbn3")(out), align_corners=True))
        out, gt_pre3 = ImagePredictionGenerator(dtype=dt, name="pred3")(out)
        out = merge(out, t3, gt_pre3, 0.3)
        gt_pre3_full = resize_bilinear(gt_pre3, gt_pre3.shape[1] * 8, gt_pre3.shape[2] * 8, align_corners=True)

        out = KaimingConv(c[1], (3, 3), dtype=dt, name="decoder4")(out)
        out = _gelu(upsample2x_bilinear(GroupNorm4(dtype=dt, name="dbn4")(out), align_corners=True))
        out, gt_pre2 = ImagePredictionGenerator(dtype=dt, name="pred4")(out)
        out = merge(out, t2, gt_pre2, 0.4)
        gt_pre2_full = resize_bilinear(gt_pre2, gt_pre2.shape[1] * 4, gt_pre2.shape[2] * 4, align_corners=True)

        out = KaimingConv(c[0], (3, 3), dtype=dt, name="decoder5")(out)
        out = _gelu(upsample2x_bilinear(GroupNorm4(dtype=dt, name="dbn5")(out), align_corners=True))
        out, gt_pre1 = ImagePredictionGenerator(dtype=dt, name="pred5")(out)
        out = merge(out, t1, gt_pre1, 0.5)
        gt_pre1_full = resize_bilinear(gt_pre1, gt_pre1.shape[1] * 2, gt_pre1.shape[2] * 2, align_corners=True)

        out = KaimingConv(self.num_classes, (1, 1), padding=0, dtype=dt, name="final")(out)
        out = upsample2x_bilinear(out, align_corners=True)
        # sigmoid head (egeunet.py:389); softmax in multi-class mode
        out = out.astype(jnp.float32)
        seg = jax.nn.sigmoid(out) if self.num_classes == 1 else jax.nn.softmax(out, axis=-1)

        aux = tuple(
            jax.nn.sigmoid(g) for g in
            (gt_pre5_full, gt_pre4_full, gt_pre3_full, gt_pre2_full, gt_pre1_full)
        )
        if not self.gt_ds:
            aux = ()
        return ModelOutput(seg=seg, aux=aux)
