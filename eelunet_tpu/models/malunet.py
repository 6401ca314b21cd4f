"""MALUNet (reference models/malunet.py:198-324). 0.178M params.

6-stage tiny U-Net (c_list 8,16,24,32,48,64) with external-attention EAblock +
DilatedGatedAttention in the deep stages and a 5-way SC_Att_Bridge (spatial-
then-channel attention applied jointly across all skip tensors) before
decoding; additive skips; bilinear (align_corners=True) upsampling; sigmoid
output.

TPU-native notes: the external-attention Conv1d C->4C over flattened spatial
positions is a Dense over the channel axis in NHWC — one MXU matmul per block;
softmax runs over the spatial axis as in the reference (malunet.py:101-104).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eelunet_tpu.models.egeunet import KaimingConv, _gelu
from eelunet_tpu.nn import init as tinit
from eelunet_tpu.nn.layers import GroupNorm4, max_pool2d
from eelunet_tpu.nn.resize import upsample2x_bilinear
from eelunet_tpu.registry import ModelOutput

Dtype = Any


class DepthWiseConv2d(nn.Module):
    """DW conv -> GroupNorm(4) -> 1x1 conv (malunet.py:9-19)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        x = KaimingConv(cin, (k, k), padding=self.padding, feature_group_count=cin,
                        kernel_dilation=(self.dilation, self.dilation), dtype=self.dtype, name="conv1")(x)
        x = GroupNorm4(dtype=self.dtype, name="norm")(x)
        x = KaimingConv(self.features, (1, 1), padding=0, dtype=self.dtype, name="conv2")(x)
        return x


class GatedAttentionUnit(nn.Module):
    """sigma(DW k) * GELU(DW k+2) -> DW out + 1x1 residual (malunet.py:22-44)."""

    features: int
    kernel_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        x1 = jax.nn.sigmoid(DepthWiseConv2d(cin, k, padding=k // 2, dtype=self.dtype, name="w1")(x))
        x2 = _gelu(DepthWiseConv2d(cin, k + 2, padding=(k + 2) // 2, dtype=self.dtype, name="w2")(x))
        out = _gelu(DepthWiseConv2d(self.features, k, padding=1, dtype=self.dtype, name="wo")(x1 * x2))
        return out + KaimingConv(self.features, (1, 1), padding=0, dtype=self.dtype, name="cw")(x)


class DilatedGatedAttention(nn.Module):
    """4-way channel chunk through dilated grouped convs -> GAU (malunet.py:47-76)."""

    features: int
    k_size: int = 3
    dilated_ratio: Tuple[int, int, int, int] = (7, 5, 2, 1)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cq = cin // 4
        chunks = jnp.split(x, 4, axis=-1)
        outs = []
        for i, (xc, d) in enumerate(zip(chunks, self.dilated_ratio)):
            pad = (self.k_size + (self.k_size - 1) * (d - 1)) // 2
            outs.append(
                KaimingConv(cq, (self.k_size, self.k_size), padding=pad,
                            kernel_dilation=(d, d), feature_group_count=cq,
                            dtype=self.dtype, name=f"mda{i}")(xc)
            )
        x = jnp.concatenate(outs, axis=-1)
        x = GroupNorm4(dtype=self.dtype, name="norm")(x)
        x = _gelu(KaimingConv(cin, (1, 1), padding=0, dtype=self.dtype, name="conv")(x))
        return GatedAttentionUnit(self.features, dtype=self.dtype, name="gau")(x)


class EAblock(nn.Module):
    """External attention (malunet.py:79-111).

    linear_1 is initialized as linear_0 transposed but trains independently —
    init-only coupling, replicated exactly (malunet.py:89; easy to get wrong
    by "improving" into true weight tying).
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = c * 4
        idn = x
        x = KaimingConv(c, (1, 1), padding=0, dtype=self.dtype, name="conv1")(x)
        b, h, w, _ = x.shape
        xs = x.reshape(b, h * w, c)  # (B, N, C)

        # Conv1d(C, 4C, 1, bias=False): torch default init = kaiming_uniform(a=sqrt(5))
        # over fan_in=C. Shared-key trick: W1 init = W0^T.
        w0 = self.param("linear_0", tinit.torch_linear_init, (c, k), jnp.float32)
        # Exact init-only coupling: linear_1 starts as linear_0^T and then
        # trains independently (malunet.py:89).
        w1 = self.param("linear_1", lambda rng, shape: jnp.transpose(w0), (k, c))
        attn = xs @ w0.astype(xs.dtype)                         # (B, N, K)
        attn = jax.nn.softmax(attn, axis=1)                      # softmax over N (malunet.py:102)
        attn = attn / (1e-9 + jnp.sum(attn, axis=2, keepdims=True))  # L1 over k (malunet.py:104)
        xs = attn @ w1.astype(attn.dtype)                        # (B, N, C)

        x = xs.reshape(b, h, w, c)
        x = KaimingConv(c, (1, 1), padding=0, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = GroupNorm4(dtype=self.dtype, name="norm")(x)
        return _gelu(x + idn)


class ChannelAttBridge(nn.Module):
    """Joint channel attention across the 5 skips (malunet.py:114-155)."""

    c_list: Tuple[int, ...]
    split_att: str = "fc"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, ts):
        dt = self.dtype
        pooled = [jnp.mean(t, axis=(1, 2)) for t in ts]  # each (B, C_i)
        att = jnp.concatenate(pooled, axis=-1)           # (B, Csum)
        # get_all_att: Conv1d(1,1,k3,pad1,bias=False) over the channel axis as
        # a length-Csum sequence (malunet.py:120,134).
        att = att[:, :, None, None]                      # (B, Csum, 1, 1) -> conv over axis 1
        att = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], use_bias=False,
                      kernel_init=tinit.torch_conv_init, dtype=dt,
                      param_dtype=jnp.float32, name="get_all_att")(att)
        att = att[:, :, 0, 0]                            # (B, Csum)

        # Both reference branches (Linear vs Conv1d-k1, malunet.py:121-125) are
        # numerically a biased dense over Csum; one code path suffices.
        outs = []
        for i, (t, c) in enumerate(zip(ts, self.c_list)):
            a = nn.Dense(c, kernel_init=tinit.torch_linear_init,
                         bias_init=tinit.torch_bias_init(att.shape[-1]),
                         dtype=dt, param_dtype=jnp.float32, name=f"att{i + 1}")(att)
            a = jax.nn.sigmoid(a)[:, None, None, :]      # broadcast over H, W
            outs.append(a)
        return outs


class SpatialAttBridge(nn.Module):
    """Shared conv2d(2->1, k7, dilation 3) on [avg,max] maps (malunet.py:158-173)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, ts):
        conv = KaimingConv(1, (7, 7), padding=9, kernel_dilation=(3, 3),
                           dtype=self.dtype, name="shared_conv")
        outs = []
        for t in ts:
            avg = jnp.mean(t, axis=-1, keepdims=True)
            mx = jnp.max(t, axis=-1, keepdims=True)
            outs.append(jax.nn.sigmoid(conv(jnp.concatenate([avg, mx], axis=-1))))
        return outs


class SCAttBridge(nn.Module):
    """Spatial-then-channel attention with the reference's residual dance
    (malunet.py:176-195)."""

    c_list: Tuple[int, ...]
    split_att: str = "fc"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, ts):
        r = ts
        satts = SpatialAttBridge(dtype=self.dtype, name="satt")(ts)
        ts = [s * t for s, t in zip(satts, ts)]
        r_ = ts
        ts = [t + ri for t, ri in zip(ts, r)]
        catts = ChannelAttBridge(self.c_list, self.split_att, dtype=self.dtype, name="catt")(ts)
        ts = [c * t for c, t in zip(catts, ts)]
        return [t + ri for t, ri in zip(ts, r_)]


class MALUNet(nn.Module):
    num_classes: int = 1
    c_list: Tuple[int, ...] = (8, 16, 24, 32, 48, 64)
    split_att: str = "fc"
    bridge: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> ModelOutput:
        dt = self.dtype
        c = self.c_list

        out = _gelu(max_pool2d(GroupNorm4(dtype=dt, name="ebn1")(
            KaimingConv(c[0], (3, 3), dtype=dt, name="encoder1")(x)), 2))
        t1 = out
        out = _gelu(max_pool2d(GroupNorm4(dtype=dt, name="ebn2")(
            KaimingConv(c[1], (3, 3), dtype=dt, name="encoder2")(out)), 2))
        t2 = out
        out = _gelu(max_pool2d(GroupNorm4(dtype=dt, name="ebn3")(
            KaimingConv(c[2], (3, 3), dtype=dt, name="encoder3")(out)), 2))
        t3 = out
        out = EAblock(dtype=dt, name="encoder4_ea")(out)
        out = DilatedGatedAttention(c[3], dtype=dt, name="encoder4_dga")(out)
        out = _gelu(max_pool2d(GroupNorm4(dtype=dt, name="ebn4")(out), 2))
        t4 = out
        out = EAblock(dtype=dt, name="encoder5_ea")(out)
        out = DilatedGatedAttention(c[4], dtype=dt, name="encoder5_dga")(out)
        out = _gelu(max_pool2d(GroupNorm4(dtype=dt, name="ebn5")(out), 2))
        t5 = out

        if self.bridge:
            t1, t2, t3, t4, t5 = SCAttBridge(c, self.split_att, dtype=dt, name="scab")([t1, t2, t3, t4, t5])

        out = EAblock(dtype=dt, name="encoder6_ea")(out)
        out = DilatedGatedAttention(c[5], dtype=dt, name="encoder6_dga")(out)
        out = _gelu(out)

        out5 = DilatedGatedAttention(c[4], dtype=dt, name="decoder1_dga")(out)
        out5 = EAblock(dtype=dt, name="decoder1_ea")(out5)
        out5 = _gelu(GroupNorm4(dtype=dt, name="dbn1")(out5)) + t5

        out4 = DilatedGatedAttention(c[3], dtype=dt, name="decoder2_dga")(out5)
        out4 = EAblock(dtype=dt, name="decoder2_ea")(out4)
        out4 = _gelu(upsample2x_bilinear(GroupNorm4(dtype=dt, name="dbn2")(out4), align_corners=True)) + t4

        out3 = DilatedGatedAttention(c[2], dtype=dt, name="decoder3_dga")(out4)
        out3 = EAblock(dtype=dt, name="decoder3_ea")(out3)
        out3 = _gelu(upsample2x_bilinear(GroupNorm4(dtype=dt, name="dbn3")(out3), align_corners=True)) + t3

        out2 = KaimingConv(c[1], (3, 3), dtype=dt, name="decoder4")(out3)
        out2 = _gelu(upsample2x_bilinear(GroupNorm4(dtype=dt, name="dbn4")(out2), align_corners=True)) + t2

        out1 = KaimingConv(c[0], (3, 3), dtype=dt, name="decoder5")(out2)
        out1 = _gelu(upsample2x_bilinear(GroupNorm4(dtype=dt, name="dbn5")(out1), align_corners=True)) + t1

        out0 = KaimingConv(self.num_classes, (1, 1), padding=0, dtype=dt, name="final")(out1)
        out0 = upsample2x_bilinear(out0, align_corners=True).astype(jnp.float32)
        if self.num_classes > 1:  # multi-class mode: softmax head
            return ModelOutput(seg=jax.nn.softmax(out0, axis=-1))
        return ModelOutput(seg=jax.nn.sigmoid(out0))
