"""UNeXt / UNeXt_S (reference models/unext.py:191-325, 328-462).

3 conv stages (2x maxpool each) + 2 tokenized-MLP stages; the shift-MLP pads
then rolls 5 channel chunks by -2..+2 along H (around fc1) and W (around fc2);
decoder mirrors with bilinear 2x upsampling (align_corners=False — the torch
default, unlike the other models) and additive skips. Returns raw logits.
UNext 1.47M params / UNext_S 0.25M.

TPU-native notes: tokens stay in NHWC — the reference's NCHW<->token permutes
(unext.py:70,78,87,94) vanish; fc1/fc2 are Dense over the channel axis (MXU
matmuls); the channel-chunk spatial shifts are pad+concat slices XLA fuses.
The dead duplicate models/Wnext.py is intentionally not reproduced.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eelunet_tpu.nn import init as tinit
from eelunet_tpu.nn.layers import BatchNorm, DropPath, TorchConv, max_pool2d
from eelunet_tpu.nn.resize import upsample2x_bilinear
from eelunet_tpu.registry import ModelOutput

Dtype = Any


def _torch_chunk_sizes(c: int, n: int) -> Tuple[int, ...]:
    """torch.chunk semantics: chunks of ceil(c/n), last takes the remainder."""
    step = -(-c // n)
    sizes = []
    left = c
    while left > 0:
        take = min(step, left)
        sizes.append(take)
        left -= take
    return tuple(sizes)


def shift_chunks(x: jnp.ndarray, axis: int, shift_size: int = 5) -> jnp.ndarray:
    """Zero-filled spatial shift of channel chunks (shiftmlp, unext.py:70-76).

    Chunk channels into ``shift_size`` torch-style groups; shift group i by
    (i - pad) pixels along ``axis`` with zeros entering at the border (the
    reference pads by ``pad``, rolls, then crops — identical result).
    """
    pad = shift_size // 2
    c = x.shape[-1]
    sizes = _torch_chunk_sizes(c, shift_size)
    pieces = []
    start = 0
    size_ax = x.shape[axis]
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (pad, pad)
    for i, s in enumerate(sizes):
        chunk = x[..., start : start + s]
        shift = i - pad if i < shift_size else 0
        padded = jnp.pad(chunk, pad_cfg)
        rolled = jnp.roll(padded, shift, axis=axis)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(pad, pad + size_ax)
        pieces.append(rolled[tuple(sl)])
        start += s
    return jnp.concatenate(pieces, axis=-1)


class DWConv(nn.Module):
    """Depthwise 3x3 over token grid (unext.py:134-145); kaiming fan_out init."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.dim, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=self.dim,
            kernel_init=tinit.kaiming_normal_fan_out(self.dim), bias_init=tinit.zeros,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)


class ShiftMLP(nn.Module):
    """shiftmlp (unext.py:27-99): shiftH -> fc1 -> DWConv -> GELU -> shiftW -> fc2.

    Linear layers use timm trunc_normal(0.02)/zero-bias init (unext.py:44-48).
    """

    hidden: int
    out: int
    shift_size: int = 5
    drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype

        def dense(feat, name):
            return nn.Dense(feat, kernel_init=tinit.trunc_normal(0.02), bias_init=tinit.zeros,
                            dtype=dt, param_dtype=jnp.float32, name=name)

        x = shift_chunks(x, axis=1, shift_size=self.shift_size)  # along H
        x = dense(self.hidden, "fc1")(x)
        x = DWConv(self.hidden, dtype=dt, name="dwconv")(x)
        x = nn.gelu(x, approximate=False)
        if self.drop > 0 and train:
            x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = shift_chunks(x, axis=2, shift_size=self.shift_size)  # along W
        x = dense(self.out, "fc2")(x)
        if self.drop > 0 and train:
            x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class ShiftedBlock(nn.Module):
    """x + DropPath(shiftmlp(LN(x))) (unext.py:102-131), mlp_ratio=1."""

    dim: int
    drop_path: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = ShiftMLP(self.dim, self.dim, dtype=self.dtype, name="mlp")(y, train)
        return x + DropPath(self.drop_path)(y, train)


class OverlapPatchEmbed(nn.Module):
    """Conv k3 s2 p1 + LayerNorm over channels (unext.py:148-188)."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            kernel_init=tinit.kaiming_normal_fan_out(1), bias_init=tinit.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="proj",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        return x


class _UNextBase(nn.Module):
    """Shared UNeXt graph; dims = (conv1, conv2, embed0, embed1, embed2)."""

    num_classes: int = 1
    dims: Tuple[int, int, int, int, int] = (16, 32, 128, 160, 256)
    dtype: Optional[Dtype] = None
    # True = the 7 conv-adjacent BN affines (ebn1-3, dbn1-4) were absorbed
    # into their conv weights at load (bnfold.fold_bn_eval; eval-only).
    bn_folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> ModelOutput:
        assert not (self.bn_folded and train), "bn_folded models are eval-only"
        dt = self.dtype
        c1, c2, e0, e1, e2 = self.dims
        up = lambda t: upsample2x_bilinear(t, align_corners=False)
        if self.bn_folded:
            bn = lambda name, y, tr: y
        else:
            bn = lambda name, y, tr: BatchNorm(dtype=dt, name=name)(y, tr)

        # Conv stages (forward 267-274)
        out = nn.relu(max_pool2d(bn("ebn1",
            TorchConv(c1, (3, 3), dtype=dt, name="encoder1")(x), train), 2))
        t1 = out
        out = nn.relu(max_pool2d(bn("ebn2",
            TorchConv(c2, (3, 3), dtype=dt, name="encoder2")(out), train), 2))
        t2 = out
        out = nn.relu(max_pool2d(bn("ebn3",
            TorchConv(e0, (3, 3), dtype=dt, name="encoder3")(out), train), 2))
        t3 = out

        # Tokenized MLP stage 4 (279-284)
        out = OverlapPatchEmbed(e1, dtype=dt, name="patch_embed3")(out)
        out = ShiftedBlock(e1, dtype=dt, name="block1")(out, train)
        out = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32, name="norm3")(out)
        t4 = out

        # Bottleneck (288-292)
        out = OverlapPatchEmbed(e2, dtype=dt, name="patch_embed4")(out)
        out = ShiftedBlock(e2, dtype=dt, name="block2")(out, train)
        out = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32, name="norm4")(out)

        # Decoder stage 4 (296-302)
        out = nn.relu(up(bn("dbn1",
            TorchConv(e1, (3, 3), dtype=dt, name="decoder1")(out), train)))
        out = out + t4
        out = ShiftedBlock(e1, dtype=dt, name="dblock1")(out, train)
        out = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32, name="dnorm3")(out)

        # Decoder stage 3 (306-316)
        out = nn.relu(up(bn("dbn2",
            TorchConv(e0, (3, 3), dtype=dt, name="decoder2")(out), train)))
        out = out + t3
        out = ShiftedBlock(e0, dtype=dt, name="dblock2")(out, train)
        out = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32, name="dnorm4")(out)

        # Decoder tail (319-325)
        out = nn.relu(up(bn("dbn3",
            TorchConv(c2, (3, 3), dtype=dt, name="decoder3")(out), train)))
        out = out + t2
        out = nn.relu(up(bn("dbn4",
            TorchConv(c1, (3, 3), dtype=dt, name="decoder4")(out), train)))
        out = out + t1
        out = nn.relu(up(TorchConv(c1, (3, 3), dtype=dt, name="decoder5")(out)))

        logits = TorchConv(self.num_classes, (1, 1), padding=0, dtype=dt, name="final")(out)
        return ModelOutput(seg=logits.astype(jnp.float32))


class UNext(_UNextBase):
    """UNeXt (unext.py:191-325): conv 16/32, embed dims 128/160/256."""

    dims: Tuple[int, int, int, int, int] = (16, 32, 128, 160, 256)


class UNextS(_UNextBase):
    """UNeXt_S (unext.py:328-462): conv 8/16, embed dims 32/64/128."""

    dims: Tuple[int, int, int, int, int] = (8, 16, 32, 64, 128)
