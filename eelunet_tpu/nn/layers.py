"""NHWC layer library shared by all model families.

Everything here is TPU-idiomatic: channels-last convolutions that XLA tiles
onto the MXU, ``lax.reduce_window`` pooling, reshape-based channel interleaving
(free at the XLA level), and PyTorch-default initializers so training dynamics
match the reference.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eelunet_tpu.nn import init as tinit

Dtype = Any


class TorchConv(nn.Module):
    """Conv2d with PyTorch-default init, NHWC, optional groups/dilation.

    Mirrors ``nn.Conv2d(cin, cout, k, padding=p, groups=g, dilation=d)``.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME_TORCH"  # int p -> [(p, p), (p, p)]
    feature_group_count: int = 1
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    padding_mode: str = "zeros"  # or "reflect"
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
        cin = x.shape[-1]
        fan_in = kh * kw * cin // self.feature_group_count
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            feature_group_count=self.feature_group_count,
            kernel_dilation=self.kernel_dilation,
            use_bias=self.use_bias,
            kernel_init=tinit.torch_conv_init,
            bias_init=tinit.torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k=2, s=2) equivalent: exact 2x upsampling."""

    features: int
    kernel_size: Tuple[int, int] = (2, 2)
    strides: Tuple[int, int] = (2, 2)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        # torch ConvTranspose2d weight is (cin, cout, kh, kw): fan_in = cout*kh*kw.
        fan_in = self.features * kh * kw
        bound = 1.0 / (fan_in ** 0.5)

        def kinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="VALID",
            kernel_init=kinit,
            bias_init=tinit.torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class _TorchExactBatchNorm(nn.BatchNorm):
    """flax BatchNorm with torch's UNBIASED running-var update.

    torch `_BatchNorm` normalizes with the biased batch variance but feeds the
    Bessel-corrected (``N/(N-1)``) variance into ``running_var``
    (aten/native/Normalization.cpp batch_norm_cpu update; contrast flax's
    ``ra_var.value = m*ra_var + (1-m)*var`` which stores the biased var).
    The skew is ``var/(N-1)`` per update — vanishing at production N
    (N=B*H*W), but a measured +7e-3 absolute on unext_s running vars after
    just 6 steps at N=4096 (tests/test_step_parity.py), i.e. a systematic
    semantic divergence, not float drift. Only the running-update line
    differs from the parent; normalization math is inherited unchanged via
    the parent's private helpers (env-pinned flax)."""

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        try:
            from flax.linen import module as _module
            from flax.linen.normalization import (
                _canonicalize_axes,
                _compute_stats,
                _normalize,
            )
        except ImportError as e:  # pragma: no cover - flax upgrade tripwire
            raise ImportError(
                "_TorchExactBatchNorm mirrors flax.linen.normalization private "
                "helpers (written against flax 0.12.x); this flax no longer "
                "exports them. Re-derive the subclass from the new BatchNorm "
                "body and re-run tests/test_step_parity.py + "
                "tests/test_layers_bn.py before trusting parity."
            ) from e
        # Cross-replica sync would make _compute_stats return the GLOBAL
        # variance while the local-shape n below stays per-device, corrupting
        # the N/(N-1) Bessel factor (torch SyncBatchNorm uses the global
        # count). The repo never syncs BN stats (DP replicates them; torch
        # reference is single-device) — fail loudly if that ever changes.
        assert self.axis_name is None and self.axis_index_groups is None, (
            "_TorchExactBatchNorm does not support cross-replica stat sync; "
            "scale n by the axis size before enabling it"
        )

        use_running_average = _module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stat_dtype = (
            jnp.float32 if self.force_float32_reductions else self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, stat_dtype), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, stat_dtype), feature_shape
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = _compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                force_float32_reductions=self.force_float32_reductions,
            )
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                # the one divergence from the parent: Bessel-correct the
                # variance entering the running estimate, as torch does
                ra_var.value = self.momentum * ra_var.value + (
                    1 - self.momentum
                ) * var * (n / max(n - 1, 1))

        return _normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )


class BatchNorm(nn.Module):
    """BatchNorm2d over NHWC channels (torch eps/momentum/Bessel running var).

    The child is explicitly named ``BatchNorm_0`` so checkpoint / torch_port
    variable paths are identical to the plain ``nn.BatchNorm`` this wrapped
    through round 3."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return _TorchExactBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="BatchNorm_0",
        )(x)


class GroupNorm4(nn.Module):
    """GroupNorm(num_groups=4) over NHWC channels (torch eps=1e-5)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis.

    Equivalent to the reference's custom LayerNorm in both data formats
    (EELUnet.py:206-225): normalizing over C per spatial position is exactly
    LayerNorm on the last (channel) axis in NHWC. PyTorch ``channels_first``
    uses a biased variance estimate — so does flax LayerNorm.
    """

    eps: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32)(x)


class TorchDense(nn.Module):
    """nn.Linear with PyTorch-default init."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = tinit.torch_linear_init
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=tinit.torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def max_pool2d(x: jnp.ndarray, k: int, stride: Optional[int] = None) -> jnp.ndarray:
    """F.max_pool2d(kernel=k, stride=k) over NHWC."""
    stride = stride or k
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def avg_pool_global(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1): (N,H,W,C) -> (N,1,1,C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def center_crop(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Center-crop NHWC spatial dims (reference Unet.py:48-56)."""
    h, w = x.shape[-3], x.shape[-2]
    top = (h - target_h) // 2
    left = (w - target_w) // 2
    return x[..., top : top + target_h, left : left + target_w, :]


def interleave_channels(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Channel interleave [a0,b0,a1,b1,...] — FeatureInterleaveBridge
    (EELUnet.py:127-141). In NHWC this is a stack+reshape, free in XLA."""
    stacked = jnp.stack([x1, x2], axis=-1)  # (N,H,W,C,2)
    return stacked.reshape(*x1.shape[:-1], x1.shape[-1] * 2)


class ConvBlock(nn.Module):
    """conv3x3 [+BN] ReLU conv3x3 [+BN] ReLU.

    ``use_bn=False`` reproduces the vanilla Unet block (Unet.py:33-40);
    ``use_bn=True`` the EELUnet block (EELUnet.py:335-345).
    ``features_mid`` overrides the first conv's width (physically pruned
    models carry per-conv channel counts; default = ``features``).
    """

    features: int
    use_bn: bool = True
    features_mid: Optional[int] = None
    dtype: Optional[Dtype] = None
    # True = BN affines were absorbed into the conv weights at load time
    # (bnfold.fold_bn_eval); the BN call sites vanish from the eval graph.
    # Eval-only: training a folded model is a usage error (no BN params).
    bn_folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = self.use_bn and not (self.bn_folded and not train)
        x = TorchConv(self.features_mid or self.features, (3, 3), dtype=self.dtype)(x)
        if bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = TorchConv(self.features, (3, 3), dtype=self.dtype)(x)
        if bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        return x


class UpConvBlock(nn.Module):
    """ConvTranspose(k2,s2) [+BN] (EELUnet.py:361-366; Unet.py:42-46 w/o BN)."""

    features: int
    use_bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConvTranspose(self.features, dtype=self.dtype)(x)
        if self.use_bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        return x


class DropPath(nn.Module):
    """Stochastic depth (timm DropPath); identity when rate==0 or not train."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)
