"""Normalisation / conditioning primitives.

Re-designed for channels-last ``[B, T, C]`` tensors (TPU lanes = C) with the
same math as the reference AdaIN/AdaLN family (train/models/ada_norm.py) and
the channel LayerNorm used by the text encoder
(train/models/text_encoder.py:15-33).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _moments(x: jax.Array, axis) -> tuple:
    """mean/var in f32 regardless of input dtype (mixed-precision safety:
    bf16 sums over hundreds of elements lose ~2 decimal digits)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=axis, keepdims=True)
    return mean, var


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis with learned affine.

    Equivalent to the reference's LayerNorm over dim=1 in [B, C, T] layout
    (text_encoder.py:15-33, eps=1e-4)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        mean, var = _moments(x, -1)
        x = ((x - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return x * gamma + beta


def _style_affine(style: jax.Array, channels: int, name: str = "fc"):
    """style [B, S] -> (gamma, beta) each [B, 1, C] via a Dense layer."""
    h = nn.Dense(channels * 2, name=name)(style)
    gamma, beta = jnp.split(h[:, None, :], 2, axis=-1)
    return gamma, beta


class AdaptiveLayerNorm(nn.Module):
    """LayerNorm (no learned affine) + style-predicted (1+γ)·x + β
    (ada_norm.py:185-201)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array) -> jax.Array:
        gamma, beta = _style_affine(style, x.shape[-1])
        mean, var = _moments(x, -1)
        x = ((x - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return (1.0 + gamma) * x + beta


class AdaptiveInstanceNorm(nn.Module):
    """Instance norm over time (per channel, per sample) + style affine
    (ada_norm.py:129-139).  x is [B, T, C]."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array) -> jax.Array:
        gamma, beta = _style_affine(style, x.shape[-1])
        mean, var = _moments(x, 1)
        x = ((x - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return (1.0 + gamma) * x + beta


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake1D activation x + (1/a)·sin²(a·x) (ada_norm.py:115-119)."""
    return x + jnp.sin(alpha * x) ** 2 / alpha


class Conv1d(nn.Module):
    """1-D convolution on [B, T, C] with torch-style symmetric padding."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.kernel_size * self.dilation - self.dilation) // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding=[(pad, pad)],
            use_bias=self.use_bias,
        )(x)


class AdaptiveDecoderBlock(nn.Module):
    """Two-conv residual block with AdaIN conditioning, /√2 output
    (ada_norm.py:142-182)."""

    dim_out: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, style: jax.Array, *, train: bool = False
    ) -> jax.Array:
        dim_in = x.shape[-1]
        h = AdaptiveInstanceNorm()(x, style)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = Conv1d(self.dim_out, 3, name="conv1")(h)
        h = AdaptiveInstanceNorm()(h, style)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = Conv1d(self.dim_out, 3, name="conv2")(h)
        if dim_in != self.dim_out:
            x = nn.Conv(
                self.dim_out, (1,), use_bias=False, name="conv1x1"
            )(x)
        return (h + x) / math.sqrt(2.0)


class AdaptiveGeneratorBlock(nn.Module):
    """HiFiGAN-style residual block with Snake activations and AdaIN
    conditioning (ada_norm.py:11-126); used by the legacy ringformer head."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilation):
            a1 = self.param(
                f"alpha1_{i}", nn.initializers.ones, (1, 1, self.channels)
            )
            a2 = self.param(
                f"alpha2_{i}", nn.initializers.ones, (1, 1, self.channels)
            )
            h = AdaptiveInstanceNorm(name=f"adain1_{i}")(x, style)
            h = snake(h, a1)
            h = Conv1d(
                self.channels, self.kernel_size, dilation=d, name=f"conv1_{i}"
            )(h)
            h = AdaptiveInstanceNorm(name=f"adain2_{i}")(h, style)
            h = snake(h, a2)
            h = Conv1d(self.channels, self.kernel_size, name=f"conv2_{i}")(h)
            x = x + h
        return x


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[B] -> bool [B, max_length], True where valid
    (reference train/utils.py:52-56)."""
    positions = jnp.arange(max_length, dtype=lengths.dtype)
    return positions[None, :] < lengths[:, None]
