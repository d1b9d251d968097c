"""Style encoders: text-side (ConvNeXt, masked mean-pool) and mel-side
(2D CNN with spectral-norm convs).

Parity: TextStyleEncoder (train/models/text_style_encoder.py:6-26) and
MelStyleEncoder (train/models/mel_style_encoder.py:120-151).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .convnext import BasicConvNeXtBlock
from .norms import Conv1d, sequence_mask


class TextStyleEncoder(nn.Module):
    """conv k7 -> N BasicConvNeXt blocks -> masked mean-pool -> style [B, S]."""

    style_dim: int
    n_layers: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array) -> jax.Array:
        x = Conv1d(self.style_dim, 7, name="conv_in")(x)
        for i in range(self.n_layers):
            x = BasicConvNeXtBlock(
                self.style_dim, self.style_dim * 4, name=f"block_{i}"
            )(x)
        mask = sequence_mask(lengths, x.shape[1]).astype(x.dtype)[..., None]
        return (x * mask).sum(axis=1) / lengths[:, None].astype(x.dtype)


class SpectralConv(nn.Module):
    """2D conv with spectral normalisation (power-iteration), channels-last."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | list = "SAME"
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, update_stats: bool = False) -> jax.Array:
        conv = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
        )
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


class _ResBlk2d(nn.Module):
    """Mel-style-encoder residual block with 'half' downsampling
    (mel_style_encoder.py:70-117); x is [B, F, T, C]."""

    dim_out: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, update_stats: bool = False) -> jax.Array:
        dim_in = x.shape[-1]

        def down(h):
            if not self.downsample:
                return h
            # pad the time axis to even as the reference does
            if h.shape[2] % 2 != 0:
                h = jnp.concatenate([h, h[:, :, -1:]], axis=2)
            return nn.avg_pool(h, (2, 2), strides=(2, 2))

        # residual path
        h = nn.leaky_relu(x, 0.2)
        h = SpectralConv(dim_in, (3, 3), name="conv1")(h, update_stats=update_stats)
        if self.downsample:
            # explicit (1,1) padding: torch pads symmetrically before the
            # stride-2 conv, while flax SAME would pad (0,1) — off by one
            h = SpectralConv(
                dim_in, (3, 3), strides=(2, 2), groups=dim_in,
                padding=[(1, 1), (1, 1)], name="downconv"
            )(h, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        h = SpectralConv(self.dim_out, (3, 3), name="conv2")(h, update_stats=update_stats)
        # shortcut
        s = x
        if dim_in != self.dim_out:
            s = SpectralConv(self.dim_out, (1, 1), use_bias=False, name="conv1x1")(
                s, update_stats=update_stats
            )
        s = down(s)
        if h.shape != s.shape:  # stride-vs-pool off-by-one on odd sizes
            h = h[:, : s.shape[1], : s.shape[2]]
        return (s + h) / math.sqrt(2.0)


class MelStyleEncoder(nn.Module):
    """2D CNN over the mel 'image' -> 64-d style vector.

    Input mel is channels-last [B, frames, n_mels]; internally treated as a
    [B, n_mels, frames, 1] image to mirror the reference orientation."""

    style_dim: int = 64
    dim_in: int = 48
    max_conv_dim: int = 384
    skip_last_downsample: bool = True

    @nn.compact
    def __call__(self, mel: jax.Array, *, update_stats: bool = False) -> jax.Array:
        x = jnp.swapaxes(mel, 1, 2)[..., None]  # [B, n_mels, T, 1]
        x = SpectralConv(self.dim_in, (3, 3), name="conv_in")(
            x, update_stats=update_stats
        )
        dim_in = self.dim_in
        for i in range(4):
            dim_out = min(dim_in * 2, self.max_conv_dim)
            downsample = not (i == 3 and self.skip_last_downsample)
            x = _ResBlk2d(dim_out, downsample=downsample, name=f"res_{i}")(
                x, update_stats=update_stats
            )
            dim_in = dim_out
        x = nn.leaky_relu(x, 0.2)
        # guard: the reference assumes >=5x5 spatial after downsampling
        # (true for all real buckets, >=60 frames); edge-pad tiny inputs so
        # the VALID conv never produces an empty tensor.
        pad_h = max(0, 5 - x.shape[1])
        pad_w = max(0, 5 - x.shape[2])
        if pad_h or pad_w:
            x = jnp.pad(
                x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge"
            )
        x = SpectralConv(dim_in, (5, 5), padding="VALID", name="conv_out")(
            x, update_stats=update_stats
        )
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(self.style_dim, name="unshared")(x)
