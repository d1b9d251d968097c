"""GAN discriminators.

* MultiResolutionDiscriminator ('mrd'): stacks of 2D convs over the raw
  |FFT| images of the 3 multi-spectrogram resolutions — the only
  discriminator used by registered stages (train/models/discriminator.py:31-120,
  README.md:277).
* MultiPeriodDiscriminator ('mpd'): HiFiGAN period discriminators, built for
  parity but unused by the default stages (discriminator.py:102-248).

Inputs are channels-last: spec images [B, frames, freq, 1]; waveforms [B, T].
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1


class SpecDiscriminator(nn.Module):
    """5 weight-normed 2D convs (freq-strided) + 1-channel head; returns
    (flattened score, feature maps)."""

    @nn.compact
    def __call__(self, y: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        fmap = []
        specs = [
            ((3, 9), (1, 1)),
            ((3, 9), (1, 2)),
            ((3, 9), (1, 2)),
            ((3, 9), (1, 2)),
            ((3, 3), (1, 1)),
        ]
        for i, (k, s) in enumerate(specs):
            # explicit torch-style symmetric padding: SAME would pad (3,4)
            # on the stride-2 axis for even widths, shifting the sampling
            # grid off the reference's (4,4) (discriminator.py:41-54)
            pad = ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))
            y = nn.WeightNorm(
                nn.Conv(32, k, strides=s, padding=pad, name=f"conv_{i}")
            )(y)
            y = nn.leaky_relu(y, LRELU_SLOPE)
            fmap.append(y)
        y = nn.WeightNorm(
            nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="out")
        )(y)
        fmap.append(y)
        return y.reshape(y.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    """One SpecDiscriminator per spectrogram resolution."""

    resolution_count: int = 3

    @nn.compact
    def __call__(
        self,
        target_list: Sequence[jax.Array],
        pred_list: Sequence[jax.Array],
    ):
        real_scores, gen_scores, real_feats, gen_feats = [], [], [], []
        for i in range(self.resolution_count):
            disc = SpecDiscriminator(name=f"disc_{i}")
            score_r, fmap_r = disc(target_list[i])
            score_g, fmap_g = disc(pred_list[i])
            real_scores.append(score_r)
            gen_scores.append(score_g)
            real_feats.append(fmap_r)
            gen_feats.append(fmap_g)
        return real_scores, gen_scores, real_feats, gen_feats


class PeriodDiscriminator(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        b, t = x.shape
        pad = (self.period - t % self.period) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        t = x.shape[1]
        y = x.reshape(b, t // self.period, self.period, 1)
        fmap = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            y = nn.WeightNorm(
                nn.Conv(
                    ch,
                    (self.kernel_size, 1),
                    strides=(self.stride, 1),
                    padding=((self.kernel_size // 2, self.kernel_size // 2), (0, 0)),
                    name=f"conv_{i}",
                )
            )(y)
            y = nn.leaky_relu(y, LRELU_SLOPE)
            if i > 0:  # reference skips the first conv's feature map
                fmap.append(y)
        y = nn.WeightNorm(
            nn.Conv(1024, (self.kernel_size, 1), padding="SAME", name="conv_4")
        )(y)
        y = nn.leaky_relu(y, LRELU_SLOPE)
        fmap.append(y)
        y = nn.WeightNorm(nn.Conv(1, (3, 1), padding="SAME", name="out"))(y)
        fmap.append(y)
        return y.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, target: jax.Array, pred: jax.Array):
        real_scores, gen_scores, real_feats, gen_feats = [], [], [], []
        for p in self.periods:
            disc = PeriodDiscriminator(p, name=f"period_{p}")
            score_r, fmap_r = disc(target)
            score_g, fmap_g = disc(pred)
            real_scores.append(score_r)
            gen_scores.append(score_g)
            real_feats.append(fmap_r)
            gen_feats.append(fmap_g)
        return real_scores, gen_scores, real_feats, gen_feats
