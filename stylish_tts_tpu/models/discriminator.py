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


class _WNConvParams(nn.Module):
    """Declares the kernel/bias params of an ``nn.Conv`` scope without
    running the conv, so the Pallas path keeps the exact param tree of
    ``nn.WeightNorm(nn.Conv(...))`` (checkpoint/converter compatible)."""

    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        cout = self.kernel_shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (cout,))
        return kernel, bias


class _ScaleParam(nn.Module):
    """Declares WeightNorm's '<conv>/kernel/scale' param in its own scope
    (flax stores it path-flattened under WeightNorm_i)."""

    pname: str
    cout: int

    @nn.compact
    def __call__(self):
        return self.param(
            self.pname, nn.initializers.ones_init(), (self.cout,)
        )


class SpecDiscriminator(nn.Module):
    """5 weight-normed 2D convs (freq-strided) + 1-channel head; returns
    (flattened score, feature maps).

    ``pallas=True`` computes the four C=32 conv layers through the fused
    packed-frequency Pallas kernel (ops/spec_conv.py): the time axis is
    packed 4-rows-per-lane-vector, so those layers' feature maps come
    back PACKED ([B, T/4, F_i, 128] with zeroed padding phases) — the
    downstream uses (mean-|diff| feature matching, sum-abs) are
    layout-insensitive up to the <0.2% pad-row dilution of the mean.
    conv_0 (cin=1) and the cout=1 head have negligible FLOPs and stay on
    XLA.  Param trees are identical in both modes.
    """

    pallas: bool = False

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
        if not self.pallas:
            for i, (k, s) in enumerate(specs):
                # explicit torch-style symmetric padding: SAME would pad
                # (3,4) on the stride-2 axis for even widths, shifting the
                # sampling grid off the reference's (4,4)
                # (discriminator.py:41-54)
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

        from ..ops.spec_conv import (
            pack_freq, spec_conv2d_packed, unpack_freq,
        )

        # conv_0: cin=1, ~1/27th of the stack's FLOPs — XLA.  WeightNorm
        # scopes are named explicitly: flax's auto-numbering would count
        # only the two nn.WeightNorm instances on this path and collide
        # with the _ScaleParam scopes.
        k, s = specs[0]
        pad = ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))
        y = nn.WeightNorm(
            nn.Conv(32, k, strides=s, padding=pad, name="conv_0"),
            name="WeightNorm_0",
        )(y)
        y = nn.leaky_relu(y, LRELU_SLOPE)
        fmap.append(y)

        t_rows = y.shape[1]
        yq = pack_freq(y)
        for i, (k, s) in list(enumerate(specs))[1:]:
            kernel, bias = _WNConvParams(
                kernel_shape=(*k, 32, 32), name=f"conv_{i}",
            )()
            scale = _ScaleParam(
                pname=f"conv_{i}/kernel/scale", cout=32,
                name=f"WeightNorm_{i}",
            )()
            norm = jnp.sqrt(
                jnp.sum(kernel.astype(jnp.float32) ** 2, axis=(0, 1, 2),
                        keepdims=True) + 1e-12
            )
            wn = (kernel.astype(jnp.float32) / norm * scale).astype(
                kernel.dtype
            )
            if self.is_initializing():
                # params are declared explicitly above; skip the TPU
                # kernel during init (init runs host-side under
                # jax.default_device(cpu) — train/init.py:80-87 — where
                # non-interpret pallas cannot lower)
                tout = (yq.shape[2] + s[1] - 1) // s[1]
                yq = jnp.zeros(
                    (yq.shape[0], yq.shape[1], tout, yq.shape[3]),
                    yq.dtype,
                )
            else:
                yq = spec_conv2d_packed(
                    yq, wn, bias, t_rows, s[1], LRELU_SLOPE
                )
            fmap.append(yq)
        y = unpack_freq(yq, t_rows, 32)
        y = nn.WeightNorm(
            nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="out"),
            name="WeightNorm_5",
        )(y)
        fmap.append(y)
        return y.reshape(y.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    """One SpecDiscriminator per spectrogram resolution."""

    resolution_count: int = 3
    pallas: bool = False

    @nn.compact
    def __call__(
        self,
        target_list: Sequence[jax.Array],
        pred_list: Sequence[jax.Array],
    ):
        real_scores, gen_scores, real_feats, gen_feats = [], [], [], []
        for i in range(self.resolution_count):
            disc = SpecDiscriminator(pallas=self.pallas, name=f"disc_{i}")
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
