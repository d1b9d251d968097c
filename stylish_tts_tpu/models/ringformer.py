"""Legacy 'ringformer' generator head: HiFiGAN-style transposed-conv
upsampling with Snake activations, per-scale conformers, and a harmonic
NSF source, ending in a small iSTFT head.

Parity target: UpsampleGenerator (train/models/generator.py:65-244),
config-selectable via `generator: type: ringformer` (model.yml comment
block, config_loader.py:220-244).  Note the reference's own copy is
non-functional — it references an undefined ``SourceModuleHnNSF``
(generator.py:86) — so this implementation restores the standard
HiFiGAN-NSF harmonic source it descends from (sine harmonics + tanh
linear merge) to make the capability real.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig, RingformerGeneratorConfig
from ..ops.stft import STFTHead
from .conformer import Conformer
from .generator import DecoderPrediction
from .norms import AdaptiveGeneratorBlock, snake


class SourceModuleHnNSF(nn.Module):
    """Harmonic-plus-noise source: sine harmonics where voiced, noise
    elsewhere, merged by a tanh linear layer (standard NSF formulation)."""

    sample_rate: int
    harmonic_num: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 10.0

    @nn.compact
    def __call__(self, f0_upsampled: jax.Array) -> jax.Array:
        """[B, T] sample-rate F0 -> [B, T, 1] source signal."""
        b, t = f0_upsampled.shape
        rng = self.make_rng("sample")
        k_phase, k_noise = jax.random.split(rng)
        harmonics = jnp.arange(1, self.harmonic_num + 2, dtype=jnp.float32)
        rad = jnp.cumsum(f0_upsampled / self.sample_rate, axis=1)
        rad = rad[:, :, None] * harmonics[None, None, :]
        rad = rad + jax.random.uniform(
            k_phase, (b, 1, self.harmonic_num + 1)
        )
        sines = self.sine_amp * jnp.sin(2.0 * jnp.pi * rad)
        voiced = (f0_upsampled > self.voiced_threshold)[..., None]
        noise = self.noise_std * jax.random.normal(k_noise, sines.shape)
        source = jnp.where(voiced, sines, 0.0) + jnp.where(
            voiced, noise, self.sine_amp / 3.0 * jax.random.normal(
                jax.random.fold_in(k_noise, 1), sines.shape
            )
        )
        merged = jnp.tanh(nn.Dense(1, name="merge")(source))
        return merged  # [B, T, 1]


def upsample_linear(x: jax.Array, factor: int) -> jax.Array:
    """[B, T] -> [B, T*factor] linear interpolation (align_corners=False)."""
    b, t = x.shape
    pos = (jnp.arange(factor * t, dtype=jnp.float32) + 0.5) / factor - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0)
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


class UpsampleGenerator(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        mel: jax.Array,     # [B, F, input_dim]
        style: jax.Array,   # [B, S]
        pitch: jax.Array,   # [B, F] frame-rate F0
        energy: jax.Array,  # unused (parity)
        *,
        train: bool = False,
    ) -> DecoderPrediction:
        mc = self.config
        gc: RingformerGeneratorConfig = mc.generator
        rates = gc.upsample_rates
        kernels = gc.upsample_kernel_sizes
        n_fft = gc.gen_istft_n_fft
        hop = gc.gen_istft_hop_size
        stft_head = STFTHead(n_fft, hop, n_fft)

        total_up = math.prod(rates) * hop
        f0_up = upsample_linear(jax.lax.stop_gradient(pitch), total_up)
        source = SourceModuleHnNSF(
            sample_rate=mc.sample_rate, name="m_source"
        )(f0_up)
        har_mag, har_cos, har_sin = stft_head.transform(source[..., 0])
        har_phase = jnp.arctan2(har_sin, har_cos)
        har = jnp.concatenate([har_mag, har_phase], axis=-1)  # [B, T', F+2ish]

        x = mel
        channels = gc.upsample_initial_channel
        for i, (rate, kernel) in enumerate(zip(rates, kernels)):
            alpha = self.param(
                f"alpha_{i}", nn.initializers.ones, (1, 1, x.shape[-1])
            )
            x = snake(x, alpha)
            x = Conformer(
                dim=x.shape[-1], depth=gc.depth, name=f"conformer_{i}",
            )(x, style, train=train)
            out_ch = channels // (2 ** (i + 1))
            # SAME gives out = in*rate exactly, matching the torch
            # HiFiGAN ConvTranspose1d(p=(k-u)//2) length; flax's explicit
            # [(lo,hi)] transpose padding follows a different formula and
            # silently shortens the signal
            x = nn.ConvTranspose(
                out_ch,
                (kernel,),
                strides=(rate,),
                padding="SAME",
                name=f"up_{i}",
            )(x)
            # harmonic source injection at this scale
            if i + 1 < len(rates):
                stride_f0 = math.prod(rates[i + 1:])
                k = stride_f0 * 2
                pad = (stride_f0 + 1) // 2
                x_source = nn.Conv(
                    out_ch, (k,), strides=(stride_f0,),
                    padding=[(pad, pad)], name=f"noise_conv_{i}",
                )(har)
                res_kernel = 7
            else:
                x_source = nn.Conv(
                    out_ch, (1,), name=f"noise_conv_{i}",
                )(har)
                res_kernel = 11
            x_source = AdaptiveGeneratorBlock(
                out_ch, kernel_size=res_kernel, name=f"noise_res_{i}",
            )(x_source[:, : x.shape[1]], style)
            if x_source.shape[1] < x.shape[1]:
                x_source = jnp.pad(
                    x_source,
                    ((0, 0), (0, x.shape[1] - x_source.shape[1]), (0, 0)),
                )
            x = x + x_source
            # multi-kernel residual stack, averaged
            xs = 0.0
            for j, (rk, rd) in enumerate(
                zip(gc.resblock_kernel_sizes, gc.resblock_dilation_sizes)
            ):
                xs = xs + AdaptiveGeneratorBlock(
                    out_ch, kernel_size=rk, dilation=tuple(rd),
                    name=f"resblock_{i}_{j}",
                )(x, style)
            x = xs / len(gc.resblock_kernel_sizes)

        alpha_post = self.param(
            "alpha_post", nn.initializers.ones, (1, 1, x.shape[-1])
        )
        x = snake(x, alpha_post)
        x = nn.Conv(n_fft + 2, (7,), padding="SAME", name="conv_post")(x)
        logamp = x[..., : n_fft // 2 + 1]
        phase = x[..., n_fft // 2 + 1:]
        # replicate-pad one trailing frame (freegan convention,
        # generator.py:425-426): the F+1-frame iSTFT yields exactly
        # F*hop samples, keeping audio aligned with the mel grid
        logamp = jnp.concatenate([logamp, logamp[:, -1:]], axis=1)
        phase = jnp.concatenate([phase, phase[:, -1:]], axis=1)
        audio = stft_head.inverse(
            jnp.exp(logamp), jnp.cos(phase), jnp.sin(phase)
        )
        return DecoderPrediction(audio=audio, magnitude=logamp, phase=phase)
