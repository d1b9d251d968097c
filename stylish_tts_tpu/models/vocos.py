"""Vocos mel vocoder (charactr/vocos-mel-24khz) — frozen eval decoder.

The reference decodes CFM-validation mels with pretrained Vocos
(train/train_context.py:179-183, train/stage_type.py:747-749).  This is an
architecture-exact flax re-implementation so the published checkpoint
converts (models/torch_convert.py:convert_vocos + scripts/convert_vocos.py):

* feature extractor: 100-bin magnitude (power=1) log-mel at n_fft 1024 /
  hop 256 / 24 kHz — weight-free, so it is available even without the
  checkpoint;
* backbone: conv embed (k7) -> LayerNorm -> 8 ConvNeXt-v1 blocks
  (dim 512, intermediate 1536, LayerScale 1/8, *no* GRN — unlike the
  ConvNeXt-v2 blocks in models/convnext.py) -> final LayerNorm;
* head: Linear to n_fft+2, split into log-magnitude (exp, clip 1e2) and
  phase, then iSTFT (ops/stft.py, forced f32).

TPU notes: channels-last throughout; the iSTFT is the chunked overlap-add
matmul formulation of ops/stft.py, so decode is a stack of MXU GEMMs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.mel import MelSpectrogram
from ..ops.stft import istft
from .norms import Conv1d

VOCOS_SAMPLE_RATE = 24000
VOCOS_N_FFT = 1024
VOCOS_HOP = 256
VOCOS_N_MELS = 100


def vocos_mel(audio: jax.Array) -> jax.Array:
    """Vocos MelSpectrogramFeatures (vocos/feature_extractors.py): 100-bin
    magnitude (power=1) mel at n_fft 1024 / hop 256, safe_log clip 1e-7.
    Weight-free — usable as a CFM feature target without the checkpoint.
    Returns [B, frames, 100]."""
    to_mel = MelSpectrogram(
        n_mels=VOCOS_N_MELS,
        n_fft=VOCOS_N_FFT,
        win_length=VOCOS_N_FFT,
        hop_length=VOCOS_HOP,
        sample_rate=VOCOS_SAMPLE_RATE,
        power=1.0,
    )
    return jnp.log(jnp.clip(to_mel(audio), 1e-7, None))


class VocosConvNeXtBlock(nn.Module):
    """ConvNeXt-v1 block with LayerScale (vocos/modules.py ConvNeXtBlock):
    dwconv k7 -> LN -> Linear -> GELU -> Linear -> gamma* -> residual."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        x = Conv1d(self.dim, 7, groups=self.dim, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        return residual + gamma * x


class Vocos(nn.Module):
    """log-mel [B, T, n_mels] -> audio [B, (T-1)*hop] (vocos/pretrained.py
    decode path: backbone + ISTFTHead)."""

    n_mels: int = VOCOS_N_MELS
    dim: int = 512
    intermediate_dim: int = 1536
    n_layers: int = 8
    n_fft: int = VOCOS_N_FFT
    hop_length: int = VOCOS_HOP

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        x = Conv1d(self.dim, 7, name="embed")(mel)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        for i in range(self.n_layers):
            x = VocosConvNeXtBlock(
                self.dim,
                self.intermediate_dim,
                layer_scale_init=1.0 / self.n_layers,
                name=f"convnext_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)

        # ISTFTHead (vocos/heads.py): Linear -> (log-mag, phase) halves
        x = nn.Dense(self.n_fft + 2, name="out")(x)
        freq = self.n_fft // 2 + 1
        mag = jnp.clip(jnp.exp(x[..., :freq]), None, 1e2)
        phase = x[..., freq:]
        return istft(
            mag * jnp.cos(phase),
            mag * jnp.sin(phase),
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.n_fft,
        )
