"""Three-resolution spectrogram bundle feeding the spectral losses and the
MRD discriminator (reference train/multi_spectrogram.py).

For each resolution we return:
  * ``mag``   — log1p of a 128-mel-scaled amplitude spectrogram [B, T, 128]
  * ``phase`` — phase thresholded to zero where |S| <= 1e-3     [B, T, F]
  * ``fft``   — raw amplitude |S| as a [B, F, T, 1] image for the 2D discs

Target-side quantities carry stop_gradient (reference computes them under
no_grad).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from .mel import mel_filterbank
from .stft import stft


@dataclass(frozen=True)
class Resolution:
    fft: int
    hop: int
    window: int


RESOLUTIONS = (
    Resolution(512, 50, 240),
    Resolution(1024, 120, 600),
    Resolution(2048, 240, 1200),
)

MULTI_SPECTROGRAM_COUNT = len(RESOLUTIONS)


class MultiSpectrogram:
    def __init__(self, sample_rate: int, resolutions=RESOLUTIONS):
        self.resolutions = resolutions
        self.fbanks = [
            jnp.asarray(mel_filterbank(r.fft // 2 + 1, 128, sample_rate))
            for r in resolutions
        ]

    def single(self, audio: jax.Array, index: int):
        r = self.resolutions[index]
        real, imag = stft(
            audio, n_fft=r.fft, hop_length=r.hop, win_length=r.window
        )
        fft_mag = jnp.sqrt(real * real + imag * imag + 1e-14)
        voiced = jax.lax.stop_gradient(fft_mag) > 1e-3
        # guard BOTH branches: arctan2's gradient at (~0, ~0) is inf, and
        # jnp.where still differentiates the masked branch (NaN * 0 = NaN)
        phase = jnp.where(
            voiced,
            jnp.arctan2(
                jnp.where(voiced, imag, 1.0), jnp.where(voiced, real, 1.0)
            ),
            0.0,
        )
        mag = jnp.log1p(
            jnp.einsum(
                "btf,fm->btm", fft_mag, self.fbanks[index],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        fft_img = jnp.swapaxes(fft_mag, 1, 2)[..., None]  # [B, F, T, 1]
        return mag, phase, fft_img

    def __call__(self, *, target: jax.Array, pred: jax.Array):
        t_mag, t_phase, t_fft = [], [], []
        p_mag, p_phase, p_fft = [], [], []
        for i in range(len(self.resolutions)):
            m, ph, f = self.single(target, i)
            t_mag.append(jax.lax.stop_gradient(m))
            t_phase.append(jax.lax.stop_gradient(ph))
            t_fft.append(jax.lax.stop_gradient(f))
            m, ph, f = self.single(pred, i)
            p_mag.append(m)
            p_phase.append(ph)
            p_fft.append(f)
        return t_mag, p_mag, t_phase, p_phase, t_fft, p_fft
