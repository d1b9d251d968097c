"""Mel filterbanks and log-mel frontend.

Replaces torchaudio.transforms.MelSpectrogram / MelScale used by the
reference (train/train_context.py:151-165, train/multi_spectrogram.py:33-38)
with the same HTK-scale, unnormalised filterbank so mel outputs are
numerically interchangeable.  The filterbank application is a matmul over
the frequency axis — MXU work fused into the STFT epilogue by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import stft


def _hz_to_mel(freq: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels], HTK scale, no norm
    (torchaudio.functional.melscale_fbanks defaults)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(mel_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


class MelSpectrogram:
    """torchaudio-compatible mel spectrogram (power=2, center, reflect pad).

    Output is channels-last ``[B, frames, n_mels]``."""

    def __init__(
        self,
        *,
        n_mels: int,
        n_fft: int,
        win_length: int,
        hop_length: int,
        sample_rate: int,
        power: float = 2.0,
    ):
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.sample_rate = sample_rate
        self.power = power
        self.fbank = jnp.asarray(
            mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate)
        )

    def __call__(self, audio: jax.Array) -> jax.Array:
        real, imag = stft(
            audio,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
        )
        power_spec = real * real + imag * imag
        if self.power != 2.0:
            power_spec = jnp.power(jnp.sqrt(power_spec), self.power)
        return jnp.einsum(
            "btf,fm->btm", power_spec, self.fbank,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def calculate_mel(
    audio: jax.Array, to_mel: MelSpectrogram, mean: float, std: float
):
    """Normalised log-mel, trimmed to an even frame count; mirrors the
    reference calculate_mel (train/stage_type.py:1023-1032).

    Returns (mel [B, frames, n_mels], mel_length [B])."""
    mel = to_mel(audio)
    mel = (jnp.log(1e-5 + mel) - mean) / std
    frames = mel.shape[1] - mel.shape[1] % 2
    mel = mel[:, :frames]
    mel_length = jnp.full((audio.shape[0],), frames, dtype=jnp.int32)
    return mel, mel_length


def log_norm_energy(mel: jax.Array, mean: float, std: float) -> jax.Array:
    """Frame energy from normalised log-mel: (exp(x*std+mean)^0.33).sum(freq)
    — reference log_norm (train/utils.py:71-77).  mel is [B, T, n_mels]."""
    return jnp.power(jnp.exp(mel * std + mean), 0.33).sum(axis=-1)
