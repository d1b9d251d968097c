"""Kaldi-compatible log-mel filterbank features (torchaudio.compliance.kaldi
semantics) — the front-end wespeaker's speaker models consume
(reference train/models/ssl.py:57-62 calls model.compute_fbank, which is
kaldi.fbank(num_mel_bins=80, frame_length=25, frame_shift=10) + CMN).

Differences from ops/mel.py's torchaudio-style MelSpectrogram, all of which
change the numbers: snip-edges framing (no centre padding), per-frame DC
removal, 0.97 pre-emphasis, the Povey window (hann^0.85), zero-padding of
the 400-sample window to a 512-point FFT, and the Kaldi mel scale
(1127·ln(1+f/700), low cutoff 20 Hz).

TPU notes: framing is a reshape-free gather into [frames, 400]; the FFT is
the same MXU matmul-DFT used by ops/stft.py (512-point basis); everything
else is fused elementwise work.  torchaudio/kaldi are not in this image, so
tests validate tone placement, framing and CMN invariants
(tests/test_dataprep.py) rather than bitwise parity; when converting real
wespeaker weights, spot-check features against kaldi.fbank offline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FRAME_LEN = 400      # 25 ms @ 16 kHz
FRAME_SHIFT = 160    # 10 ms
PADDED = 512         # next power of two
PREEMPH = 0.97
EPS = 1.1920928955078125e-07  # torch.finfo(float32).eps — kaldi log floor


def _kaldi_mel(freq):
    return 1127.0 * np.log1p(np.asarray(freq, np.float64) / 700.0)


@functools.lru_cache(maxsize=4)
def kaldi_mel_banks(
    n_mels: int = 80,
    sample_rate: int = 16000,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """[n_fft_bins=PADDED//2, n_mels] triangular filters on the Kaldi mel
    scale (torchaudio.compliance.kaldi.get_mel_banks)."""
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    n_bins = PADDED // 2
    fft_bin_width = sample_rate / PADDED
    mel_low, mel_high = _kaldi_mel(low_freq), _kaldi_mel(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)
    bin_mels = _kaldi_mel(fft_bin_width * np.arange(n_bins))  # [n_bins]
    left = mel_low + np.arange(n_mels) * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    up = (bin_mels[:, None] - left[None, :]) / mel_delta
    down = (right[None, :] - bin_mels[:, None]) / mel_delta
    banks = np.maximum(0.0, np.minimum(up, down))
    return banks.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _povey_window() -> np.ndarray:
    n = np.arange(FRAME_LEN, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (FRAME_LEN - 1))
    return (hann ** 0.85).astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_basis() -> np.ndarray:
    """[PADDED, 2 * n_bins] real/imag DFT basis for the power spectrum."""
    n_bins = PADDED // 2 + 1
    k = np.arange(n_bins)
    n = np.arange(PADDED)
    ang = -2.0 * np.pi * np.outer(n, k) / PADDED
    return np.concatenate(
        [np.cos(ang), np.sin(ang)], axis=1
    ).astype(np.float32)  # [PADDED, 2*n_bins]


def kaldi_fbank(
    wave: jax.Array,          # [B, T] 16 kHz
    n_mels: int = 80,
    sample_rate: int = 16000,
    cmn: bool = True,
) -> jax.Array:
    """[B, frames, n_mels] Kaldi log-fbank (+ cepstral mean norm)."""
    b, t = wave.shape
    frames = 1 + (t - FRAME_LEN) // FRAME_SHIFT  # snip_edges
    idx = (
        jnp.arange(frames)[:, None] * FRAME_SHIFT
        + jnp.arange(FRAME_LEN)[None, :]
    )
    x = wave.astype(jnp.float32)[:, idx]              # [B, frames, 400]
    x = x - jnp.mean(x, axis=-1, keepdims=True)       # remove_dc_offset
    # pre-emphasis with the Kaldi edge rule (x[0] against itself)
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    x = x - PREEMPH * prev
    x = x * jnp.asarray(_povey_window())
    x = jnp.pad(x, ((0, 0), (0, 0), (0, PADDED - FRAME_LEN)))
    spec = jnp.einsum(
        "btn,nf->btf", x, jnp.asarray(_dft_basis()),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n_bins_full = PADDED // 2 + 1
    power = (
        spec[..., :n_bins_full] ** 2 + spec[..., n_bins_full:] ** 2
    )[..., : PADDED // 2]  # kaldi drops the nyquist bin for mel
    banks = jnp.asarray(kaldi_mel_banks(n_mels, sample_rate))
    mel = jnp.einsum(
        "btf,fm->btm", power, banks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    feats = jnp.log(jnp.maximum(mel, EPS))
    if cmn:
        feats = feats - jnp.mean(feats, axis=1, keepdims=True)
    return feats
