"""Griffin-Lim mel inversion — the documented substitute for the
pretrained Vocos decoder the reference uses to audition CFM-predicted mels
during validation (reference train/train_context.py:179-183,
train/stage_type.py:747-749; Vocos weights are an external download, so
the framework ships a weight-free decoder and `models/vocos.py`-style
checkpoints can replace it when available).

Pure XLA: mel -> linear power spectrum via the filterbank pseudo-inverse,
then a fixed-iteration Griffin-Lim loop over the framework's matmul
STFT/iSTFT (everything stays on the MXU; lax.fori_loop keeps one trace).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank
from .stft import istft, stft


@functools.lru_cache(maxsize=4)
def _pinv_fbank(sample_rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    fbank = mel_filterbank(
        n_freqs=n_fft // 2 + 1, n_mels=n_mels, sample_rate=sample_rate
    )  # [freq, mels]
    return np.linalg.pinv(fbank).astype(np.float32)  # [mels, freq]


def mel_to_audio(
    norm_log_mel: jax.Array,
    *,
    sample_rate: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    mean: float,
    std: float,
    n_iter: int = 32,
    rng: jax.Array | None = None,
    power: float = 2.0,
) -> jax.Array:
    """Normalised log-mel [B, T, n_mels] -> waveform [B, T*hop] via
    Griffin-Lim.  power=2.0 is the calculate_mel convention
    (log(1e-5 + power-mel)); power=1.0 is the Vocos feature convention
    (log magnitude-mel, models/vocos.py:vocos_mel)."""
    n_mels = norm_log_mel.shape[-1]
    eps = 1e-5 if power == 2.0 else 0.0
    lin_mel = jnp.exp(norm_log_mel * std + mean) - eps
    pinv = jnp.asarray(_pinv_fbank(sample_rate, n_fft, n_mels))
    lin_spec = jnp.maximum(
        jnp.einsum("btm,mf->btf", lin_mel, pinv), 0.0
    )
    magnitude = jnp.sqrt(lin_spec) if power == 2.0 else lin_spec

    length = norm_log_mel.shape[1] * hop_length
    if rng is None:
        rng = jax.random.PRNGKey(0)
    phase = jax.random.uniform(
        rng, magnitude.shape, minval=-np.pi, maxval=np.pi
    )
    spec_kw = dict(n_fft=n_fft, hop_length=hop_length, win_length=win_length)

    def body(_, angles):
        cos, sin = jnp.cos(angles), jnp.sin(angles)
        wave = istft(
            magnitude * cos, magnitude * sin, length=length, **spec_kw
        )
        re, im = stft(wave, **spec_kw)
        re, im = re[:, : magnitude.shape[1]], im[:, : magnitude.shape[1]]
        return jnp.arctan2(im, re + 1e-12)

    angles = jax.lax.fori_loop(0, n_iter, body, phase)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    return istft(magnitude * cos, magnitude * sin, length=length, **spec_kw)
