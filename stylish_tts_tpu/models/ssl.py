"""Frozen SSL feature extractors for the experimental hubert/CFM stages.

The reference pulls pretrained torch checkpoints at runtime — HuBERT
`dr87/spinv2_rvc` (train/models/ssl.py:16-31) and a wespeaker x-vector
model (:34-67) — which an air-gapped TPU pod cannot fetch.  We re-provide
the capability as JAX modules of the same shape: a HuBERT-base feature
encoder (conv waveform encoder + transformer, final_proj head) whose
weights can be loaded from a converted checkpoint on disk, and an ECAPA-like
speaker embedder over fbank features.  At random init they still exercise
the full hubert-stage training path end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.mel import MelSpectrogram
from ..ops.resample import resample
from .slm import SLMFeatureExtractor


class AdaptiveHubert(nn.Module):
    """Waveform -> HuBERT features nearest-interpolated to `time_dim`
    (reference ssl.py:16-31).  Output [B, time_dim, hidden_dim]."""

    model_sr: int = 24000
    hubert_sr: int = 16000
    hidden_dim: int = 768
    proj_dim: int = 256
    n_layers: int = 6

    @nn.compact
    def __call__(self, wave: jax.Array, time_dim: int) -> jax.Array:
        wave16 = resample(wave, self.model_sr, self.hubert_sr)
        states = SLMFeatureExtractor(
            hidden_dim=self.hidden_dim, n_layers=self.n_layers,
            rel_pos_bias=False,  # HuBERT-base = plain wav2vec2 attention
            name="encoder",
        )(wave16)
        x = states[-1]  # [B, frames, hidden]
        x = nn.Dense(self.proj_dim, name="final_proj")(x)
        # nearest interpolation to the mel frame count
        src = x.shape[1]
        idx = jnp.clip(
            (jnp.arange(time_dim) * src) // time_dim, 0, src - 1
        )
        return x[:, idx]


class SpeakerEmbeddingModel(nn.Module):
    """Utterance-level speaker embedding from a 4-second fbank crop
    (reference ssl.py:34-67; wespeaker 'vblinkp' with the bottleneck
    removed → a wide pre-bottleneck embedding)."""

    model_sr: int = 24000
    embed_sr: int = 16000
    n_mels: int = 80
    hidden_dim: int = 10240
    max_half_seconds: float = 2.0

    @nn.compact
    def __call__(self, wave: jax.Array) -> jax.Array:
        wave16 = resample(wave, self.model_sr, self.embed_sr)
        max_len = int(2 * self.max_half_seconds * self.embed_sr)
        wave16 = wave16[:, :max_len]
        fbank = MelSpectrogram(
            n_mels=self.n_mels, n_fft=512, win_length=400, hop_length=160,
            sample_rate=self.embed_sr,
        )(wave16)
        x = jnp.log(fbank + 1e-6)
        x = x - jnp.mean(x, axis=1, keepdims=True)  # cepstral mean norm
        # TDNN stack over frames
        for i, (c, k, d) in enumerate(
            [(512, 5, 1), (512, 3, 2), (512, 3, 3), (512, 1, 1)]
        ):
            pad = (k * d - d) // 2
            x = nn.Conv(
                c, (k,), kernel_dilation=(d,), padding=[(pad, pad)],
                name=f"tdnn_{i}",
            )(x)
            x = nn.relu(x)
        # stats pooling -> wide embedding
        mean = jnp.mean(x, axis=1)
        std = jnp.sqrt(jnp.var(x, axis=1) + 1e-6)
        pooled = jnp.concatenate([mean, std], axis=-1)
        return nn.Dense(self.hidden_dim, name="embed")(pooled)
