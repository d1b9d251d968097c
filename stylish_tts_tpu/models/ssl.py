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
    """Utterance-level speaker embedding from a 4-second Kaldi-fbank crop
    (reference ssl.py:34-67; wespeaker 'vblinkp' = voxblink2 SimAM-ResNet34
    with the bottleneck removed → the 10240-d pre-bottleneck statistics
    vector).  Architecture-exact build in models/wespeaker.py so the
    published checkpoint converts (scripts/convert_wespeaker.py); at other
    `hidden_dim`s (tiny test configs) a random projection maps the natural
    output down — conversion requires hidden_dim == 2·512·(n_mels/8)."""

    model_sr: int = 24000
    embed_sr: int = 16000
    n_mels: int = 80
    hidden_dim: int = 10240
    max_half_seconds: float = 2.0
    m_channels: int = 64

    @nn.compact
    def __call__(self, wave: jax.Array) -> jax.Array:
        from ..ops.fbank import kaldi_fbank
        from .wespeaker import SimAMResNet34ASP

        wave16 = resample(wave, self.model_sr, self.embed_sr)
        max_len = int(2 * self.max_half_seconds * self.embed_sr)
        wave16 = wave16[:, :max_len]
        feats = kaldi_fbank(wave16, self.n_mels)
        emb = SimAMResNet34ASP(
            self.m_channels, self.n_mels, name="xvector"
        )(feats)
        if emb.shape[-1] != self.hidden_dim:
            emb = nn.Dense(self.hidden_dim, name="proj")(emb)
        return emb
