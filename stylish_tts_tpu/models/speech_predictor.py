"""SpeechPredictor: the acoustic model composing text encoder, style
encoder, decoder, flow prior/posterior and the freegan generator
(train/models/speech_predictor.py:14-129).

Frame bookkeeping: the alignment arrives at mel frame rate (hop 300) and is
upsampled ×4 to the generator rate (hop 75); pitch/energy are linearly
upsampled ×4 the same way.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .decoder import Decoder
from .flow import PosteriorEncoder, PriorEncoder, ResidualCouplingBlock
from .generator import DecoderPrediction, Generator
from .style_encoders import TextStyleEncoder
from .text_encoder import TextEncoder


def upsample_x4_linear(x: jax.Array) -> jax.Array:
    """[B, F] -> [B, 4F] linear interpolation matching
    torch.nn.Upsample(scale_factor=4, mode='linear', align_corners=False)."""
    b, f = x.shape
    # output position i maps to input coordinate (i + 0.5)/4 - 0.5
    pos = (jnp.arange(4 * f, dtype=jnp.float32) + 0.5) / 4.0 - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, f - 1)
    hi = jnp.clip(lo + 1, 0, f - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0).astype(x.dtype)
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


class SpeechPredictor(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,        # [B, T]
        text_lengths: jax.Array,  # [B]
        alignment: jax.Array,     # [B, T, F_mel]
        pitch: jax.Array,         # [B, F_mel]
        energy: jax.Array,        # [B, F_mel]
        audio_gt: Optional[jax.Array] = None,  # [B, T_samples] for training
        *,
        train: bool = False,
        sample: bool = True,
    ) -> DecoderPrediction:
        mc = self.config
        tc = mc.text_encoder
        text_encoding, _, _ = TextEncoder(
            n_tokens=tc.tokens,
            hidden_dim=tc.hidden_dim,
            filter_channels=tc.filter_channels,
            n_heads=tc.heads,
            n_layers=tc.layers,
            kernel_size=tc.kernel_size,
            dropout=tc.dropout,
            inter_dim=mc.inter_dim,
            name="text_encoder",
        )(tokens, text_lengths, train=train)
        style = TextStyleEncoder(
            style_dim=mc.style_dim,
            n_layers=mc.style_encoder.layers,
            name="style_encoder",
        )(text_encoding, text_lengths)

        # freegan runs at 4x the mel frame rate (hop 75); the ringformer
        # head upsamples x(4,5) itself with a hop-15 iSTFT (4*5*15 = 300),
        # so it consumes mel-rate frames directly.
        use_x4 = mc.generator.type == "freegan"
        if use_x4:
            alignment4 = jnp.repeat(alignment, 4, axis=2)
            pitch4 = upsample_x4_linear(pitch)
            energy4 = upsample_x4_linear(energy)
        else:
            alignment4, pitch4, energy4 = alignment, pitch, energy

        asr = jnp.einsum(
            "btc,btf->bfc", text_encoding, alignment4,
            preferred_element_type=jnp.float32,
        ).astype(text_encoding.dtype)
        x = Decoder(
            hidden_dim=mc.decoder.hidden_dim,
            residual_dim=mc.decoder.residual_dim,
            name="decoder",
        )(asr, pitch4, energy4, style, train=train)

        flow_dim = mc.decoder.hidden_dim // 4
        z_text, mean_text, logstd_text = PriorEncoder(
            flow_dim, name="prior_encoder"
        )(x, sample=sample)
        flow = ResidualCouplingBlock(
            flow_dim,
            flow_dim,
            kernel_size=5,
            n_layers=4,
            n_flows=8,
            cond_channels=mc.style_dim,
            remat=mc.remat_flow,
            name="flow",
        )
        z_text2mel, mean_text2mel, logstd_text2mel = flow(
            z_text, mean_text, logstd_text, cond=style, reverse=True,
            train=train,
        )

        if audio_gt is not None:
            z_mel, mean_mel, logstd_mel = PosteriorEncoder(
                flow_dim,
                flow_dim,
                n_fft=mc.n_fft,
                win_length=mc.win_length,
                hop_length=mc.hop_length // 4 if use_x4 else mc.hop_length,
                n_layers=12,
                cond_channels=mc.style_dim,
                remat=mc.remat_flow,
                name="posterior_encoder",
            )(audio_gt, cond=style, sample=sample, train=train)
            z_mel2text, mean_mel2text, logstd_mel2text = flow(
                z_mel, mean_mel, logstd_mel, cond=style, reverse=False,
                train=train,
            )
            mel = nn.Dense(mc.decoder.hidden_dim, name="post_flow")(z_mel)
        else:
            mel = nn.Dense(mc.decoder.hidden_dim, name="post_flow")(z_text2mel)

        if use_x4:
            prediction = Generator(mc, name="generator")(
                mel, style, pitch4, energy4, train=train
            )
        else:
            from .ringformer import UpsampleGenerator

            prediction = UpsampleGenerator(mc, name="generator")(
                mel, style, pitch4, energy4, train=train
            )
        if audio_gt is not None:
            prediction.text_stats = (z_text, mean_text, logstd_text)
            prediction.text2mel_stats = (
                z_text2mel, mean_text2mel, logstd_text2mel,
            )
            prediction.mel_stats = (z_mel, mean_mel, logstd_mel)
            prediction.mel2text_stats = (
                z_mel2text, mean_mel2text, logstd_mel2text,
            )
        return prediction
