"""Hubert-driven acoustic model + pitch/energy predictor (experimental
`hubert_acoustic` stage).

Parity: HubertSpeechPredictor (train/models/speech_predictor.py:132-251)
and HubertPitchEnergyPredictor (train/models/pitch_energy_predictor.py:124-191):
SSL phone features replace the text encoder; the speaker embedding replaces
the text style vector; no alignment/cross-attention is needed because the
features are already frame-rate."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .decoder import Decoder
from .flow import PosteriorEncoder, PriorEncoder, ResidualCouplingBlock
from .generator import DecoderPrediction, Generator
from .hubert_encoder import HubertEncoder
from .norms import AdaptiveDecoderBlock
from .prosody_encoder import ProsodyEncoder
from .speech_predictor import upsample_x4_linear
from .xut import mish


class HubertSpeechPredictor(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        phones: jax.Array,         # [B, F_mel, inter_dim] SSL features
        phone_lengths: jax.Array,  # [B]
        spk_emb: jax.Array,        # [B, speaker_embedder.hidden_dim]
        pitch: jax.Array,          # [B, F_mel]
        energy: jax.Array,         # [B, F_mel]
        audio_gt: Optional[jax.Array] = None,
        *,
        train: bool = False,
        sample: bool = True,
    ) -> DecoderPrediction:
        mc = self.config
        # x4 to the freegan generator frame rate (reference repeats phones
        # x4); the ringformer head upsamples itself and takes mel rate
        use_x4 = mc.generator.type == "freegan"
        phones4 = jnp.repeat(phones, 4, axis=1) if use_x4 else phones
        phones4 = HubertEncoder(mc, name="phone_encoder")(
            phones4, phone_lengths * (4 if use_x4 else 1), train=train
        )
        s = nn.Dense(mc.style_dim * 4, name="style1")(spk_emb)
        s = mish(s)
        s = nn.Dropout(0.25, deterministic=not train)(s)
        s = nn.Dense(mc.style_dim * 2, name="style2")(s)
        s = mish(s)
        s = nn.Dropout(0.25, deterministic=not train)(s)
        style = nn.Dense(mc.style_dim, name="style3")(s)

        pitch4 = upsample_x4_linear(pitch) if use_x4 else pitch
        energy4 = upsample_x4_linear(energy) if use_x4 else energy
        x = Decoder(
            hidden_dim=mc.decoder.hidden_dim,
            residual_dim=mc.decoder.residual_dim,
            name="decoder",
        )(phones4, pitch4, energy4, style, train=train)

        flow_dim = mc.decoder.hidden_dim // 4
        z_text, mean_text, logstd_text = PriorEncoder(
            flow_dim, name="prior_encoder"
        )(x, sample=sample)
        flow = ResidualCouplingBlock(
            flow_dim, flow_dim, kernel_size=5, n_layers=4, n_flows=8,
            cond_channels=mc.style_dim, name="flow",
        )
        z_text2mel, mean_text2mel, logstd_text2mel = flow(
            z_text, mean_text, logstd_text, cond=style, reverse=True,
            train=train,
        )
        if audio_gt is not None:
            z_mel, mean_mel, logstd_mel = PosteriorEncoder(
                flow_dim, flow_dim, n_fft=mc.n_fft,
                win_length=mc.win_length,
                hop_length=mc.hop_length // 4 if use_x4 else mc.hop_length,
                n_layers=12, cond_channels=mc.style_dim,
                name="posterior_encoder",
            )(audio_gt, cond=style, sample=sample, train=train)
            z_mel2text, mean_mel2text, logstd_mel2text = flow(
                z_mel, mean_mel, logstd_mel, cond=style, reverse=False,
                train=train,
            )
            mel = nn.Dense(mc.decoder.hidden_dim, name="post_flow")(z_mel)
        else:
            mel = nn.Dense(mc.decoder.hidden_dim, name="post_flow")(z_text2mel)

        if mc.generator.type == "freegan":
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


class HubertPitchEnergyPredictor(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        phones: jax.Array,         # [B, F_mel, hubert_dim]
        phone_lengths: jax.Array,
        spk_emb: jax.Array,
        *,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        mc = self.config
        dropout = mc.pitch_energy_predictor.dropout
        channels = mc.inter_dim + mc.style_dim
        phones = nn.Conv(mc.inter_dim, (1,), name="phone_quant")(phones)
        style = nn.Dense(mc.style_dim, name="style_encoder")(spk_emb)
        x = ProsodyEncoder(
            style_dim=mc.style_dim, d_model=mc.inter_dim, n_layers=3,
            dropout=0.2, name="prosody_encoder",
        )(phones, style, phone_lengths, train=train)
        f0 = x
        for i in range(3):
            f0 = AdaptiveDecoderBlock(
                channels, dropout_rate=dropout, name=f"f0_block_{i}"
            )(f0, style, train=train)
        f0 = nn.Conv(1, (1,), name="f0_proj")(f0)[..., 0]
        energy = x
        for i in range(3):
            energy = AdaptiveDecoderBlock(
                channels, dropout_rate=dropout, name=f"energy_block_{i}"
            )(energy, style, train=train)
        energy = nn.Conv(1, (1,), name="energy_proj")(energy)[..., 0]
        return f0, energy
