"""build_models: construct the named module zoo from a ModelConfig.

Mirrors the reference build_model (train/models/models.py:27-103).  Modules
are returned as flax module definitions; parameters are initialised by the
training runtime per stage (only the modules a stage needs).
"""

from __future__ import annotations

from typing import Dict

from flax import linen as nn

from ..config import ModelConfig
from .cfm_mel_decoder import CfmMelDecoder
from .cfm_pitch_predictor import CfmPitchPredictor
from .discriminator import MultiPeriodDiscriminator, MultiResolutionDiscriminator
from .duration_predictor import DurationPredictor
from .hubert_encoder import HubertEncoder
from .hubert_speech_predictor import (
    HubertPitchEnergyPredictor,
    HubertSpeechPredictor,
)
from .pitch_energy_predictor import PitchEnergyPredictor
from .speech_predictor import SpeechPredictor
from .style_encoders import MelStyleEncoder, TextStyleEncoder
from .text_aligner import TextAligner
from .text_encoder import TextEncoder


def build_models(model_config: ModelConfig) -> Dict[str, nn.Module]:
    mc = model_config
    tc = mc.text_encoder
    text_encoder_kwargs = dict(
        n_tokens=tc.tokens,
        hidden_dim=tc.hidden_dim,
        filter_channels=tc.filter_channels,
        n_heads=tc.heads,
        n_layers=tc.layers,
        kernel_size=tc.kernel_size,
        dropout=tc.dropout,
        inter_dim=mc.inter_dim,
    )
    # the pitch/energy branch runs at its own width (256), reference
    # models.py:49-58
    pe_text_encoder_kwargs = dict(
        text_encoder_kwargs, inter_dim=mc.pitch_energy_predictor.inter_dim
    )
    return {
        "text_aligner": TextAligner(
            n_mels=80,  # alignment runs on an 80-mel frontend (train_context.py:159-165)
            n_tokens=tc.tokens,
            hidden_dim=mc.text_aligner.hidden_dim,
        ),
        "duration_predictor": DurationPredictor(mc),
        "pitch_energy_predictor": PitchEnergyPredictor(mc),
        "speech_predictor": SpeechPredictor(mc),
        "pe_text_encoder": TextEncoder(**pe_text_encoder_kwargs),
        "pe_text_style_encoder": TextStyleEncoder(
            style_dim=mc.style_dim, n_layers=mc.style_encoder.layers
        ),
        "pe_mel_style_encoder": MelStyleEncoder(
            style_dim=mc.style_dim,
            dim_in=mc.n_mels,  # reference models.py:58-63 passes n_mels
            max_conv_dim=mc.mel_style_encoder.max_channels,
            skip_last_downsample=mc.mel_style_encoder.skip_downsample,
        ),
        "mrd": MultiResolutionDiscriminator(
            resolution_count=3, pallas=mc.mrd_pallas
        ),
        "mpd": MultiPeriodDiscriminator(),
        "hubert_encoder": HubertEncoder(mc),
        "cfm_mel_decoder": CfmMelDecoder(
            # "vocos" feature space = 100-bin hop-256 (models/vocos.py);
            # the reference leaves this inconsistent (decoder built at
            # n_mels=80, fed 100-bin vocos mels, stage_type.py:707)
            feat_dim=100 if mc.cfm_mel_features == "vocos" else mc.n_mels,
            asr_dim=mc.hubert.hidden_dim,
            spk_dim=mc.speaker_embedder.hidden_dim,
            hidden_dim=mc.decoder.hidden_dim,
        ),
        "cfm_pitch_predictor": CfmPitchPredictor(
            asr_dim=mc.hubert.hidden_dim, n_mels=mc.n_mels
        ),
        "hubert_speech_predictor": HubertSpeechPredictor(mc),
        "hubert_pitch_energy_predictor": HubertPitchEnergyPredictor(mc),
    }
