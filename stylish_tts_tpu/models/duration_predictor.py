"""Duration predictor: own text encoder + text style encoder + prosody
encoder -> dropout -> linear over 16 duration classes
(train/models/duration_predictor.py:8-36).  Exported standalone as the
first of the two inference graphs."""

from __future__ import annotations

import jax
from flax import linen as nn

from ..config import ModelConfig
from .prosody_encoder import ProsodyEncoder
from .style_encoders import TextStyleEncoder
from .text_encoder import TextEncoder


class DurationPredictor(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self, tokens: jax.Array, lengths: jax.Array, *, train: bool = False
    ) -> jax.Array:
        mc = self.config
        tc = mc.text_encoder
        encoding, _, _ = TextEncoder(
            n_tokens=tc.tokens,
            hidden_dim=tc.hidden_dim,
            filter_channels=tc.filter_channels,
            n_heads=tc.heads,
            n_layers=tc.layers,
            kernel_size=tc.kernel_size,
            dropout=tc.dropout,
            inter_dim=mc.inter_dim,
            name="text_encoder",
        )(tokens, lengths, train=train)
        style = TextStyleEncoder(
            style_dim=mc.style_dim,
            n_layers=mc.style_encoder.layers,
            name="style_encoder",
        )(encoding, lengths)
        prosody = ProsodyEncoder(
            style_dim=mc.style_dim,
            d_model=mc.inter_dim,
            n_layers=mc.duration_predictor.n_layer,
            dropout=mc.duration_predictor.dropout,
            name="prosody_encoder",
        )(encoding, style, lengths, train=train)
        prosody = nn.Dropout(
            mc.duration_predictor.last_dropout, deterministic=not train
        )(prosody)
        return nn.Dense(
            mc.duration_predictor.duration_classes,
            kernel_init=nn.initializers.xavier_uniform(),
            name="duration_proj",
        )(prosody)  # [B, T, classes]
