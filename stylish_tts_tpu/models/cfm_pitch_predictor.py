"""CFM pitch predictor: ConvNeXt regressor over SSL phone features,
conditioned on a MelStyleEncoder speaker vector
(reference train/models/cfm/cfm_pitch_predictor.py:12-53)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .convnext import StyleConvNeXtBlock
from .style_encoders import MelStyleEncoder
from .xut import mish


class CfmPitchPredictor(nn.Module):
    asr_dim: int = 256
    n_mels: int = 80
    hidden_dim: int = 256

    @nn.compact
    def __call__(
        self,
        asr: jax.Array,   # [B, T, asr_dim] SSL phone features
        mel: jax.Array,   # [B, T_mel, n_mels]
        *,
        train: bool = False,
    ) -> jax.Array:
        h = nn.Conv(self.hidden_dim * 4, (1,), name="asr_emb1")(asr)
        h = mish(h)
        h = nn.Conv(self.hidden_dim, (1,), name="asr_emb2")(h)
        spk = MelStyleEncoder(
            style_dim=self.hidden_dim,
            dim_in=self.n_mels,
            max_conv_dim=self.hidden_dim * 4,
            skip_last_downsample=True,
            name="spk_emb",
        )(mel)
        x = h
        for i in range(4):
            x = StyleConvNeXtBlock(
                self.hidden_dim, self.hidden_dim * 4, name=f"block_{i}"
            )(x, spk)
        return nn.Conv(1, (1,), name="out_proj")(x)[..., 0]  # [B, T]
