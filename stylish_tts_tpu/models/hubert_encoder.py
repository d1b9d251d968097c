"""HubertEncoder: projects frozen HuBERT features into the acoustic
inter_dim space through a RoPE transformer
(reference train/models/hubert_encoder.py:7-47)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .norms import sequence_mask
from .text_encoder import TransformerEncoder


class HubertEncoder(nn.Module):
    config: ModelConfig
    input_cond_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        phones: jax.Array,        # [B, T, hubert_dim]
        phone_lengths: jax.Array,
        cond: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        mc = self.config
        x = nn.Conv(mc.inter_dim, (1,), name="phone_emb")(phones)
        hidden = mc.inter_dim
        if self.input_cond_dim:
            c = nn.Dense(mc.style_dim, name="cond_proj")(cond)
            x = jnp.concatenate(
                [x, jnp.broadcast_to(c[:, None], (*x.shape[:2], mc.style_dim))],
                axis=-1,
            )
            hidden = mc.inter_dim + mc.style_dim
        tc = mc.text_encoder
        mask = sequence_mask(phone_lengths, x.shape[1]).astype(x.dtype)[..., None]
        x = TransformerEncoder(
            hidden, tc.filter_channels, tc.heads, tc.layers, tc.kernel_size,
            tc.dropout, name="encoder",
        )(x, mask, train=train)
        if hidden != mc.inter_dim:
            x = nn.Conv(mc.inter_dim, (1,), name="final_proj")(x)
        return x
