"""Prosody encoder: transformer over [text-encoding ⊕ broadcast style] with
AdaLN conditioning (train/models/prosody_encoder.py:10-81).

Each layer re-concatenates the style after a projection back to d_model, so
the style vector is re-injected at every depth."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import AdaptiveLayerNorm, sequence_mask
from .text_encoder import ConvFFN, MultiHeadAttention


class ProsodyEncoder(nn.Module):
    style_dim: int
    d_model: int
    n_layers: int
    dropout: float = 0.1
    n_heads: int = 2
    kernel_size: int = 1

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, d_model]
        style: jax.Array,  # [B, S]
        lengths: jax.Array,
        *,
        train: bool = False,
    ) -> jax.Array:
        t = x.shape[1]
        hidden = self.d_model + self.style_dim
        mask = sequence_mask(lengths, t).astype(x.dtype)[..., None]
        valid = mask[:, None, :, 0] > 0
        attn_mask = valid[:, :, None, :] & valid[:, :, :, None]
        style_seq = jnp.broadcast_to(
            style[:, None, :], (x.shape[0], t, self.style_dim)
        )
        drop = nn.Dropout(self.dropout, deterministic=not train)
        x = jnp.concatenate([x, style_seq], axis=-1)
        for i in range(self.n_layers):
            x = x * mask
            y = MultiHeadAttention(
                hidden, hidden, self.n_heads, self.dropout, name=f"attn_{i}"
            )(x, x, attn_mask, train=train)
            x = AdaptiveLayerNorm(name=f"norm1_{i}")(x + drop(y), style)
            y = ConvFFN(
                hidden, hidden * 2, self.kernel_size, self.dropout,
                name=f"ffn_{i}",
            )(x, mask, train=train)
            x = AdaptiveLayerNorm(name=f"norm2_{i}")(x + drop(y), style)
            x = nn.Conv(self.d_model, (1,), name=f"proj_{i}")(x)
            x = jnp.concatenate([x, style_seq], axis=-1)
        return x * mask  # [B, T, d_model + style_dim]
