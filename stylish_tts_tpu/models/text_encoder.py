"""Phoneme transformer encoder with rotary attention.

Capability parity with the reference TextEncoder
(train/models/text_encoder.py:396-462, Matcha/Glow-TTS lineage): token
embedding ×√d, ConvReluNorm prenet, N transformer layers whose attention
applies RoPE to the first half of each head's dims, conv-FFNs, and a
projection to ``inter_dim``.

TPU notes: attention is a pair of batched MXU matmuls with an additive
-1e4 mask; all shapes static per text bucket.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import ChannelLayerNorm, Conv1d, sequence_mask


def apply_rope(x: jax.Array, rope_dims: int) -> jax.Array:
    """Rotate the first ``rope_dims`` feature dims of ``x`` [B, H, T, Dh].

    Uses the rotate-half convention of the reference RoPE module
    (text_encoder.py:89-168): features are split into two halves of
    rope_dims/2 and rotated as pairs (i, i + rope_dims/2)."""
    d = rope_dims
    half = d // 2
    x_rope, x_pass = x[..., :d], x[..., d:]
    t = x.shape[2]
    theta = 1.0 / (
        10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / d)
    )
    angles = jnp.arange(t, dtype=jnp.float32)[:, None] * theta[None, :]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [T, d]
    # tables computed in f32, applied in the activation dtype (keeps the
    # bf16 mixed-precision path from promoting q/k back to f32)
    cos = jnp.cos(angles)[None, None].astype(x.dtype)
    sin = jnp.sin(angles)[None, None].astype(x.dtype)
    neg_half = jnp.concatenate([-x_rope[..., half:], x_rope[..., :half]], -1)
    return jnp.concatenate([x_rope * cos + neg_half * sin, x_pass], axis=-1)


class MultiHeadAttention(nn.Module):
    """MHA with RoPE on half of each head's dims and additive masking
    (text_encoder.py:171-296)."""

    channels: int
    out_channels: int
    n_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        attn_mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        head_dim = self.channels // self.n_heads
        # rotate-half pairs dims (i, i+rope/2): rope span must be even
        rope_dims = head_dim // 2 // 2 * 2

        def split_heads(h):
            b, t, _ = h.shape
            return h.reshape(b, t, self.n_heads, head_dim).transpose(0, 2, 1, 3)

        q = split_heads(nn.Dense(self.channels, name="q")(x))
        k = split_heads(nn.Dense(self.channels, name="k")(context))
        v = split_heads(nn.Dense(self.channels, name="v")(context))
        q = apply_rope(q, rope_dims)
        k = apply_rope(k, rope_dims)

        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        if attn_mask is not None:
            scores = scores + jnp.where(attn_mask, 0.0, -1e4)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)  # f32 accumulation, activation-dtype result
        b, _, t, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return nn.Dense(self.out_channels, name="out")(out)


class ConvFFN(nn.Module):
    """conv k -> relu -> dropout -> conv k, masked (text_encoder.py:305-329)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, *, train: bool = False
    ) -> jax.Array:
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv1")(
            x * mask
        )
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Conv1d(self.out_channels, self.kernel_size, name="conv2")(x * mask)
        return x * mask


class TransformerEncoder(nn.Module):
    """Stack of (RoPE-MHA + conv-FFN) layers with channel LayerNorms
    (text_encoder.py:332-393).  Masks: mask [B, T, 1] float."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, *, train: bool = False
    ) -> jax.Array:
        attn_mask = (mask[:, None, :, 0] > 0)[:, :, None, :] & (
            mask[:, None, :, 0] > 0
        )[:, :, :, None]
        drop = nn.Dropout(self.dropout, deterministic=not train)
        for i in range(self.n_layers):
            x = x * mask
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                self.dropout,
                name=f"attn_{i}",
            )(x, x, attn_mask, train=train)
            x = ChannelLayerNorm(name=f"norm1_{i}")(x + drop(y))
            y = ConvFFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                self.dropout,
                name=f"ffn_{i}",
            )(x, mask, train=train)
            x = ChannelLayerNorm(name=f"norm2_{i}")(x + drop(y))
        return x * mask


class ConvReluNorm(nn.Module):
    """Prenet: n conv-relu-norm layers + zero-init residual projection
    (text_encoder.py:36-86)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array, *, train: bool = False
    ) -> jax.Array:
        x_org = x
        for i in range(self.n_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, name=f"conv_{i}")(
                x * mask
            )
            x = ChannelLayerNorm(name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        proj = nn.Conv(
            self.out_channels,
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        return (x_org + proj) * mask


class TextEncoder(nn.Module):
    """Full text encoder; returns (mu [B,T,inter_dim], hidden [B,T,C],
    mask [B,T,1])."""

    n_tokens: int
    hidden_dim: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    dropout: float
    inter_dim: int

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        lengths: jax.Array,
        *,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        emb = nn.Embed(
            self.n_tokens,
            self.hidden_dim,
            embedding_init=nn.initializers.normal(self.hidden_dim**-0.5),
            name="emb",
        )(tokens)
        x = emb * math.sqrt(self.hidden_dim)
        mask = sequence_mask(lengths, tokens.shape[1]).astype(x.dtype)[..., None]
        x = ConvReluNorm(
            self.hidden_dim, self.hidden_dim, name="prenet"
        )(x, mask, train=train)
        x = TransformerEncoder(
            self.hidden_dim,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.dropout,
            name="encoder",
        )(x, mask, train=train)
        mu = nn.Conv(self.inter_dim, (1,), name="proj_m")(x) * mask
        return mu, x, mask
