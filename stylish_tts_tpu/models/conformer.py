"""Style-conditioned conformer (used by the legacy 'ringformer' generator
head).  Parity: train/models/conformer.py:198-303 — blocks of
FF(½) → MHSA → depthwise-conv module → FF(½) with AdaptiveLayerNorm
pre-norms and a post-norm, all conditioned on the style vector."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import AdaptiveLayerNorm, sequence_mask


class _FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train=False):
        x = nn.Dense(self.dim * self.mult)(x)
        x = nn.silu(x)  # Swish
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class _Attention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, *, train=False):
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        b, t, _ = x.shape

        def heads(h):
            return h.reshape(b, t, self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (self.dim_head**-0.5)
        if mask is not None:
            allowed = mask[:, None, None, :] & mask[:, None, :, None]
            scores = jnp.where(allowed, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)  # f32 accumulation, activation-dtype result
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _ConvModule(nn.Module):
    dim: int
    expansion: int = 2
    kernel_size: int = 31
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, style, *, train=False):
        inner = self.dim * self.expansion
        x = AdaptiveLayerNorm(name="norm")(x, style)
        x = nn.Dense(inner * 2, name="pw_in")(x)
        gates = jnp.split(x, 2, axis=-1)
        x = gates[0] * jax.nn.sigmoid(gates[1])  # GLU
        pad = self.kernel_size // 2
        x = nn.Conv(
            inner,
            (self.kernel_size,),
            padding=[(pad, pad - (self.kernel_size + 1) % 2)],
            feature_group_count=inner,
            name="dwconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn"
        )(x)
        x = x * jax.nn.sigmoid(x)  # Swish
        x = nn.Dense(self.dim, name="pw_out")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ConformerBlock(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, style, mask=None, *, train=False):
        h = AdaptiveLayerNorm(name="ff1_norm")(x, style)
        x_ff1 = 0.5 * _FeedForward(
            self.dim, self.ff_mult, self.ff_dropout, name="ff1"
        )(h, train=train) + x
        h = AdaptiveLayerNorm(name="attn_norm")(x, style)
        h = _Attention(
            self.dim, self.heads, self.dim_head, self.attn_dropout,
            name="attn",
        )(h, mask, train=train)
        h = nn.Dropout(self.attn_dropout, deterministic=not train)(h)
        x = h + x_ff1
        x = _ConvModule(
            self.dim, self.conv_expansion_factor, self.conv_kernel_size,
            self.conv_dropout, name="conv",
        )(x, style, train=train) + x
        h = AdaptiveLayerNorm(name="ff2_norm")(x, style)
        x = 0.5 * _FeedForward(
            self.dim, self.ff_mult, self.ff_dropout, name="ff2"
        )(h, train=train) + x
        return AdaptiveLayerNorm(name="post_norm")(x, style)


class Conformer(nn.Module):
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                      # [B, T, dim]
        style: jax.Array,                  # [B, S]
        lengths: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        mask = None
        if lengths is not None:
            mask = sequence_mask(lengths, x.shape[1])
        for i in range(self.depth):
            x = ConformerBlock(
                dim=self.dim,
                dim_head=self.dim_head,
                heads=self.heads,
                ff_mult=self.ff_mult,
                conv_expansion_factor=self.conv_expansion_factor,
                conv_kernel_size=self.conv_kernel_size,
                attn_dropout=self.attn_dropout,
                ff_dropout=self.ff_dropout,
                conv_dropout=self.conv_dropout,
                name=f"block_{i}",
            )(x, style, mask, train=train)
        return x
