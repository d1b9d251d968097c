"""XUT: cross-U-transformer backbone for the CFM mel decoder.

Parity target: train/models/xut/ (xut.py, transformer.py, attention.py,
axial_rope.py, adaln.py, norm.py, layers.py, time_emb.py, ~900 LoC) — a
U-shaped transformer whose encoder blocks stash activations and whose
decoder blocks cross-attend to them, with axial RoPE over a continuous
position map, AdaLN modulation (optionally shared across layers from the
timestep embedding), RMSNorm and SwiGLU FFNs.

TPU re-design: one flax module, channels-last, attention as two MXU
matmuls; the 1-D positional map drives a continuous rotary embedding.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cfm import sinusoidal_pos_emb


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + self.eps) * scale


def continuous_rope(x: jax.Array, pos: jax.Array) -> jax.Array:
    """Rotary embedding driven by a continuous position map.

    x: [B, H, T, D]; pos: [B, T, 1] in [-1, 1] (axial_rope capability)."""
    d = x.shape[-1]
    half = d // 2
    freqs = jnp.pi * jnp.exp(
        jnp.linspace(0.0, jnp.log(half), half)
    )  # log-spaced frequencies
    angles = pos[:, None, :, 0:1] * freqs[None, None, None, :]  # [B,1,T,half]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :half], x[..., half: 2 * half]
    rotated = jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos, x[..., 2 * half:]], -1
    )
    return rotated


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class AdaLNModulation(nn.Module):
    """timestep embedding -> (shift, scale, gate) (xut/adaln.py:10-28)."""

    dim: int

    @nn.compact
    def __call__(self, t_emb: jax.Array):
        h = nn.LayerNorm()(t_emb)
        h = nn.Dense(self.dim * 4)(h)
        h = mish(h)
        h = nn.Dense(
            self.dim * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(h)
        shift, scale, gate = jnp.split(h, 3, axis=-1)
        return shift[:, None], scale[:, None], gate[:, None]


def _modulate(x, mod):
    shift, scale, _ = mod
    return x * (1.0 + scale) + shift


class _Attention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, context=None, pos=None, ctx_pos=None):
        context = x if context is None else context
        head_dim = self.dim // self.heads
        b, t, _ = x.shape
        s = context.shape[1]

        def split(h, length):
            return h.reshape(b, length, self.heads, head_dim).transpose(
                0, 2, 1, 3
            )

        q = split(nn.Dense(self.dim, name="q")(x), t)
        k = split(nn.Dense(self.dim, name="k")(context), s)
        v = split(nn.Dense(self.dim, name="v")(context), s)
        if pos is not None:
            q = continuous_rope(q, pos)
        if ctx_pos is not None:
            k = continuous_rope(k, ctx_pos)
        elif pos is not None and context is x:
            k = continuous_rope(k, pos)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="out")(out)


class _SwiGLU(nn.Module):
    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        gate = nn.Dense(self.mlp_dim, name="gate")(x)
        up = nn.Dense(self.mlp_dim, name="up")(x)
        return nn.Dense(self.dim, name="down")(nn.silu(gate) * up)


class XUTBlock(nn.Module):
    """One transformer block: self-attn (+ optional cross-attn to skips)
    + SwiGLU, each AdaLN-modulated and gated."""

    dim: int
    heads: int
    mlp_dim: int
    cross: bool = False

    @nn.compact
    def __call__(self, x, pos, t_emb, skip=None, skip_pos=None,
                 shared_adaln=None):
        if shared_adaln is not None:
            mod_attn, mod_xattn, mod_ffw = shared_adaln
        else:
            mod_attn = AdaLNModulation(self.dim, name="adaln_attn")(t_emb)
            mod_xattn = AdaLNModulation(self.dim, name="adaln_xattn")(t_emb)
            mod_ffw = AdaLNModulation(self.dim, name="adaln_ffw")(t_emb)

        h = _modulate(RMSNorm(name="norm1")(x), mod_attn)
        x = x + mod_attn[2] * _Attention(
            self.dim, self.heads, name="attn"
        )(h, pos=pos)
        if self.cross and skip is not None:
            h = _modulate(RMSNorm(name="norm_x")(x), mod_xattn)
            x = x + mod_xattn[2] * _Attention(
                self.dim, self.heads, name="xattn"
            )(h, context=skip, pos=pos, ctx_pos=skip_pos)
        h = _modulate(RMSNorm(name="norm2")(x), mod_ffw)
        x = x + mod_ffw[2] * _SwiGLU(self.dim, self.mlp_dim, name="ffw")(h)
        return x


class XUTBackbone(nn.Module):
    """U-shape: enc_blocks stash activations per depth level; dec_blocks
    cross-attend to the stashed activations in reverse order
    (xut/xut.py:89-219)."""

    dim: int
    heads: int
    mlp_dim: int
    depth: int = 4
    enc_blocks: int = 1
    dec_blocks: int = 2

    @nn.compact
    def __call__(self, x, pos, t_emb, shared_adaln=None):
        skips: List[jax.Array] = []
        for d in range(self.depth):
            for i in range(self.enc_blocks):
                x = XUTBlock(
                    self.dim, self.heads, self.mlp_dim,
                    name=f"enc_{d}_{i}",
                )(x, pos, t_emb, shared_adaln=shared_adaln)
            skips.append(x)
        for d in range(self.depth):
            skip = skips[self.depth - 1 - d]
            for i in range(self.dec_blocks):
                x = XUTBlock(
                    self.dim, self.heads, self.mlp_dim, cross=True,
                    name=f"dec_{d}_{i}",
                )(x, pos, t_emb, skip=skip, skip_pos=pos,
                  shared_adaln=shared_adaln)
        return RMSNorm(name="norm_out")(x)


class TBackbone(nn.Module):
    """Plain transformer stack (used by the TREAD pre/post routers)."""

    dim: int
    heads: int
    mlp_dim: int
    depth: int

    @nn.compact
    def __call__(self, x, pos, t_emb, shared_adaln=None):
        for i in range(self.depth):
            x = XUTBlock(
                self.dim, self.heads, self.mlp_dim, name=f"block_{i}"
            )(x, pos, t_emb, shared_adaln=shared_adaln)
        return x


class TimestepEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        emb = sinusoidal_pos_emb(t, self.dim)
        emb = nn.Dense(self.dim * 4)(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim)(emb)
