"""XUT: cross-U-transformer backbone for the CFM mel decoder.

Architecture-exact port of train/models/xut/ (xut.py, transformer.py,
attention.py, axial_rope.py, adaln.py, norm.py, layers.py, time_emb.py):
a U-shaped transformer whose encoder blocks stash activations and whose
decoder levels cross-attend (first block per level only) to the FINAL
encoder output (xut/xut.py:196-215 uses self_ctx[-1] at every level),
with learnable per-head axial RoPE over a continuous position map,
AdaLN modulation in (scale, shift, gate+1) order shared across layers
from the timestep embedding, RMSNorm (eps 1e-6) and packed SwiGLU FFNs.

TPU notes: channels-last, attention as two MXU matmuls; all shapes static.
"""

from __future__ import annotations

import math


import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """RMSNorm with learned scale (xut/norm.py RMSNormTorch, eps=1e-6)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + self.eps) * scale


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class AxialRoPE(nn.Module):
    """Learnable log-frequency rotary embedding over a continuous position
    map (xut/axial_rope.py:114-142).  x: [B, H, T, D]; pos: [B, T, pos_dim].

    Init matches freqs_pixel_log for pos_dim=1: linspace over the last
    axis of size 1 leaves every log-frequency at log(π)."""

    head_dim: int
    n_heads: int
    pos_dim: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, pos: jax.Array) -> jax.Array:
        half = self.head_dim // (2 * self.pos_dim)
        log_min = math.log(math.pi)
        log_max = math.log(10.0 * math.pi / 2)
        init = jnp.broadcast_to(
            jnp.linspace(log_min, log_max, self.pos_dim),
            (self.n_heads, half, self.pos_dim),
        )
        freqs = self.param("freqs", lambda key: init)
        # [B, T, H, half, pos_dim] -> [B, T, H, rot] -> pairs repeated
        f = pos[:, :, None, None, :] * jnp.exp(freqs)[None, None]
        b, t = pos.shape[0], pos.shape[1]
        f = f.reshape(b, t, self.n_heads, half * self.pos_dim)
        f = jnp.repeat(f, 2, axis=-1)          # [B, T, H, rot*2]
        f = f.transpose(0, 2, 1, 3)            # [B, H, T, rot*2]
        rot_dim = f.shape[-1]
        t_rot, t_right = x[..., :rot_dim], x[..., rot_dim:]
        x1, x2 = t_rot[..., 0::2], t_rot[..., 1::2]
        rot_half = jnp.stack([-x2, x1], axis=-1).reshape(t_rot.shape)
        t_rot = t_rot * jnp.cos(f) + rot_half * jnp.sin(f)
        return jnp.concatenate([t_rot, t_right], axis=-1)


class AdaLNModulation(nn.Module):
    """Shared modulation head: t_emb -> (scale, shift, gate) raw chunks
    (cfm_mel_decoder.py build_shared_adaln: LayerNorm -> Linear 4x ->
    Mish -> zero-init Linear 3x)."""

    dim: int

    @nn.compact
    def __call__(self, t_emb: jax.Array):
        h = nn.LayerNorm(name="ln")(t_emb)
        h = nn.Dense(self.dim * 4, name="fc1")(h)
        h = mish(h)
        h = nn.Dense(
            self.dim * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="fc2",
        )(h)
        scale, shift, gate = jnp.split(h, 3, axis=-1)
        return scale[:, None], shift[:, None], gate[:, None]


class AdaLN(nn.Module):
    """Pre-norm + modulation: returns (normed*(scale+1)+shift, gate+1)
    (xut/adaln.py:9-28)."""

    dim: int

    @nn.compact
    def __call__(self, x, t_emb=None, shared=None):
        normed = RMSNorm(name="norm")(x)
        if shared is None:
            h = nn.Dense(
                self.dim * 3,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="adaln",
            )(t_emb)
            scale, shift, gate = jnp.split(h, 3, axis=-1)
            scale, shift, gate = scale[:, None], shift[:, None], gate[:, None]
        else:
            scale, shift, gate = shared
        return normed * (scale + 1.0) + shift, gate + 1.0


class _SelfAttention(nn.Module):
    """Fused-qkv self attention with axial RoPE (xut/attention.py:12-71)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, pos=None):
        head_dim = self.dim // self.heads
        b, t, _ = x.shape
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(h):
            return h.reshape(b, t, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if pos is not None:
            rope = AxialRoPE(head_dim, self.heads, name="rope")
            q = rope(q, pos)
            k = rope(k, pos)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)  # f32 accumulation, activation-dtype result
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="out")(out)


class _CrossAttention(nn.Module):
    """q / fused-kv cross attention with axial RoPE on both sides
    (xut/attention.py:74-135)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, ctx, pos=None, ctx_pos=None):
        head_dim = self.dim // self.heads
        b, t, _ = x.shape
        s = ctx.shape[1]
        q = nn.Dense(self.dim, use_bias=False, name="q")(x)
        kv = nn.Dense(self.dim * 2, use_bias=False, name="kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, t, self.heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)
        rope = AxialRoPE(head_dim, self.heads, name="rope")
        if pos is not None:
            q = rope(q, pos)
        if ctx_pos is not None:
            k = rope(k, ctx_pos)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(v.dtype)  # f32 accumulation, activation-dtype result
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="out")(out)


class _SwiGLU(nn.Module):
    """Packed SwiGLU (xut/layers.py): w12 -> chunk -> silu(x1)*x2 -> w3."""

    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.mlp_dim * 2, name="w12")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, name="w3")(nn.silu(x1) * x2)


class XUTBlock(nn.Module):
    """One transformer block (xut/transformer.py:9-81): AdaLN-pre-normed
    self-attn (+ optional cross-attn) + SwiGLU, each gated by (gate+1)."""

    dim: int
    heads: int
    mlp_dim: int
    cross: bool = False

    @nn.compact
    def __call__(self, x, pos, t_emb, skip=None, skip_pos=None,
                 shared_adaln=None):
        sh_attn, sh_xattn, sh_ffw = (
            shared_adaln if shared_adaln is not None else (None, None, None)
        )
        # NOTE the reference REBINDS x to the pre-normed/modulated tensor
        # before each residual add (transformer.py:66-80: `x, gate =
        # self.attn_pre_norm(x, *y); x = x + self.attn(x, ...) * gate`),
        # so the residual stream is re-normalised at every sub-layer.
        x, gate = AdaLN(self.dim, name="attn_pre_norm")(
            x, t_emb, shared=sh_attn
        )
        x = x + _SelfAttention(self.dim, self.heads, name="attn")(
            x, pos=pos
        ) * gate
        if self.cross and skip is not None:
            x, gate = AdaLN(self.dim, name="xattn_pre_norm")(
                x, t_emb, shared=sh_xattn
            )
            x = x + _CrossAttention(self.dim, self.heads, name="xattn")(
                x, skip, pos=pos, ctx_pos=skip_pos
            ) * gate
        x, gate = AdaLN(self.dim, name="mlp_pre_norm")(x, t_emb, shared=sh_ffw)
        x = x + _SwiGLU(self.dim, self.mlp_dim, name="mlp")(x) * gate
        return x


class XUTBackbone(nn.Module):
    """U-shape (xut/xut.py:89-219): depth levels of enc blocks, then depth
    levels of dec blocks whose FIRST block cross-attends to the final
    encoder output (the reference reads self_ctx[-1] at every level)."""

    dim: int
    heads: int
    mlp_dim: int
    depth: int = 4
    enc_blocks: int = 1
    dec_blocks: int = 2

    @nn.compact
    def __call__(self, x, pos, t_emb, shared_adaln=None):
        for d in range(self.depth):
            for i in range(self.enc_blocks):
                x = XUTBlock(
                    self.dim, self.heads, self.mlp_dim,
                    name=f"enc_{d}_{i}",
                )(x, pos, t_emb, shared_adaln=shared_adaln)
        enc_out = x
        for d in range(self.depth):
            for i in range(self.dec_blocks):
                x = XUTBlock(
                    self.dim, self.heads, self.mlp_dim, cross=(i == 0),
                    name=f"dec_{d}_{i}",
                )(x, pos, t_emb, skip=enc_out if i == 0 else None,
                  skip_pos=pos, shared_adaln=shared_adaln)
        return x


class TBackbone(nn.Module):
    """Plain transformer stack (TBackBone; the TREAD pre/post routers)."""

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
    """t [B] -> [B, dim] (xut/time_emb.py): fixed exp-spaced frequency
    buffer, t scaled by 1000, cos||sin, one Linear + Mish."""

    dim: int
    max_period: float = 10000.0
    time_factor: float = 1000.0

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        freqs = jnp.exp(
            -math.log(self.max_period)
            * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = self.time_factor * t[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        return mish(nn.Dense(self.dim, name="proj")(emb))
