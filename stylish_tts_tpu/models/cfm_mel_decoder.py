"""CFM mel decoder: XUT backbone + sine-source harmonic conditioning +
TREAD token-dropout routing (reference train/models/cfm/cfm_mel_decoder.py:193-418).

TPU re-design of TREAD: the random token route uses an argsort-of-uniforms
permutation with a *static* kept-token count, gathered with take_along_axis
and scattered back with .at[].set — no boolean masthead dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cfm import CfmSampler
from .xut import TBackbone, TimestepEmbedding, XUTBackbone, AdaLNModulation, mish


class SineGenerator(nn.Module):
    """F0 curve [B, T] -> learned-merge sine source [B, T, 1]
    (cfm_mel_decoder.py:16-102): no-grad sine + UV-gated noise, then a
    bias-free 1->1 Linear and tanh WITH grad."""

    sample_rate: int = 24000
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0: jax.Array) -> jax.Array:
        rng = self.make_rng("sample")
        rad = jnp.cumsum((f0 / self.sample_rate) % 1.0, axis=1)
        sine = self.sine_amp * jnp.sin(2.0 * jnp.pi * rad)
        uv = (f0 > self.voiced_threshold).astype(f0.dtype)
        noise_amp = uv * self.noise_std + (1.0 - uv) * self.sine_amp / 3.0
        noise = noise_amp * jax.random.normal(rng, f0.shape)
        source = jax.lax.stop_gradient(sine * uv + noise)[..., None]
        return jnp.tanh(
            nn.Dense(1, use_bias=False, name="merge")(source)
        )


class CfmMelDecoder(nn.Module):
    feat_dim: int = 80
    asr_dim: int = 256
    spk_dim: int = 10240
    hidden_dim: int = 256
    emb_dim: int = 256
    xut_depth: int = 4
    xut_heads: int = 8
    xut_enc_blocks: int = 1
    xut_dec_blocks: int = 2
    tread_prev_depth: int = 1
    tread_post_depth: int = 3
    tread_dropout: float = 0.5
    guidance_w: float = 0.7

    def _embed_conds(self, asr, f0, energy, spk_emb, length):
        asr = nn.Dense(self.emb_dim * 4, name="asr_emb1")(asr)
        asr = mish(asr)
        asr = nn.Dense(self.emb_dim, name="asr_emb2")(asr)
        spk = nn.Dense(self.emb_dim * 4, name="spk_emb1")(spk_emb)
        spk = mish(spk)
        spk = nn.Dense(self.emb_dim, name="spk_emb2")(spk)
        spk = jnp.broadcast_to(
            spk[:, None], (spk.shape[0], length, self.emb_dim)
        )
        return asr, spk

    @nn.compact
    def __call__(
        self,
        x: jax.Array,            # [B, T, feat_dim] noisy mel
        t: jax.Array,            # [B] timestep
        asr: jax.Array,          # [B, T, asr_dim]
        f0: jax.Array,           # [B, T]
        energy: jax.Array,       # [B, T]
        spk_emb: jax.Array,      # [B, spk_dim]
        *,
        train: bool = False,
    ) -> jax.Array:
        b, length, _ = x.shape
        asr_e, spk_e = self._embed_conds(asr, f0, energy, spk_emb, length)

        source = SineGenerator(name="m_source")(f0)
        har = jnp.concatenate(
            [source, energy[..., None],
             jnp.broadcast_to(t[:, None, None], (b, length, 1))], axis=-1,
        )
        prior = nn.Conv(self.feat_dim, (7,), padding="SAME",
                        name="prior_generator")(har)
        x = x + prior
        x = nn.Dense(self.hidden_dim, name="in_proj")(
            jnp.concatenate([x, asr_e, spk_e], axis=-1)
        )

        t_emb = TimestepEmbedding(self.hidden_dim, name="time_emb")(t)
        shared = (
            AdaLNModulation(self.hidden_dim, name="shared_attn")(t_emb),
            AdaLNModulation(self.hidden_dim, name="shared_xattn")(t_emb),
            AdaLNModulation(self.hidden_dim, name="shared_ffw")(t_emb),
        )
        pos = jnp.broadcast_to(
            jnp.linspace(-1.0, 1.0, length)[None, :, None], (b, length, 1)
        )

        x = TBackbone(
            self.hidden_dim, self.xut_heads, self.hidden_dim * 4,
            self.tread_prev_depth, name="prev_tread",
        )(x, pos, t_emb, shared_adaln=shared)

        if train and self.tread_dropout > 0:
            # TREAD route: keep a static fraction of tokens through the
            # backbone, pass the rest around it.
            keep = length - int(length * self.tread_dropout)
            rng = self.make_rng("dropout")
            order = jnp.argsort(
                jax.random.uniform(rng, (b, length)), axis=1
            )  # random permutation per sample
            kept_idx = order[:, :keep]                      # [B, keep]
            x_kept = jnp.take_along_axis(
                x, kept_idx[..., None], axis=1
            )
            pos_kept = jnp.take_along_axis(pos, kept_idx[..., None], axis=1)
            y = XUTBackbone(
                self.hidden_dim, self.xut_heads, self.hidden_dim * 4,
                self.xut_depth, self.xut_enc_blocks, self.xut_dec_blocks,
                name="backbone",
            )(x_kept, pos_kept, t_emb, shared_adaln=shared)
            batch_idx = jnp.arange(b)[:, None]
            x = x.at[batch_idx, kept_idx].set(y)
        else:
            x = XUTBackbone(
                self.hidden_dim, self.xut_heads, self.hidden_dim * 4,
                self.xut_depth, self.xut_enc_blocks, self.xut_dec_blocks,
                name="backbone",
            )(x, pos, t_emb, shared_adaln=shared)

        x = TBackbone(
            self.hidden_dim, self.xut_heads, self.hidden_dim * 4,
            self.tread_post_depth, name="post_tread",
        )(x, pos, t_emb, shared_adaln=shared)
        return nn.Dense(self.feat_dim, name="out_proj")(x)


class CfmMelDecoderWrapper:
    """Binds CfmMelDecoder into the CfmSampler train/infer API
    (compute_pred_target / n-step Euler sampling)."""

    def __init__(self, module: CfmMelDecoder, variables, train: bool = False):
        self.module = module
        self.variables = variables
        self.train = train

    def estimator(self, x, t, rngs=None, **conds):
        return self.module.apply(
            self.variables, x, t, train=self.train,
            rngs=rngs or {}, **conds,
        )

    def sampler(self, rngs) -> CfmSampler:
        return CfmSampler(
            lambda x, t, **conds: self.module.apply(
                self.variables, x, t, train=self.train, rngs=rngs, **conds
            ),
            non_drop_conds=["spk_emb"],
        )
