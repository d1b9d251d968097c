"""Acoustic decoder: AdaIN residual stack re-concatenating
[x, asr_res, F0, N] at every block (train/models/decoder.py:6-61)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import AdaptiveDecoderBlock, Conv1d


class Decoder(nn.Module):
    hidden_dim: int = 512
    residual_dim: int = 64

    @nn.compact
    def __call__(
        self,
        asr: jax.Array,     # [B, F, inter_dim] aligned token encodings
        f0_curve: jax.Array,  # [B, F]
        energy: jax.Array,    # [B, F]
        style: jax.Array,     # [B, S]
        *,
        train: bool = False,
    ) -> jax.Array:
        f0 = Conv1d(1, 3, name="f0_conv")(f0_curve[..., None])
        n = Conv1d(1, 3, name="n_conv")(energy[..., None])

        x = jnp.concatenate([asr, f0, n], axis=-1)
        x = AdaptiveDecoderBlock(self.hidden_dim, name="encode")(
            x, style, train=train
        )
        asr_res = nn.Conv(self.residual_dim, (1,), name="asr_res")(asr)
        for i in range(4):
            x = jnp.concatenate([x, asr_res, f0, n], axis=-1)
            x = AdaptiveDecoderBlock(self.hidden_dim, name=f"decode_{i}")(
                x, style, train=train
            )
        return x  # [B, F, hidden_dim]
