"""ConvNeXt blocks with Global Response Normalisation.

Parity targets: BasicConvNeXtBlock + GRN (train/models/conv_next.py:4-51)
and the style-conditioned ConvNeXtBlock of the freegan generator
(train/models/generator.py:441-499).  Channels-last layout means the
depthwise conv + pointwise MLP chain needs no transposes at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import AdaptiveLayerNorm, Conv1d


class GRN(nn.Module):
    """Global Response Normalisation over [B, T, C]: L2 over time, divisive
    norm over channels (conv_next.py:4-16)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, c))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, c))
        xf = x.astype(jnp.float32)  # L2-over-time accumulates in f32
        gx = jnp.sqrt(jnp.sum(xf * xf, axis=1, keepdims=True))
        nx = (gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)).astype(
            x.dtype
        )
        return gamma * (x * nx) + beta + x


class BasicConvNeXtBlock(nn.Module):
    """depthwise conv -> LN -> pw MLP (GELU, GRN) with residual."""

    dim: int
    intermediate_dim: int
    kernel: int = 7

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        x = Conv1d(self.dim, self.kernel, groups=self.dim, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN()(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        return residual + x


class StyleConvNeXtBlock(nn.Module):
    """Style-conditioned variant (AdaLN + SiLU) used in the freegan
    generator (generator.py:441-485)."""

    dim: int
    intermediate_dim: int
    kernel: int = 7

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array) -> jax.Array:
        residual = x
        x = Conv1d(self.dim, self.kernel, groups=self.dim, name="dwconv")(x)
        x = AdaptiveLayerNorm(eps=1e-6)(x, style)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = nn.silu(x)
        x = GRN()(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        return residual + x
