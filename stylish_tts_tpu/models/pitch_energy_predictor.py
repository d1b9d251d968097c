"""Pitch/energy predictor with banded monotonic cross-attention.

Parity: train/models/pitch_energy_predictor.py:11-121 — ProsodyEncoder over
token states, frame queries formed by ``prosody @ alignment``, cross
attention restricted to a ±window monotonic band around each frame's aligned
token, then 3 AdaIN residual blocks + 1×1 heads for F0 and energy.

TPU notes: the band mask keeps the cross attention effectively local, but we
materialise it as a dense additive mask — frames×tokens is small (≤800×512)
and one masked MXU matmul beats gather-based sparsity on TPU.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .norms import AdaptiveDecoderBlock, AdaptiveLayerNorm, Conv1d, sequence_mask
from .prosody_encoder import ProsodyEncoder
from .text_encoder import MultiHeadAttention


def build_monotonic_band_mask(
    alignment: jax.Array, text_valid: jax.Array, window: int,
    reference_inverted: bool = False,
) -> jax.Array:
    """alignment [B, T, F], text_valid [B, T] (True where valid) ->
    allowed-mask [B, 1, F, T] (True where attention is permitted).

    Mirrors build_monotonic_band_mask (pitch_energy_predictor.py:194-212)
    but returns the positive mask used by our additive-mask attention.

    ``reference_inverted=True`` replicates the reference's masking bug for
    MIGRATED checkpoints: its MultiHeadAttention fills -1e4 where the mask
    is False (text_encoder.py:255-261), yet build_monotonic_band_mask
    documents/returns True where attention is NOT allowed — so a trained
    reference model actually attends to the band COMPLEMENT plus padded
    keys.  (Softmax shift-invariance makes the two agree only when a
    query row's mask is constant, which is why unpadded full-window tests
    can't see it.)  Checkpoints trained with the reference learned under
    that behavior; `import-torch` flips this flag in the exported model
    config so they keep it."""
    tau = jnp.argmax(alignment, axis=1)  # [B, F]
    t_idx = jnp.arange(alignment.shape[1])[None, None, :]  # [1, 1, T]
    tau_exp = tau[:, :, None]  # [B, F, 1]
    band = (t_idx >= tau_exp - window) & (t_idx <= tau_exp + window)
    valid = text_valid[:, None, :]
    if reference_inverted:
        allowed = ~band | ~valid
    else:
        allowed = band & valid
    return allowed[:, None]  # [B, 1, F, T]


class PitchEnergyPredictor(nn.Module):
    config: ModelConfig
    cross_window: int = 5

    @nn.compact
    def __call__(
        self,
        text_encoding: jax.Array,  # [B, T, inter_dim]
        text_lengths: jax.Array,  # [B]
        alignment: jax.Array,  # [B, T, F]
        style: jax.Array,  # [B, style_dim]
        *,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        mc = self.config
        pe_dim = mc.pitch_energy_predictor.inter_dim
        dropout = mc.pitch_energy_predictor.dropout
        channels = pe_dim + mc.style_dim

        prosody = ProsodyEncoder(
            style_dim=mc.style_dim,
            d_model=pe_dim,
            n_layers=3,
            dropout=0.2,
            name="prosody_encoder",
        )(text_encoding, style, text_lengths, train=train)  # [B, T, C]

        # frame-rate base: tokens scattered to frames by the alignment
        base = jnp.einsum(
            "btc,btf->bfc", prosody, alignment,
            preferred_element_type=jnp.float32,
        ).astype(prosody.dtype)
        query = AdaptiveLayerNorm(name="query_norm")(base, style)
        key = AdaptiveLayerNorm(name="key_norm")(prosody, style)
        text_valid = sequence_mask(text_lengths, prosody.shape[1])
        allowed = build_monotonic_band_mask(
            alignment, text_valid, self.cross_window,
            reference_inverted=mc.pitch_energy_predictor.reference_band_mask,
        )
        attention = MultiHeadAttention(
            channels, channels, 8, dropout, name="cross_attention"
        )(query, key, allowed, train=train)
        attention = Conv1d(
            channels, 5, groups=channels, name="cross_post_dw"
        )(attention)
        attention = nn.silu(attention)
        attention = nn.Conv(channels, (1,), name="cross_post_pw")(attention)
        x = (base + attention) / math.sqrt(2.0)  # [B, F, C]

        f0 = x
        for i in range(3):
            f0 = AdaptiveDecoderBlock(
                channels, dropout_rate=dropout, name=f"f0_block_{i}"
            )(f0, style, train=train)
        f0 = nn.Conv(1, (1,), name="f0_proj")(f0)[..., 0]

        energy = x
        for i in range(3):
            energy = AdaptiveDecoderBlock(
                channels, dropout_rate=dropout, name=f"energy_block_{i}"
            )(energy, style, train=train)
        energy = nn.Conv(1, (1,), name="energy_proj")(energy)[..., 0]

        return f0, energy  # each [B, F]
