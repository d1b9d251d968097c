"""Speech-language-model feature extractor for the 'slm' perceptual loss.

The reference freezes HF ``microsoft/wavlm-base-plus`` and takes an L1 over
all hidden states (reference train/losses.py:408-426).  That checkpoint
cannot be fetched in an air-gapped TPU pod, so the capability is re-provided
as an architecture-exact WavLM-base flax module:

  * conv feature encoder: 7 conv1d layers, strides (5,2,2,2,2,2,2),
    kernels (10,3,3,3,3,2,2), 512 channels, group-norm on the first layer;
  * feature projection (layer-norm + 512->768 dense);
  * weight-norm-folded grouped positional conv (k=128, 16 groups);
  * ``n_layers`` post-norm transformer blocks with WavLM's gated
    relative-position-bias attention (T5-style 320 log-buckets, max
    distance 800; the bias table lives in layer 0 and is shared).

``scripts/convert_wavlm.py`` converts a torch WavLM checkpoint into a
safetensors file this module loads (``ModelConfig.slm.weights_path``); the
conversion is parity-tested against HF transformers in
``tests/test_slm.py``.  Without weights it runs frozen at random init —
a random-feature perceptual loss over the same receptive fields (the
established fallback when pretrained perceptual nets are unavailable).
``ModelConfig.slm.layers`` trades fidelity for step time.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CONV_DIMS = (512,) * 7
CONV_STRIDES = (5, 2, 2, 2, 2, 2, 2)
CONV_KERNELS = (10, 3, 3, 3, 3, 2, 2)


def relative_position_buckets(
    length: int, num_buckets: int = 320, max_distance: int = 800
) -> jax.Array:
    """T5-style bidirectional log-bucketed relative positions [T, T].

    Built from on-device aranges (not a numpy literal): a [T, T] constant
    per call site bloats the serialized HLO enough to trip request-size
    limits of remote-compile services."""
    half = num_buckets // 2
    rel = jnp.arange(length)[None, :] - jnp.arange(length)[:, None]
    buckets = (rel > 0).astype(jnp.int32) * half
    rel = jnp.abs(rel)
    max_exact = half // 2
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, half - 1)
    return buckets + jnp.where(rel < max_exact, rel, large)


class _EncoderAttention(nn.Module):
    """WavLM attention: softmax(q k^T / sqrt(d) + gate(x) * bias) v.

    The per-head, per-query gate is sigmoid-projected from the layer input
    (gru_rel_pos in the WavLM paper).  With ``position_bias=None`` this is
    plain wav2vec2/HuBERT self-attention (no bias, no gate params)."""

    hidden_dim: int
    n_heads: int

    @nn.compact
    def __call__(
        self, x: jax.Array, position_bias: jax.Array | None
    ) -> jax.Array:
        b, t, _ = x.shape
        h, d = self.n_heads, self.hidden_dim // self.n_heads
        dense = lambda name: nn.DenseGeneral(
            (h, d), axis=-1, name=name, dtype=x.dtype
        )
        q = dense("q_proj")(x) / math.sqrt(d)  # [B, T, h, d]
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if position_bias is not None:
            # gate: head-split input -> Linear(d, 8) -> sum over 4s -> 2 gates
            xh = x.reshape(b, t, h, d)
            proj = nn.DenseGeneral(
                8, axis=-1, name="gru_rel_pos_linear", dtype=x.dtype
            )(xh)
            proj = proj.reshape(b, t, h, 2, 4).sum(-1)
            gates = jax.nn.sigmoid(proj)  # [B, T, h, 2]
            gate_a, gate_b = gates[..., 0], gates[..., 1]
            const = self.param(
                "gru_rel_pos_const", nn.initializers.ones, (1, 1, h)
            ).astype(x.dtype)
            gate = gate_a * (gate_b * const - 1.0) + 2.0  # [B, T, h]
            # [B, h, Tq, Tk]: bias is per (h, Tq, Tk), gate per query
            scores = scores + (
                jnp.transpose(gate, (0, 2, 1))[..., None]
                * position_bias[None].astype(x.dtype)
            )
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            x.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.DenseGeneral(
            self.hidden_dim, axis=(-2, -1), name="out_proj", dtype=x.dtype
        )(out)


class SLMFeatureExtractor(nn.Module):
    """[B, T] 16 kHz audio -> list of n_layers+1 hidden states [B, F, C]."""

    hidden_dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    intermediate_dim: int = 3072
    num_buckets: int = 320
    max_distance: int = 800
    # True = WavLM gated relative-position-bias attention;
    # False = plain wav2vec2/HuBERT-base attention (same everything else)
    rel_pos_bias: bool = True

    @nn.compact
    def __call__(self, audio16k: jax.Array) -> List[jax.Array]:
        compute_dtype = audio16k.dtype
        x = audio16k[..., None]  # [B, T, 1]
        for i, (c, s, k) in enumerate(
            zip(CONV_DIMS, CONV_STRIDES, CONV_KERNELS)
        ):
            x = nn.Conv(
                c, (k,), strides=(s,), padding="VALID", use_bias=False,
                name=f"conv_{i}", dtype=compute_dtype,
            )(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=c, epsilon=1e-5, name="gn", dtype=compute_dtype)(x)
            x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5, name="fp_ln", dtype=compute_dtype)(x)
        x = nn.Dense(self.hidden_dim, name="feature_proj", dtype=compute_dtype)(x)
        x = x + self._pos_conv(x)
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_ln", dtype=compute_dtype)(x)

        if self.rel_pos_bias:
            # shared relative position bias from the layer-0 table
            buckets = relative_position_buckets(
                x.shape[1], self.num_buckets, self.max_distance
            )
            table = self.param(
                "rel_attn_embed",
                nn.initializers.normal(0.02),
                (self.num_buckets, self.n_heads),
            )
            position_bias = jnp.transpose(table[buckets], (2, 0, 1))  # [h,T,T]
        else:
            position_bias = None

        hidden_states = [x]
        for i in range(self.n_layers):
            x = self._layer(x, position_bias, f"layer_{i}")
            hidden_states.append(x)
        return hidden_states

    def _pos_conv(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(
            self.hidden_dim, (128,), padding=[(64, 64)],
            feature_group_count=16, name="pos_conv", dtype=x.dtype,
        )(x)
        return nn.gelu(h[:, : x.shape[1]], approximate=False)

    def _layer(self, x, position_bias, name):
        # post-norm (WavLMEncoderLayer): residual -> LN, then FFN -> LN
        y = _EncoderAttention(
            self.hidden_dim, self.n_heads, name=f"{name}_attn"
        )(x, position_bias)
        x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_ln1", dtype=x.dtype)(x + y)
        y = nn.Dense(
            self.intermediate_dim, name=f"{name}_fc1", dtype=x.dtype
        )(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_dim, name=f"{name}_fc2", dtype=x.dtype)(y)
        return nn.LayerNorm(epsilon=1e-5, name=f"{name}_ln2", dtype=x.dtype)(x + y)


def slm_feature_loss(
    gt_states: List[jax.Array], pred_states: List[jax.Array]
) -> jax.Array:
    """L1 over all hidden states (reference losses.py:415-426)."""
    loss = 0.0
    for g, p in zip(gt_states, pred_states):
        loss += jnp.mean(
            jnp.abs(
                jax.lax.stop_gradient(g).astype(jnp.float32)
                - p.astype(jnp.float32)
            )
        )
    return loss / len(gt_states)
