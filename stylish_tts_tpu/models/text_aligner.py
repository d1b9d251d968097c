"""CTC text aligner: TDNN conv stack + deep FFN -> log-softmax over
tokens+blank (train/models/text_aligner.py:16-242).

BatchNorm runs in inference (running-stats) or train mode via the flax
'batch_stats' collection.  Output is [B, T, V+1] log-probs (channels-last;
the reference emits (T, N, C) — transpose at the loss if needed).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import Conv1d, sequence_mask


class TextAligner(nn.Module):
    n_mels: int = 80
    n_tokens: int = 178
    hidden_dim: int = 640
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        mel: jax.Array,      # [B, T, n_mels]
        lengths: jax.Array,  # [B]
        *,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        x = mel
        # TDNN blocks: conv(k) -> relu -> batchnorm(affine=False) -> dropout
        for i, k in enumerate((5, 3, 3)):
            mask = sequence_mask(lengths, x.shape[1]).astype(x.dtype)[..., None]
            x = Conv1d(self.hidden_dim, k, name=f"tdnn_{i}")(x * mask)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                use_bias=False,
                use_scale=False,
                momentum=0.9,
                name=f"bn_{i}",
            )(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # FFN block: 5 linear+relu+dropout layers with residual skip
        h = x
        for i in range(5):
            h = nn.Dense(self.hidden_dim, name=f"ffn_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        logits = nn.Dense(self.n_tokens + 1, name="out")(x)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, lengths
