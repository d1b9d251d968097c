"""RMVPE: deep-U-net + BiGRU E2E pitch estimator, 360-bin cents decoding.

Parity target: train/dataprep/rmvpe/ (model.py, spec.py, utils.py,
inference.py — ~700 LoC).  The reference downloads pretrained safetensors
from HF hub at runtime (pitch_extractor.py:51-53); here the architecture is
a flax module whose converted weights load from disk
(``--method rmvpe --weights path``), giving the same `calculate_pitch`
capability without network access.  Without weights, YIN
(dataprep/pitch.py) is the default method.

Cents decoding: 360 bins spanning ~C1..~B7 at 20-cent resolution;
f0 = 10 * 2**(cents/1200), cents from a local weighted average around the
argmax bin (rmvpe/utils.py capability).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.mel import MelSpectrogram

N_CLASS = 360
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191  # cents of the first bin above 10 Hz


class _ConvBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, *, train=False):
        for i in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        use_bias=False, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x


class _Encoder(nn.Module):
    channels: List[int]

    @nn.compact
    def __call__(self, x, *, train=False):
        skips = []
        for i, c in enumerate(self.channels):
            x = _ConvBlock(c, name=f"block_{i}")(x, train=train)
            skips.append(x)
            if i < len(self.channels) - 1:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x, skips


class _Decoder(nn.Module):
    channels: List[int]

    @nn.compact
    def __call__(self, x, skips, *, train=False):
        for i, c in enumerate(self.channels):
            b, h, w, _ = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, x.shape[-1]),
                                 "nearest")
            skip = skips[-(i + 2)]
            x = x[:, : skip.shape[1], : skip.shape[2]]
            x = jnp.concatenate([x, skip], axis=-1)
            x = _ConvBlock(c, name=f"block_{i}")(x, train=train)
        return x


class BiGRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        fwd_cell = nn.GRUCell(self.hidden, name="fwd")
        bwd_cell = nn.GRUCell(self.hidden, name="bwd")
        b = x.shape[0]
        init_f = fwd_cell.initialize_carry(jax.random.PRNGKey(0),
                                           (b, x.shape[-1]))
        init_b = bwd_cell.initialize_carry(jax.random.PRNGKey(0),
                                           (b, x.shape[-1]))
        fwd = nn.RNN(fwd_cell, name="rnn_fwd")(x)
        bwd = nn.RNN(bwd_cell, reverse=True, keep_order=True,
                     name="rnn_bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class RMVPE(nn.Module):
    """mel [B, T, n_mels] -> salience [B, T, 360] in (0, 1)."""

    base_channels: int = 16
    gru_hidden: int = 256

    @nn.compact
    def __call__(self, mel: jax.Array, *, train: bool = False) -> jax.Array:
        c = self.base_channels
        x = mel[..., None]  # [B, T, M, 1]
        x, skips = _Encoder([c, c * 2, c * 4, c * 8],
                            name="encoder")(x, train=train)
        x = _ConvBlock(c * 8, name="intermediate")(x, train=train)
        x = _Decoder([c * 4, c * 2, c], name="decoder")(
            x, skips, train=train
        )
        b, t, m, ch = x.shape
        x = x.reshape(b, t, m * ch)
        x = BiGRU(self.gru_hidden, name="gru")(x)
        return jax.nn.sigmoid(nn.Dense(N_CLASS, name="head")(x))


def decode_cents(salience: np.ndarray, threshold: float = 0.03) -> np.ndarray:
    """Local weighted-average cents decoding (rmvpe/utils.py capability).

    salience [T, 360] -> f0 [T] (0 where below threshold)."""
    center = salience.argmax(axis=1)
    t = salience.shape[0]
    cents = np.zeros(t)
    for i in range(t):
        lo = max(0, center[i] - 4)
        hi = min(N_CLASS, center[i] + 5)
        window = salience[i, lo:hi]
        bins = np.arange(lo, hi)
        denom = window.sum()
        if denom > 0:
            cents[i] = (window * bins).sum() / denom * CENTS_PER_BIN \
                + CENTS_OFFSET
    f0 = 10.0 * 2.0 ** (cents / 1200.0)
    voiced = salience.max(axis=1) > threshold
    return np.where(voiced & (cents > 0), f0, 0.0).astype(np.float32)


class RMVPEInference:
    """End-to-end: 16 kHz audio -> f0, weights from a safetensors file."""

    def __init__(self, weights_path: str | None = None, sample_rate=16000):
        self.sample_rate = sample_rate
        self.model = RMVPE()
        self.mel = MelSpectrogram(
            n_mels=128, n_fft=1024, win_length=1024, hop_length=160,
            sample_rate=sample_rate, power=1.0,
        )
        dummy = jnp.zeros((1, 32, 128))
        self.variables = self.model.init(
            {"params": jax.random.PRNGKey(0)}, dummy
        )
        if weights_path:
            from ..train.checkpoint import load_model_safetensors

            params = load_model_safetensors(
                weights_path, self.variables["params"]
            )
            self.variables = {**self.variables, "params": params}

    def __call__(self, audio16k: np.ndarray) -> np.ndarray:
        mel = self.mel(jnp.asarray(audio16k[None]))
        log_mel = jnp.log(jnp.clip(mel, 1e-5, None))
        salience = self.model.apply(self.variables, log_mel)
        return decode_cents(np.asarray(salience[0]))
