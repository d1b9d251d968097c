"""RMVPE: deep-U-net + BiGRU E2E pitch estimator, 360-bin cents decoding.

Architecture-exact port of the reference's E2E0(4, 1, (2, 2)) model
(train/dataprep/rmvpe/: model.py, deepunet.py, seq.py, spec.py, utils.py)
so the published pretrained checkpoint converts directly
(scripts/convert_rmvpe.py; the reference downloads it from HF hub at
runtime, pitch_extractor.py:51-53).  Without weights, YIN
(dataprep/pitch.py) is the default method.

Cents decoding: 360 bins at 20-cent resolution; f0 = 10·2^(cents/1200),
cents from a local weighted average around the argmax bin
(rmvpe/utils.py to_local_average_f0).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

N_CLASS = 360
N_MELS = 128
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191  # cents of the first bin above 10 Hz


class ConvBlockRes(nn.Module):
    """conv-BN-relu ×2 with residual (deepunet.py:6-42); convs bias-free,
    1x1 shortcut (with bias) when channels change."""

    out_channels: int

    @nn.compact
    def __call__(self, x, *, train=False):
        h = x
        for i in range(2):
            h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        use_bias=False, name=f"conv_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, name=f"bn_{i}")(h)
            h = nn.relu(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return h + x


class ResEncoderBlock(nn.Module):
    """n_blocks ConvBlockRes (+ optional 2x2 avg pool)
    (deepunet.py:45-64)."""

    out_channels: int
    n_blocks: int = 4
    pool: bool = True

    @nn.compact
    def __call__(self, x, *, train=False):
        for j in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"block_{j}")(
                x, train=train
            )
        if self.pool:
            return x, nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResDecoderBlock(nn.Module):
    """ConvTranspose (bias-free, stride 2) + BN + relu, concat skip,
    n_blocks ConvBlockRes (deepunet.py:67-95)."""

    out_channels: int
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x, skip, *, train=False):
        # torch ConvTranspose2d(k3, s2, p1, op1) crops 1 leading / 0
        # trailing from the VALID output; flax trims (k-1-lo, k-1-hi),
        # so (lo, hi) = (1, 2) reproduces it exactly
        x = nn.ConvTranspose(
            self.out_channels, (3, 3), strides=(2, 2),
            padding=[(1, 2), (1, 2)], use_bias=False, name="up",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         name="bn")(x)
        x = nn.relu(x)
        x = jnp.concatenate([x, skip], axis=-1)
        for j in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"block_{j}")(
                x, train=train
            )
        return x


class BiGRU(nn.Module):
    """Single-layer bidirectional GRU (seq.py:4-17)."""

    hidden: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        fwd = nn.RNN(nn.GRUCell(self.hidden, name="fwd"), name="rnn_fwd")(x)
        bwd = nn.RNN(nn.GRUCell(self.hidden, name="bwd"), reverse=True,
                     keep_order=True, name="rnn_bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class RMVPE(nn.Module):
    """mel [B, T, 128] (log, clamp 1e-5) -> salience [B, T, 360] in (0,1).

    E2E0(n_blocks=4, n_gru=1, kernel=(2,2)): 5 encoder levels 16..256,
    4 intermediate blocks at 512, 5 decoder levels, 3-channel CNN,
    BiGRU(384, 256), Linear(512, 360), sigmoid."""

    en_out_channels: int = 16
    en_de_layers: int = 5
    inter_layers: int = 4
    n_blocks: int = 4
    gru_hidden: int = 256

    @nn.compact
    def __call__(self, mel: jax.Array, *, train: bool = False) -> jax.Array:
        x = mel[..., None]  # [B, T, M, 1]; H=time, W=mels
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         name="in_bn")(x)
        skips = []
        c = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(
                c, self.n_blocks, pool=True, name=f"enc_{i}"
            )(x, train=train)
            skips.append(skip)
            c *= 2
        for i in range(self.inter_layers):
            x = ResEncoderBlock(
                c, self.n_blocks, pool=False, name=f"inter_{i}"
            )(x, train=train)
        for i in range(self.en_de_layers):
            c //= 2
            x = ResDecoderBlock(c, self.n_blocks, name=f"dec_{i}")(
                x, skips[-(i + 1)], train=train
            )
        x = nn.Conv(3, (3, 3), padding="SAME", name="cnn")(x)
        b, t, m, ch = x.shape
        x = x.transpose(0, 1, 3, 2).reshape(b, t, ch * m)  # torch flatten(-2) of [B,T,3,M]
        x = BiGRU(self.gru_hidden, name="gru")(x)
        return jax.nn.sigmoid(nn.Dense(N_CLASS, name="head")(x))


def rmvpe_mel_basis() -> np.ndarray:
    """librosa.filters.mel(sr=16000, n_fft=1024, n_mels=128, fmin=30,
    fmax=8000, htk=True) with slaney area normalisation (spec.py:22-29)."""
    sr, n_fft, n_mels, fmin, fmax = 16000, 1024, N_MELS, 30.0, 8000.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    weights = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # slaney normalisation: divide by band width
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights


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
    """End-to-end: 16 kHz audio -> f0, weights from a converted
    safetensors file (scripts/convert_rmvpe.py)."""

    def __init__(self, weights_path: str | None = None, sample_rate=16000):
        from ..ops.stft import stft

        self.sample_rate = sample_rate
        self.model = RMVPE()
        self._stft = stft
        self._mel_basis = jnp.asarray(rmvpe_mel_basis())
        dummy = jnp.zeros((1, 32, N_MELS))
        self.variables = self.model.init(
            {"params": jax.random.PRNGKey(0)}, dummy
        )
        if weights_path:
            from ..export.import_torch import load_converted_module

            self.variables = load_converted_module(
                weights_path, self.variables
            )

    def mel(self, audio: jax.Array) -> jax.Array:
        """[B, samples] -> log-mel [B, T, 128] (spec.py forward)."""
        real, imag = self._stft(
            audio, n_fft=1024, hop_length=160, win_length=1024
        )
        mag = jnp.sqrt(real * real + imag * imag)
        mel = jnp.einsum("btf,mf->btm", mag, self._mel_basis)
        return jnp.log(jnp.clip(mel, min=1e-5))

    def __call__(self, audio16k: np.ndarray) -> np.ndarray:
        mel = self.mel(jnp.asarray(audio16k[None]))
        n = mel.shape[1]
        pad = 32 * ((n - 1) // 32 + 1) - n
        if pad:
            mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        salience = self.model.apply(self.variables, mel)[0, :n]
        return decode_cents(np.asarray(salience))
