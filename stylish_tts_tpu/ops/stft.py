"""STFT / iSTFT as framed matmuls against windowed DFT bases.

The reference relies on torch.stft/istft (cuFFT) for every spectral loss and
the vocoder head (train/models/generator.py:23-56) and separately ships a
conv-formulated STFT for ONNX export (train/models/stft.py:50-96).  On TPU the
conv formulation *is* the fast path: a frame of audio times a precomputed
``[n_fft, 2*freq_bins]`` windowed DFT basis is a single MXU matmul, and XLA
fuses the magnitude/phase elementwise epilogue into it.  We therefore build
one kernel family used by the generator head, the mag/phase loss, the
3-resolution multi-spectrogram, the posterior encoder and the mel frontend.

Conventions follow ``torch.stft(center=True, pad_mode="reflect",
onesided=True)`` and ``torch.istft`` (overlap-add with window-envelope
normalisation) so outputs are numerically interchangeable with the torch
reference — see tests/test_stft.py for the parity suite.

Layout: waveforms are ``[B, T]``; spectrograms are channels-last
``[B, frames, freq]`` so the frequency axis sits on TPU lanes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _padded_window(win_length: int, n_fft: int) -> np.ndarray:
    """Hann window center-padded to n_fft (torch.stft convention)."""
    w = hann_window(win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    elif win_length > n_fft:
        w = w[:n_fft]
    return w


@functools.lru_cache(maxsize=32)
def _forward_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed forward DFT basis, shape [n_fft, 2 * freq_bins].

    Columns 0..F-1 give the real part, F..2F-1 the imaginary part
    (with torch's e^{-j2πkn/N} sign convention)."""
    freq_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(freq_bins)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    window = _padded_window(win_length, n_fft)[:, None]
    real = np.cos(angle) * window
    imag = -np.sin(angle) * window
    return np.concatenate([real, imag], axis=1).astype(np.float32)


def _window_dev(win_length: int, n_fft: int) -> jax.Array:
    """Periodic Hann window center-padded to n_fft, built on device."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(n * jnp.float32(2.0 * np.pi / win_length))
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = jnp.pad(w, (left, n_fft - win_length - left))
    elif win_length > n_fft:
        w = w[:n_fft]
    return w


def _dft_angles(n_fft: int, freq_bins: int) -> jax.Array:
    """[n_fft, freq_bins] DFT phase angles 2π·n·k/N built on device.

    Device-side construction matters: a [n_fft, 2F] f32 numpy basis is
    embedded as a literal at EVERY stft/istft call site (the step graph
    carried >400 MB of them, tripping remote-compile request limits).
    The product is phase-reduced in exact int32 ((n·k) mod N < 2^31)
    before the f32 multiply so cos/sin stay accurate."""
    n = jnp.arange(n_fft, dtype=jnp.int32)[:, None]
    k = jnp.arange(freq_bins, dtype=jnp.int32)[None, :]
    nk = (n * k) % n_fft
    return nk.astype(jnp.float32) * jnp.float32(2.0 * np.pi / n_fft)


def _forward_basis_dev(n_fft: int, win_length: int) -> jax.Array:
    """Device-built windowed forward DFT basis [n_fft, 2 * freq_bins]."""
    freq_bins = n_fft // 2 + 1
    angle = _dft_angles(n_fft, freq_bins)
    window = _window_dev(win_length, n_fft)[:, None]
    return jnp.concatenate(
        [jnp.cos(angle) * window, -jnp.sin(angle) * window], axis=1
    )


def _inverse_basis_dev(n_fft: int, win_length: int) -> jax.Array:
    """Device-built windowed inverse DFT basis [2 * freq_bins, n_fft]."""
    freq_bins = n_fft // 2 + 1
    angle = _dft_angles(n_fft, freq_bins).T  # [F, n_fft]
    k = jnp.arange(freq_bins)[:, None]
    nyquist = (n_fft % 2 == 0) & (k == freq_bins - 1)
    scale = jnp.where((k == 0) | nyquist, 1.0, 2.0) / n_fft
    window = _window_dev(win_length, n_fft)[None, :]
    real_basis = jnp.cos(angle) * scale * window
    imag_basis = -jnp.sin(angle) * scale * window
    return jnp.concatenate([real_basis, imag_basis], axis=0)


@functools.lru_cache(maxsize=32)
def _inverse_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed inverse DFT basis, shape [2 * freq_bins, n_fft].

    Maps (real, imag) rFFT coefficients of one frame to the windowed
    time-domain frame w[n] * irfft(X)[n], including the doubling of
    non-DC/non-Nyquist bins for the onesided transform."""
    freq_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(freq_bins)[:, None]
    angle = 2.0 * np.pi * n * k / n_fft
    scale = np.full((freq_bins, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    window = _padded_window(win_length, n_fft)[None, :]
    real_basis = np.cos(angle) * scale * window
    imag_basis = -np.sin(angle) * scale * window
    return np.concatenate([real_basis, imag_basis], axis=0).astype(np.float32)


def stft(
    x: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> Tuple[jax.Array, jax.Array]:
    """Real STFT of [B, T] -> (real, imag), each [B, frames, n_fft//2+1]."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode=pad_mode)
    b, t = x.shape
    frames = 1 + (t - n_fft) // hop_length
    # hop-row framing: reshape into hop-sized rows, then frame f chunk k is
    # row f+k — K static slices + one MXU einsum.  A strided conv with a
    # 2048-tap kernel expresses the same math but XLA lowers it off the
    # MXU (measured ~1000x slower on TPU); this formulation stays a GEMM.
    k_chunks = -(-n_fft // hop_length)
    rows_needed = frames + k_chunks
    x = jnp.pad(x, ((0, 0), (0, max(0, rows_needed * hop_length - t))))
    x_rows = x[:, : rows_needed * hop_length].reshape(
        b, rows_needed, hop_length
    )
    frames_mat = jnp.concatenate(
        [x_rows[:, k : k + frames] for k in range(k_chunks)], axis=-1
    )  # [B, frames, K*hop]; columns beyond n_fft hit zero basis rows

    basis = jnp.pad(
        _forward_basis_dev(n_fft, win_length),  # [n_fft, 2F]
        ((0, k_chunks * hop_length - n_fft), (0, 0)),
    )
    out = jnp.einsum(
        "btn,nf->btf", frames_mat, basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # spectral chain stays f32
        # (TPU default bf16 would break the mel-MAE target)
    )  # [B, frames, 2F]
    freq_bins = n_fft // 2 + 1
    return out[..., :freq_bins], out[..., freq_bins:]


def stft_magnitude(x: jax.Array, *, n_fft, hop_length, win_length, eps=1e-14):
    real, imag = stft(
        x, n_fft=n_fft, hop_length=hop_length, win_length=win_length
    )
    return jnp.sqrt(real * real + imag * imag + eps)


def _overlap_add(frames_time: jax.Array, hop_length: int) -> jax.Array:
    """[B, frames, n_fft] -> [B, (frames-1)*hop + n_fft] overlap-add.

    Decomposed into K = ceil(n_fft/hop) shifted adds of [B, frames, hop]
    chunks: chunk k of frame t lands at output frame t+k.  This keeps the
    op a handful of vectorised adds instead of a (n_fft x n_fft)-kernel
    transposed convolution, which XLA compiles and runs far slower."""
    b, n_frames, n_fft = frames_time.shape
    k_chunks = -(-n_fft // hop_length)
    padded = jnp.pad(
        frames_time, ((0, 0), (0, 0), (0, k_chunks * hop_length - n_fft))
    )
    chunks = padded.reshape(b, n_frames, k_chunks, hop_length)
    out_frames = n_frames + k_chunks - 1
    y = jnp.zeros((b, out_frames, hop_length), frames_time.dtype)
    for k in range(k_chunks):
        y = y.at[:, k : k + n_frames].add(chunks[:, :, k])
    return y.reshape(b, out_frames * hop_length)[
        :, : (n_frames - 1) * hop_length + n_fft
    ]


def istft(
    real: jax.Array,
    imag: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: int | None = None,
    center: bool = True,
    eps: float = 1e-11,
) -> jax.Array:
    """Inverse STFT of [B, frames, F] (real, imag) -> [B, T].

    Matches torch.istft: y = OLA(w · irfft(X)) / OLA(w²), then the center
    padding is trimmed.  The window-envelope denominator depends only on
    static shapes, so XLA constant-folds it."""
    basis = _inverse_basis_dev(n_fft, win_length)
    coeffs = jnp.concatenate([real, imag], axis=-1)  # [B, frames, 2F]
    frames_time = jnp.einsum(
        "btf,fn->btn", coeffs, basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    y = _overlap_add(frames_time, hop_length)

    n_frames = real.shape[1]
    w2 = _window_dev(win_length, n_fft) ** 2
    env = _overlap_add(
        jnp.broadcast_to(w2, (1, n_frames, n_fft)), hop_length
    )
    y = y / jnp.maximum(env, eps)

    pad = n_fft // 2 if center else 0
    if length is not None:
        # torch.istft semantics: trim `pad` from the head only and take
        # `length` samples (zero-padding past the synthesized tail).
        end = pad + length
        if y.shape[1] < end:
            y = jnp.pad(y, ((0, 0), (0, end - y.shape[1])))
        y = y[:, pad:end]
    elif center:
        y = y[:, pad:-pad]
    return y


class STFTHead:
    """Bound STFT config mirroring the reference TorchSTFT wrapper
    (train/models/generator.py:23-56): transform() returns (|S|, cos, sin)
    and inverse() reconstructs audio from magnitude and unit phase."""

    def __init__(self, filter_length: int, hop_length: int, win_length: int):
        self.n_fft = filter_length
        self.hop_length = hop_length
        self.win_length = win_length

    def transform(self, x: jax.Array):
        real, imag = stft(
            x,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
        )
        mag = jnp.abs(jax.lax.complex(real, imag)) + 1e-9
        return mag, real / mag, imag / mag

    def inverse(self, magnitude, cos, sin, length=None):
        return istft(
            magnitude * cos,
            magnitude * sin,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            length=length,
        )
