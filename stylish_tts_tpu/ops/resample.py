"""Polyphase sinc resampling (torchaudio.transforms.Resample equivalent).

Used by the SLM perceptual loss to feed 16 kHz features from 24 kHz audio
(reference train/losses.py:411-414).  One strided grouped convolution whose
``up`` output channels are the polyphase branches; XLA lowers it to a single
MXU-friendly conv.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
):
    """Hann-windowed sinc interpolation kernels.

    Returns (kernels [up, 1, K], width, up, down) where ``up``/``down`` are
    the gcd-reduced rate factors; phase i of the output is the convolution
    of the input with kernels[i] at stride ``down``."""
    gcd = math.gcd(orig_freq, new_freq)
    up = new_freq // gcd
    down = orig_freq // gcd
    base_freq = min(up, down) * rolloff
    width = int(np.ceil(lowpass_filter_width * down / base_freq))
    idx = np.arange(-width, width + down, dtype=np.float64)

    kernels = []
    for i in range(up):
        t = (-i / up + idx / down) * base_freq
        t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
        window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
        scale = base_freq / down
        denom = np.where(t == 0, 1.0, np.pi * t)
        kernel = np.where(t == 0, 1.0, np.sin(np.pi * t) / denom)
        kernels.append(kernel * window * scale)
    k = np.stack(kernels)[:, None, :].astype(np.float32)  # [up, 1, K]
    return k, width, up, down


def resample(x: jax.Array, orig_freq: int, new_freq: int) -> jax.Array:
    """[B, T] -> [B, ceil(T * new/orig)] windowed-sinc resampling."""
    if orig_freq == new_freq:
        return x
    kernels, width, up, down = _sinc_kernel(orig_freq, new_freq)
    t = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x[:, None, :],
        jnp.asarray(kernels),
        window_strides=(down,),
        padding=[(width, width + down)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, up, T//down (+1)]
    b = x.shape[0]
    interleaved = jnp.swapaxes(out, 1, 2).reshape(b, -1)
    target_len = int(math.ceil(t * new_freq / orig_freq))
    return interleaved[:, :target_len]
