"""Host-side audio IO: WAV header probe, decode, resample.

Replaces the reference's soundfile/librosa usage (train/dataloader.py:4-6,
157-161).  ``wav_info`` reads only the header (the reference uses sf.info
to bucket by length without decoding, dataloader.py:69-121).
"""

from __future__ import annotations

import struct
import wave
from dataclasses import dataclass
from pathlib import Path

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


@dataclass
class WavInfo:
    frames: int
    samplerate: int
    channels: int


def wav_info(path: str | Path) -> WavInfo:
    from .. import native

    probed = native.wav_probe(str(path))
    if probed is not None:
        frames, sr = probed
        return WavInfo(frames, sr, 1)
    with wave.open(str(path), "rb") as f:
        return WavInfo(f.getnframes(), f.getframerate(), f.getnchannels())


def read_wav(path: str | Path, target_sr: int) -> np.ndarray:
    """Decode to float32 mono at target_sr (native C++ decoder when built,
    scipy fallback otherwise)."""
    from .. import native

    decoded = native.wav_decode(str(path))
    if decoded is not None:
        probed = native.wav_probe(str(path))
        sr = probed[1] if probed else target_sr
        if sr == target_sr:
            return decoded
        import math

        g = math.gcd(sr, target_sr)
        return resample_poly(decoded, target_sr // g, sr // g).astype(
            np.float32
        )
    sr, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data[:, 0]
    if sr != target_sr:
        import math

        g = math.gcd(sr, target_sr)
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return data
