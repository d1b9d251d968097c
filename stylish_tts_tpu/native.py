"""ctypes bindings for the native host DSP library (native/dsp.cpp).

Builds on demand with make/g++; every entry point has a pure-Python
fallback (data/audio.py) so the framework runs without a toolchain."""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libstylish_dsp.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.is_file()
    except Exception as exc:
        logger.debug("native build failed: %s", exc)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.is_file() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.wav_probe.restype = ctypes.c_int
    lib.wav_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.wav_decode.restype = ctypes.c_int64
    lib.wav_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.batch_decode_padded.restype = ctypes.c_int
    lib.batch_decode_padded.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def wav_probe(path: str):
    lib = get_lib()
    if lib is None:
        return None
    frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    if lib.wav_probe(str(path).encode(), ctypes.byref(frames), ctypes.byref(sr)) != 0:
        return None
    return int(frames.value), int(sr.value)


def wav_decode(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int32()
    n = lib.wav_decode(str(path).encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        return None
    out = np.empty(n, np.float32)
    got = lib.wav_decode(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.byref(sr),
    )
    if got < 0:
        return None
    return out[:got]


def batch_decode_padded(
    paths: Sequence[str], samples_per_row: int, n_threads: int = 8
) -> Optional[np.ndarray]:
    """Decode + center-pad a batch in one native call -> [B, samples]."""
    lib = get_lib()
    if lib is None:
        return None
    joined = b"\0".join(str(p).encode() for p in paths) + b"\0"
    out = np.zeros((len(paths), samples_per_row), np.float32)
    rc = lib.batch_decode_padded(
        joined,
        len(paths),
        samples_per_row,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if rc != 0:
        return None
    return out
