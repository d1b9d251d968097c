"""Native host DSP library (native/dsp.cpp via ctypes): parity of the C++
WAV decode against the scipy reference path, header probing, and the
threaded batch decoder's center padding (data/audio.py consumers)."""

import numpy as np
import pytest
from scipy.io import wavfile

from stylish_tts_tpu import native
from stylish_tts_tpu.data.audio import read_wav, wav_info


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate((24000, 36001, 12000)):
        wave = (0.5 * np.sin(np.linspace(0, 440 * np.pi, n))
                + 0.1 * rng.standard_normal(n))
        data = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        p = root / f"t{i}.wav"
        wavfile.write(p, 24000, data)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert native.get_lib() is not None, "native/dsp.cpp failed to build"


def test_wav_probe_matches_header(wav_files):
    for p in wav_files:
        info = wav_info(p)
        assert info.samplerate == 24000
        frames, sr = native.wav_probe(str(p))
        assert (frames, sr) == (info.frames, 24000)


def test_native_decode_matches_scipy(wav_files):
    for p in wav_files:
        decoded = native.wav_decode(str(p))
        assert decoded is not None
        sr, ref = wavfile.read(str(p))
        ref = ref.astype(np.float32) / 32768.0
        assert decoded.shape == ref.shape
        np.testing.assert_allclose(decoded, ref, atol=1e-6)
        # the public loader returns the same audio
        np.testing.assert_allclose(read_wav(p, 24000), ref, atol=1e-6)


def test_batch_decode_padded_centering(wav_files):
    row = 40000
    out = native.batch_decode_padded([str(p) for p in wav_files], row)
    assert out is not None and out.shape == (len(wav_files), row)
    for i, p in enumerate(wav_files):
        sr, ref = wavfile.read(str(p))
        ref = ref.astype(np.float32) / 32768.0
        n = len(ref)
        left = (row - n) // 2
        np.testing.assert_allclose(out[i, left:left + n], ref, atol=1e-6)
        assert np.all(out[i, :left] == 0.0)
        assert np.all(out[i, left + n:] == 0.0)
