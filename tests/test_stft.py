"""Parity of the framed-matmul STFT/iSTFT/mel vs torch (CPU reference).

These gates anchor the BASELINE 'mel MAE < 1e-3 vs torch reference' target:
if the spectral frontend matches, a weight-ported model matches.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stylish_tts_tpu.ops import stft as jstft
from stylish_tts_tpu.ops.mel import MelSpectrogram, log_norm_energy, calculate_mel

CONFIGS = [
    # (n_fft, hop, win) — generator head (hop 75 = 300/4), mel frontend,
    # and the three multi-spectrogram resolutions
    (2048, 75, 1200),
    (2048, 300, 1200),
    (512, 50, 240),
    (1024, 120, 600),
    (2048, 240, 1200),
]


def _torch_stft(x, n_fft, hop, win):
    return torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop,
        win,
        window=torch.hann_window(win),
        return_complex=True,
    )


@pytest.mark.parametrize("n_fft,hop,win", CONFIGS)
def test_stft_matches_torch(n_fft, hop, win):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2 * n_fft + 7 * hop)).astype(np.float32)
    ref = _torch_stft(x, n_fft, hop, win)  # [B, F, T]
    real, imag = jstft.stft(
        jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win
    )
    got = np.asarray(real) + 1j * np.asarray(imag)  # [B, T, F]
    got = np.swapaxes(got, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got.real, ref.real.numpy(), atol=2e-3)
    np.testing.assert_allclose(got.imag, ref.imag.numpy(), atol=2e-3)


@pytest.mark.parametrize("n_fft,hop,win", [(2048, 75, 1200), (512, 50, 240)])
def test_istft_matches_torch(n_fft, hop, win):
    rng = np.random.default_rng(1)
    length = 4 * n_fft
    x = rng.standard_normal((2, length)).astype(np.float32)
    spec = _torch_stft(x, n_fft, hop, win)
    ref = torch.istft(
        spec, n_fft, hop, win, window=torch.hann_window(win), length=length
    ).numpy()
    real = jnp.asarray(np.swapaxes(spec.real.numpy(), 1, 2))
    imag = jnp.asarray(np.swapaxes(spec.imag.numpy(), 1, 2))
    got = np.asarray(
        jstft.istft(
            real, imag, n_fft=n_fft, hop_length=hop, win_length=win,
            length=length,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_roundtrip_reconstruction():
    """stft→istft is (near) identity — exercises window-envelope division."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 24000)).astype(np.float32)
    real, imag = jstft.stft(
        jnp.asarray(x), n_fft=2048, hop_length=300, win_length=1200
    )
    y = np.asarray(
        jstft.istft(
            real, imag, n_fft=2048, hop_length=300, win_length=1200,
            length=24000,
        )
    )
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_stft_head_unit_phase():
    head = jstft.STFTHead(512, 128, 512)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4096)), jnp.float32)
    mag, c, s = head.transform(x)
    np.testing.assert_allclose(np.asarray(c**2 + s**2), 1.0, atol=1e-5)
    y = head.inverse(mag, c, s, length=4096)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


class TestMel:
    def test_mel_fbank_properties(self):
        from stylish_tts_tpu.ops.mel import mel_filterbank

        fb = mel_filterbank(1025, 80, 24000)
        assert fb.shape == (1025, 80)
        assert fb.min() >= 0
        # every filter has mass, peaks are ordered in frequency
        assert (fb.sum(axis=0) > 0).all()
        peaks = fb.argmax(axis=0)
        assert (np.diff(peaks) > 0).all()

    def test_mel_spectrogram_shapes_and_norm(self):
        mel = MelSpectrogram(
            n_mels=80, n_fft=2048, win_length=1200, hop_length=300,
            sample_rate=24000,
        )
        x = jnp.asarray(
            np.random.default_rng(4).standard_normal((2, 24000)), jnp.float32
        )
        m = mel(x)
        assert m.shape == (2, 24000 // 300 + 1, 80)
        normed, lengths = calculate_mel(x, mel, -4.0, 4.0)
        assert normed.shape[1] % 2 == 0
        assert lengths.tolist() == [normed.shape[1]] * 2
        e = log_norm_energy(normed, -4.0, 4.0)
        assert e.shape == (2, normed.shape[1])
        assert bool((np.asarray(e) > 0).all())

    def test_mel_matches_torch_formula(self):
        """Cross-check the full mel pipeline against an independent torch
        implementation of torchaudio's MelSpectrogram (power=2, HTK)."""
        from stylish_tts_tpu.ops.mel import mel_filterbank

        n_fft, hop, win, sr, n_mels = 1024, 256, 1024, 24000, 80
        x = np.random.default_rng(5).standard_normal((1, 8192)).astype(np.float32)
        spec = _torch_stft(x, n_fft, hop, win)
        power = spec.real**2 + spec.imag**2  # [B, F, T]
        fb = torch.from_numpy(mel_filterbank(n_fft // 2 + 1, n_mels, sr))
        ref = torch.einsum("bft,fm->btm", power, fb).numpy()
        mel = MelSpectrogram(
            n_mels=n_mels, n_fft=n_fft, win_length=win, hop_length=hop,
            sample_rate=sr,
        )
        got = np.asarray(mel(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
