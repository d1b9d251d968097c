"""Pallas STFT kernel parity (interpreter mode on CPU; real on TPU via
-m slow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
@pytest.mark.parametrize("n_fft,hop,win", [(2048, 300, 1200), (512, 50, 240)])
def test_stft_pallas_matches_reference(n_fft, hop, win):
    from stylish_tts_tpu.ops import stft as jstft
    from stylish_tts_tpu.ops.stft_pallas import stft_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, 4 * n_fft + 13 * hop)), jnp.float32
    )
    r0, i0 = jstft.stft(x, n_fft=n_fft, hop_length=hop, win_length=win)
    r1, i1 = stft_pallas(x, n_fft=n_fft, hop_length=hop, win_length=win)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-2)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i0), atol=2e-2)
