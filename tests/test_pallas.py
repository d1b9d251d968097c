"""Pallas STFT kernel parity.

The kernel's algorithm is verified in interpreter mode (runs everywhere).
On this sandbox's remote-compile TPU service the compiled kernel currently
faults at runtime (opaque 'TPU device error' with no diagnostics — see
ops/stft_pallas.py docstring); the conv-based ops.stft is the production
path until a TPU with local Mosaic compilation is available.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("n_fft,hop,win", [(512, 75, 512), (512, 128, 240)])
def test_stft_pallas_interpret_matches_reference(n_fft, hop, win):
    from jax.experimental import pallas as pl

    from stylish_tts_tpu.ops import stft as jstft
    import stylish_tts_tpu.ops.stft_pallas as sp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4 * n_fft)), jnp.float32)
    r0, i0 = jstft.stft(x, n_fft=n_fft, hop_length=hop, win_length=win)

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        r1, i1 = sp.stft_pallas.__wrapped__(
            x, n_fft=n_fft, hop_length=hop, win_length=win,
            frame_tile=16, freq_tile=256,
        )
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-3)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i0), atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("n_fft,hop,win", [(2048, 75, 1200)])
def test_stft_pallas_compiled(n_fft, hop, win):
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("pallas compiled mode needs a TPU backend "
                    "(CPU supports interpret only)")
    """Compiled-mode parity — expected to pass on TPUs with local Mosaic
    compile; currently faults on the remote-compile sandbox service."""
    from stylish_tts_tpu.ops import stft as jstft
    from stylish_tts_tpu.ops.stft_pallas import stft_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4 * n_fft + 13 * hop)), jnp.float32)
    r0, i0 = jstft.stft(x, n_fft=n_fft, hop_length=hop, win_length=win)
    r1, i1 = stft_pallas(x, n_fft=n_fft, hop_length=hop, win_length=win)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-2)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i0), atol=2e-2)
