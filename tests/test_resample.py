"""Polyphase resampler correctness (sine preservation, torch parity-free)."""

import numpy as np

import jax.numpy as jnp

from stylish_tts_tpu.ops.resample import resample


def test_sine_preserved_24k_to_16k():
    sr_in, sr_out, f0 = 24000, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x[None]), sr_in, sr_out))[0]
    assert y.shape[0] == 16000
    t2 = np.arange(y.shape[0]) / sr_out
    ref = np.sin(2 * np.pi * f0 * t2)
    # ignore filter edges
    err = np.abs(y[100:-100] - ref[100:-100]).max()
    assert err < 0.02, err


def test_amplitude_bounded():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 7200)) * 0.1).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), 24000, 16000))
    assert np.isfinite(y).all()
    assert np.abs(y).max() < 1.0


def test_identity_when_same_rate():
    x = jnp.ones((1, 100))
    y = resample(x, 16000, 16000)
    assert y is x
