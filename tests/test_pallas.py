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


# --------------------------------------------------------------------- #
# Packed-frequency SpecDiscriminator conv kernel (round 4)
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("stride,kt", [(1, 9), (2, 9), (1, 3)])
def test_spec_conv_packed_parity(stride, kt):
    """Fused packed conv == lax reference: fwd and all three grads."""
    from stylish_tts_tpu.ops.spec_conv import (
        pack_freq, spec_conv2d_packed, spec_conv2d_reference, unpack_freq,
    )

    rng = np.random.default_rng(0)
    B, F, T, C = 2, 10, 70, 32
    x = jnp.asarray(rng.standard_normal((B, F, T, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, kt, C, C)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    xq = pack_freq(x)

    def loss_p(xq, w, b):
        y = spec_conv2d_packed(xq, w, b, F, stride, 0.1, True)
        s = jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.01)
        return jnp.sum(y * s)

    def loss_r(x, w, b):
        y = spec_conv2d_reference(x, w, b, stride, 0.1)
        yq = pack_freq(y)
        s = jnp.cos(jnp.arange(yq.size).reshape(yq.shape) * 0.01)
        return jnp.sum(yq * s)

    vp, (gx_p, gw_p, gb_p) = jax.value_and_grad(loss_p, argnums=(0, 1, 2))(
        xq, w, b
    )
    vr, (gx_r, gw_r, gb_r) = jax.value_and_grad(loss_r, argnums=(0, 1, 2))(
        x, w, b
    )
    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(unpack_freq(gx_p, F, C)), np.asarray(gx_r), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), atol=1e-4)


def test_spec_discriminator_pallas_parity():
    """SpecDiscriminator(pallas=True) matches the XLA path with the SAME
    param tree (interpreter mode); packed fmaps checked after unpacking."""
    import functools as ft

    from jax.experimental import pallas as pl

    from stylish_tts_tpu.models.discriminator import SpecDiscriminator
    from stylish_tts_tpu.ops.spec_conv import unpack_freq

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 24, 65, 1)), jnp.float32)
    ref = SpecDiscriminator(pallas=False)
    variables = ref.init(jax.random.PRNGKey(0), x)
    score_r, fmap_r = ref.apply(variables, x)

    orig = pl.pallas_call
    pl.pallas_call = ft.partial(orig, interpret=True)
    try:
        pal = SpecDiscriminator(pallas=True)
        v2 = pal.init(jax.random.PRNGKey(0), x)
        # identical param trees (names AND shapes)
        t1 = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
        t2 = jax.tree_util.tree_map(lambda a: a.shape, v2["params"])
        assert t1 == t2
        score_p, fmap_p = pal.apply(variables, x)
    finally:
        pl.pallas_call = orig

    np.testing.assert_allclose(
        np.asarray(score_p), np.asarray(score_r), atol=2e-4
    )
    assert len(fmap_p) == len(fmap_r)
    t_rows = fmap_r[0].shape[1]
    for i, (fp, fr) in enumerate(zip(fmap_p, fmap_r)):
        if fp.shape != fr.shape:  # packed layers 1..4
            fp = unpack_freq(fp, t_rows, 32)
        np.testing.assert_allclose(
            np.asarray(fp), np.asarray(fr), atol=2e-4,
            err_msg=f"fmap {i}",
        )
