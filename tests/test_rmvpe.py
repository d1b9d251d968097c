"""RMVPE architecture + cents decoding tests."""

import numpy as np
import pytest


class TestCentsDecoding:
    def test_decode_peaked_salience(self):
        from stylish_tts_tpu.dataprep.rmvpe import (
            CENTS_OFFSET,
            CENTS_PER_BIN,
            decode_cents,
        )

        t, target_bin = 5, 180
        salience = np.full((t, 360), 1e-4, np.float32)
        salience[:, target_bin] = 0.9
        f0 = decode_cents(salience)
        expected = 10.0 * 2.0 ** (
            (target_bin * CENTS_PER_BIN + CENTS_OFFSET) / 1200.0
        )
        np.testing.assert_allclose(f0, expected, rtol=0.02)

    def test_below_threshold_unvoiced(self):
        from stylish_tts_tpu.dataprep.rmvpe import decode_cents

        salience = np.full((4, 360), 0.01, np.float32)
        f0 = decode_cents(salience)
        assert (f0 == 0).all()


class TestRMVPEModel:
    def test_forward_shapes(self):
        import jax
        import jax.numpy as jnp

        from stylish_tts_tpu.dataprep.rmvpe import RMVPE

        model = RMVPE(en_out_channels=2, n_blocks=1, inter_layers=1,
                      gru_hidden=16)
        mel = jnp.zeros((1, 32, 128))
        variables = model.init({"params": jax.random.PRNGKey(0)}, mel)
        out = model.apply(variables, mel)
        assert out.shape == (1, 32, 360)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
