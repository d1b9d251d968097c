"""Shape / invariance tests for the model zoo (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylish_tts_tpu.config import ModelConfig
from stylish_tts_tpu.models import build_models
from stylish_tts_tpu.models.pitch_energy_predictor import (
    build_monotonic_band_mask,
)
from stylish_tts_tpu.models.speech_predictor import upsample_x4_linear


def tiny_config() -> ModelConfig:
    mc = ModelConfig()
    mc.text_encoder.layers = 2
    mc.text_encoder.hidden_dim = 64
    mc.text_encoder.filter_channels = 128
    mc.inter_dim = 64
    mc.style_dim = 32
    mc.decoder.hidden_dim = 128
    mc.decoder.residual_dim = 32
    mc.generator.input_dim = 128
    mc.generator.hidden_dim = 128
    mc.generator.conv_intermediate_dim = 256
    return mc


@pytest.fixture(scope="module")
def models():
    return build_models(tiny_config())


@pytest.fixture(scope="module")
def rngs():
    k = jax.random.PRNGKey(0)
    return {"params": k, "dropout": k, "sample": k}


class TestTextEncoder:
    def test_mask_invariance(self, models, rngs):
        """Padding content must not change valid outputs."""
        enc = models["pe_text_encoder"]
        tokens = jnp.asarray(np.random.default_rng(0).integers(0, 178, (2, 12)))
        lengths = jnp.asarray([8, 12])
        variables = enc.init(rngs, tokens, lengths)
        mu1, _, mask = enc.apply(variables, tokens, lengths)
        tokens2 = tokens.at[0, 8:].set(5)  # change padding region
        mu2, _, _ = enc.apply(variables, tokens2, lengths)
        np.testing.assert_allclose(
            np.asarray(mu1[0, :8]), np.asarray(mu2[0, :8]), atol=1e-5
        )
        assert mask.shape == (2, 12, 1)
        # masked positions are zero
        assert np.abs(np.asarray(mu1[0, 8:])).max() == 0.0


class TestUpsample:
    def test_matches_torch_linear(self):
        import torch

        x = np.random.default_rng(1).standard_normal((2, 9)).astype(np.float32)
        ref = (
            torch.nn.Upsample(scale_factor=4, mode="linear")(
                torch.from_numpy(x)[:, None]
            )[:, 0]
            .numpy()
        )
        got = np.asarray(upsample_x4_linear(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestBandMask:
    def test_band_and_padding(self):
        T, F = 6, 8
        align = np.zeros((1, T, F), np.float32)
        # monotonic alignment: token t owns frames
        owners = [0, 0, 1, 2, 2, 3, 4, 5]
        for f, t in enumerate(owners):
            align[0, t, f] = 1.0
        text_valid = jnp.asarray([[True] * 5 + [False]])
        allowed = np.asarray(
            build_monotonic_band_mask(jnp.asarray(align), text_valid, window=1)
        )[0, 0]
        # frame 3 aligned to token 2: tokens 1..3 allowed
        assert allowed[3].tolist() == [False, True, True, True, False, False]
        # padded token 5 never allowed even when in band
        assert not allowed[7][5]


class TestGenerator:
    def test_pcph_prior_properties(self):
        from stylish_tts_tpu.models.generator import generate_pcph

        rng = jax.random.PRNGKey(0)
        f0 = jnp.full((1, 40), 200.0)
        voiced = jnp.ones((1, 40))
        wave = np.asarray(
            generate_pcph(f0, voiced, rng, hop_length=75, sample_rate=24000)
        )
        assert wave.shape == (1, 3000)
        # harmonic signal has significant power
        assert wave.std() > 0.05
        # unvoiced input -> noise only (amplitude ~ noise_amplitude)
        wave_uv = np.asarray(
            generate_pcph(
                jnp.zeros((1, 40)), jnp.zeros((1, 40)), rng,
                hop_length=75, sample_rate=24000,
            )
        )
        assert wave_uv.std() < 0.05

    @pytest.mark.slow
    def test_speech_predictor_inference_path(self, models, rngs):
        sp = models["speech_predictor"]
        B, T, Fm = 1, 8, 12
        tokens = jnp.zeros((B, T), jnp.int32)
        lengths = jnp.asarray([T])
        align = jnp.zeros((B, T, Fm)).at[:, 0].set(1.0)
        pitch = jnp.full((B, Fm), 120.0)
        energy = jnp.ones((B, Fm))
        variables = sp.init(rngs, tokens, lengths, align, pitch, energy, None)
        pred = sp.apply(
            variables, tokens, lengths, align, pitch, energy, None,
            rngs={"sample": jax.random.PRNGKey(1)},
        )
        assert pred.audio.shape == (B, Fm * 300)
        assert pred.text_stats is None
        assert np.isfinite(np.asarray(pred.audio)).all()


class TestFlow:
    def test_flow_roundtrip_identity(self, rngs):
        """reverse(forward(z)) == z for the coupling stack."""
        from stylish_tts_tpu.models.flow import ResidualCouplingBlock

        flow = ResidualCouplingBlock(32, 32, n_flows=4, cond_channels=8)
        z = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 10, 32)), jnp.float32
        )
        mean = jnp.zeros_like(z)
        logstd = jnp.zeros_like(z)
        cond = jnp.ones((2, 8))
        variables = flow.init(rngs, z, mean, logstd, cond)
        zf, mf, sf = flow.apply(variables, z, mean, logstd, cond, reverse=False)
        zr, mr, sr = flow.apply(variables, zf, mf, sf, cond, reverse=True)
        np.testing.assert_allclose(np.asarray(zr), np.asarray(z), atol=1e-4)
        np.testing.assert_allclose(np.asarray(sr), np.asarray(logstd), atol=1e-4)


class TestAligner:
    def test_log_probs_normalized(self, models, rngs):
        ta = models["text_aligner"]
        mel = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 14, 80)), jnp.float32
        )
        lengths = jnp.asarray([14, 10])
        variables = ta.init(rngs, mel, lengths)
        lp, _ = ta.apply(variables, mel, lengths)
        s = np.exp(np.asarray(lp)).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-4)
