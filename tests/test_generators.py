"""Generator heads: PCPH/freegan pieces (fast) and the ringformer path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestConformer:
    def test_shapes_and_mask(self):
        from stylish_tts_tpu.models.conformer import Conformer

        c = Conformer(dim=32, depth=1, heads=2, dim_head=16)
        rng = jax.random.PRNGKey(0)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 12, 32)), jnp.float32
        )
        style = jnp.zeros((2, 64))
        lengths = jnp.asarray([12, 8])
        v = c.init({"params": rng}, x, style, lengths)
        y = c.apply(v, x, style, lengths)
        assert y.shape == x.shape
        assert bool(jnp.isfinite(y).all())


class TestRingformer:
    @pytest.mark.slow
    def test_upsample_generator_output_length(self):
        from stylish_tts_tpu.config import ModelConfig
        from stylish_tts_tpu.models.ringformer import UpsampleGenerator

        mc = ModelConfig(**{"generator": {"type": "ringformer", "depth": 1}})
        mc.style_dim = 32
        gen = UpsampleGenerator(mc)
        rng = jax.random.PRNGKey(0)
        frames = 20
        mel = jnp.zeros((1, frames, 512))
        style = jnp.zeros((1, 32))
        pitch = jnp.full((1, frames), 120.0)
        rngs = {"params": rng, "sample": rng, "dropout": rng}
        v = gen.init(rngs, mel, style, pitch, pitch)
        pred = gen.apply(v, mel, style, pitch, pitch, rngs={"sample": rng})
        # 4*5 upsampling * hop 15 = x300 samples per mel frame
        assert pred.audio.shape[1] >= frames * 300 - 300
        assert bool(jnp.isfinite(pred.audio).all())


class TestSourceModule:
    def test_harmonic_source(self):
        from stylish_tts_tpu.models.ringformer import SourceModuleHnNSF

        m = SourceModuleHnNSF(sample_rate=24000)
        rng = jax.random.PRNGKey(0)
        f0 = jnp.full((1, 6000), 200.0)
        v = m.init({"params": rng, "sample": rng}, f0)
        out = m.apply(v, f0, rngs={"sample": rng})
        assert out.shape == (1, 6000, 1)
        assert bool(jnp.isfinite(out).all())
        # unvoiced -> noise only, smaller correlation with sine
        f0_uv = jnp.zeros((1, 6000))
        out_uv = m.apply(v, f0_uv, rngs={"sample": rng})
        assert float(jnp.abs(out_uv).mean()) < float(jnp.abs(out).mean()) * 2
