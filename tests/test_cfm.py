"""CFM sampler + XUT backbone + cfm/hubert model tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCfmSampler:
    def test_pred_target_shapes_and_interp(self):
        from stylish_tts_tpu.models.cfm import CfmSampler

        def estimator(x, t, **conds):
            return x * 0.5

        sampler = CfmSampler(estimator, guidance_w=0.0)
        x1 = jnp.ones((2, 8, 4))
        pred, target = sampler.compute_pred_target(jax.random.PRNGKey(0), x1)
        assert pred.shape == target.shape == x1.shape

    def test_euler_solver_linear_field(self):
        from stylish_tts_tpu.models.cfm import CfmSampler

        # dx/dt = 1 -> x(1) = x(0) + 1 regardless of step count
        sampler = CfmSampler(lambda x, t, **c: jnp.ones_like(x))
        z = jnp.zeros((1, 4, 2))
        out = sampler.sample(z, n_timesteps=10)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)

    def test_guidance_stop_grad(self):
        from stylish_tts_tpu.models.cfm import CfmSampler

        sampler = CfmSampler(
            lambda x, t, **c: x * c.get("w", 1.0), guidance_w=0.5,
            cond_drop_prob=0.5,
        )
        x1 = jnp.ones((2, 4, 2))
        pred, target = sampler.compute_pred_target(
            jax.random.PRNGKey(1), x1, w=jnp.ones(())
        )
        assert np.isfinite(np.asarray(pred)).all()


class TestXUT:
    def test_backbone_shapes(self):
        from stylish_tts_tpu.models.xut import TimestepEmbedding, XUTBackbone

        rng = jax.random.PRNGKey(0)
        dim = 32
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 10, dim)), jnp.float32
        )
        pos = jnp.broadcast_to(
            jnp.linspace(-1, 1, 10)[None, :, None], (2, 10, 1)
        )
        temb_mod = TimestepEmbedding(dim)
        tv = temb_mod.init({"params": rng}, jnp.zeros((2,)))
        t_emb = temb_mod.apply(tv, jnp.asarray([0.1, 0.9]))
        bb = XUTBackbone(dim, 4, dim * 4, depth=2)
        v = bb.init({"params": rng}, x, pos, t_emb)
        y = bb.apply(v, x, pos, t_emb)
        assert y.shape == x.shape
        assert bool(jnp.isfinite(y).all())


class TestCfmMelDecoder:
    def test_forward_train_and_eval(self):
        from stylish_tts_tpu.models.cfm_mel_decoder import CfmMelDecoder

        rng = jax.random.PRNGKey(0)
        dec = CfmMelDecoder(
            feat_dim=8, asr_dim=16, spk_dim=12, hidden_dim=32, emb_dim=16,
            xut_depth=1, xut_heads=2, tread_prev_depth=1, tread_post_depth=1,
        )
        b, t = 2, 10
        x = jnp.zeros((b, t, 8))
        ts = jnp.asarray([0.3, 0.7])
        asr = jnp.zeros((b, t, 16))
        f0 = jnp.full((b, t), 120.0)
        energy = jnp.ones((b, t))
        spk = jnp.zeros((b, 12))
        rngs = {"params": rng, "sample": rng, "dropout": rng}
        v = dec.init(rngs, x, ts, asr, f0, energy, spk)
        out = dec.apply(
            v, x, ts, asr, f0, energy, spk, rngs={"sample": rng}
        )
        assert out.shape == (b, t, 8)
        out_t = dec.apply(
            v, x, ts, asr, f0, energy, spk, train=True,
            rngs={"sample": rng, "dropout": rng},
        )
        assert out_t.shape == (b, t, 8)
        assert bool(jnp.isfinite(out_t).all())


class TestHubertModels:
    def test_pitch_energy(self):
        from stylish_tts_tpu.config import ModelConfig
        from stylish_tts_tpu.models.hubert_speech_predictor import (
            HubertPitchEnergyPredictor,
        )

        mc = ModelConfig()
        mc.inter_dim = 32
        mc.style_dim = 16
        mc.hubert.hidden_dim = 24
        mc.speaker_embedder.hidden_dim = 20
        m = HubertPitchEnergyPredictor(mc)
        rng = jax.random.PRNGKey(0)
        phones = jnp.zeros((2, 12, 24))
        lengths = jnp.asarray([12, 10])
        spk = jnp.zeros((2, 20))
        v = m.init({"params": rng, "dropout": rng}, phones, lengths, spk)
        f0, en = m.apply(v, phones, lengths, spk)
        assert f0.shape == (2, 12) and en.shape == (2, 12)

    def test_f0_zscore_roundtrip(self):
        from stylish_tts_tpu.train.stages import (
            denorm_f0_zscore,
            norm_f0_zscore,
        )

        f0 = jnp.asarray([[0.0, 110.0, 220.0, 440.0]])
        uv = f0 == 0
        normed = norm_f0_zscore(f0, uv, 7.5, 0.8)
        back = denorm_f0_zscore(normed, uv, 7.5, 0.8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(f0), rtol=1e-4)


class TestVocosFeatureSpace:
    def test_vocos_mel_shapes(self):
        from stylish_tts_tpu.models.vocos import VOCOS_HOP, vocos_mel

        audio = jnp.zeros((2, VOCOS_HOP * 20))
        mel = vocos_mel(audio)
        assert mel.shape[0] == 2 and mel.shape[2] == 100
        assert np.isfinite(np.asarray(mel)).all()

    def test_vocos_decode_shapes(self):
        from stylish_tts_tpu.models.vocos import VOCOS_HOP, Vocos

        model = Vocos(dim=32, intermediate_dim=64, n_layers=2)
        mel = jnp.zeros((1, 10, 100))
        variables = model.init(jax.random.PRNGKey(0), mel)
        audio = model.apply(variables, mel)
        assert audio.shape == (1, 9 * VOCOS_HOP)

    @pytest.mark.slow
    def test_cfm_mel_stage_on_vocos_features(self):
        """cfm_hubert_mel with model_config.cfm_mel_features='vocos':
        trains on the 100-bin hop-256 vocos feature grid and auditions
        through the Vocos decoder when weights are provided (reference
        stage_type.py:707,747-749 — dimension-consistent here, see
        config.py)."""
        from stylish_tts_tpu.config import Config, ModelConfig
        from stylish_tts_tpu.models import build_models
        from stylish_tts_tpu.models.vocos import Vocos
        from stylish_tts_tpu.train.init import (
            build_train_state,
            init_model_variables,
            init_slm_params,
            init_ssl_params,
        )
        from stylish_tts_tpu.train.stages import (
            StageContext,
            make_eval_step,
            make_train_step,
        )

        mc = ModelConfig()
        mc.cfm_mel_features = "vocos"
        mc.text_encoder.layers = 1
        mc.text_encoder.hidden_dim = 32
        mc.text_encoder.filter_channels = 64
        mc.inter_dim = 32
        mc.style_dim = 16
        mc.decoder.hidden_dim = 64
        mc.decoder.residual_dim = 16
        mc.generator.input_dim = 64
        mc.generator.hidden_dim = 64
        mc.generator.conv_intermediate_dim = 128
        mc.hubert.hidden_dim = 32
        mc.speaker_embedder.hidden_dim = 48
        models = build_models(mc)
        rng = jax.random.PRNGKey(0)
        variables = init_model_variables(
            models, mc, rng,
            keys=["cfm_mel_decoder", "hubert_encoder"],
        )
        state = build_train_state(variables, mc)
        ctx = StageContext(
            models=models, model_config=mc, config=Config(),
            mel_mean=-4.0, mel_std=4.0, step_limit=100,
            duration_class_weight=jnp.ones((16,)),
        )
        vocos = Vocos()
        vocos_p = vocos.init(rng, jnp.zeros((1, 8, 100)))["params"]
        frozen = {
            "slm": init_slm_params(rng, mc),
            "ssl": init_ssl_params(rng, mc),
            "vocos": vocos_p,
        }
        B, Fm = 2, 24
        batch = dict(
            text=jnp.zeros((B, 10), jnp.int32),
            text_length=jnp.asarray([10, 8], jnp.int32),
            alignment=jnp.zeros((B, 10, Fm)).at[:, 0].set(1.0),
            pitch=jnp.full((B, Fm), 120.0),
            audio_gt=jnp.asarray(
                np.random.default_rng(0).standard_normal((B, Fm * 300)),
                jnp.float32,
            ) * 0.1,
        )
        step = jax.jit(make_train_step("cfm_hubert_mel", ctx, 1e-4))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1), frozen)
        assert np.isfinite(float(metrics["loss"]))
        eval_step = jax.jit(make_eval_step("cfm_hubert_mel", ctx))
        emetrics, audio = eval_step(
            new_state, batch, jax.random.PRNGKey(2), frozen
        )
        assert np.isfinite(float(emetrics["loss"]))
        # audition decoded through Vocos at the hop-256 grid
        assert audio is not None and np.isfinite(np.asarray(audio)).all()
