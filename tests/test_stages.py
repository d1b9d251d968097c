"""One jitted train step per registered stage on tiny shapes (slow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.init import (
        build_train_state,
        init_model_variables,
        init_slm_params,
        init_ssl_params,
    )
    from stylish_tts_tpu.train.stages import StageContext

    mc = ModelConfig()
    mc.text_encoder.layers = 1
    mc.text_encoder.hidden_dim = 32
    mc.text_encoder.filter_channels = 64
    mc.text_encoder.heads = 4
    mc.inter_dim = 32
    mc.style_dim = 16
    mc.pitch_energy_predictor.inter_dim = 48
    mc.decoder.hidden_dim = 64
    mc.decoder.residual_dim = 16
    mc.generator.input_dim = 64
    mc.generator.hidden_dim = 64
    mc.generator.conv_intermediate_dim = 128
    mc.hubert.hidden_dim = 32
    mc.speaker_embedder.hidden_dim = 48
    cfg = Config()
    models = build_models(mc)
    rng = jax.random.PRNGKey(0)
    variables = init_model_variables(models, mc, rng)
    state = build_train_state(variables, mc)
    ctx = StageContext(
        models=models, model_config=mc, config=cfg,
        mel_mean=-4.0, mel_std=4.0, step_limit=100,
        duration_class_weight=jnp.ones((16,)),
    )
    frozen = {
        "slm": init_slm_params(rng, mc),
        "ssl": init_ssl_params(rng, mc),
    }
    B, T, Fm = 2, 10, 24
    batch = dict(
        text=jnp.zeros((B, T), jnp.int32),
        text_length=jnp.asarray([T, T - 2], jnp.int32),
        alignment=jnp.zeros((B, T, Fm)).at[:, 0].set(1.0),
        pitch=jnp.full((B, Fm), 120.0),
        audio_gt=jnp.asarray(
            np.random.default_rng(0).standard_normal((B, Fm * 300)),
            jnp.float32,
        ) * 0.1,
    )
    return ctx, state, batch, frozen


@pytest.mark.parametrize(
    "stage",
    ["textual", "style", "joint", "hubert_acoustic", "cfm_hubert_mel",
     "cfm_hubert_pitch"],
)
def test_stage_step_runs(setup, stage):
    from stylish_tts_tpu.train.stages import make_train_step

    ctx, state, batch, frozen = setup
    step = jax.jit(make_train_step(stage, ctx, 1e-4))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1), frozen)
    assert np.isfinite(float(metrics["loss"])), metrics
    # parameters of the stage's train models changed
    from stylish_tts_tpu.train.stages import STAGES

    key = STAGES[stage].train_models[0]
    deltas = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params[key]),
            jax.tree_util.tree_leaves(new_state.params[key]),
        )
    ]
    assert max(deltas) > 0.0, f"no parameter of {key} moved"


@pytest.mark.parametrize("stage", ["acoustic", "textual", "style", "duration",
                                   "alignment", "hubert_acoustic",
                                   "cfm_hubert_mel", "cfm_hubert_pitch"])
def test_eval_step_runs(setup, stage):
    from stylish_tts_tpu.train.stages import make_eval_step

    ctx, state, batch, frozen = setup
    step = jax.jit(make_eval_step(stage, ctx))
    metrics, audio = step(state, batch, jax.random.PRNGKey(1), frozen)
    assert np.isfinite(float(metrics["loss"]))
    # stages that synthesize during validation must return finite audio —
    # for `duration` that audio is driven by PREDICTED durations (the true
    # end-to-end inference check, reference stage_type.py:483-523); for
    # cfm_hubert_mel it is the Griffin-Lim-decoded CFM mel
    if stage in ("acoustic", "textual", "style", "duration",
                 "hubert_acoustic", "cfm_hubert_mel"):
        assert audio is not None
        assert np.isfinite(np.asarray(audio)).all()


def test_routed_gan_grads_match_two_pass():
    """The routed-GAN custom_vjp used on the mrd_pallas path (one MRD
    forward; param grads from the disc-loss pullback, input grads from
    the gen-loss pullback) must reproduce the reference two-detached-pass
    gradients exactly.  Routing correctness is independent of the conv
    implementation, so this runs the fast XLA conv path; pallas-vs-XLA
    numerical parity is covered in tests/test_pallas.py."""
    import functools

    from stylish_tts_tpu import losses as L
    from stylish_tts_tpu.models.discriminator import (
        MultiResolutionDiscriminator,
    )

    disc = MultiResolutionDiscriminator(resolution_count=2)
    rng = np.random.default_rng(0)
    t_fft = [jnp.asarray(rng.standard_normal((2, 20, 17, 1)), jnp.float32),
             jnp.asarray(rng.standard_normal((2, 12, 9, 1)), jnp.float32)]
    p_fft = [jnp.asarray(rng.standard_normal((2, 20, 17, 1)), jnp.float32),
             jnp.asarray(rng.standard_normal((2, 12, 9, 1)), jnp.float32)]
    params = disc.init(jax.random.PRNGKey(0), t_fft, p_fft)["params"]

    sg = functools.partial(jax.tree_util.tree_map, jax.lax.stop_gradient)

    def scalars(p, t, f):
        rs, gs, rf, gf = disc.apply({"params": p}, t, f)
        gen = L.generator_adversarial_loss(rs, gs, rf, gf)
        d_total, d_plain = L.discriminator_loss(rs, gs)
        return gen, d_total, d_plain

    def two_pass(p, t, f):
        g_rs, g_gs, g_rf, g_gf = disc.apply({"params": sg(p)}, t, f)
        gen = L.generator_adversarial_loss(g_rs, g_gs, g_rf, g_gf)
        d_rs, d_gs, _, _ = disc.apply({"params": p}, sg(t), sg(f))
        d_total, _ = L.discriminator_loss(d_rs, d_gs)
        return gen + 3.0 * d_total

    @jax.custom_vjp
    def routed(p, t, f):
        gen, d_total, _ = scalars(p, t, f)
        return gen, d_total

    def routed_fwd(p, t, f):
        return routed(p, t, f), (p, t, f)

    def routed_bwd(res, cts):
        p, t, f = res
        cg, cd = cts
        _, pull = jax.vjp(lambda *a: scalars(*a)[:2], p, t, f)
        zero = jnp.zeros(())
        _dp, dt_g, df_g = pull((cg, zero))
        dp_d, _dt, _df = pull((zero, cd))
        return dp_d, dt_g, df_g

    routed.defvjp(routed_fwd, routed_bwd)

    def routed_total(p, t, f):
        gen, d_total = routed(p, t, f)
        return gen + 3.0 * d_total

    gp_ref, gt_ref, gf_ref = jax.grad(two_pass, argnums=(0, 1, 2))(
        params, t_fft, p_fft
    )
    gp_r, gt_r, gf_r = jax.grad(routed_total, argnums=(0, 1, 2))(
        params, t_fft, p_fft
    )
    for a, b in zip(jax.tree_util.tree_leaves((gp_ref, gt_ref, gf_ref)),
                    jax.tree_util.tree_leaves((gp_r, gt_r, gf_r))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )
