"""bf16 mixed-precision training path (config.training.mixed_precision).

The reference trains every stage under Accelerate bf16 autocast
(train/cli.py:290-299, train/train_context.py:96-101).  Here the policy
lives in StageContext.apply: module forwards run in bf16 against f32
master weights; the spectral chain, losses and optimizer stay f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles full acoustic steps (~8 min CPU)


def tiny_model_config():
    from stylish_tts_tpu.config import ModelConfig

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
    return mc


@pytest.fixture(scope="module")
def setup():
    from stylish_tts_tpu.config import Config
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.init import (
        build_train_state,
        init_model_variables,
        init_slm_params,
        init_ssl_params,
    )

    mc = tiny_model_config()
    models = build_models(mc)
    rng = jax.random.PRNGKey(0)
    variables = init_model_variables(models, mc, rng)
    state = build_train_state(variables, mc)
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
    return mc, models, state, batch, frozen


def make_ctx(mc, models, precision: str):
    from stylish_tts_tpu.config import Config
    from stylish_tts_tpu.train.stages import StageContext

    cfg = Config()
    cfg.training.mixed_precision = precision
    return StageContext(
        models=models, model_config=mc, config=cfg,
        mel_mean=-4.0, mel_std=4.0, step_limit=100,
        duration_class_weight=jnp.ones((16,)),
    )


def test_bf16_step_keeps_f32_master_state(setup):
    """After a bf16 train step, params/opt/batch_stats are still f32."""
    from stylish_tts_tpu.train.stages import make_train_step

    mc, models, state, batch, frozen = setup
    ctx = make_ctx(mc, models, "bf16")
    assert ctx.compute_dtype == jnp.bfloat16
    step = jax.jit(make_train_step("acoustic", ctx, 1e-4))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1), frozen)
    assert np.isfinite(float(metrics["loss"])), metrics
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(new_state.batch_stats):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    # training moved weights
    delta = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params["speech_predictor"]),
            jax.tree_util.tree_leaves(new_state.params["speech_predictor"]),
        )
    )
    assert delta > 0.0


def test_bf16_matches_f32_loss(setup):
    """bf16 and f32 modes agree on the initial loss to bf16 tolerance."""
    from stylish_tts_tpu.train.stages import make_train_step

    mc, models, state, batch, frozen = setup
    rng = jax.random.PRNGKey(1)
    losses = {}
    for precision in ("no", "bf16"):
        ctx = make_ctx(mc, models, precision)
        step = jax.jit(make_train_step("acoustic", ctx, 1e-4))
        _, metrics = step(state, batch, rng, frozen)
        losses[precision] = float(metrics["loss"])
    assert np.isfinite(losses["no"]) and np.isfinite(losses["bf16"])
    rel = abs(losses["bf16"] - losses["no"]) / max(abs(losses["no"]), 1e-6)
    assert rel < 0.05, losses


def test_no_f32_creep_through_speech_predictor(setup):
    """With bf16 params+inputs the activation chain stays bf16 to the
    generator output heads (magnitude/phase), proving no hidden f32
    promotion anywhere in text encoder -> decoder -> flow -> generator.
    The audio itself leaves in f32 via the forced-f32 iSTFT."""
    from stylish_tts_tpu.train.stages import cast_floats

    mc, models, state, batch, frozen = setup
    p = cast_floats(state.params["speech_predictor"], jnp.bfloat16)
    b16 = cast_floats(
        dict(
            alignment=batch["alignment"],
            pitch=batch["pitch"],
            energy=jnp.ones_like(batch["pitch"]),
            audio=batch["audio_gt"],
        ),
        jnp.bfloat16,
    )
    rngs = {"dropout": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    pred = models["speech_predictor"].apply(
        {"params": p}, batch["text"], batch["text_length"],
        b16["alignment"], b16["pitch"], b16["energy"], b16["audio"],
        rngs=rngs, train=True,
    )
    assert pred.magnitude.dtype == jnp.bfloat16
    assert pred.phase.dtype == jnp.bfloat16
    assert pred.audio.dtype == jnp.float32  # iSTFT is pinned f32
    assert np.isfinite(np.asarray(pred.audio, np.float32)).all()


def test_alignment_stage_exempt(setup):
    """The CTC chain is exempt from bf16: the aligner's log-probs must be
    computed in f32 (reference autocast keeps log_softmax f32)."""
    from stylish_tts_tpu.ops.mel import calculate_mel
    from stylish_tts_tpu.train.stages import make_train_step

    mc, models, state, batch, frozen = setup
    ctx = make_ctx(mc, models, "bf16")
    mel, mel_length = calculate_mel(
        batch["audio_gt"], ctx.to_align_mel, -4.0, 4.0
    )
    log_probs, _ = ctx.apply(
        "text_aligner", state.params, state.batch_stats, mel, mel_length,
    )
    assert log_probs.dtype == jnp.float32
    step = jax.jit(make_train_step("alignment", ctx, 1e-4))
    _, metrics = step(state, batch, jax.random.PRNGKey(1), frozen)
    assert np.isfinite(float(metrics["loss"]))
