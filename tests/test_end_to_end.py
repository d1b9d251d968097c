"""End-to-end integration: synthetic dataset -> every training stage ->
inference.  Heavy compiles — marked slow; run on TPU (or patient CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow


from stylish_tts_tpu.utils.synthetic import make_synthetic_dataset  # noqa: F401 (re-exported for test_cli_pipeline)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from stylish_tts_tpu.config import Config, ModelConfig

    root = tmp_path_factory.mktemp("dataset")
    make_synthetic_dataset(root)
    config = Config()
    config.dataset.path = str(root)
    config.training.log_interval = 1
    config.training.val_interval = 1000
    config.training.save_interval = 1000
    mc = ModelConfig()
    mc.text_encoder.layers = 1
    mc.text_encoder.hidden_dim = 64
    mc.text_encoder.filter_channels = 128
    mc.inter_dim = 64
    mc.style_dim = 32
    mc.decoder.hidden_dim = 128
    mc.decoder.residual_dim = 32
    mc.generator.input_dim = 128
    mc.generator.hidden_dim = 128
    mc.generator.conv_intermediate_dim = 256
    mc.slm.layers = 2
    mc.text_aligner.hidden_dim = 64
    return root, config, mc


def test_alignment_then_acoustic_stage(tiny_setup, tmp_path):
    from stylish_tts_tpu.train.loop import train_model

    root, config, mc = tiny_setup
    out = tmp_path / "out"
    manifest = train_model(
        config=config, model_config=mc, out_dir=str(out),
        stage_name="alignment", max_steps=2,
    )
    assert manifest.current_total_step >= 2
    assert (out / "alignment_model.safetensors").is_file()

    manifest = train_model(
        config=config, model_config=mc, out_dir=str(out),
        stage_name="acoustic", max_steps=2,
    )
    assert manifest.current_total_step >= 2
    assert (out / "acoustic" / "checkpoint_final" / "meta.json").is_file()


def test_duration_stage_and_inference(tiny_setup, tmp_path):
    import jax

    from stylish_tts_tpu.export.infer import Synthesizer
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.init import init_model_variables
    from stylish_tts_tpu.train.loop import train_model

    root, config, mc = tiny_setup
    out = tmp_path / "out2"
    manifest = train_model(
        config=config, model_config=mc, out_dir=str(out),
        stage_name="duration", max_steps=2,
    )
    assert manifest.current_total_step >= 2

    models = build_models(mc)
    variables = init_model_variables(
        models, mc, jax.random.PRNGKey(0),
        keys=["duration_predictor", "pe_text_encoder",
              "pe_text_style_encoder", "pitch_energy_predictor",
              "speech_predictor"],
    )
    params = {k: v["params"] for k, v in variables.items()}
    synth = Synthesizer(mc, params)
    audio = synth.synthesize("abcdef")
    assert audio.ndim == 1 and audio.shape[0] > 0
    assert np.isfinite(audio).all()
    long = synth.synthesize_longform(["abc", "def"])
    assert long.shape[0] > 2 * audio.shape[0] * 0  # non-empty concat

    # batched + pipelined serving APIs agree with single-utterance output
    batch = synth.synthesize_batch(["abcdef", "abc"])
    assert len(batch) == 2 and all(np.isfinite(b).all() for b in batch)
    np.testing.assert_allclose(
        batch[0][: audio.shape[0]].shape, audio.shape
    )
    dev_audio, totals = synth.synthesize_batch_async(["abcdef", "abc"])
    assert np.asarray(dev_audio).shape[0] == 2 and len(totals) == 2


def test_resume_replays_uninterrupted_stream(tiny_setup, tmp_path):
    """Checkpoint/resume determinism incl. the PRNG stream: train 4 steps
    straight == train 2, save, resume 2 (the checkpoint stores the host
    RNG key; reference parity via accelerator.save_state,
    train/train.py:433-449)."""
    import jax

    from stylish_tts_tpu.train.checkpoint import load_checkpoint
    from stylish_tts_tpu.train.init import (
        build_train_state,
        init_model_variables,
    )
    from stylish_tts_tpu.models import build_models
    from stylish_tts_tpu.train.loop import train_model

    root, config, mc = tiny_setup

    out_a = tmp_path / "straight"
    train_model(
        config=config, model_config=mc, out_dir=str(out_a),
        stage_name="duration", max_steps=4,
    )
    out_b = tmp_path / "interrupted"
    train_model(
        config=config, model_config=mc, out_dir=str(out_b),
        stage_name="duration", max_steps=2,
    )
    train_model(
        config=config, model_config=mc, out_dir=str(out_b),
        stage_name="duration", max_steps=4,
        checkpoint=str(out_b / "duration" / "checkpoint_final"),
    )

    models = build_models(mc)
    template = build_train_state(
        init_model_variables(models, mc, jax.random.PRNGKey(0)), mc
    )
    state_a, man_a, _, meta_a = load_checkpoint(
        out_a / "duration" / "checkpoint_final", template
    )
    state_b, man_b, _, meta_b = load_checkpoint(
        out_b / "duration" / "checkpoint_final", template
    )
    assert man_a.current_step == man_b.current_step == 4
    assert meta_a.get("rng_key") == meta_b.get("rng_key") is not None
    leaves_a = jax.tree_util.tree_leaves(state_a.params["duration_predictor"])
    leaves_b = jax.tree_util.tree_leaves(state_b.params["duration_predictor"])
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        )


def test_aot_memory_plan_refines_batch_sizes(tiny_setup, tmp_path):
    """training.aot_memory_plan=True routes stage start through
    BatchManager.refine_plan_aot: XLA memory analysis of the compiled step
    sizes every bucket (the reference's OOM probe, ahead of time)."""
    import copy
    import json

    from stylish_tts_tpu.train.loop import train_model

    root, config, mc = tiny_setup
    config = copy.deepcopy(config)
    config.training.aot_memory_plan = True
    config.training.memory_budget_mib = 512  # small budget -> small batches
    out = tmp_path / "out_aot"
    manifest = train_model(
        config=config, model_config=mc, out_dir=str(out),
        stage_name="duration", max_steps=1,
    )
    assert manifest.current_total_step >= 1
    sizes = json.loads(
        (out / "duration" / "duration_batch_sizes.json").read_text()
    )
    assert sizes and all(v >= 1 for v in sizes.values())
