"""Parity of the flax WavLM (slm loss feature net) vs HF transformers.

A randomly-initialised torch WavLMModel is converted with
slm_convert.convert_wavlm_model and must reproduce every hidden state —
this proves converted microsoft/wavlm-base-plus weights reproduce the
reference's slm loss (reference train/losses.py:408-426) without needing
network access in the test environment.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def torch_wavlm():
    import torch
    from transformers import WavLMConfig, WavLMModel

    torch.manual_seed(0)
    cfg = WavLMConfig(
        hidden_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=192,
        num_buckets=64,
        max_bucket_distance=100,
        conv_dim=(512,) * 7,  # feature encoder kept at reference shape
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    model = WavLMModel(cfg)
    model.eval()
    return cfg, model


def test_hidden_state_parity(torch_wavlm):
    import torch

    from stylish_tts_tpu.models.slm import SLMFeatureExtractor
    from stylish_tts_tpu.models.slm_convert import convert_wavlm_model
    from stylish_tts_tpu.train.checkpoint import load_model_safetensors

    cfg, model = torch_wavlm
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1

    with torch.no_grad():
        ref = model(
            input_values=torch.from_numpy(audio), output_hidden_states=True
        ).hidden_states
    ref = [h.numpy() for h in ref]

    flax_mod = SLMFeatureExtractor(
        hidden_dim=cfg.hidden_size,
        n_layers=cfg.num_hidden_layers,
        n_heads=cfg.num_attention_heads,
        intermediate_dim=cfg.intermediate_size,
        num_buckets=cfg.num_buckets,
        max_distance=cfg.max_bucket_distance,
    )
    import jax
    import jax.numpy as jnp

    template = flax_mod.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 1600))
    )["params"]

    flat = convert_wavlm_model(model)
    import tempfile

    from safetensors.numpy import save_file

    with tempfile.NamedTemporaryFile(suffix=".safetensors") as f:
        save_file(flat, f.name)
        params = load_model_safetensors(f.name, template)

    states = flax_mod.apply({"params": params}, jnp.asarray(audio))
    assert len(states) == len(ref)
    for i, (got, want) in enumerate(zip(states, ref)):
        np.testing.assert_allclose(
            np.asarray(got), want, atol=2e-4, rtol=1e-3,
            err_msg=f"hidden state {i}",
        )


def test_random_fallback_runs():
    """Without converted weights the net still provides a perceptual loss."""
    import jax
    import jax.numpy as jnp

    from stylish_tts_tpu.models.slm import (
        SLMFeatureExtractor,
        slm_feature_loss,
    )

    slm = SLMFeatureExtractor(n_layers=2)
    p = slm.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 3200)))[
        "params"
    ]
    a = jax.random.normal(jax.random.PRNGKey(1), (1, 3200)) * 0.1
    b = a + 0.01
    la = slm_feature_loss(slm.apply({"params": p}, a), slm.apply({"params": p}, a))
    lb = slm_feature_loss(slm.apply({"params": p}, a), slm.apply({"params": p}, b))
    assert float(la) == 0.0 and float(lb) > 0.0
