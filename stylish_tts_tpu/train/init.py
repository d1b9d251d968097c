"""Parameter initialisation for the model zoo and train-state assembly.

Shapes used at init are tiny: every module's parameters are independent of
sequence length, so we initialise on an 8-token / 12-frame dummy and reuse
the params for all buckets.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.slm import SLMFeatureExtractor
from .optim import init_opt_states as _init_opt_states  # noqa: F401  (compat)
from .state import TrainState, init_prior_state

INIT_T = 8
INIT_F = 12


def _cpu_init():
    """Context manager pinning init computations to host CPU.

    Init graphs are huge one-shot computations: running them through the
    TPU remote-compile service takes minutes AND leaves the compiled init
    program resident in HBM (the r4 jit-init of the SLM on-device cost
    ~0.1 GB of headroom and tipped the b8xf700 train-step compile over
    the 16 GB limit).  Arrays transfer to device on first use."""
    import contextlib

    try:
        # local_devices, NOT devices: under jax.distributed the global
        # list leads with process 0's CPU, and pinning another process's
        # eager ops to a non-addressable device segfaults inside XLA
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def init_model_variables(
    models: Dict[str, Any], mc: ModelConfig, rng: jax.Array,
    keys: Optional[List[str]] = None,
) -> Dict[str, Dict[str, Any]]:
    """Initialise flax variables for each named model.

    Returns {model_key: {"params": ..., "batch_stats": ...?}}."""
    b, t, f = 1, INIT_T, INIT_F
    tokens = jnp.zeros((b, t), jnp.int32)
    lengths = jnp.full((b,), t, jnp.int32)
    frame_lengths = jnp.full((b,), f, jnp.int32)
    align = jnp.zeros((b, t, f)).at[:, 0].set(1.0)
    pitch = jnp.full((b, f), 100.0)
    energy = jnp.ones((b, f))
    audio = jnp.zeros((b, f * mc.hop_length))
    mel = jnp.zeros((b, f, mc.n_mels))
    mel80 = jnp.zeros((b, f, 80))
    pe_dim = mc.pitch_energy_predictor.inter_dim
    pe_inter = jnp.zeros((b, t, pe_dim))
    style = jnp.zeros((b, mc.style_dim))
    spec_images = [
        jnp.zeros((b, r // 2 + 1, f, 1)) for r in (512, 1024, 2048)
    ]
    hubert_feats = jnp.zeros((b, f, mc.hubert.hidden_dim))
    spk_emb = jnp.zeros((b, mc.speaker_embedder.hidden_dim))
    timesteps = jnp.zeros((b,))

    init_args = {
        "text_aligner": (mel80, lengths),
        "duration_predictor": (tokens, lengths),
        "pitch_energy_predictor": (pe_inter, lengths, align, style),
        "speech_predictor": (tokens, lengths, align, pitch, energy, audio),
        "pe_text_encoder": (tokens, lengths),
        "pe_text_style_encoder": (pe_inter, lengths),
        "pe_mel_style_encoder": (mel,),
        "mrd": (spec_images, spec_images),
        "mpd": (audio, audio),
        "hubert_encoder": (hubert_feats, frame_lengths),
        "cfm_mel_decoder": (
            # feature space follows mc.cfm_mel_features (registry feat_dim)
            jnp.zeros(
                (b, f, 100 if mc.cfm_mel_features == "vocos" else mc.n_mels)
            ),
            timesteps, hubert_feats, pitch, energy, spk_emb,
        ),
        "cfm_pitch_predictor": (hubert_feats, mel),
        "hubert_speech_predictor": (
            hubert_feats, frame_lengths, spk_emb, pitch, energy, audio,
        ),
        "hubert_pitch_energy_predictor": (
            hubert_feats, frame_lengths, spk_emb,
        ),
    }
    out: Dict[str, Dict[str, Any]] = {}
    # Initialise on CPU: init graphs are huge one-shot computations that
    # take minutes each through the TPU remote-compile service but seconds
    # on host; the resulting arrays transfer to device on first use.
    with _cpu_init():
        for i, key in enumerate(keys if keys is not None else models.keys()):
            k = jax.random.fold_in(rng, i)
            rngs = {"params": k, "dropout": k, "sample": k}
            # jit the whole init: eager flax init dispatches thousands of
            # one-op XLA compiles (measured 100s+ of wall seconds on the
            # 8-virtual-device CPU mesh); one fused compile per module is
            # ~10x faster and benefits the TPU relay path equally.
            out[key] = jax.jit(models[key].init)(rngs, *init_args[key])
    return out


def init_slm_params(rng: jax.Array, mc: Optional[ModelConfig] = None) -> Any:
    """Frozen SLM feature net (see models/slm.py): converted WavLM weights
    when ``mc.slm.weights_path`` is set, random features otherwise."""
    layers = mc.slm.layers if mc is not None else 12
    slm = SLMFeatureExtractor(n_layers=layers)
    with _cpu_init():
        params = jax.jit(slm.init)(
            {"params": rng}, jnp.zeros((1, 1600))
        )["params"]
    if mc is not None and mc.slm.weights_path:
        from .checkpoint import load_model_safetensors

        params = load_model_safetensors(mc.slm.weights_path, params)
    return params


def init_vocos_params(rng: jax.Array, weights_path: Optional[str]) -> Any:
    """Frozen Vocos decoder params (models/vocos.py) from a converted
    checkpoint (scripts/convert_vocos.py); None when no weights are
    configured — validation then auditions via Griffin-Lim."""
    if not weights_path:
        return None
    from ..models.vocos import VOCOS_N_MELS, Vocos
    from .checkpoint import load_model_safetensors

    vocos = Vocos()
    with _cpu_init():
        params = jax.jit(vocos.init)(
            {"params": rng}, jnp.zeros((1, INIT_F, VOCOS_N_MELS))
        )["params"]
    return load_model_safetensors(weights_path, params)


def init_ssl_params(rng: jax.Array, mc: ModelConfig):
    """Frozen HuBERT + speaker-embedder params for the hubert/CFM stages
    (see models/ssl.py — loadable from converted checkpoints on disk)."""
    from ..models.ssl import AdaptiveHubert, SpeakerEmbeddingModel

    k1, k2 = jax.random.split(rng)
    hubert = AdaptiveHubert(
        model_sr=mc.sample_rate, hubert_sr=mc.hubert.sr,
        proj_dim=mc.hubert.hidden_dim,
    )
    with _cpu_init():
        hubert_p = jax.jit(hubert.init, static_argnums=2)(
            {"params": k1}, jnp.zeros((1, 4800)), 12
        )["params"]
    if mc.hubert.weights_path:
        from .checkpoint import load_model_safetensors

        # converted file holds the bare encoder tree (scripts/convert_hubert.py)
        hubert_p = dict(hubert_p)
        hubert_p["encoder"] = load_model_safetensors(
            mc.hubert.weights_path, hubert_p["encoder"]
        )
    spk = SpeakerEmbeddingModel(
        model_sr=mc.sample_rate, hidden_dim=mc.speaker_embedder.hidden_dim
    )
    with _cpu_init():
        spk_p = jax.jit(spk.init)(
            {"params": k2}, jnp.zeros((1, 4800))
        )["params"]
    if mc.speaker_embedder.weights_path:
        from .checkpoint import load_model_safetensors

        # converted vblinkp tree (scripts/convert_wespeaker.py) fills the
        # xvector submodule; requires hidden_dim == the natural 10240
        spk_p = dict(spk_p)
        spk_p["xvector"] = load_model_safetensors(
            mc.speaker_embedder.weights_path, spk_p["xvector"]
        )
    return hubert_p, spk_p


def build_train_state(
    variables: Dict[str, Dict[str, Any]],
    mc: ModelConfig,
) -> TrainState:
    params = {k: v["params"] for k, v in variables.items()}
    batch_stats = {
        k: v["batch_stats"] for k, v in variables.items() if "batch_stats" in v
    }
    from .optim import init_opt_states

    opt_states = init_opt_states(params)
    priors = init_prior_state(mc.text_encoder.tokens + 1)
    return TrainState(
        params=params,
        opt_states=opt_states,
        batch_stats=batch_stats,
        # explicit dtypes (weak_type=False): a weak-typed scalar here flips
        # aval after the first update and forces a full step retrace+recompile
        disc_ema={
            "mrd": jnp.array(1.5, dtype=jnp.float32),
            "mpd": jnp.array(2.5, dtype=jnp.float32),
        },
        step=jnp.zeros((), jnp.int32),
        **priors,
    )
