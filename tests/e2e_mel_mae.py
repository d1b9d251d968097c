"""End-to-end mel-MAE measurement: the COMPOSED inference graph
(reference ExportModel, train/models/export_model.py:35-45 —
pe_text_encoder -> pe_text_style_encoder -> pitch_energy_predictor ->
speech_predictor) runs in both frameworks from the SAME converted
weights, and the normalised log-mel of the two audio outputs is compared.

This is BASELINE.md's parity metric ("mel MAE < 1e-3 vs the torch
reference") measured at the full composition rather than per module.
No trained checkpoint ships with the reference (and this environment has
no network), so the weights are a seeded random torch init pushed through
the real conversion path — exactly what `import-torch` does to a trained
checkpoint, so the measured agreement transfers.

Determinism pins (same approach as test_speech_predictor_parity):
z-sampling off on both sides, the stochastic PCPH harmonic prior replaced
by one shared full-band noise wave (near-silent harmonic bins sit on the
atan2 branch cut where 1e-7 FFT noise flips raw phase inputs by 2π), and
``reference_band_mask=True`` on our side so the cross-attention replicates
the reference's inverted band mask that a migrated checkpoint was trained
with (see models/pitch_energy_predictor.py:build_monotonic_band_mask).
"""

from __future__ import annotations

import numpy as np


def measure_e2e_mel_mae():
    """Returns (mel_mae, audio_mae) of the composed inference graph."""
    import torch

    from torch_ref import install_reference, reference_model_config

    install_reference()
    import jax
    import jax.numpy as jnp

    from stylish_tts.train.models.models import build_model

    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.models.registry import build_models
    from stylish_tts_tpu.models.torch_convert import convert_module
    from stylish_tts_tpu.ops.mel import MelSpectrogram
    from stylish_tts_tpu.train.checkpoint import fill_from_flat
    from stylish_tts_tpu.train.init import init_model_variables

    torch.manual_seed(0)
    ref_models = build_model(reference_model_config())
    for m in ref_models.values():
        m.eval()
    mc = ModelConfig()
    # what `import-torch` sets for migrated checkpoints (default band
    # window on BOTH sides — production shapes, padded batch)
    mc.pitch_energy_predictor.reference_band_mask = True
    models = build_models(mc)

    # perturb zero-initialised projection heads so their conversion is
    # exercised (identical trick to the per-module parity test)
    with torch.no_grad():
        for p in ref_models["speech_predictor"].parameters():
            if float(p.abs().sum()) == 0.0:
                p.add_(0.02 * torch.randn_like(p))

    names = [
        "pe_text_encoder", "pe_text_style_encoder",
        "pitch_energy_predictor", "speech_predictor",
    ]
    converted = {}
    for name in names:
        variables = init_model_variables(
            models, mc, jax.random.PRNGKey(0), keys=[name]
        )[name]
        params_flat, stats_flat = convert_module(
            name, ref_models[name].state_dict()
        )
        out = dict(variables)
        out["params"] = fill_from_flat(params_flat, variables["params"])
        if stats_flat:
            out["batch_stats"] = fill_from_flat(
                stats_flat, variables["batch_stats"]
            )
        converted[name] = out

    B, T, frames = 2, 16, 20
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 170, size=(B, T))
    lengths = np.array([T, T - 5])
    tokens[1, T - 5:] = 0
    align = np.zeros((B, T, frames), np.float32)
    for b in range(B):
        n = int(lengths[b])
        bounds = np.linspace(0, frames, n + 1).astype(int)
        for t_i in range(n):
            align[b, t_i, bounds[t_i]:bounds[t_i + 1]] = 1.0

    pe = models["pitch_energy_predictor"]

    # -- determinism pins ------------------------------------------------
    import stylish_tts.train.models.generator as ref_gen_mod  # noqa: F401

    import stylish_tts_tpu.models.generator as my_gen_mod
    from stylish_tts_tpu.ops.stft import stft as stft_fn

    hop4 = mc.hop_length // 4
    wave = (
        0.1 * np.random.default_rng(6).standard_normal(
            (B, frames * mc.hop_length)
        )
    ).astype(np.float32)
    real_w, imag_w = stft_fn(
        jnp.asarray(wave), n_fft=mc.n_fft, hop_length=hop4,
        win_length=mc.win_length,
    )
    real_w, imag_w = np.asarray(real_w), np.asarray(imag_w)
    mag_w = np.abs(real_w + 1j * imag_w) + 1e-9
    cos_w, sin_w = real_w / mag_w, imag_w / mag_w

    def t(arr):  # [B, F, bins] -> torch [B, bins, F]
        return torch.tensor(arr.transpose(0, 2, 1))

    sp_ref = ref_models["speech_predictor"]
    sp_ref.generator.prior_generator = (
        lambda f0, voiced, *a, **k: torch.tensor(wave).unsqueeze(1)
    )
    sp_ref.generator.stft.transform = lambda x: (t(mag_w), t(cos_w), t(sin_w))
    orig_randn_like = torch.randn_like
    orig_pcph = my_gen_mod.generate_pcph
    orig_transform = my_gen_mod.STFTHead.transform
    torch.randn_like = lambda tns: torch.zeros_like(tns)
    my_gen_mod.generate_pcph = (
        lambda f0, voiced, rng_key, **kw: jnp.asarray(wave)
    )
    my_gen_mod.STFTHead.transform = lambda self, x: (
        jnp.asarray(mag_w), jnp.asarray(cos_w), jnp.asarray(sin_w),
    )
    try:
        # -- torch composed graph (ExportModel semantics) ----------------
        with torch.no_grad():
            enc_t, _, _ = ref_models["pe_text_encoder"](
                torch.tensor(tokens), torch.tensor(lengths)
            )
            style_t = ref_models["pe_text_style_encoder"](
                enc_t, torch.tensor(lengths)
            )
            pitch_t, energy_t = ref_models["pitch_energy_predictor"](
                enc_t, torch.tensor(lengths), torch.tensor(align), style_t
            )
            pred_t = sp_ref(
                torch.tensor(tokens), torch.tensor(lengths),
                torch.tensor(align), pitch_t, energy_t,
            )
        audio_t = pred_t.audio.numpy()[:, 0]

        # -- jax composed graph ------------------------------------------
        enc_j, _, _ = models["pe_text_encoder"].apply(
            converted["pe_text_encoder"], jnp.asarray(tokens),
            jnp.asarray(lengths),
        )
        style_j = models["pe_text_style_encoder"].apply(
            converted["pe_text_style_encoder"], enc_j, jnp.asarray(lengths)
        )
        pitch_j, energy_j = pe.apply(
            converted["pitch_energy_predictor"], enc_j,
            jnp.asarray(lengths), jnp.asarray(align), style_j,
        )
        pred_j = models["speech_predictor"].apply(
            converted["speech_predictor"], jnp.asarray(tokens),
            jnp.asarray(lengths), jnp.asarray(align), pitch_j, energy_j,
            sample=False, rngs={"sample": jax.random.PRNGKey(0)},
        )
        audio_j = np.asarray(pred_j.audio)
    finally:
        torch.randn_like = orig_randn_like
        my_gen_mod.generate_pcph = orig_pcph
        my_gen_mod.STFTHead.transform = orig_transform

    # the reference's own "mel" domain (multi_spectrogram.py:40-55):
    # log1p of the mel-scaled STFT MAGNITUDE — log-scaled where energy is,
    # linear near zero, so random-weight near-silent bins don't blow up
    # the metric the way raw log-mel does
    to_mel_mag = MelSpectrogram(
        n_mels=mc.n_mels, n_fft=mc.n_fft, win_length=mc.win_length,
        hop_length=mc.hop_length, sample_rate=mc.sample_rate, power=1.0,
    )
    to_mel = MelSpectrogram(
        n_mels=mc.n_mels, n_fft=mc.n_fft, win_length=mc.win_length,
        hop_length=mc.hop_length, sample_rate=mc.sample_rate,
    )

    def log1p_mel(a):
        return np.asarray(jnp.log1p(to_mel_mag(jnp.asarray(a))))

    def log_mel(a):
        return np.asarray(jnp.log(1e-5 + to_mel(jnp.asarray(a))))

    mel_mae = float(np.abs(log1p_mel(audio_j) - log1p_mel(audio_t)).mean())
    log_mel_mae = float(np.abs(log_mel(audio_j) - log_mel(audio_t)).mean())
    audio_mae = float(np.abs(audio_j - audio_t).mean())
    return mel_mae, log_mel_mae, audio_mae
