"""Numerical parity: reference torch modules vs our flax modules after
weight conversion (models/torch_convert.py).

Each test random-initialises the torch reference module, converts its
state_dict, loads it into the matching flax module, and asserts the two
forwards agree.  This is the proof obligation behind BASELINE.md's
"mel MAE < 1e-3 vs torch reference" and the user-facing checkpoint
migration path.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stylish_tts_tpu.config import ModelConfig  # noqa: E402
from stylish_tts_tpu.models.registry import build_models  # noqa: E402
from stylish_tts_tpu.models.torch_convert import convert_module  # noqa: E402
from stylish_tts_tpu.train.checkpoint import fill_from_flat  # noqa: E402
from stylish_tts_tpu.train.init import init_model_variables  # noqa: E402

from torch_ref import install_reference, reference_model_config  # noqa: E402

B, T, F = 2, 16, 24


@pytest.fixture(scope="module")
def zoo():
    """(torch reference modules, our flax module defs, our ModelConfig)."""
    install_reference()
    from stylish_tts.train.models.models import build_model

    torch.manual_seed(0)
    ref_models = build_model(reference_model_config())
    for m in ref_models.values():
        m.eval()
    return ref_models, build_models(ModelConfig()), ModelConfig()


def _load(models, mc, name, state_dict, rng=0):
    """Init our flax module and overwrite its variables from the torch
    state_dict via the converter."""
    variables = init_model_variables(
        models, mc, jax.random.PRNGKey(rng), keys=[name]
    )[name]
    params_flat, stats_flat = convert_module(name, state_dict)
    out = dict(variables)
    out["params"] = fill_from_flat(params_flat, variables["params"])
    if stats_flat:
        out["batch_stats"] = fill_from_flat(
            stats_flat, variables["batch_stats"]
        )
    return out


def _tokens_and_lengths():
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 170, size=(B, T))
    lengths = np.array([T, T - 5])
    tokens[1, T - 5:] = 0
    return tokens, lengths


def _alignment(lengths):
    """Hard monotonic alignment [B, T, F] matching token lengths."""
    align = np.zeros((B, T, F), np.float32)
    for b in range(B):
        n = int(lengths[b])
        bounds = np.linspace(0, F, n + 1).astype(int)
        for t in range(n):
            align[b, t, bounds[t]:bounds[t + 1]] = 1.0
    return align


def test_pe_text_encoder_parity(zoo):
    ref_models, models, mc = zoo
    tokens, lengths = _tokens_and_lengths()
    with torch.no_grad():
        mu_t, x_t, mask_t = ref_models["pe_text_encoder"](
            torch.tensor(tokens), torch.tensor(lengths)
        )
    variables = _load(
        models, mc, "pe_text_encoder",
        ref_models["pe_text_encoder"].state_dict(),
    )
    mu_j, x_j, _ = models["pe_text_encoder"].apply(
        variables, jnp.asarray(tokens), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(
        np.asarray(mu_j), mu_t.numpy().transpose(0, 2, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(x_j), x_t.numpy().transpose(0, 2, 1), atol=2e-4
    )


def test_pe_text_style_encoder_parity(zoo):
    ref_models, models, mc = zoo
    rng = np.random.default_rng(1)
    pe_dim = mc.pitch_energy_predictor.inter_dim
    x = rng.standard_normal((B, T, pe_dim)).astype(np.float32)
    lengths = np.array([T, T - 5])
    x[1, T - 5:] = 0.0
    with torch.no_grad():
        s_t = ref_models["pe_text_style_encoder"](
            torch.tensor(x).transpose(1, 2), torch.tensor(lengths)
        )
    variables = _load(
        models, mc, "pe_text_style_encoder",
        ref_models["pe_text_style_encoder"].state_dict(),
    )
    s_j = models["pe_text_style_encoder"].apply(
        variables, jnp.asarray(x), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(np.asarray(s_j), s_t.numpy(), atol=2e-4)


def test_duration_predictor_parity(zoo):
    ref_models, models, mc = zoo
    tokens, lengths = _tokens_and_lengths()
    with torch.no_grad():
        d_t = ref_models["duration_predictor"](
            torch.tensor(tokens), torch.tensor(lengths)
        )
    variables = _load(
        models, mc, "duration_predictor",
        ref_models["duration_predictor"].state_dict(),
    )
    d_j = models["duration_predictor"].apply(
        variables, jnp.asarray(tokens), jnp.asarray(lengths)
    )
    # compare valid positions only (padded tail differs by masking policy)
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(d_j)[b, :n], d_t.numpy()[b, :n], atol=5e-4
        )


def test_text_aligner_parity(zoo):
    ref_models, models, mc = zoo
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((B, F, 80)).astype(np.float32)
    lengths = np.array([F, F - 7])
    mel[1, F - 7:] = 0.0
    with torch.no_grad():
        logp_t, _ = ref_models["text_aligner"](
            torch.tensor(mel), torch.tensor(lengths)
        )  # (T, N, C)
    variables = _load(
        models, mc, "text_aligner", ref_models["text_aligner"].state_dict()
    )
    logp_j, _ = models["text_aligner"].apply(
        variables, jnp.asarray(mel), jnp.asarray(lengths)
    )  # [B, T, C]
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(logp_j)[b, :n],
            logp_t.numpy().transpose(1, 0, 2)[b, :n],
            atol=5e-4,
        )


def test_pitch_energy_predictor_parity(zoo):
    """Weights parity with the cross-attention band disabled: the reference
    passes its band mask with inverted semantics into MHA (True-means-allowed
    there, build_monotonic_band_mask docstring says True-means-blocked,
    pitch_energy_predictor.py:194-212), so it attends everywhere EXCEPT the
    monotonic band.  We deliberately fixed that (models/pitch_energy_predictor
    .py); with window >= T and full-length batches both reduce to unmasked
    attention, which exercises every converted weight."""
    ref_models, models, mc = zoo
    tokens_rng = np.random.default_rng(3)
    pe_dim = mc.pitch_energy_predictor.inter_dim
    enc = tokens_rng.standard_normal((B, T, pe_dim)).astype(np.float32)
    lengths = np.array([T, T])
    align = _alignment(lengths)
    style = tokens_rng.standard_normal((B, mc.style_dim)).astype(np.float32)

    ref = ref_models["pitch_energy_predictor"]
    ref.cross_window = T  # band covers all tokens
    with torch.no_grad():
        f0_t, n_t = ref(
            torch.tensor(enc).transpose(1, 2),
            torch.tensor(lengths),
            torch.tensor(align),
            torch.tensor(style),
        )
    variables = _load(
        models, mc, "pitch_energy_predictor", ref.state_dict()
    )
    pe = models["pitch_energy_predictor"].clone(cross_window=T)
    f0_j, n_j = pe.apply(
        variables,
        jnp.asarray(enc),
        jnp.asarray(lengths),
        jnp.asarray(align),
        jnp.asarray(style),
    )
    np.testing.assert_allclose(np.asarray(f0_j), f0_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(n_j), n_t.numpy(), atol=1e-3)


def test_speech_predictor_parity(zoo, monkeypatch):
    """End-to-end acoustic model parity (inference + training paths).

    Randomness pinned on both sides: z = mean (torch.randn_like zeroed /
    sample=False) and a deterministic PCPH prior (no noise, no random
    phase).  Zero-initialised flow/prior/posterior projection heads are
    perturbed first so their conversion is actually exercised."""
    ref_models, models, mc = zoo
    ref = ref_models["speech_predictor"]
    torch.manual_seed(5)
    with torch.no_grad():
        for p in ref.parameters():
            if float(p.abs().sum()) == 0.0:
                p.add_(0.02 * torch.randn_like(p))

    rng = np.random.default_rng(5)
    frames = 20
    tokens, lengths = _tokens_and_lengths()
    align = _alignment(lengths)[:, :, :frames]
    align = align / np.maximum(align.sum(axis=1, keepdims=True), 1e-6)
    pitch = (100.0 + 80.0 * rng.random((B, frames))).astype(np.float32)
    energy = rng.random((B, frames)).astype(np.float32)
    audio_gt = (0.1 * rng.standard_normal((B, frames * mc.hop_length))).astype(
        np.float32
    )

    import stylish_tts.train.models.generator as ref_gen_mod
    import stylish_tts_tpu.models.generator as my_gen_mod

    # init before the prior monkeypatch (init shapes differ from the test's)
    variables = _load(models, mc, "speech_predictor", ref.state_dict())

    # The deterministic PCPH priors agree directly ...
    pitch4 = np.repeat(pitch, 4, axis=1)
    tp = torch.tensor(pitch4).unsqueeze(1)
    with torch.no_grad():
        prior_t = ref_gen_mod.generate_pcph(
            tp, (tp > 10.0).float(), hop_length=mc.hop_length // 4,
            sample_rate=mc.sample_rate, noise_amplitude=0.0,
            random_init_phase=False,
        )[:, 0]
    prior_j = my_gen_mod.generate_pcph(
        jnp.asarray(pitch4),
        (jnp.asarray(pitch4) > 10.0).astype(jnp.float32),
        jax.random.PRNGKey(0), hop_length=mc.hop_length // 4,
        sample_rate=mc.sample_rate, noise_amplitude=0.0,
        random_init_phase=False,
    )
    np.testing.assert_allclose(
        np.asarray(prior_j), prior_t.numpy(), atol=2e-4
    )

    # ... but STFT phase is fed RAW into convs (phase_prior_conv, the
    # posterior's pre_phase) and the center-pad reflect makes frame 0
    # symmetric: its imag part is ~0, so every negative-real bin sits ON
    # the atan2 branch cut where 1e-7 FFT noise flips the value by 2π.
    # To test weights rather than branch-cut luck, feed BOTH sides
    # identical precomputed STFT outputs (atan2 of identical floats picks
    # identical branches).
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))

    import stylish_tts_tpu.models.flow as my_flow_mod
    from stylish_tts_tpu.ops.stft import stft as stft_fn

    hop4 = mc.hop_length // 4

    def fixed_spectra(w):
        real, imag = stft_fn(
            jnp.asarray(w), n_fft=mc.n_fft, hop_length=hop4,
            win_length=mc.win_length,
        )
        real, imag = np.asarray(real), np.asarray(imag)
        mag = np.abs(real + 1j * imag) + 1e-9
        return real, imag, mag, real / mag, imag / mag

    # pin the stochastic prior to one full-band noise waveform on both
    # sides (harmonic priors also have near-silent bins with noise phase)
    wave = (
        0.1 * np.random.default_rng(6).standard_normal(
            (B, frames * mc.hop_length)
        )
    ).astype(np.float32)
    _, _, mag_w, cos_w, sin_w = fixed_spectra(wave)
    real_a, imag_a, mag_a, cos_a, sin_a = fixed_spectra(audio_gt)

    def t(arr):  # [B, F, bins] -> torch [B, bins, F]
        return torch.tensor(arr.transpose(0, 2, 1))

    ref.generator.prior_generator = (
        lambda f0, voiced, *a, **k: torch.tensor(wave).unsqueeze(1)
    )
    ref.generator.stft.transform = lambda x: (t(mag_w), t(cos_w), t(sin_w))
    ref.posterior_encoder.stft.transform = lambda x: (
        t(mag_a), t(cos_a), t(sin_a),
    )
    monkeypatch.setattr(
        my_gen_mod, "generate_pcph",
        lambda f0, voiced, rng_key, **kw: jnp.asarray(wave),
    )
    monkeypatch.setattr(
        my_gen_mod.STFTHead, "transform",
        lambda self, x: (
            jnp.asarray(mag_w), jnp.asarray(cos_w), jnp.asarray(sin_w),
        ),
    )
    monkeypatch.setattr(
        my_flow_mod, "stft",
        lambda audio, **kw: (jnp.asarray(real_a), jnp.asarray(imag_a)),
    )

    rngs = {"sample": jax.random.PRNGKey(0)}

    with torch.no_grad():
        pred_t = ref(
            torch.tensor(tokens),
            torch.tensor(lengths),
            torch.tensor(align),
            torch.tensor(pitch),
            torch.tensor(energy),
        )
    pred_j = models["speech_predictor"].apply(
        variables,
        jnp.asarray(tokens),
        jnp.asarray(lengths),
        jnp.asarray(align),
        jnp.asarray(pitch),
        jnp.asarray(energy),
        sample=False,
        rngs=rngs,
    )
    np.testing.assert_allclose(
        np.asarray(pred_j.magnitude),
        pred_t.magnitude.numpy().transpose(0, 2, 1),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(pred_j.audio), pred_t.audio.numpy()[:, 0], atol=2e-3
    )

    with torch.no_grad():
        pred_t = ref(
            torch.tensor(tokens),
            torch.tensor(lengths),
            torch.tensor(align),
            torch.tensor(pitch),
            torch.tensor(energy),
            torch.tensor(audio_gt),
        )
    pred_j = models["speech_predictor"].apply(
        variables,
        jnp.asarray(tokens),
        jnp.asarray(lengths),
        jnp.asarray(align),
        jnp.asarray(pitch),
        jnp.asarray(energy),
        jnp.asarray(audio_gt),
        sample=False,
        rngs=rngs,
    )
    np.testing.assert_allclose(
        np.asarray(pred_j.audio), pred_t.audio.numpy()[:, 0], atol=2e-3
    )
    for name in ("text_stats", "text2mel_stats", "mel_stats", "mel2text_stats"):
        stats_t = getattr(pred_t, name)
        stats_j = getattr(pred_j, name)
        for j_arr, t_arr in zip(
            stats_j, (stats_t.z, stats_t.mean, stats_t.logstd)
        ):
            np.testing.assert_allclose(
                np.asarray(j_arr),
                t_arr.numpy().transpose(0, 2, 1),
                atol=2e-3,
                err_msg=name,
            )


def test_hubert_encoder_parity(zoo):
    ref_models, models, mc = zoo
    rng = np.random.default_rng(9)
    phones = rng.standard_normal((B, F, mc.hubert.hidden_dim)).astype(np.float32)
    lengths = np.array([F, F - 6])
    phones[1, F - 6:] = 0.0
    with torch.no_grad():
        y_t = ref_models["hubert_encoder"](
            torch.tensor(phones).transpose(1, 2), torch.tensor(lengths)
        )
    variables = _load(
        models, mc, "hubert_encoder", ref_models["hubert_encoder"].state_dict()
    )
    y_j = models["hubert_encoder"].apply(
        variables, jnp.asarray(phones), jnp.asarray(lengths)
    )
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(y_j)[b, :n], y_t.numpy().transpose(0, 2, 1)[b, :n],
            atol=5e-4,
        )


def test_hubert_pitch_energy_predictor_parity(zoo):
    ref_models, models, mc = zoo
    rng = np.random.default_rng(10)
    phones = rng.standard_normal((B, F, mc.hubert.hidden_dim)).astype(np.float32)
    lengths = np.array([F, F])
    spk = rng.standard_normal((B, mc.speaker_embedder.hidden_dim)).astype(
        np.float32
    )
    ref = ref_models["hubert_pitch_energy_predictor"]
    with torch.no_grad():
        f0_t, n_t = ref(
            torch.tensor(phones).transpose(1, 2),
            torch.tensor(lengths),
            torch.tensor(spk),
        )
    variables = _load(
        models, mc, "hubert_pitch_energy_predictor", ref.state_dict()
    )
    f0_j, n_j = models["hubert_pitch_energy_predictor"].apply(
        variables, jnp.asarray(phones), jnp.asarray(lengths), jnp.asarray(spk)
    )
    np.testing.assert_allclose(np.asarray(f0_j), f0_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(n_j), n_t.numpy(), atol=1e-3)


def test_hubert_speech_predictor_parity(zoo, monkeypatch):
    """Same stochastic-path pinning as test_speech_predictor_parity, with
    SSL phone features + speaker embedding replacing text + style."""
    ref_models, models, mc = zoo
    ref = ref_models["hubert_speech_predictor"]
    torch.manual_seed(11)
    with torch.no_grad():
        for p in ref.parameters():
            if float(p.abs().sum()) == 0.0:
                p.add_(0.02 * torch.randn_like(p))

    rng = np.random.default_rng(11)
    frames = 20
    phones = rng.standard_normal((B, frames, mc.hubert.hidden_dim)).astype(
        np.float32
    )
    lengths = np.array([frames, frames])
    spk = rng.standard_normal((B, mc.speaker_embedder.hidden_dim)).astype(
        np.float32
    )
    pitch = (100.0 + 80.0 * rng.random((B, frames))).astype(np.float32)
    energy = rng.random((B, frames)).astype(np.float32)

    import stylish_tts_tpu.models.generator as my_gen_mod
    import stylish_tts_tpu.models.flow as my_flow_mod
    from stylish_tts_tpu.ops.stft import stft as stft_fn

    variables = _load(models, mc, "hubert_speech_predictor", ref.state_dict())

    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))
    wave = (
        0.1 * np.random.default_rng(12).standard_normal(
            (B, frames * mc.hop_length)
        )
    ).astype(np.float32)
    real, imag = stft_fn(
        jnp.asarray(wave), n_fft=mc.n_fft, hop_length=mc.hop_length // 4,
        win_length=mc.win_length,
    )
    real, imag = np.asarray(real), np.asarray(imag)
    mag = np.abs(real + 1j * imag) + 1e-9
    cos, sin = real / mag, imag / mag

    def t(arr):
        return torch.tensor(arr.transpose(0, 2, 1))

    ref.generator.prior_generator = (
        lambda f0, voiced, *a, **k: torch.tensor(wave).unsqueeze(1)
    )
    ref.generator.stft.transform = lambda x: (t(mag), t(cos), t(sin))
    monkeypatch.setattr(
        my_gen_mod, "generate_pcph",
        lambda f0, voiced, rng_key, **kw: jnp.asarray(wave),
    )
    monkeypatch.setattr(
        my_gen_mod.STFTHead, "transform",
        lambda self, x: (jnp.asarray(mag), jnp.asarray(cos), jnp.asarray(sin)),
    )

    with torch.no_grad():
        pred_t = ref(
            torch.tensor(phones).transpose(1, 2),
            torch.tensor(lengths),
            torch.tensor(spk),
            torch.tensor(pitch),
            torch.tensor(energy),
        )
    pred_j = models["hubert_speech_predictor"].apply(
        variables,
        jnp.asarray(phones),
        jnp.asarray(lengths),
        jnp.asarray(spk),
        jnp.asarray(pitch),
        jnp.asarray(energy),
        sample=False,
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(pred_j.magnitude),
        pred_t.magnitude.numpy().transpose(0, 2, 1),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(pred_j.audio), pred_t.audio.numpy()[:, 0], atol=2e-3
    )


def test_cfm_pitch_predictor_parity(zoo):
    ref_models, models, mc = zoo
    rng = np.random.default_rng(13)
    frames = 64
    asr = rng.standard_normal((B, frames, mc.hubert.hidden_dim)).astype(
        np.float32
    )
    mel = rng.standard_normal((B, frames, mc.n_mels)).astype(np.float32)
    ref = ref_models["cfm_pitch_predictor"]
    ref.train()
    with torch.no_grad():  # converge spectral-norm power iteration
        for _ in range(100):
            ref(torch.tensor(asr).transpose(1, 2), torch.tensor(mel).mT)
    ref.eval()
    with torch.no_grad():
        f0_t = ref(torch.tensor(asr).transpose(1, 2), torch.tensor(mel).mT)
    variables = _load(models, mc, "cfm_pitch_predictor", ref.state_dict())
    f0_j = models["cfm_pitch_predictor"].apply(
        variables, jnp.asarray(asr), jnp.asarray(mel)
    )
    np.testing.assert_allclose(
        np.asarray(f0_j), f0_t.numpy()[:, 0], atol=5e-3
    )


def test_cfm_mel_decoder_parity(zoo, monkeypatch):
    ref_models, models, mc = zoo
    rng = np.random.default_rng(14)
    frames = 48
    x = rng.standard_normal((B, frames, mc.n_mels)).astype(np.float32)
    asr = rng.standard_normal((B, frames, mc.hubert.hidden_dim)).astype(
        np.float32
    )
    f0 = (100.0 + 50.0 * rng.random((B, frames))).astype(np.float32)
    energy = rng.random((B, frames)).astype(np.float32)
    spk = rng.standard_normal((B, mc.speaker_embedder.hidden_dim)).astype(
        np.float32
    )
    t = rng.random((B,)).astype(np.float32)

    ref = ref_models["cfm_mel_decoder"]
    variables = _load(models, mc, "cfm_mel_decoder", ref.state_dict())

    # pin the sine-source noise to zero on both sides
    monkeypatch.setattr(torch, "randn_like", lambda v: torch.zeros_like(v))
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(*a, **k))
    real_normal = jax.random.normal
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    try:
        with torch.no_grad():
            y_t = ref._forward(
                torch.tensor(x).mT,
                torch.tensor(asr).transpose(1, 2),
                torch.tensor(f0),
                torch.tensor(energy),
                torch.tensor(spk),
                torch.tensor(t),
            )
        y_j = models["cfm_mel_decoder"].apply(
            variables,
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(asr),
            jnp.asarray(f0), jnp.asarray(energy), jnp.asarray(spk),
            rngs={"sample": jax.random.PRNGKey(0)},
        )
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    np.testing.assert_allclose(
        np.asarray(y_j), y_t.numpy().transpose(0, 2, 1), atol=3e-3
    )


def test_rmvpe_parity():
    """The published RMVPE pitch model (E2E0(4,1,(2,2))) converts into
    dataprep.rmvpe.RMVPE: deep U-net with BN running stats, transposed
    convs, BiGRU and head all match the torch forward in eval mode."""
    install_reference()
    from stylish_tts.train.dataprep.rmvpe.model import E2E0

    from stylish_tts_tpu.dataprep.rmvpe import RMVPE
    from stylish_tts_tpu.models.torch_convert import convert_rmvpe

    torch.manual_seed(21)
    ref = E2E0(4, 1, (2, 2))
    # give BN non-trivial running stats
    with torch.no_grad():
        for k, v in ref.state_dict().items():
            if k.endswith("running_mean"):
                v.add_(0.1 * torch.randn_like(v))
            elif k.endswith("running_var"):
                v.mul_(torch.exp(0.1 * torch.randn_like(v)))
    ref.eval()

    rng = np.random.default_rng(21)
    mel = rng.standard_normal((1, 32, 128)).astype(np.float32)
    with torch.no_grad():
        # reference forward takes [B, M, T] and transposes internally
        y_t = ref(torch.tensor(mel).mT)

    model = RMVPE()
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(mel))
    params_flat, stats_flat = convert_rmvpe(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    variables = {
        "params": fill_from_flat(params_flat, variables["params"]),
        "batch_stats": fill_from_flat(stats_flat, variables["batch_stats"]),
    }
    y_j = model.apply(variables, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=5e-4)


def test_rmvpe_convert_roundtrip(tmp_path):
    """scripts/convert_rmvpe.py format loads into RMVPEInference and the
    end-to-end audio->f0 path runs (random weights; values are junk)."""
    install_reference()
    from stylish_tts.train.dataprep.rmvpe.model import E2E0

    from stylish_tts_tpu.dataprep.rmvpe import RMVPEInference
    from stylish_tts_tpu.export.import_torch import BATCH_STATS_PREFIX
    from stylish_tts_tpu.models.torch_convert import convert_rmvpe

    torch.manual_seed(22)
    ref = E2E0(4, 1, (2, 2))
    params, stats = convert_rmvpe(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    from safetensors.numpy import save_file

    flat = dict(params)
    for k, v in stats.items():
        flat[BATCH_STATS_PREFIX + k] = np.atleast_1d(np.asarray(v))
    path = tmp_path / "rmvpe.safetensors"
    save_file(flat, str(path))

    infer = RMVPEInference(str(path))
    audio = (0.5 * np.sin(
        2 * np.pi * 220.0 * np.arange(16000) / 16000.0
    )).astype(np.float32)
    f0 = infer(audio)
    assert f0.shape[0] > 90 and np.isfinite(f0).all()


def test_mrd_parity(zoo):
    """Spec discriminators: weight-normed 2D convs with torch-style
    explicit padding (even-width stride-2 parity)."""
    ref_models, models, mc = zoo
    rng = np.random.default_rng(7)
    frames = 24  # even width exercises the stride-2 padding path
    target = [
        rng.standard_normal((B, r // 2 + 1, frames, 1)).astype(np.float32)
        for r in (512, 1024, 2048)
    ]
    pred = [
        rng.standard_normal((B, r // 2 + 1, frames, 1)).astype(np.float32)
        for r in (512, 1024, 2048)
    ]
    with torch.no_grad():
        sr_t, sg_t, fr_t, _ = ref_models["mrd"](
            target_list=[torch.tensor(t.transpose(0, 3, 1, 2)) for t in target],
            pred_list=[torch.tensor(p.transpose(0, 3, 1, 2)) for p in pred],
        )
    variables = _load(models, mc, "mrd", ref_models["mrd"].state_dict())
    sr_j, sg_j, fr_j, _ = models["mrd"].apply(
        variables, [jnp.asarray(t) for t in target], [jnp.asarray(p) for p in pred]
    )
    for j, t in zip(sr_j + sg_j, sr_t + sg_t):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy(), atol=2e-4
        )
    # feature maps ([B,C,H,W] torch vs [B,H,W,C] flax)
    for j, t in zip(fr_j[0], fr_t[0]):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy().transpose(0, 2, 3, 1), atol=2e-4
        )


def test_mpd_parity(zoo):
    ref_models, models, mc = zoo
    rng = np.random.default_rng(8)
    audio = (0.2 * rng.standard_normal((B, 2310))).astype(np.float32)
    with torch.no_grad():
        sr_t, sg_t, _, _ = ref_models["mpd"](
            torch.tensor(audio), torch.tensor(audio[:, ::-1].copy())
        )
    variables = _load(models, mc, "mpd", ref_models["mpd"].state_dict())
    sr_j, sg_j, _, _ = models["mpd"].apply(
        variables, jnp.asarray(audio), jnp.asarray(audio[:, ::-1].copy())
    )
    for j, t in zip(sr_j + sg_j, sr_t + sg_t):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=2e-4)


def test_import_torch_checkpoint(zoo, tmp_path):
    """User migration path: a reference accelerator save_state directory
    imports into a TPU inference artifact that speaks."""
    ref_models, models, mc = zoo
    ckpt = tmp_path / "checkpoint_00001_step_000000100"
    ckpt.mkdir()
    from stylish_tts_tpu.export.import_torch import (
        REFERENCE_SAVE_ORDER,
        import_torch_checkpoint,
        load_converted_module,
    )

    for i, name in enumerate(REFERENCE_SAVE_ORDER):
        if name in (
            "duration_predictor", "pe_text_encoder", "pe_text_style_encoder",
            "pitch_energy_predictor", "speech_predictor", "text_aligner",
        ):
            suffix = "" if i == 0 else f"_{i}"
            torch.save(
                ref_models[name].state_dict(),
                ckpt / f"pytorch_model{suffix}.bin",
            )

    artifact = tmp_path / "artifact"
    import_torch_checkpoint(ckpt, artifact, mc)
    assert (artifact / "speech_predictor.safetensors").exists()
    assert (artifact / "text_aligner.safetensors").exists()
    assert (artifact / "model_config.json").exists()

    # aligner roundtrip including BatchNorm running stats
    variables = init_model_variables(
        models, mc, jax.random.PRNGKey(0), keys=["text_aligner"]
    )["text_aligner"]
    loaded = load_converted_module(
        artifact / "text_aligner.safetensors", variables
    )
    bn_mean = np.asarray(loaded["batch_stats"]["bn_0"]["mean"])
    ref_mean = (
        ref_models["text_aligner"]
        .state_dict()["encoder.layers.0.2.running_mean"]
        .numpy()
    )
    np.testing.assert_allclose(bn_mean, ref_mean, atol=1e-6)

    # the artifact drives the jitted two-graph Synthesizer end to end
    from stylish_tts_tpu.export.infer import Synthesizer
    from stylish_tts_tpu.export.package import load_inference_params

    params = load_inference_params(str(artifact), mc)
    synth = Synthesizer(mc, params)
    audio = synth.synthesize("ðɪs ɪz ɐ tˈɛst")
    assert audio.ndim == 1 and audio.size > 0
    assert np.isfinite(audio).all()


def test_seed_state_from_torch(zoo, tmp_path):
    """train --init-torch seeding: converted params land in the
    TrainState; models without files stay at their random init."""
    from stylish_tts_tpu.train.init import build_train_state
    from stylish_tts_tpu.train.torch_seed import seed_state_from_torch

    ref_models, models, mc = zoo
    ckpt = tmp_path / "ref_ckpt"
    ckpt.mkdir()
    torch.save(ref_models["text_aligner"].state_dict(),
               ckpt / "pytorch_model.bin")
    torch.save(ref_models["mrd"].state_dict(), ckpt / "pytorch_model_4.bin")

    variables = init_model_variables(
        models, mc, jax.random.PRNGKey(0), keys=["text_aligner", "mrd"]
    )
    state = build_train_state(variables, mc)
    before = np.asarray(
        jax.tree_util.tree_leaves(state.params["mrd"])[0]
    ).copy()
    seeded = seed_state_from_torch(state, ckpt)

    ref_out = ref_models["text_aligner"].state_dict()[
        "encoder_output_layer.weight"
    ].numpy()
    np.testing.assert_allclose(
        np.asarray(seeded.params["text_aligner"]["out"]["kernel"]),
        ref_out.T, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(seeded.batch_stats["text_aligner"]["bn_1"]["var"]),
        ref_models["text_aligner"].state_dict()[
            "encoder.layers.1.2.running_var"
        ].numpy(),
        atol=1e-6,
    )
    after = np.asarray(jax.tree_util.tree_leaves(seeded.params["mrd"])[0])
    assert not np.allclose(before, after)  # mrd weights were replaced


def test_pe_mel_style_encoder_parity(zoo):
    ref_models, models, mc = zoo
    rng = np.random.default_rng(4)
    frames = 64
    mel = rng.standard_normal((B, frames, mc.n_mels)).astype(np.float32)
    ref = ref_models["pe_mel_style_encoder"]
    # converge the spectral-norm power iteration (torch updates u/v once per
    # train-mode forward; flax refines from the stored u at apply time)
    ref.train()
    with torch.no_grad():
        for _ in range(100):
            ref(torch.tensor(mel).transpose(1, 2).unsqueeze(1))
    ref.eval()
    with torch.no_grad():
        s_t = ref(torch.tensor(mel).transpose(1, 2).unsqueeze(1))
    variables = _load(
        models, mc, "pe_mel_style_encoder", ref.state_dict()
    )
    s_j = models["pe_mel_style_encoder"].apply(variables, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(s_j), s_t.numpy(), atol=2e-3)


@pytest.mark.slow
def test_end_to_end_mel_mae():
    """BASELINE.md parity target measured at the COMPOSED inference graph:
    mel MAE < 1e-3 vs the torch reference through converted weights (see
    tests/e2e_mel_mae.py; scripts/mel_mae.py publishes the number)."""
    from e2e_mel_mae import measure_e2e_mel_mae

    mel_mae, log_mel_mae, audio_mae = measure_e2e_mel_mae()
    print(
        f"end-to-end mel MAE (log1p-mel-magnitude, the reference's mel-loss "
        f"domain): {mel_mae:.2e}; raw log-mel MAE: {log_mel_mae:.2e}; "
        f"audio MAE: {audio_mae:.2e}"
    )
    assert mel_mae < 1e-3, (mel_mae, log_mel_mae, audio_mae)
    assert audio_mae < 1e-3, audio_mae


def test_vocos_parity():
    """models/vocos.py:Vocos vs a torch build of the published Vocos
    decode path (backbone + ISTFTHead, vocos/models.py — the package is
    not installable air-gapped, so the torch side is assembled here with
    the checkpoint's exact module/buffer naming), through convert_vocos."""
    import torch.nn.functional as tF

    dim, inter, n_layers, n_mels, n_fft, hop = 32, 64, 2, 12, 64, 16

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dwconv = torch.nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
            self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
            self.pwconv1 = torch.nn.Linear(dim, inter)
            self.pwconv2 = torch.nn.Linear(inter, dim)
            self.gamma = torch.nn.Parameter(
                (1.0 / n_layers) * torch.ones(dim)
            )

        def forward(self, x):  # [B, C, T]
            r = x
            x = self.dwconv(x).transpose(1, 2)
            x = self.norm(x)
            x = self.pwconv2(tF.gelu(self.pwconv1(x)))
            x = (self.gamma * x).transpose(1, 2)
            return r + x

    class Backbone(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = torch.nn.Conv1d(n_mels, dim, 7, padding=3)
            self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
            self.convnext = torch.nn.ModuleList(
                Block() for _ in range(n_layers)
            )
            self.final_layer_norm = torch.nn.LayerNorm(dim, eps=1e-6)

        def forward(self, mel):  # [B, n_mels, T] -> [B, T, C]
            x = self.embed(mel)
            x = self.norm(x.transpose(1, 2)).transpose(1, 2)
            for block in self.convnext:
                x = block(x)
            return self.final_layer_norm(x.transpose(1, 2))

    class Head(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.out = torch.nn.Linear(dim, n_fft + 2)

        def forward(self, x):  # [B, T, C] -> [B, samples]
            x = self.out(x)
            mag, p = x.chunk(2, dim=-1)
            mag = torch.clip(torch.exp(mag), max=1e2)
            spec = mag * (torch.cos(p) + 1j * torch.sin(p))
            return torch.istft(
                spec.transpose(1, 2), n_fft, hop_length=hop,
                win_length=n_fft, window=torch.hann_window(n_fft),
                center=True,
            )

    class TorchVocos(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.head = Head()

        def forward(self, mel):
            return self.head(self.backbone(mel))

    torch.manual_seed(0)
    ref = TorchVocos().eval()
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 20, n_mels)).astype(np.float32)
    with torch.no_grad():
        audio_t = ref(torch.tensor(mel).transpose(1, 2))

    from stylish_tts_tpu.models.torch_convert import convert_vocos
    from stylish_tts_tpu.models.vocos import Vocos

    model = Vocos(
        n_mels=n_mels, dim=dim, intermediate_dim=inter,
        n_layers=n_layers, n_fft=n_fft, hop_length=hop,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(mel))
    params = fill_from_flat(
        convert_vocos(ref.state_dict()), variables["params"]
    )
    audio_j = model.apply({"params": params}, jnp.asarray(mel))
    assert audio_j.shape[-1] == audio_t.shape[-1]
    np.testing.assert_allclose(
        np.asarray(audio_j), audio_t.numpy(), atol=2e-4
    )


def test_wespeaker_parity():
    """models/wespeaker.py vs a torch build of wespeaker's
    SimAM_ResNet34_ASP (the package is not installable air-gapped; the
    torch side follows its module naming exactly — front.*, pooling.
    attention.{0,2,3}, bottleneck stripped), through convert_wespeaker.
    Tiny channel count for speed; the block/stage structure is the real
    3/4/6/3."""
    import torch.nn.functional as tF

    m, n_mels = 4, 16  # tiny channels, real topology

    class SimAM(torch.nn.Module):
        def forward(self, x):  # [B, C, F, T] in torch layout
            n = x.shape[2] * x.shape[3] - 1
            mean = x.mean(dim=[2, 3], keepdim=True)
            d = (x - mean) ** 2
            v = d.sum(dim=[2, 3], keepdim=True) / n
            return x * torch.sigmoid(d / (4 * (v + 1e-4)) + 0.5)

    class Block(torch.nn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(
                inp, planes, 3, stride, 1, bias=False
            )
            self.bn1 = torch.nn.BatchNorm2d(planes)
            self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(planes)
            self.simam = SimAM()
            if stride != 1 or inp != planes:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(inp, planes, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(planes),
                )
            else:
                self.downsample = torch.nn.Identity()

        def forward(self, x):
            h = tF.relu(self.bn1(self.conv1(x)))
            h = self.simam(self.bn2(self.conv2(h)))
            return tF.relu(h + self.downsample(x))

    class Front(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(1, m, 3, 1, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(m)
            chans, strides, counts = (m, 2 * m, 4 * m, 8 * m), (1, 2, 2, 2), (3, 4, 6, 3)
            inp = m
            for s, (c, st, n) in enumerate(zip(chans, strides, counts), 1):
                blocks = []
                for i in range(n):
                    blocks.append(Block(inp, c, st if i == 0 else 1))
                    inp = c
                setattr(self, f"layer{s}", torch.nn.Sequential(*blocks))

        def forward(self, x):
            x = tF.relu(self.bn1(self.conv1(x)))
            for s in range(1, 5):
                x = getattr(self, f"layer{s}")(x)
            return x

    class ASPT(torch.nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.attention = torch.nn.Sequential(
                torch.nn.Conv1d(dim, 128, 1), torch.nn.ReLU(),
                torch.nn.BatchNorm1d(128), torch.nn.Conv1d(128, dim, 1),
                torch.nn.Softmax(dim=2),
            )

        def forward(self, x):  # [B, D, T]
            w = self.attention(x)
            mu = (x * w).sum(2)
            sg = torch.sqrt(
                ((x ** 2) * w).sum(2).sub(mu ** 2).clamp(min=1e-5)
            )
            return torch.cat([mu, sg], dim=1)

    class TorchSam(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.front = Front()
            self.pooling = ASPT(8 * m * (n_mels // 8))

        def forward(self, feats):  # [B, T, F]
            x = feats.permute(0, 2, 1).unsqueeze(1)  # [B, 1, F, T]
            x = self.front(x)                        # [B, C, F', T']
            b, c, f, t = x.shape
            x = x.reshape(b, c * f, t)
            return self.pooling(x)

    torch.manual_seed(0)
    ref = TorchSam().eval()
    # randomise BN running stats so the conversion is actually exercised
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 40, n_mels)).astype(np.float32)
    with torch.no_grad():
        emb_t = ref(torch.tensor(feats))

    from stylish_tts_tpu.models.torch_convert import convert_wespeaker
    from stylish_tts_tpu.models.wespeaker import SimAMResNet34ASP

    model = SimAMResNet34ASP(m_channels=m, n_mels=n_mels)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    params = fill_from_flat(
        convert_wespeaker(ref.state_dict()), variables["params"]
    )
    emb_j = model.apply({"params": params}, jnp.asarray(feats))
    assert emb_j.shape == tuple(emb_t.shape)
    np.testing.assert_allclose(
        np.asarray(emb_j), emb_t.numpy(), atol=5e-4
    )
