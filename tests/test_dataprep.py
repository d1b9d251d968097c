"""Dataprep: YIN pitch extraction + alignment precache helpers."""

import numpy as np
import pytest


class TestYin:
    def test_recovers_sine_f0(self):
        from stylish_tts_tpu.dataprep.pitch import extract_pitch

        sr, hop = 24000, 300
        for f0_true in (110.0, 220.0, 330.0):
            t = np.arange(sr) / sr  # 1 second
            wave = 0.5 * np.sin(2 * np.pi * f0_true * t).astype(np.float32)
            f0 = extract_pitch(wave, sr, hop)
            voiced = f0[f0 > 0]
            assert voiced.size > 0.8 * f0.size
            err = np.abs(np.median(voiced) - f0_true) / f0_true
            assert err < 0.02, f"f0 {f0_true}: got {np.median(voiced)}"

    def test_noise_is_unvoiced(self):
        from stylish_tts_tpu.dataprep.pitch import extract_pitch

        rng = np.random.default_rng(0)
        wave = rng.standard_normal(24000).astype(np.float32) * 0.1
        f0 = extract_pitch(wave, 24000, 300)
        assert (f0 > 0).mean() < 0.35  # mostly unvoiced

    def test_silence(self):
        from stylish_tts_tpu.dataprep.pitch import extract_pitch

        f0 = extract_pitch(np.zeros(12000, np.float32), 24000, 300)
        assert (f0 == 0).all()


class TestAlignmentHelpers:
    def test_states_to_durations(self):
        from stylish_tts_tpu.dataprep.align_text import states_to_durations

        # lattice: blank(0) tok0(1) blank(2) tok1(3) blank(4)
        # frames: blank, tok0, tok0, blank(after tok0), tok1, blank
        states = np.array([0, 1, 1, 2, 3, 4])
        durs = states_to_durations(states, 2)
        # leading blank -> tok0; trailing blanks to previous token
        assert durs.tolist() == [4, 2]

    def test_boundary_probs_normalised(self):
        from stylish_tts_tpu.dataprep.align_text import boundary_probs

        rng = np.random.default_rng(0)
        logp = np.log(
            rng.dirichlet(np.ones(5), size=10).astype(np.float64)
        )
        text = np.array([1, 2, 3])
        durs = np.array([4, 3, 3])
        left, right = boundary_probs(logp, text, durs)
        assert left.shape == (3,) and right.shape == (3,)
        assert ((left >= 0) & (left <= 1)).all()
        assert ((left + right)[:-1] <= 1.0 + 1e-6).all()


class TestKaldiFbank:
    """ops/fbank.py — Kaldi-semantics front-end for the wespeaker embedder
    (torchaudio/kaldi are absent from this image, so these validate the
    documented invariants rather than bitwise parity)."""

    def test_frame_count_snip_edges(self):
        import jax.numpy as jnp

        from stylish_tts_tpu.ops.fbank import kaldi_fbank

        t = 16000
        feats = kaldi_fbank(jnp.zeros((2, t)), cmn=False)
        assert feats.shape == (2, 1 + (t - 400) // 160, 80)

    def test_tone_lands_in_right_mel_bin(self):
        import jax.numpy as jnp
        import numpy as np

        from stylish_tts_tpu.ops.fbank import kaldi_fbank, kaldi_mel_banks

        sr, f0 = 16000, 1000.0
        t = np.arange(sr) / sr
        tone = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        feats = np.asarray(kaldi_fbank(jnp.asarray(tone[None]), cmn=False))
        hot = feats[0].mean(axis=0).argmax()
        banks = kaldi_mel_banks(80, sr)
        # expected bin: the filter with max weight at the tone's fft bin
        expected = banks[round(f0 / (sr / 512))].argmax()
        assert abs(int(hot) - int(expected)) <= 1

    def test_cmn_zero_mean_and_scale_invariance(self):
        import jax.numpy as jnp
        import numpy as np

        from stylish_tts_tpu.ops.fbank import kaldi_fbank

        rng = np.random.default_rng(0)
        wave = (0.1 * rng.standard_normal(8000)).astype(np.float32)
        a = np.asarray(kaldi_fbank(jnp.asarray(wave[None])))
        np.testing.assert_allclose(a.mean(axis=1), 0.0, atol=1e-4)
        # log + CMN cancels any constant gain (wespeaker's 1<<15 scaling)
        b = np.asarray(kaldi_fbank(jnp.asarray(wave[None] * 32768.0)))
        np.testing.assert_allclose(a, b, atol=1e-3)
