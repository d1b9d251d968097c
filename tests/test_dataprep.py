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
