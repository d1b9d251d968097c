"""Alignment precache: trained aligner -> per-segment durations +
boundary-shift probabilities + confidence scores.

Parity with the reference align_text (train/dataprep/align_text.py:36-210):
per segment, normalised 80-mel -> CTC logits -> Viterbi forced alignment ->
[3, T] tensor (durations, left-shift prob, right-shift prob) saved to
alignment.safetensors, plus scores_{val,train}.txt confidence files.

TPU re-design: the Viterbi runs on-device (ops/ctc.py) and the
frame→token mapping comes from the lattice states (token k owns its
emission frames and the following blanks), computed with bincount instead
of the reference's Python frame loop."""

from __future__ import annotations

import json
import logging
import math
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ModelConfig
from ..data.audio import read_wav
from ..data.dataset import get_data_path_list
from ..models.text_aligner import TextAligner
from ..ops.ctc import forced_align
from ..ops.mel import MelSpectrogram
from ..text import TextCleaner
from ..train.checkpoint import load_model_safetensors

logger = logging.getLogger(__name__)


def states_to_durations(states: np.ndarray, n_tokens: int) -> np.ndarray:
    """Lattice states [T_frames] -> per-token frame counts [n_tokens].

    Odd state 2k+1 emits token k; even state 2k is the blank following
    token k-1 (leading blanks go to token 0) — matching the reference's
    assignment of blank frames to the previous token
    (align_text.py:176-193)."""
    tok = np.where(
        states % 2 == 1, (states - 1) // 2, np.maximum(states // 2 - 1, 0)
    )
    return np.bincount(tok, minlength=n_tokens)[:n_tokens]


def boundary_probs(
    log_probs: np.ndarray, text: np.ndarray, durations: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Left/right ±1-frame boundary shift probabilities
    (align_text.py:195-210)."""
    n = durations.shape[0]
    left = np.zeros(n, np.float32)
    right = np.zeros(n, np.float32)
    index = 0
    for i in range(n - 1):
        index += int(durations[i])
        lt = int(text[i])
        rt = int(text[i + 1])
        lp = math.exp(log_probs[index - 1, lt] + log_probs[index, lt])
        sp = math.exp(log_probs[index - 1, lt] + log_probs[index, rt])
        rp = math.exp(log_probs[index - 1, rt] + log_probs[index, rt])
        denom = lp + sp + rp
        if denom > 0:
            left[i] = lp / denom
            right[i] = rp / denom
    return left, right


def align_text(config: Config, model_config: ModelConfig) -> None:
    root = Path(config.dataset.path)
    wavdir = root / config.dataset.wav_path
    mc = model_config

    norm_mean, norm_std = -4.0, 4.0
    stats_path = root / "normalization.json"
    if stats_path.is_file():
        data = json.loads(stats_path.read_text())
        norm_mean = float(data.get("mel_log_mean", -4.0))
        norm_std = float(data.get("mel_log_std", 4.0))

    aligner = TextAligner(
        n_mels=80, n_tokens=mc.text_encoder.tokens, hidden_dim=640
    )
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 16, 80))
    variables = aligner.init(
        {"params": rng, "dropout": rng}, dummy, jnp.asarray([16])
    )
    params = load_model_safetensors(
        root / config.dataset.alignment_model_path, variables["params"]
    )
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    to_mel = MelSpectrogram(
        n_mels=80, n_fft=mc.n_fft, win_length=mc.win_length,
        hop_length=mc.hop_length, sample_rate=mc.sample_rate,
    )
    text_cleaner = TextCleaner(mc.symbol)
    blank = mc.text_encoder.tokens

    @jax.jit
    def run(wave, text, text_length):
        mel = to_mel(wave)
        mel = (jnp.log(1e-5 + mel) - norm_mean) / norm_std
        mel = mel[:, :-1]  # reference preprocess drops the last frame
        mel_length = jnp.full((1,), mel.shape[1], jnp.int32)
        log_probs, _ = aligner.apply(variables, mel, mel_length)
        labels, scores, states = forced_align(
            log_probs, text, mel_length, text_length, blank,
            return_states=True,
        )
        return log_probs, labels, scores, states

    result: Dict[str, np.ndarray] = {}
    for split, scores_name in (
        (config.dataset.val_data, "scores_val.txt"),
        (config.dataset.train_data, "scores_train.txt"),
    ):
        scores_map = {}
        lines = get_data_path_list(root / split)
        for i, line in enumerate(lines):
            fields = line.strip().split("|")
            if len(fields) != 4:
                continue
            name, phonemes = fields[0], fields[1]
            wave = read_wav(wavdir / name, mc.sample_rate)
            ids = text_cleaner("$" + phonemes + "$")
            text = jnp.asarray(np.asarray(ids, np.int32)[None])
            tl = jnp.asarray([len(ids)], jnp.int32)
            log_probs, labels, scores, states = run(
                jnp.asarray(wave[None]), text, tl
            )
            n_frames = int(np.asarray(log_probs).shape[1])
            durs = states_to_durations(
                np.asarray(states)[0][:n_frames], len(ids)
            )
            left, right = boundary_probs(
                np.asarray(log_probs)[0], np.asarray(ids), durs
            )
            result[name] = np.stack(
                [durs.astype(np.float32), left, right]
            )
            scores_map[name] = float(
                np.exp(np.asarray(scores)[0][:n_frames]).mean()
            )
            if (i + 1) % 200 == 0:
                logger.info("%s: %d/%d", split, i + 1, len(lines))
        with open(root / scores_name, "w") as f:
            for name, score in scores_map.items():
                f.write(f"{score} {name}\n")

    from safetensors.numpy import save_file

    save_file(result, str(root / config.dataset.alignment_path))
    logger.info(
        "wrote %s (%d segments)", config.dataset.alignment_path, len(result)
    )
