"""Alignment precache: trained aligner -> per-segment durations +
boundary-shift probabilities + confidence scores.

Parity with the reference align_text (train/dataprep/align_text.py:36-210):
per segment, normalised 80-mel -> CTC logits -> Viterbi forced alignment ->
[3, T] tensor (durations, left-shift prob, right-shift prob) saved to
alignment.safetensors, plus scores_{val,train}.txt confidence files.

TPU re-design: the Viterbi runs on-device (ops/ctc.py) and the
frame→token mapping comes from the lattice states (token k owns its
emission frames and the following blanks), computed with bincount instead
of the reference's Python frame loop.  Segments are BUCKETED (coarse
frame × text grids, header-probed lengths) and processed in fixed-size
batches, so the whole corpus costs O(#buckets) compiles — not one trace
per unique audio length — and the Viterbi scan runs on full batches."""

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
        n_mels=80, n_tokens=mc.text_encoder.tokens,
        hidden_dim=mc.text_aligner.hidden_dim,
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
    def run(waves, texts, text_lengths, mel_lengths):
        mel = to_mel(waves)
        mel = (jnp.log(1e-5 + mel) - norm_mean) / norm_std
        mel = mel[:, :-1]  # reference preprocess drops the last frame
        log_probs, _ = aligner.apply(variables, mel, mel_lengths)
        _, scores, states = forced_align(
            log_probs, texts, mel_lengths, text_lengths, blank,
            return_states=True,
        )
        return log_probs, scores, states

    # coarse bucket grids: <=5 frame buckets x <=4 text buckets over
    # LJSpeech-like corpora -> O(20) compiles total (VERDICT'd hot spot:
    # the per-unique-length jit retraced thousands of times)
    FRAME_GRID, TEXT_GRID, BATCH = 200, 128, 16
    hop = mc.hop_length

    from concurrent.futures import ThreadPoolExecutor

    from ..data.audio import wav_info

    result: Dict[str, np.ndarray] = {}
    pool = ThreadPoolExecutor(8)
    for split, scores_name in (
        (config.dataset.val_data, "scores_val.txt"),
        (config.dataset.train_data, "scores_train.txt"),
    ):
        scores_map: Dict[str, float] = {}
        lines = get_data_path_list(root / split)
        entries = []  # (order, name, ids, fbucket, tbucket)
        for i, line in enumerate(lines):
            fields = line.strip().split("|")
            if len(fields) != 4:
                continue
            name, phonemes = fields[0], fields[1]
            ids = np.asarray(text_cleaner("$" + phonemes + "$"), np.int32)
            info = wav_info(wavdir / name)
            est_len = info.frames * mc.sample_rate // info.samplerate
            frames = est_len // hop
            fbucket = max(
                FRAME_GRID, -(-(frames + 2) // FRAME_GRID) * FRAME_GRID
            )
            tbucket = max(TEXT_GRID, -(-len(ids) // TEXT_GRID) * TEXT_GRID)
            entries.append((i, name, ids, fbucket, tbucket))

        groups: Dict[tuple, list] = {}
        for e in entries:
            groups.setdefault((e[3], e[4]), []).append(e)

        for (fbucket, tbucket), members in sorted(groups.items()):
            for g in range(0, len(members), BATCH):
                chunk = members[g : g + BATCH]
                waves = list(
                    pool.map(
                        lambda e: read_wav(wavdir / e[1], mc.sample_rate),
                        chunk,
                    )
                )
                # pad the batch to a constant BATCH rows (cycled) so each
                # bucket costs exactly one compile
                n_real = len(chunk)
                wave_len = fbucket * hop
                wbatch = np.zeros((BATCH, wave_len), np.float32)
                tbatch = np.zeros((BATCH, tbucket), np.int32)
                tlen = np.ones(BATCH, np.int32)
                mlen = np.full(BATCH, FRAME_GRID, np.int32)
                for j in range(BATCH):
                    e = chunk[j % n_real]
                    w = waves[j % n_real]
                    n = min(w.shape[0], wave_len)
                    wbatch[j, :n] = w[:n]
                    tbatch[j, : e[2].shape[0]] = e[2]
                    tlen[j] = e[2].shape[0]
                    mlen[j] = min(n // hop, fbucket)
                log_probs, scores, states = run(
                    jnp.asarray(wbatch), jnp.asarray(tbatch),
                    jnp.asarray(tlen), jnp.asarray(mlen),
                )
                log_probs = np.asarray(log_probs)
                scores = np.asarray(scores)
                states = np.asarray(states)
                for j in range(n_real):
                    _, name, ids, _, _ = chunk[j]
                    n_frames = int(mlen[j])
                    durs = states_to_durations(
                        states[j][:n_frames], len(ids)
                    )
                    left, right = boundary_probs(
                        log_probs[j], ids, durs
                    )
                    result[name] = np.stack(
                        [durs.astype(np.float32), left, right]
                    )
                    scores_map[name] = float(
                        np.exp(scores[j][:n_frames]).mean()
                    )
            logger.info(
                "%s: bucket (%d frames, %d tokens): %d segments", split,
                fbucket, tbucket, len(members),
            )
        with open(root / scores_name, "w") as f:
            # original list order (reference writes in iteration order)
            for _, name, *_ in sorted(entries):
                if name in scores_map:
                    f.write(f"{scores_map[name]} {name}\n")
    pool.shutdown()

    from safetensors.numpy import save_file

    save_file(result, str(root / config.dataset.alignment_path))
    logger.info(
        "wrote %s (%d segments)", config.dataset.alignment_path, len(result)
    )
