"""Deployment inference: two jit-compiled graphs + a sentence-streaming
driver.

Parity: the reference exports two ONNX graphs — a duration model and a
speech model composed as pe_text_encoder → pe_text_style_encoder →
pitch_energy_predictor → speech_predictor (train/models/export_model.py:5-45,
train/convert_to_onnx.py:21-123) — and drives them per sentence with
concatenation (train/test_onnx.py:22-96).  Here the graphs are jitted
XLA executables per (text-bucket, frame-bucket); the deployment artifact
is the orbax checkpoint + model-config JSON (an ONNX file would be a
de-optimisation on TPU).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..duration import DurationProcessor
from ..models import build_models
from ..text import TextCleaner


def frame_bucket(frames: int) -> int:
    """Round frames up to the 20-frame grid used by training buckets."""
    return max(60, -(-frames // 20) * 20)


class Synthesizer:
    """jit-compiled TTS inference over static buckets."""

    def __init__(
        self,
        model_config: ModelConfig,
        params: Dict[str, any],
        *,
        sample_seed: int = 0,
    ):
        self.mc = model_config
        self.models = build_models(model_config)
        # pin params to the default device ONCE: init builds them on the
        # CPU backend (train/init.py), and jit does not relocate committed
        # arrays — without this every call re-uploads the full ~120 MB
        # param set through the device transport (measured 6 s/call on the
        # tunneled TPU, completely dominating synthesis)
        self.params = jax.device_put(params, jax.devices()[0])
        self.text_cleaner = TextCleaner(model_config.symbol)
        self.duration_processor = DurationProcessor(
            model_config.duration_predictor.duration_classes,
            model_config.duration_predictor.max_duration,
        )
        self.rng = jax.random.PRNGKey(sample_seed)

        @partial(jax.jit, static_argnums=())
        def duration_graph(params, tokens, lengths):
            return self.models["duration_predictor"].apply(
                {"params": params["duration_predictor"]}, tokens, lengths
            )

        @partial(jax.jit, static_argnums=())
        def style_graph(params, tokens, lengths):
            """Text-derived style vector — exposed separately so long-form
            synthesis can blend styles across sentences (the reference's
            combine_styles, tts/ttab/inference.py:572-578)."""
            pe_enc, _, _ = self.models["pe_text_encoder"].apply(
                {"params": params["pe_text_encoder"]}, tokens, lengths
            )
            return self.models["pe_text_style_encoder"].apply(
                {"params": params["pe_text_style_encoder"]}, pe_enc, lengths
            )

        @partial(jax.jit, static_argnums=(4,))
        def speech_graph(params, tokens, lengths, durations, frames, style,
                         rng):
            # the alignment is built on device from the [B, T] duration
            # vector — uploading the dense [B, T, frames] one-hot per call
            # costs ~frames× more transfer over the host link
            alignment = self.duration_processor.batched_duration_to_alignment(
                durations, frames
            )
            pe_enc, _, _ = self.models["pe_text_encoder"].apply(
                {"params": params["pe_text_encoder"]}, tokens, lengths
            )
            pitch, energy = self.models["pitch_energy_predictor"].apply(
                {"params": params["pitch_energy_predictor"]},
                pe_enc, lengths, alignment, style,
            )
            pred = self.models["speech_predictor"].apply(
                {"params": params["speech_predictor"]},
                tokens, lengths, alignment, pitch, energy, None,
                rngs={"sample": rng},
            )
            # ship PCM16 off-device: audio is tanh-bounded, WAV-standard
            # 16-bit halves the device->host transfer per call
            return jnp.clip(
                pred.audio * 32767.0, -32768.0, 32767.0
            ).astype(jnp.int16)

        self._duration_graph = duration_graph
        self._style_graph = style_graph
        self._speech_graph = speech_graph

    # ------------------------------------------------------------------ #

    def _encode(self, phonemes: str, bucket: Optional[int] = None):
        ids = [0] + self.text_cleaner(phonemes) + [0]
        n = len(ids)
        if bucket is None:
            bucket = min(max(64, -(-n // 64) * 64), 512)
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :n] = ids
        return jnp.asarray(tokens), jnp.asarray([n], jnp.int32), n

    def predict_durations(self, phonemes: str) -> np.ndarray:
        tokens, lengths, n = self._encode(phonemes)
        logits = self._duration_graph(self.params, tokens, lengths)
        durs = self.duration_processor.prediction_to_duration(logits[0])
        return np.asarray(durs[:n], dtype=np.int64)

    def text_style(self, phonemes: str) -> jax.Array:
        """Style vector [1, style_dim] for one utterance."""
        tokens, lengths, _ = self._encode(phonemes)
        return self._style_graph(self.params, tokens, lengths)

    def synthesize(
        self,
        phonemes: str,
        speed: float = 1.0,
        fixed_duration: Optional[int] = None,
        style: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Single-utterance synthesis -> float32 waveform at 24 kHz.

        ``fixed_duration`` bypasses the duration model with a constant
        frames-per-token (benchmarking with untrained weights).
        ``style`` overrides the text-derived style vector (long-form
        style carry-over)."""
        tokens, lengths, n = self._encode(phonemes)
        logits = self._duration_graph(self.params, tokens, lengths)
        if fixed_duration is not None:
            # benchmark mode: duration graph still timed, its (untrained)
            # output replaced by a realistic constant frames-per-token
            durs = np.full(n, fixed_duration, np.int64)
        else:
            durs = np.asarray(
                self.duration_processor.prediction_to_duration(logits[0])
            )[:n]
        if speed != 1.0:
            durs = np.maximum(1, np.round(durs / speed)).astype(np.int64)
        total_frames = int(durs.sum())
        # round to an even mel-frame bucket (generator upsamples ×4)
        frames = frame_bucket(total_frames)
        dur_vec = np.zeros((1, tokens.shape[1]), np.int32)
        dur_vec[0, :n] = durs
        if style is None:
            style = self._style_graph(self.params, tokens, lengths)
        self.rng, sample_rng = jax.random.split(self.rng)
        audio = self._speech_graph(
            self.params, tokens, lengths, jnp.asarray(dur_vec), frames,
            style, sample_rng,
        )
        samples = total_frames * self.mc.hop_length
        return (
            np.asarray(audio[0, :samples]).astype(np.float32) / 32767.0
        )

    def synthesize_batch_async(
        self,
        phoneme_list: List[str],
        speed: float = 1.0,
        fixed_duration: Optional[int] = None,
    ):
        """Dispatch one batched synthesis call without blocking.

        Returns (device_audio [B, samples] int16 PCM, totals frame counts);
        jax dispatch is asynchronous, so the caller can queue the next
        batch while this one computes and fetch results behind the device
        (the pipelined serving loop — see measure_rtf/bench.py)."""
        b = len(phoneme_list)
        encoded = [
            [0] + self.text_cleaner(p) + [0] for p in phoneme_list
        ]
        max_n = max(len(ids) for ids in encoded)
        bucket = min(max(64, -(-max_n // 64) * 64), 512)
        tokens = np.zeros((b, bucket), np.int32)
        lengths = np.zeros((b,), np.int32)
        for i, ids in enumerate(encoded):
            tokens[i, : len(ids)] = ids
            lengths[i] = len(ids)
        tokens_j = jnp.asarray(tokens)
        lengths_j = jnp.asarray(lengths)
        logits = self._duration_graph(self.params, tokens_j, lengths_j)
        if fixed_duration is not None:
            durs = np.full((b, bucket), fixed_duration, np.int64)
        else:
            durs = np.asarray(
                self.duration_processor.prediction_to_duration(logits)
            )
        totals = []
        frames = 60
        dur_vec = np.zeros((b, bucket), np.int32)
        for i, ids in enumerate(encoded):
            d = np.maximum(1, np.round(durs[i, : len(ids)] / speed)).astype(
                np.int32
            )
            dur_vec[i, : len(ids)] = d
            totals.append(int(d.sum()))
            frames = max(frames, frame_bucket(int(d.sum())))
        style = self._style_graph(self.params, tokens_j, lengths_j)
        self.rng, sample_rng = jax.random.split(self.rng)
        audio = self._speech_graph(
            self.params, tokens_j, lengths_j, jnp.asarray(dur_vec),
            frames, style, sample_rng,
        )
        return audio, totals

    def synthesize_batch(
        self,
        phoneme_list: List[str],
        speed: float = 1.0,
        fixed_duration: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Batched bucketed synthesis: all utterances padded to one
        (text-bucket, frame-bucket) pair and decoded in a single jitted
        call — the production serving path (BASELINE 'batched bucketed
        synthesis' config)."""
        audio_dev, totals = self.synthesize_batch_async(
            phoneme_list, speed=speed, fixed_duration=fixed_duration
        )
        audio = np.asarray(audio_dev)
        return [
            audio[i, : totals[i] * self.mc.hop_length].astype(np.float32)
            / 32767.0
            for i in range(len(phoneme_list))
        ]

    def synthesize_longform(
        self,
        sentences: List[str],
        silence_ms: float = 120.0,
        crossfade_ms: float = 15.0,
        trim_threshold: float = 1000.0 / 32768.0,
        style_alpha: float = 0.7,
        style_memory: int = 3,
    ) -> np.ndarray:
        """Sentence-streaming long-form synthesis (capability of
        train/test_onnx.py:47-92 and the legacy audiobook driver):

        - per-sentence silence trimming at the reference's amplitude
          threshold (tts/ttab/inference.py:195-200)
        - linear cross-fades at segment joins — blend_together
          (tts/ttab/inference.py:556-563) — plus inter-sentence silence
        - style carry-over: each sentence's style vector blends with the
          last ``style_memory`` sentences' — combine_styles
          (tts/ttab/inference.py:572-578)
        """
        sr = self.mc.sample_rate
        gap = np.zeros(int(sr * silence_ms / 1000.0), np.float32)
        fade = max(1, int(sr * crossfade_ms / 1000.0))
        recent_styles: List[jax.Array] = []
        out: Optional[np.ndarray] = None
        for sentence in sentences:
            style = self.text_style(sentence)
            if recent_styles:
                others = sum(np.asarray(s) for s in recent_styles) / len(
                    recent_styles
                )
                blended = style_alpha * np.asarray(style) + (
                    1.0 - style_alpha
                ) * others
                style = jnp.asarray(blended)
            recent_styles = (recent_styles + [style])[-style_memory:]
            audio = trim_silence(self.synthesize(sentence, style=style),
                                 trim_threshold)
            if out is None:
                out = audio
                continue
            out = np.concatenate([out, gap])
            n = min(fade, out.shape[0], audio.shape[0])
            if n > 1:
                w = np.linspace(0.0, 1.0, n, dtype=np.float32)
                head = w * audio[:n] + (1.0 - w) * out[-n:]
                out = np.concatenate([out[:-n], head, audio[n:]])
            else:
                out = np.concatenate([out, audio])
        return out if out is not None else np.zeros(0, np.float32)


def trim_silence(
    audio: np.ndarray, threshold: float = 1000.0 / 32768.0,
    keep_tail: int = 2400,
) -> np.ndarray:
    """Trim leading/trailing samples below an amplitude threshold; keeps a
    short natural release tail (the reference trims with the same
    threshold and keeps 9000 samples of tail at 24 kHz,
    tts/ttab/inference.py:194-200)."""
    loud = np.flatnonzero(np.abs(audio) >= threshold)
    if loud.size == 0:
        return audio  # fully-quiet utterance: nothing to anchor a trim on
    start = int(loud[0])
    end = min(audio.shape[0], int(loud[-1]) + 1 + keep_tail)
    return audio[start:end]


@dataclass
class RTFReport:
    audio_seconds: float
    wall_seconds: float

    @property
    def rtf(self) -> float:
        return self.audio_seconds / self.wall_seconds


def measure_rtf(
    synthesizer: Synthesizer, phonemes: str, iters: int = 5
) -> RTFReport:
    """Real-time-factor harness (reference prints RTF in test_onnx.py:91-92)."""
    audio = synthesizer.synthesize(phonemes)  # warm-up & compile
    t0 = time.perf_counter()
    total = 0.0
    for _ in range(iters):
        audio = synthesizer.synthesize(phonemes)
        total += audio.shape[0] / synthesizer.mc.sample_rate
    jax.block_until_ready(audio)
    return RTFReport(total, time.perf_counter() - t0)
