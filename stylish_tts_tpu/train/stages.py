"""Stage registry: pure train/eval step functions per training stage.

Mirrors the reference stage table (train/stage_type.py:12-1032) —
alignment → acoustic → textual → style → duration (+ joint) — re-designed
as a functional pipeline: each stage provides ``compute_losses`` returning
(metrics, disc_inputs); a generic ``make_train_step`` closes over it and
handles gradient partitioning, the GAN discriminator pass with the
gap-aware LR, per-module AdamW updates and the scalar state machines, all
inside one ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import losses as L
from ..config import Config, ModelConfig
from ..duration import DurationProcessor
from ..models.cfm import CfmSampler
from ..models.slm import SLMFeatureExtractor, slm_feature_loss
from ..models.ssl import AdaptiveHubert, SpeakerEmbeddingModel
from ..ops import ctc as ctc_ops
from ..ops.mel import MelSpectrogram, calculate_mel, log_norm_energy
from ..ops.multi_spectrogram import MultiSpectrogram
from ..ops.resample import resample
from .loss_log import backwards_loss, weighted_total
from .optim import apply_updates, cosine_logical_lr
from .state import TrainState

# Modules whose numerics must stay f32 even under mixed precision: the
# CTC chain needs full-precision log-probs (the reference's autocast also
# keeps log_softmax in f32).
MIXED_PRECISION_EXEMPT = frozenset({"text_aligner"})


def _interp_frames(x: jax.Array, n_out: int) -> jax.Array:
    """Linear resample [B, F_in] -> [B, n_out] along the frame axis
    (hop-rate conversion for cross-frame-grid conditioning)."""
    f_in = x.shape[1]
    pos = jnp.arange(n_out) * (f_in / n_out)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, f_in - 1)
    hi = jnp.clip(lo + 1, 0, f_in - 1)
    w = (pos - lo).astype(x.dtype)
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


def cast_floats(tree, dtype):
    """Cast every floating-point array leaf of a pytree to ``dtype``;
    integer/bool leaves and non-arrays pass through untouched."""
    def _cast(a):
        if isinstance(a, (jax.Array, jnp.ndarray)) and jnp.issubdtype(
            a.dtype, jnp.floating
        ):
            return a.astype(dtype)
        return a

    return jax.tree_util.tree_map(_cast, tree)


@dataclass
class StageContext:
    """Everything a stage step closes over (static / device constants)."""

    models: Dict[str, Any]
    model_config: ModelConfig
    config: Config
    mel_mean: float
    mel_std: float
    step_limit: int                       # steps in this stage (for the LR axis)
    duration_class_weight: jnp.ndarray = None
    # Frozen feature-net params (SLM / hubert+speaker).  NEVER close a
    # jitted step over concrete arrays here: closure constants lower to
    # embedded HLO literals — the 94M-param WavLM made the serialized
    # step 380+ MB, tripping remote-compile request limits.  The train
    # step takes them as a `frozen` ARGUMENT and rebinds these fields on
    # a per-trace copy of the context (tracers are fine to close over).
    slm_params: Any = None                # frozen SLM feature extractor params
    ssl_params: Any = None                # frozen (hubert, speaker) params
    vocos_params: Any = None              # frozen Vocos decoder (eval audition)
    f0_log2_mean: float = 7.0
    f0_log2_std: float = 1.0

    def __post_init__(self):
        mc = self.model_config
        self.to_mel = MelSpectrogram(
            n_mels=mc.n_mels, n_fft=mc.n_fft, win_length=mc.win_length,
            hop_length=mc.hop_length, sample_rate=mc.sample_rate,
        )
        self.to_align_mel = MelSpectrogram(
            n_mels=80, n_fft=mc.n_fft, win_length=mc.win_length,
            hop_length=mc.hop_length, sample_rate=mc.sample_rate,
        )
        self.multi_spectrogram = MultiSpectrogram(mc.sample_rate)
        self.duration_processor = DurationProcessor(
            mc.duration_predictor.duration_classes,
            mc.duration_predictor.max_duration,
        )
        self.slm = SLMFeatureExtractor(n_layers=mc.slm.layers)
        self.hubert = AdaptiveHubert(
            model_sr=mc.sample_rate,
            hubert_sr=mc.hubert.sr,
            proj_dim=mc.hubert.hidden_dim,
        )
        self.speaker_embedder = SpeakerEmbeddingModel(
            model_sr=mc.sample_rate,
            hidden_dim=mc.speaker_embedder.hidden_dim,
        )
        self.weights = self.config.loss_weight.model_dump()
        # bf16 mixed precision (reference trains under Accelerate bf16
        # autocast, train/cli.py:290-299): module forwards run in bf16 with
        # f32 master weights; the spectral chain (ops/stft.py), loss
        # accumulation and the optimizer stay f32.  apply()/apply_auto()
        # cast params+inputs down and outputs back up per module.
        self.compute_dtype = (
            jnp.bfloat16
            if self.config.training.mixed_precision == "bf16"
            else jnp.float32
        )

    # -- convenience wrappers ------------------------------------------- #

    def apply(self, key, params, batch_stats, *args, rngs=None,
              mutable=False, **kwargs):
        mixed = (
            self.compute_dtype == jnp.bfloat16
            and key not in MIXED_PRECISION_EXEMPT
        )
        p = params[key]
        if mixed:
            # bf16 compute with f32 master weights: the astype transpose
            # returns f32 gradients, so the optimizer update is untouched
            p = cast_floats(p, jnp.bfloat16)
            args = cast_floats(args, jnp.bfloat16)
        variables = {"params": p}
        if batch_stats and key in batch_stats:
            # running stats stay f32 (flax norm layers compute statistics
            # in f32 regardless of input dtype)
            variables["batch_stats"] = batch_stats[key]
        out = self.models[key].apply(
            variables, *args, rngs=rngs,
            mutable=["batch_stats"] if mutable else False, **kwargs,
        )
        if mixed:
            # losses and inter-module glue accumulate in f32; stored
            # batch_stats collections keep f32 across steps
            out = cast_floats(out, jnp.float32)
        return out

    def apply_auto(self, key, params, batch_stats, *args, rngs=None,
                   **kwargs):
        """apply with automatic batch_stats threading: models whose config
        variant carries batch stats (e.g. the ringformer generator's
        conformer BatchNorm inside speech_predictor) get their collection
        passed and updated.  Returns (out, new_stats_or_None)."""
        has_stats = bool(batch_stats) and key in batch_stats
        if not has_stats:
            return (
                self.apply(key, params, None, *args, rngs=rngs, **kwargs),
                None,
            )
        out, upd = self.apply(
            key, params, batch_stats, *args, rngs=rngs, mutable=True,
            **kwargs,
        )
        return out, upd["batch_stats"]

    # NOTE: rematerialising the speech_predictor forward (jax.checkpoint
    # around the whole module) was measured and REJECTED: XLA's buffer
    # assignment grew temp memory 11.5 -> 14.3 GiB at batch 8 (the
    # scheduler absorbs freed HBM) and batch 16 still failed to compile,
    # so the extra recompute bought nothing.  The targeted remats that do
    # pay are the GAN discriminator pass and the pred-side SLM forward
    # (below / make_train_step).

    def magphase_params(self):
        """STFT params of the generator head's native resolution: the
        magphase loss must compare at the resolution the head emits
        (freegan: n_fft @ hop/4; ringformer: its own iSTFT grid — the
        reference hard-codes the freegan case, train_context.py:133-141)."""
        mc = self.model_config
        gc = mc.generator
        if gc.type == "freegan":
            return dict(n_fft=mc.n_fft, hop_length=mc.hop_length // 4,
                        win_length=mc.win_length)
        return dict(n_fft=gc.gen_istft_n_fft,
                    hop_length=gc.gen_istft_hop_size,
                    win_length=gc.gen_istft_n_fft)

    def mel_and_energy(self, audio_gt):
        mel, mel_length = calculate_mel(
            audio_gt, self.to_mel, self.mel_mean, self.mel_std
        )
        energy = jax.lax.stop_gradient(
            log_norm_energy(mel, self.mel_mean, self.mel_std)
        )
        return mel, mel_length, energy

    def cfm_mel_features(self, audio_gt, pitch):
        """(normed mel, energy, pitch-at-mel-frames) in the configured CFM
        feature space (model_config.cfm_mel_features).

        "vocos" targets the pretrained Vocos 100-bin / hop-256 features the
        reference's cfm stage extracts (stage_type.py:707,732), normalised
        by the same dataset stats; pitch (hop_length frames) is linearly
        resampled onto the vocos frame grid — the reference passes the
        hop-300 pitch through unresampled, a ~17 % time-scale mismatch we
        do not reproduce."""
        if self.model_config.cfm_mel_features == "vocos":
            from ..models.vocos import vocos_mel

            mel = (vocos_mel(audio_gt) - self.mel_mean) / self.mel_std
            energy = jax.lax.stop_gradient(
                log_norm_energy(mel, self.mel_mean, self.mel_std)
            )
            return mel, energy, _interp_frames(pitch, mel.shape[1])
        mel, _, energy = self.mel_and_energy(audio_gt)
        return mel, energy, pitch[:, : mel.shape[1]]

    def ssl_features(self, audio_gt, time_dim):
        """Frozen HuBERT phone features + speaker embedding
        (reference pred_ssl_features, stage_type.py:685-688)."""
        hubert_p, spk_p = self.ssl_params
        phones = self.hubert.apply(
            {"params": hubert_p}, jax.lax.stop_gradient(audio_gt), time_dim
        )
        spk = self.speaker_embedder.apply(
            {"params": spk_p}, jax.lax.stop_gradient(audio_gt)
        )
        return jax.lax.stop_gradient(phones), jax.lax.stop_gradient(spk)

    def slm_loss(self, audio_gt, audio_pred):
        sr = self.model_config.sample_rate
        slm_sr = self.model_config.slm.sr
        gt16 = resample(jax.lax.stop_gradient(audio_gt), sr, slm_sr)
        pred16 = resample(audio_pred, sr, slm_sr)
        # frozen net in bf16 (reference runs WavLM under bf16 autocast);
        # remat the pred-side forward — with 12 layers its activations
        # would otherwise dominate the loss-path footprint
        bf16 = functools.partial(
            jax.tree_util.tree_map, lambda a: a.astype(jnp.bfloat16)
        )
        slm_p = bf16(self.slm_params)
        gt_states = self.slm.apply(
            {"params": slm_p}, gt16.astype(jnp.bfloat16)
        )
        pred_states = jax.checkpoint(
            lambda a: self.slm.apply({"params": slm_p}, a)
        )(pred16.astype(jnp.bfloat16))
        return slm_feature_loss(gt_states, pred_states)


@dataclass
class StageType:
    next_stage: Optional[str]
    compute_losses: Callable
    train_models: List[str]
    eval_models: List[str]
    discriminators: List[str]
    inputs: List[str]
    uses_priors: bool = False


STAGES: Dict[str, StageType] = {}


def is_valid_stage(name: str) -> bool:
    return name in STAGES


def valid_stage_list() -> List[str]:
    return list(STAGES.keys())


# --------------------------------------------------------------------------- #
# Per-stage loss computations.  Each returns (metrics, disc_inputs, new_collections)
# where disc_inputs is None or (target_fft_list, pred_fft_list).
# --------------------------------------------------------------------------- #


def _acoustic_losses(ctx: StageContext, params, batch_stats, batch, rngs,
                     state: TrainState):
    mel, _, energy = ctx.mel_and_energy(batch["audio_gt"])
    new_stats = {}
    pred, sp_stats = ctx.apply_auto(
        "speech_predictor", params, batch_stats,
        batch["text"], batch["text_length"], batch["alignment"],
        batch["pitch"], energy, batch["audio_gt"],
        rngs=rngs, train=True,
    )
    if sp_stats is not None:
        new_stats["speech_predictor"] = sp_stats
    pe_enc, _, _ = ctx.apply(
        "pe_text_encoder", params, None,
        batch["text"], batch["text_length"], rngs=rngs, train=True,
    )
    (pe_mel_style, stats) = ctx.apply(
        "pe_mel_style_encoder", params, batch_stats, mel,
        rngs=rngs, mutable=True, update_stats=True,
    )
    new_stats["pe_mel_style_encoder"] = stats["batch_stats"]
    pred_pitch, pred_energy = ctx.apply(
        "pitch_energy_predictor", params, None,
        pe_enc, batch["text_length"], batch["alignment"], pe_mel_style,
        rngs=rngs, train=True,
    )

    specs = ctx.multi_spectrogram(
        target=batch["audio_gt"], pred=pred.audio
    )
    t_mag, p_mag, _, _, t_fft, p_fft = specs
    mc = ctx.model_config
    mag_l, phase_l = L.magphase_loss(
        pred.magnitude, pred.phase, batch["audio_gt"],
        **ctx.magphase_params(),
    )
    metrics = {
        "mel": L.multi_resolution_stft_loss(t_mag, p_mag),
        "slm": ctx.slm_loss(batch["audio_gt"], pred.audio),
        "mag": mag_l,
        "phase": phase_l,
        "pitch": L.smooth_l1_loss(pred_pitch, batch["pitch"]),
        "energy": L.smooth_l1_loss(pred_energy, energy),
    }
    return metrics, (t_fft, p_fft), new_stats


def _textual_losses(ctx, params, batch_stats, batch, rngs, state):
    mel, _, energy = ctx.mel_and_energy(batch["audio_gt"])
    new_stats = {}
    pe_enc, _, _ = ctx.apply(
        "pe_text_encoder", params, None,
        batch["text"], batch["text_length"], rngs=rngs, train=True,
    )
    (pe_mel_style, stats) = ctx.apply(
        "pe_mel_style_encoder", params, batch_stats, mel,
        rngs=rngs, mutable=True, update_stats=True,
    )
    new_stats["pe_mel_style_encoder"] = stats["batch_stats"]
    pred_pitch, pred_energy = ctx.apply(
        "pitch_energy_predictor", params, None,
        pe_enc, batch["text_length"], batch["alignment"], pe_mel_style,
        rngs=rngs, train=True,
    )
    pred = ctx.apply(
        "speech_predictor", params, batch_stats,
        batch["text"], batch["text_length"], batch["alignment"],
        pred_pitch, pred_energy, None,
        rngs=rngs, train=False,
    )
    t_mag, p_mag, _, _, t_fft, p_fft = ctx.multi_spectrogram(
        target=batch["audio_gt"], pred=pred.audio
    )
    mc = ctx.model_config
    mag_l, phase_l = L.magphase_loss(
        pred.magnitude, pred.phase, batch["audio_gt"],
        **ctx.magphase_params(),
    )
    metrics = {
        "mel": L.multi_resolution_stft_loss(t_mag, p_mag),
        "mag": mag_l,
        "phase": phase_l,
        "pitch": L.smooth_l1_loss(pred_pitch, batch["pitch"]),
        "energy": L.smooth_l1_loss(pred_energy, energy),
    }
    return metrics, (t_fft, p_fft), new_stats


def _style_losses(ctx, params, batch_stats, batch, rngs, state):
    mel, _, energy = ctx.mel_and_energy(batch["audio_gt"])
    pe_enc, _, _ = ctx.apply(
        "pe_text_encoder", params, None,
        batch["text"], batch["text_length"], rngs=rngs, train=True,
    )
    pe_text_style = ctx.apply(
        "pe_text_style_encoder", params, None, pe_enc, batch["text_length"],
        rngs=rngs,
    )
    pe_mel_style = ctx.apply(
        "pe_mel_style_encoder", params, batch_stats, mel, rngs=rngs,
    )
    pred_pitch, pred_energy = ctx.apply(
        "pitch_energy_predictor", params, None,
        pe_enc, batch["text_length"], batch["alignment"], pe_text_style,
        rngs=rngs, train=True,
    )
    metrics = {
        "style": L.smooth_l1_loss(pe_text_style, pe_mel_style) * 10.0,
        "pitch": L.smooth_l1_loss(pred_pitch, batch["pitch"]),
        "energy": L.smooth_l1_loss(pred_energy, energy),
    }
    return metrics, None, {}


def _duration_losses(ctx, params, batch_stats, batch, rngs, state):
    targets = ctx.duration_processor.align_to_class(batch["alignment"])
    pred = ctx.apply(
        "duration_predictor", params, None,
        batch["text"], batch["text_length"], rngs=rngs, train=True,
    )
    ce, cdw = L.duration_loss(
        pred, targets, batch["text_length"], ctx.duration_class_weight
    )
    return {"duration_ce": ce, "duration": cdw}, None, {}


def _alignment_losses(ctx, params, batch_stats, batch, rngs, state):
    mel, mel_length = calculate_mel(
        batch["audio_gt"], ctx.to_align_mel, ctx.mel_mean, ctx.mel_std
    )
    (log_probs, _), stats = ctx.apply(
        "text_aligner", params, batch_stats, mel, mel_length,
        rngs=rngs, train=True, mutable=True,
    )
    blank = ctx.model_config.text_encoder.tokens
    priors = jnp.where(
        state.priors_initialized, state.log_priors, jnp.zeros_like(state.log_priors)
    )
    loss, prior_sum, n_frames = ctc_ops.ctc_loss_with_priors(
        log_probs, batch["text"], mel_length, batch["text_length"], blank,
        log_priors=priors, prior_scale=0.3,
    )
    metrics = {"align_loss": loss}
    aux = {
        "text_aligner": stats["batch_stats"],
        "__prior_sum": prior_sum,
        "__prior_frames": n_frames,
    }
    return metrics, None, aux


def _joint_losses(ctx, params, batch_stats, batch, rngs, state):
    mel, _, energy = ctx.mel_and_energy(batch["audio_gt"])
    new_stats = {}
    (pe_mel_style, stats) = ctx.apply(
        "pe_mel_style_encoder", params, batch_stats, mel, rngs=rngs,
        mutable=True, update_stats=False,
    )
    new_stats["pe_mel_style_encoder"] = stats["batch_stats"]
    pe_enc, _, _ = ctx.apply(
        "pe_text_encoder", params, None,
        batch["text"], batch["text_length"], rngs=rngs, train=True,
    )
    pe_text_style = ctx.apply(
        "pe_text_style_encoder", params, None, pe_enc, batch["text_length"],
        rngs=rngs,
    )
    pred_pitch, pred_energy = ctx.apply(
        "pitch_energy_predictor", params, None,
        pe_enc, batch["text_length"], batch["alignment"], pe_text_style,
        rngs=rngs, train=True,
    )
    pred, sp_stats = ctx.apply_auto(
        "speech_predictor", params, batch_stats,
        batch["text"], batch["text_length"], batch["alignment"],
        pred_pitch, pred_energy, batch["audio_gt"],
        rngs=rngs, train=True,
    )
    if sp_stats is not None:
        new_stats["speech_predictor"] = sp_stats
    t_mag, p_mag, _, _, t_fft, p_fft = ctx.multi_spectrogram(
        target=batch["audio_gt"], pred=pred.audio
    )
    mc = ctx.model_config
    mag_l, phase_l = L.magphase_loss(
        pred.magnitude, pred.phase, batch["audio_gt"],
        **ctx.magphase_params(),
    )
    metrics = {
        "mel": L.multi_resolution_stft_loss(t_mag, p_mag),
        "slm": ctx.slm_loss(batch["audio_gt"], pred.audio),
        "mag": mag_l,
        "phase": phase_l,
        "style": L.smooth_l1_loss(pe_text_style, pe_mel_style) * 10.0,
        "pitch": L.smooth_l1_loss(pred_pitch, batch["pitch"]),
        "energy": L.smooth_l1_loss(pred_energy, energy),
    }
    return metrics, (t_fft, p_fft), new_stats


def norm_f0_zscore(f0, unvoiced, mean, std):
    """log2 z-score F0 normalisation, unvoiced pinned to 0
    (stage_type.py:784-798)."""
    normed = (jnp.log2(f0 + 1e-8) - mean) / std
    return jnp.where(unvoiced, 0.0, normed)


def denorm_f0_zscore(normed, unvoiced, mean, std, min_hz=50.0, max_hz=1200.0):
    f0 = jnp.clip(2.0 ** (normed * std + mean), min_hz, max_hz)
    return jnp.where(unvoiced, 0.0, f0)


def _hubert_acoustic_losses(ctx, params, batch_stats, batch, rngs, state):
    mel, mel_length, energy = ctx.mel_and_energy(batch["audio_gt"])
    phones, spk_emb = ctx.ssl_features(batch["audio_gt"], mel.shape[1])
    new_stats = {}
    pred, sp_stats = ctx.apply_auto(
        "hubert_speech_predictor", params, batch_stats,
        phones, mel_length, spk_emb, batch["pitch"][:, : mel.shape[1]],
        energy, batch["audio_gt"], rngs=rngs, train=True,
    )
    if sp_stats is not None:
        new_stats["hubert_speech_predictor"] = sp_stats
    pred_pitch, pred_energy = ctx.apply(
        "hubert_pitch_energy_predictor", params, None,
        phones, mel_length, spk_emb, rngs=rngs, train=True,
    )
    t_mag, p_mag, _, _, t_fft, p_fft = ctx.multi_spectrogram(
        target=batch["audio_gt"], pred=pred.audio
    )
    mc = ctx.model_config
    mag_l, phase_l = L.magphase_loss(
        pred.magnitude, pred.phase, batch["audio_gt"],
        **ctx.magphase_params(),
    )
    metrics = {
        "mel": L.multi_resolution_stft_loss(t_mag, p_mag),
        "slm": ctx.slm_loss(batch["audio_gt"], pred.audio),
        "mag": mag_l,
        "phase": phase_l,
        "pitch": L.smooth_l1_loss(
            pred_pitch, batch["pitch"][:, : pred_pitch.shape[1]]
        ),
        "energy": L.smooth_l1_loss(pred_energy, energy),
    }
    metrics.update(L.normalizing_flow_losses(pred))
    return metrics, (t_fft, p_fft), new_stats


def _cfm_mel_losses(ctx, params, batch_stats, batch, rngs, state):
    mel, energy, pitch = ctx.cfm_mel_features(
        batch["audio_gt"], batch["pitch"]
    )
    phones, spk_emb = ctx.ssl_features(batch["audio_gt"], mel.shape[1])

    def estimator(x, t, **conds):
        return ctx.models["cfm_mel_decoder"].apply(
            {"params": params["cfm_mel_decoder"]}, x, t, train=True,
            rngs=rngs, **conds,
        )

    sampler = CfmSampler(estimator, non_drop_conds=["spk_emb"])
    pred, target = sampler.compute_pred_target(
        rngs["sample"], mel,
        asr=phones, f0=pitch, energy=energy,
        spk_emb=spk_emb,
    )
    return {"mel_l2": jnp.mean((pred - target) ** 2)}, None, {}


def _cfm_pitch_losses(ctx, params, batch_stats, batch, rngs, state):
    mel, _, _ = ctx.mel_and_energy(batch["audio_gt"])
    phones, _ = ctx.ssl_features(batch["audio_gt"], batch["pitch"].shape[1])
    f0 = batch["pitch"]
    unvoiced = f0 == 0
    normed_f0 = norm_f0_zscore(
        f0, unvoiced, ctx.f0_log2_mean, ctx.f0_log2_std
    )
    pred = ctx.apply(
        "cfm_pitch_predictor", params, batch_stats, phones, mel,
        rngs=rngs, train=True,
    )
    return {
        "normed_pitch_l2": jnp.mean(
            (pred[:, : normed_f0.shape[1]] - normed_f0) ** 2
        )
    }, None, {}


STAGES["hubert_acoustic"] = StageType(
    next_stage=None,
    compute_losses=_hubert_acoustic_losses,
    train_models=["hubert_speech_predictor", "hubert_pitch_energy_predictor"],
    eval_models=[],
    discriminators=["mrd"],
    inputs=["text", "text_length", "audio_gt", "pitch", "alignment"],
)
STAGES["cfm_hubert_mel"] = StageType(
    next_stage=None,
    compute_losses=_cfm_mel_losses,
    train_models=["cfm_mel_decoder", "hubert_encoder"],
    eval_models=[],
    discriminators=[],
    inputs=["text", "text_length", "audio_gt", "pitch", "alignment"],
)
STAGES["cfm_hubert_pitch"] = StageType(
    next_stage=None,
    compute_losses=_cfm_pitch_losses,
    train_models=["cfm_pitch_predictor"],
    eval_models=[],
    discriminators=[],
    inputs=["text", "text_length", "audio_gt", "pitch", "alignment"],
)


STAGES["alignment"] = StageType(
    next_stage=None,
    compute_losses=_alignment_losses,
    train_models=["text_aligner"],
    eval_models=[],
    discriminators=[],
    inputs=["text", "text_length", "audio_gt"],
    uses_priors=True,
)
STAGES["acoustic"] = StageType(
    next_stage="textual",
    compute_losses=_acoustic_losses,
    train_models=[
        "speech_predictor",
        "pitch_energy_predictor",
        "pe_text_encoder",
        "pe_mel_style_encoder",
    ],
    eval_models=[],
    discriminators=["mrd"],
    inputs=["text", "text_length", "audio_gt", "pitch", "alignment"],
)
STAGES["textual"] = StageType(
    next_stage="style",
    compute_losses=_textual_losses,
    train_models=[
        "pitch_energy_predictor",
        "pe_text_encoder",
        "pe_mel_style_encoder",
    ],
    eval_models=["speech_predictor"],
    discriminators=["mrd"],
    inputs=["text", "text_length", "audio_gt", "pitch", "alignment"],
)
STAGES["style"] = StageType(
    next_stage="duration",
    compute_losses=_style_losses,
    train_models=["pe_text_style_encoder"],
    eval_models=[
        "pe_mel_style_encoder",
        "pitch_energy_predictor",
        "pe_text_encoder",
        "speech_predictor",
    ],
    discriminators=[],
    inputs=["text", "text_length", "audio_gt", "pitch", "alignment"],
)
STAGES["duration"] = StageType(
    next_stage=None,
    compute_losses=_duration_losses,
    train_models=["duration_predictor"],
    eval_models=[
        "pitch_energy_predictor",
        "speech_predictor",
        "pe_text_encoder",
        "pe_text_style_encoder",
    ],
    discriminators=[],
    inputs=["text", "text_length", "alignment", "audio_gt"],
)
STAGES["joint"] = StageType(
    next_stage=None,
    compute_losses=_joint_losses,
    train_models=[
        "pe_text_style_encoder",
        "pitch_energy_predictor",
        "pe_text_encoder",
        "speech_predictor",
    ],
    eval_models=["pe_mel_style_encoder"],
    discriminators=["mrd"],
    inputs=["text", "text_length", "audio_gt", "pitch", "alignment"],
)


# --------------------------------------------------------------------------- #
# Generic train step
# --------------------------------------------------------------------------- #


def make_train_step(stage_name: str, ctx: StageContext, base_lr: float):
    """Build the jittable train step for a stage.

    step(state, batch, rng) -> (new_state, metrics_dict)

    The GAN stages run two passes inside the same compiled function:
    generator update (disc frozen) then discriminator update on detached
    spectrogram images with loss scaled by √batch (reference
    train/stage.py:100-129) at LR = gen_lr × gap multiplier."""
    stage = STAGES[stage_name]
    has_disc = len(stage.discriminators) > 0

    def step(
        state: TrainState,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        frozen: Optional[Dict[str, Any]] = None,
    ):
        # rebind frozen feature-net params (jit arguments, possibly
        # tracers) onto a per-trace context copy — see StageContext note
        sctx = ctx
        if frozen is not None:
            sctx = dataclasses.replace(
                ctx,
                slm_params=frozen.get("slm", ctx.slm_params),
                ssl_params=frozen.get("ssl", ctx.ssl_params),
                vocos_params=frozen.get("vocos", ctx.vocos_params),
            )
        rng_d, rng_s = jax.random.split(rng)
        rngs = {"dropout": rng_d, "sample": rng_s}
        train_params = {k: state.params[k] for k in stage.train_models}
        frozen = {
            k: v for k, v in state.params.items()
            if k not in stage.train_models
        }

        # rematerialised adversarial term: the MRD feature maps are the
        # dominant activation cost (multi-GB at full batch); checkpointing
        # recomputes them in the backward instead of keeping them live
        # (jax.checkpoint = the TPU remat lever called out in SURVEY §7.1)
        def _to_bf16(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), tree
            )

        sg_tree = functools.partial(
            jax.tree_util.tree_map, jax.lax.stop_gradient
        )
        f32_tree = functools.partial(
            jax.tree_util.tree_map, lambda a: a.astype(jnp.float32)
        )

        def _gan_scalars(bp, bt, bf):
            """ONE MRD forward -> all three GAN scalars."""
            rs, gs, rf, gf = ctx.models["mrd"].apply(
                {"params": bp}, bt, bf
            )
            gen_loss = L.generator_adversarial_loss(
                f32_tree(rs), f32_tree(gs), f32_tree(rf), f32_tree(gf),
            )
            d_total, d_plain = L.discriminator_loss(
                f32_tree(rs), f32_tree(gs)
            )
            return gen_loss, d_total, d_plain

        if getattr(ctx.model_config, "mrd_pallas", False):
            # Pallas path: XLA does NOT CSE across custom-calls, so the
            # two stop-gradient role views would each run the full conv
            # stack (and remat would re-run both).  Route gradients
            # explicitly instead: one forward; the backward recomputes
            # (remat-equivalent) and takes PARAM grads from the
            # discriminator-loss pullback and INPUT grads from the
            # generator-loss pullback — numerically identical to the
            # reference's two detached passes (train/stage.py:100-129).
            @jax.custom_vjp
            def _gan_losses(mrd_params, t_fft, p_fft):
                return _gan_scalars(
                    _to_bf16(mrd_params), _to_bf16(t_fft), _to_bf16(p_fft)
                )

            def _gan_fwd(mrd_params, t_fft, p_fft):
                return _gan_losses(mrd_params, t_fft, p_fft), (
                    mrd_params, t_fft, p_fft,
                )

            def _gan_bwd(res, cts):
                mrd_params, t_fft, p_fft = res
                cg, cdt, cdp = cts
                _, pull = jax.vjp(
                    lambda p, t, f: _gan_scalars(
                        _to_bf16(p), _to_bf16(t), _to_bf16(f)
                    ),
                    mrd_params, t_fft, p_fft,
                )
                zero = jnp.zeros_like(cg)
                _dp_g, dt_g, df_g = pull((cg, zero, zero))
                dp_d, _dt_d, _df_d = pull((zero, cdt, cdp))
                return dp_d, dt_g, df_g

            _gan_losses.defvjp(_gan_fwd, _gan_bwd)
        else:
            # XLA path: BOTH roles in one checkpointed region returning
            # scalars only (fmaps as remat outputs would pin multi-GB in
            # HBM): the generator view (disc params detached, generated
            # spectra live) and the discriminator view (params live,
            # spectra detached) are HLO-identical forwards after
            # stop_gradient erasure, so XLA CSE computes the dominant MRD
            # conv forward once instead of twice.
            @jax.checkpoint
            def _gan_losses(mrd_params, t_fft, p_fft):
                bp = _to_bf16(mrd_params)
                bt, bf = _to_bf16(t_fft), _to_bf16(p_fft)
                g_rs, g_gs, g_rf, g_gf = ctx.models["mrd"].apply(
                    {"params": sg_tree(bp)}, bt, bf
                )
                gen_loss = L.generator_adversarial_loss(
                    f32_tree(g_rs), f32_tree(g_gs),
                    f32_tree(g_rf), f32_tree(g_gf),
                )
                d_rs, d_gs, _, _ = ctx.models["mrd"].apply(
                    {"params": bp}, sg_tree(bt), sg_tree(bf)
                )
                d_total, d_plain = L.discriminator_loss(
                    f32_tree(d_rs), f32_tree(d_gs)
                )
                return gen_loss, d_total, d_plain

        batch_size = batch["text"].shape[0]

        def loss_fn(allp):
            tp = {k: allp[k] for k in stage.train_models}
            params = {**frozen, **tp}
            metrics, disc_inputs, aux = stage.compute_losses(
                sctx, params, state.batch_stats, batch, rngs, state
            )
            d_total = d_plain = jnp.zeros(())
            if has_disc:
                t_fft, p_fft = disc_inputs
                metrics = dict(metrics)
                gen_loss, d_total, d_plain = _gan_losses(
                    allp["mrd"], t_fft, p_fft
                )
                metrics["generator"] = gen_loss
            total = backwards_loss(metrics, ctx.weights)
            if has_disc:
                # √batch scaling of the disc update (reference
                # train/stage.py:100-129); grad-isolated from the
                # generator term by the stop_gradients above
                total = total + d_total * math.sqrt(batch_size)
            return total, (metrics, disc_inputs, aux, d_total, d_plain)

        all_params = dict(train_params)
        if has_disc:
            all_params["mrd"] = state.params["mrd"]
        (_, (metrics, disc_inputs, aux, d_total, d_plain)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(all_params)
        )

        lr = cosine_logical_lr(base_lr, state.step, ctx.step_limit)
        new_params = dict(state.params)
        new_opt = dict(state.opt_states)
        for key in stage.train_models:
            new_params[key], new_opt[key] = apply_updates(
                state.params[key], grads[key], state.opt_states[key], lr
            )

        new_batch_stats = dict(state.batch_stats)
        for key, value in aux.items():
            if not key.startswith("__"):
                new_batch_stats[key] = value

        new_ema = dict(state.disc_ema)
        if has_disc:
            multiplier = L.disc_lr_multiplier(state.disc_ema["mrd"])
            new_params["mrd"], new_opt["mrd"] = apply_updates(
                state.params["mrd"], grads["mrd"], state.opt_states["mrd"],
                lr * multiplier,
            )
            new_ema["mrd"] = state.disc_ema["mrd"] * 0.95 + d_plain * 0.05
            metrics = dict(metrics)
            metrics["discriminator"] = d_total

        updates = dict(
            params=new_params,
            opt_states=new_opt,
            batch_stats=new_batch_stats,
            disc_ema=new_ema,
            step=state.step + 1,
        )
        if stage.uses_priors:
            updates["prior_sum"] = jnp.logaddexp(
                state.prior_sum, aux["__prior_sum"]
            )
            updates["prior_frames"] = state.prior_frames + aux["__prior_frames"]
        new_state = state.replace(**updates)
        metrics_out = dict(metrics)
        metrics_out["loss"] = weighted_total(metrics, ctx.weights)
        return new_state, metrics_out

    return step


def make_eval_step(stage_name: str, ctx: StageContext):
    """Jitted validation step: (state, batch, rng) -> (metrics, audio_pred).

    Mirrors the reference validate_* functions (stage_type.py:78-111,
    195-229, 306-337, 400-437, 483-523, 700-760): no parameter updates,
    losses on the stage's inference composition, plus synthesized audio
    for TensorBoard samples where the stage produces audio."""
    stage = STAGES[stage_name]

    def step(state: TrainState, batch, rng, frozen=None):
        sctx = ctx
        if frozen is not None:
            sctx = dataclasses.replace(
                ctx,
                slm_params=frozen.get("slm", ctx.slm_params),
                ssl_params=frozen.get("ssl", ctx.ssl_params),
                vocos_params=frozen.get("vocos", ctx.vocos_params),
            )
        rngs = {"dropout": rng, "sample": rng}
        params = state.params
        metrics: Dict[str, jax.Array] = {}
        audio_pred = None
        if stage_name == "alignment":
            mel, mel_length = calculate_mel(
                batch["audio_gt"], ctx.to_align_mel, ctx.mel_mean, ctx.mel_std
            )
            log_probs, _ = ctx.apply(
                "text_aligner", params, state.batch_stats, mel, mel_length,
            )
            blank = ctx.model_config.text_encoder.tokens
            loss = ctc_ops.ctc_loss(
                log_probs, batch["text"], mel_length, batch["text_length"],
                blank,
            )
            _, scores = ctc_ops.forced_align(
                log_probs, batch["text"], mel_length, batch["text_length"],
                blank,
            )
            frame_valid = (
                jnp.arange(scores.shape[1])[None] < mel_length[:, None]
            )
            confidence = jnp.sum(jnp.exp(scores) * frame_valid) / jnp.sum(
                frame_valid
            )
            metrics = {"align_loss": loss, "confidence": confidence}
        elif stage_name in ("acoustic", "textual", "style", "joint"):
            mel, _, energy = ctx.mel_and_energy(batch["audio_gt"])
            pe_enc, _, _ = ctx.apply(
                "pe_text_encoder", params, None,
                batch["text"], batch["text_length"],
            )
            pe_mel_style = ctx.apply(
                "pe_mel_style_encoder", params, state.batch_stats, mel,
            )
            if stage_name in ("style", "joint"):
                style_vec = ctx.apply(
                    "pe_text_style_encoder", params, None, pe_enc,
                    batch["text_length"],
                )
            else:
                style_vec = pe_mel_style
            pred_pitch, pred_energy = ctx.apply(
                "pitch_energy_predictor", params, None,
                pe_enc, batch["text_length"], batch["alignment"], style_vec,
            )
            if stage_name == "acoustic":
                use_pitch, use_energy = batch["pitch"], energy
            else:
                use_pitch, use_energy = pred_pitch, pred_energy
            pred = ctx.apply(
                "speech_predictor", params, state.batch_stats,
                batch["text"], batch["text_length"], batch["alignment"],
                use_pitch, use_energy, None, rngs={"sample": rng},
            )
            t_mag, p_mag, _, _, _, _ = ctx.multi_spectrogram(
                target=batch["audio_gt"], pred=pred.audio
            )
            metrics = {
                "mel": L.multi_resolution_stft_loss(t_mag, p_mag),
                "pitch": L.smooth_l1_loss(pred_pitch, batch["pitch"]),
                "energy": L.smooth_l1_loss(pred_energy, energy),
            }
            if stage_name in ("style", "joint"):
                metrics["style"] = (
                    L.smooth_l1_loss(style_vec, pe_mel_style) * 10.0
                )
            audio_pred = pred.audio
        elif stage_name == "duration":
            targets = ctx.duration_processor.align_to_class(batch["alignment"])
            pred = ctx.apply(
                "duration_predictor", params, None,
                batch["text"], batch["text_length"],
            )
            ce, cdw = L.duration_loss(
                pred, targets, batch["text_length"], ctx.duration_class_weight
            )
            metrics = {"duration_ce": ce, "duration": cdw}
            # the TRUE end-to-end inference check: predicted durations ->
            # alignment -> pitch/energy -> speech, per the reference
            # validate_duration (stage_type.py:483-523).  The frame axis
            # stays the batch bucket's static length; predicted durations
            # past it are clipped (duration_to_alignment drops them).
            frames = batch["alignment"].shape[-1]
            durs = ctx.duration_processor.prediction_to_duration(pred)
            token_mask = (
                jnp.arange(durs.shape[1])[None, :]
                < batch["text_length"][:, None]
            )
            durs = jnp.where(token_mask, durs, 0)
            pred_align = ctx.duration_processor.batched_duration_to_alignment(
                durs, frames
            )
            pe_enc, _, _ = ctx.apply(
                "pe_text_encoder", params, None,
                batch["text"], batch["text_length"],
            )
            text_style = ctx.apply(
                "pe_text_style_encoder", params, None, pe_enc,
                batch["text_length"],
            )
            pred_pitch, pred_energy = ctx.apply(
                "pitch_energy_predictor", params, None,
                pe_enc, batch["text_length"], pred_align, text_style,
            )
            sp = ctx.apply(
                "speech_predictor", params, state.batch_stats,
                batch["text"], batch["text_length"], pred_align,
                pred_pitch, pred_energy, None, rngs={"sample": rng},
            )
            audio_pred = sp.audio
        elif stage_name == "hubert_acoustic":
            # reference validate_hubert_acoustic (stage_type.py:700-744):
            # frozen SSL features drive the hubert predictor, GT pitch
            mel, mel_length, energy = sctx.mel_and_energy(batch["audio_gt"])
            phones, spk_emb = sctx.ssl_features(
                batch["audio_gt"], mel.shape[1]
            )
            pred = sctx.apply(
                "hubert_speech_predictor", params, state.batch_stats,
                phones, mel_length, spk_emb,
                batch["pitch"][:, : mel.shape[1]], energy, None,
                rngs={"sample": rng},
            )
            pred_pitch, pred_energy = sctx.apply(
                "hubert_pitch_energy_predictor", params, None,
                phones, mel_length, spk_emb,
            )
            t_mag, p_mag, _, _, _, _ = sctx.multi_spectrogram(
                target=batch["audio_gt"], pred=pred.audio
            )
            metrics = {
                "mel": L.multi_resolution_stft_loss(t_mag, p_mag),
                "pitch": L.smooth_l1_loss(
                    pred_pitch, batch["pitch"][:, : pred_pitch.shape[1]]
                ),
                "energy": L.smooth_l1_loss(pred_energy, energy),
            }
            audio_pred = pred.audio
        elif stage_name == "cfm_hubert_mel":
            # reference validate_cfm_mel (stage_type.py:747-760): solve the
            # CFM ODE from noise, compare mels, and audition the result —
            # with converted Vocos weights when provided (the reference's
            # decoder, train_context.py:179-183), Griffin-Lim otherwise
            mel, energy, pitch = sctx.cfm_mel_features(
                batch["audio_gt"], batch["pitch"]
            )
            phones, spk_emb = sctx.ssl_features(batch["audio_gt"], mel.shape[1])

            def estimator(x, t, **conds):
                return sctx.models["cfm_mel_decoder"].apply(
                    {"params": params["cfm_mel_decoder"]}, x, t,
                    train=False, rngs={"sample": rng}, **conds,
                )

            sampler = CfmSampler(estimator, non_drop_conds=["spk_emb"])
            z = jax.random.normal(rng, mel.shape, mel.dtype)
            mel_pred = sampler.sample(
                z, n_timesteps=16,
                asr=phones, f0=pitch,
                energy=energy, spk_emb=spk_emb,
            )
            metrics = {
                "mel_l2": jnp.mean((mel_pred - mel) ** 2),
                "mel_l1": jnp.mean(jnp.abs(mel_pred - mel)),
            }
            mc = sctx.model_config
            use_vocos = (
                mc.cfm_mel_features == "vocos"
                and sctx.vocos_params is not None
            )
            if use_vocos:
                from ..models.vocos import Vocos

                audio_pred = Vocos().apply(
                    {"params": sctx.vocos_params},
                    mel_pred * sctx.mel_std + sctx.mel_mean,
                )
            else:
                from ..models.vocos import VOCOS_HOP, VOCOS_N_FFT
                from ..ops.griffin_lim import mel_to_audio

                if mc.cfm_mel_features == "vocos":
                    gl = dict(n_fft=VOCOS_N_FFT, win_length=VOCOS_N_FFT,
                              hop_length=VOCOS_HOP, power=1.0)
                else:
                    gl = dict(n_fft=mc.n_fft, win_length=mc.win_length,
                              hop_length=mc.hop_length)
                audio_pred = mel_to_audio(
                    mel_pred, sample_rate=mc.sample_rate,
                    mean=sctx.mel_mean, std=sctx.mel_std, rng=rng, **gl,
                )
        elif stage_name == "cfm_hubert_pitch":
            mel, _, _ = sctx.mel_and_energy(batch["audio_gt"])
            phones, _ = sctx.ssl_features(
                batch["audio_gt"], batch["pitch"].shape[1]
            )
            f0 = batch["pitch"]
            unvoiced = f0 == 0
            normed_f0 = norm_f0_zscore(
                f0, unvoiced, sctx.f0_log2_mean, sctx.f0_log2_std
            )
            pred = sctx.apply(
                "cfm_pitch_predictor", params, state.batch_stats, phones,
                mel,
            )
            metrics = {
                "normed_pitch_l2": jnp.mean(
                    (pred[:, : normed_f0.shape[1]] - normed_f0) ** 2
                )
            }
        metrics["loss"] = weighted_total(metrics, ctx.weights)
        return metrics, audio_pred

    return step


def end_alignment_epoch(state: TrainState, axis_name: Optional[str] = None):
    """Epoch-end CTC prior update.  Under a mesh, accumulators reduce over
    the data axis (the reference's accelerator.gather, losses.py:603-611)."""
    prior_sum = state.prior_sum
    frames = state.prior_frames
    if axis_name is not None:
        prior_sum = jax.lax.psum(jnp.exp(prior_sum), axis_name)
        prior_sum = jnp.log(prior_sum + 1e-30)
        frames = jax.lax.psum(frames, axis_name)
    new_priors = ctc_ops.update_log_priors(
        prior_sum, jnp.log(frames + 1e-9)
    )
    return state.replace(
        log_priors=new_priors,
        prior_sum=jnp.full_like(state.prior_sum, -1e30),
        prior_frames=jnp.zeros_like(state.prior_frames),
        priors_initialized=jnp.ones_like(state.priors_initialized),
    )
