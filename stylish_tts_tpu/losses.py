"""Loss functions — pure jnp, shaped for fusion inside the jitted step.

Parity map (reference train/losses.py):
  * spectral convergence over 3 mel spectrograms ("mel")      :14-35
  * anti-wrapping differential phase loss                      :38-82
  * MagPhaseLoss (log-magnitude L1 + phase loss at hop/4)      :85-154
  * VITS KL losses + NormalizingFlowLoss                       :157-221
  * LSGAN + TPRLS discriminator/generator losses, feature
    matching ×2, gap-aware discriminator LR multiplier         :229-405
  * CDW-CCE duration loss                                      :429-476
  * SLM (WavLM) feature loss — see SLMFeatureLoss below        :408-426
CTC-with-priors lives in ops/ctc.py.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .ops.stft import stft

# --------------------------------------------------------------------------- #
# Spectral losses
# --------------------------------------------------------------------------- #


def spectral_convergence_loss(target: jax.Array, pred: jax.Array) -> jax.Array:
    return jnp.sum(jnp.abs(target - pred)) / (jnp.sum(jnp.abs(target)) + 1e-6)


def multi_resolution_stft_loss(
    target_list: Sequence[jax.Array], pred_list: Sequence[jax.Array]
) -> jax.Array:
    loss = 0.0
    for target, pred in zip(target_list, pred_list):
        loss += spectral_convergence_loss(target, pred)
    return loss / len(target_list)


def _anti_wrapping(phase_diff: jax.Array, weights: jax.Array) -> jax.Array:
    loss = jnp.abs(
        phase_diff - 2.0 * jnp.pi * jnp.round(phase_diff / (2.0 * jnp.pi))
    )
    return loss * weights


def differential_phase_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Anti-wrapping phase + first-difference (freq and time) losses with
    exponential frequency weights (losses.py:43-76).

    pred/target are [B, T, F] channels-last.  The reference's explicit
    difference matrices are first-difference operators; we use jnp.diff
    (same values, no F×F matmul)."""
    freq_size = target.shape[-1]
    base = math.exp(math.log(2.5) / (freq_size // 2))
    weights = jnp.power(base, jnp.arange(freq_size))[None, None, :]

    loss = jnp.mean(_anti_wrapping(pred - target, weights))
    # the reference's difference matrix (triu(1)-triu(2)-eye) computes
    # x[j-1]-x[j] with a -x[0] boundary column — a PREPEND-style first
    # difference, so column j pairs with weight w[j] (append-style would
    # shift every interior term one weight index)
    pred_df = jnp.diff(pred, axis=-1, prepend=jnp.zeros_like(pred[..., :1]))
    targ_df = jnp.diff(target, axis=-1, prepend=jnp.zeros_like(target[..., :1]))
    loss += jnp.mean(_anti_wrapping(pred_df - targ_df, weights))
    pred_dt = jnp.diff(pred, axis=1, prepend=jnp.zeros_like(pred[:, :1]))
    targ_dt = jnp.diff(target, axis=1, prepend=jnp.zeros_like(target[:, :1]))
    loss += jnp.mean(_anti_wrapping(pred_dt - targ_dt, weights))
    return loss


def magphase_loss(
    pred_magnitude: jax.Array,  # [B, T, F] log-amplitude from the generator
    pred_phase: jax.Array,      # [B, T, F]
    audio_gt: jax.Array,        # [B, samples]
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> Tuple[jax.Array, jax.Array]:
    """(mag L1, phase) losses vs the GT STFT at hop/4 (losses.py:85-154)."""
    real, imag = stft(
        audio_gt, n_fft=n_fft, hop_length=hop_length, win_length=win_length
    )
    # heads may emit F frames vs the GT's F+1 (the ringformer iSTFT grid
    # has no replicate-padded trailing frame); compare the common span
    frames = min(pred_magnitude.shape[1], real.shape[1])
    pred_magnitude = pred_magnitude[:, :frames]
    pred_phase = pred_phase[:, :frames]
    real, imag = real[:, :frames], imag[:, :frames]
    target_mag = jnp.sqrt(real * real + imag * imag + 1e-14) + 1e-14
    voiced = jax.lax.stop_gradient(target_mag > 1e-3)
    target_phase = jnp.where(voiced, jnp.arctan2(imag, real), 0.0)
    pred_phase = jnp.where(voiced, pred_phase, 0.0)
    mag_l = jnp.mean(jnp.abs(pred_magnitude - jnp.log(target_mag + 1e-9)))
    phase_l = differential_phase_loss(pred_phase, target_phase)
    return mag_l, phase_l


# --------------------------------------------------------------------------- #
# Flow / KL losses
# --------------------------------------------------------------------------- #


def kl_loss(z_p, logs_q, m_p, logs_p) -> jax.Array:
    """Inputs channels-last [B, T, H].  The reference normalises by the
    [B, 1, T] mask sum (losses.py:157-178): mean over batch/time but SUM
    over channels — keep that scale, it feeds the loss weights."""
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.mean(jnp.sum(kl, axis=-1))


def kl_loss_normal(m_q, logs_q, m_p, logs_p) -> jax.Array:
    """Channel-SUM scale as kl_loss (losses.py:181-203)."""
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_q) + (m_q - m_p) ** 2) * jnp.exp(
        -2.0 * logs_p
    )
    return jnp.mean(jnp.sum(kl, axis=-1))


def normalizing_flow_losses(pred) -> Dict[str, jax.Array]:
    """kl_text / kl_audio from a DecoderPrediction with flow stats
    (losses.py:204-221)."""
    z_text, mean_text, logstd_text = pred.text_stats
    _, mean_text2mel, logstd_text2mel = pred.text2mel_stats
    _, mean_mel, logstd_mel = pred.mel_stats
    z_mel2text, mean_mel2text, logstd_mel2text = pred.mel2text_stats
    return {
        "kl_text": kl_loss(z_mel2text, logstd_mel2text, mean_text, logstd_text),
        "kl_audio": kl_loss_normal(
            mean_text2mel, logstd_text2mel, mean_mel, logstd_mel
        ),
    }


# --------------------------------------------------------------------------- #
# GAN losses (LSGAN + TPRLS + feature matching)
# --------------------------------------------------------------------------- #


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sum(values * mask) / (jnp.sum(mask) + 1e-9)


def _tprls(real_score: jax.Array, gen_score: jax.Array) -> jax.Array:
    """Truncated pointwise relativistic LS term (losses.py:322-336)."""
    tau = 0.04
    diff = real_score - gen_score
    m_dg = jnp.median(diff)
    mask = (diff < m_dg).astype(real_score.dtype)
    l_rel = _masked_mean((diff - m_dg) ** 2, mask)
    return tau - jax.nn.relu(tau - l_rel)


def discriminator_loss(
    real_scores: Sequence[jax.Array], gen_scores: Sequence[jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Returns (total including TPRLS, plain LSGAN part for the EMA)."""
    disc = 0.0
    tprls = 0.0
    for dr, dg in zip(real_scores, gen_scores):
        disc += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg**2)
        tprls += _tprls(dr, dg)
    return disc + tprls, disc


def generator_adversarial_loss(
    real_scores: Sequence[jax.Array],
    gen_scores: Sequence[jax.Array],
    real_features: Sequence[Sequence[jax.Array]],
    gen_features: Sequence[Sequence[jax.Array]],
) -> jax.Array:
    """Feature matching ×2 + LSGAN + TPRLS (losses.py:356-405)."""
    feature = 0.0
    for fr, fg in zip(real_features, gen_features):
        for rl, gl in zip(fr, fg):
            feature += jnp.mean(jnp.abs(rl - gl))
    feature = feature * 2.0
    gen = 0.0
    for dg in gen_scores:
        gen += jnp.mean((1.0 - dg) ** 2)
    # note the reference generator-side tprls swaps the roles (losses.py:389)
    tprls = 0.0
    for dr, dg in zip(real_scores, gen_scores):
        tprls += _tprls(dg, dr)
    return feature + gen + tprls


def disc_lr_multiplier(
    last_loss: jax.Array,
    sub_count: int = 3,
    f_max: float = 4.0,
    h_min: float = 0.01,
) -> jax.Array:
    """Gap-aware discriminator LR multiplier from the EMA of the plain
    LSGAN disc loss (losses.py:281-307).  Pure function of train state."""
    ideal = 0.5 * sub_count
    x_max = 0.05 * sub_count
    x = jnp.abs(last_loss - ideal)
    hi = ideal + ideal * x_max
    lo = ideal - ideal * x_max
    pow_up = jnp.minimum(jnp.power(f_max, x / x_max), f_max)
    pow_down = jnp.maximum(jnp.power(h_min, x / x_max), h_min)
    return jnp.where(
        last_loss > hi,
        f_max,
        jnp.where(
            last_loss < lo,
            h_min,
            jnp.where(last_loss > ideal, pow_up, pow_down),
        ),
    )


# --------------------------------------------------------------------------- #
# Duration loss (class-distance-weighted cross entropy)
# --------------------------------------------------------------------------- #


def duration_loss(
    pred: jax.Array,          # [B, T, C] class logits
    target: jax.Array,        # [B, T] class ids
    text_lengths: jax.Array,  # [B]
    class_weight: jax.Array,  # [C] per-class weights (inverse frequency)
    alpha: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """(ce, cdw) losses, batch-averaged with per-sample length masking —
    vectorised version of DurationLoss/CDW_CCELoss (losses.py:429-476)."""
    b, t, c = pred.shape
    classes = jnp.arange(c)
    distance = jnp.abs(classes[None, :] - classes[:, None])
    distance = jnp.minimum(distance, 7).astype(jnp.float32) ** alpha  # [C, C]

    valid = (jnp.arange(t)[None, :] < text_lengths[:, None]).astype(
        jnp.float32
    )  # [B, T]
    log_probs = jax.nn.log_softmax(pred, axis=-1)
    tgt_logp = jnp.take_along_axis(log_probs, target[..., None], axis=-1)[
        ..., 0
    ]
    w = class_weight[target] * valid  # [B, T]
    # per-sample weight normalisation over valid tokens
    w_norm = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-9)
    ce = -jnp.sum(tgt_logp * w_norm, axis=1)  # [B]

    d = distance[target]  # [B, T, C]
    d = d / (jnp.sum(d, axis=-1, keepdims=True) + 1e-9)
    cdw_terms = jnp.log(1.0 - jax.nn.softmax(pred, axis=-1) + 1e-9) * d
    denom = jnp.maximum(text_lengths.astype(jnp.float32), 1.0)
    cdw = -jnp.sum(cdw_terms.sum(-1) * valid, axis=1) / denom * 100.0

    return jnp.mean(ce), jnp.mean(cdw)


# --------------------------------------------------------------------------- #
# Misc
# --------------------------------------------------------------------------- #


def smooth_l1_loss(pred: jax.Array, target: jax.Array, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.mean(
        jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    )
