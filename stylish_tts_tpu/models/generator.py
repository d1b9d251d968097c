"""'freegan' vocoder head: pseudo-constant-power harmonic (PCPH) prior +
style-conditioned ConvNeXt stack -> log-magnitude & phase -> iSTFT.

Parity: train/models/generator.py:247-438 (APNet2/LightVoc lineage).

TPU re-design of the PCPH prior (generate_pcph, generator.py:247-315): the
reference computes a data-dependent harmonic count and a float64 cumsum over
samples; we instead use the fixed 16-harmonic cap with the Nyquist mask
(mathematically identical, static shapes) and split the phase integral into
a frame-level cumsum plus a within-frame ramp, which is exact because F0 is
piecewise-constant per frame — no float64 needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.stft import STFTHead
from .convnext import StyleConvNeXtBlock
from .norms import AdaptiveLayerNorm, Conv1d

MAX_HARMONICS = 16


@jax.tree_util.register_dataclass
@dataclass
class DecoderPrediction:
    """Vocoder output bundle (reference train/utils.py DecoderPrediction)."""

    audio: jax.Array       # [B, T_samples]
    magnitude: jax.Array   # [B, frames+1, n_fft//2+1] log-amplitude
    phase: jax.Array       # [B, frames+1, n_fft//2+1]
    text_stats: Optional[tuple] = None
    text2mel_stats: Optional[tuple] = None
    mel_stats: Optional[tuple] = None
    mel2text_stats: Optional[tuple] = None


def generate_pcph(
    f0: jax.Array,          # [B, F] frame-rate F0 in Hz
    voiced: jax.Array,      # [B, F] 1.0 where voiced
    rng: jax.Array,
    *,
    hop_length: int,
    sample_rate: int,
    noise_amplitude: float = 0.01,
    random_init_phase: bool = True,
    power_factor: float = 0.1,
) -> jax.Array:
    """Pseudo-constant-power harmonic waveform [B, F * hop_length].

    Always computed in f32: the frame-level phase cumsum is exact in f32
    (module docstring) but NOT in bf16, where rounding over hundreds of
    frames would detune every harmonic."""
    f0 = f0.astype(jnp.float32)
    voiced = voiced.astype(jnp.float32)
    b, frames = f0.shape
    n_samples = frames * hop_length
    k_noise, k_phase = jax.random.split(rng)
    noise = noise_amplitude * jax.random.normal(k_noise, (b, n_samples))

    vuv = jnp.round(voiced) > 0.5
    # per-frame harmonic count for the constant-power amplitude
    n_harm = jnp.where(vuv, sample_rate / 2.0 / jnp.maximum(f0, 1e-5), 1.0)
    amplitude = vuv * power_factor * jnp.sqrt(2.0 / n_harm)  # [B, F]

    indices = jnp.arange(1, MAX_HARMONICS + 1, dtype=jnp.float32)
    # harmonic mask at frame rate: harmonic below Nyquist
    harmonic_mask = (
        f0[:, None, :] * indices[None, :, None] <= sample_rate / 2.0
    )  # [B, H, F]

    # exact phase integral: frame-level cumsum + within-frame ramp
    radians_per_sample = f0 / sample_rate  # [B, F]
    frame_base = jnp.cumsum(radians_per_sample * hop_length, axis=1)
    frame_base = jnp.concatenate(
        [jnp.zeros((b, 1)), frame_base[:, :-1]], axis=1
    )  # exclusive cumsum [B, F]
    ramp = jnp.arange(1, hop_length + 1, dtype=jnp.float32)  # [hop]
    # cum[s] for sample j of frame t = frame_base[t] + (j+1) * f0[t]/sr
    cum = (
        frame_base[:, :, None] + ramp[None, None, :] * radians_per_sample[:, :, None]
    ).reshape(b, n_samples)
    if random_init_phase:
        cum = cum + jax.random.uniform(k_phase, (1, 1))

    phases = 2.0 * jnp.pi * cum[:, None, :] * indices[None, :, None]
    harmonics = jnp.sin(phases)  # [B, H, n_samples]
    mask_samples = jnp.repeat(
        harmonic_mask.astype(jnp.float32), hop_length, axis=2
    )
    amp_samples = jnp.repeat(amplitude, hop_length, axis=1)  # [B, n_samples]
    wave = amp_samples * jnp.sum(harmonics * mask_samples, axis=1)
    return wave + noise


class Generator(nn.Module):
    """mel latent [B, F, input_dim] + style + frame-rate pitch -> audio."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        mel: jax.Array,     # [B, F, input_dim]
        style: jax.Array,   # [B, S]
        pitch: jax.Array,   # [B, F] frame-rate F0 (generator rate = hop/4)
        energy: jax.Array,  # [B, F] (unused by freegan, parity with ref)
        *,
        train: bool = False,
    ) -> DecoderPrediction:
        mc = self.config
        gc = mc.generator
        n_fft = mc.n_fft
        hop = mc.hop_length // 4
        freq_bins = n_fft // 2 + 1
        stft_head = STFTHead(n_fft, hop, mc.win_length)

        # ---- harmonic prior (no gradient) ---------------------------------
        prior = generate_pcph(
            jax.lax.stop_gradient(pitch),
            (jax.lax.stop_gradient(pitch) > 10.0).astype(jnp.float32),
            self.make_rng("sample"),
            hop_length=hop,
            sample_rate=mc.sample_rate,
        )
        prior = jax.lax.stop_gradient(prior)
        har_mag, har_cos, har_sin = stft_head.transform(prior)
        har_phase = jnp.arctan2(har_sin, har_cos)
        # back to the activation dtype after the f32 prior/STFT chain
        har_mag = har_mag[:, :-1].astype(mel.dtype)
        har_phase = har_phase[:, :-1].astype(mel.dtype)

        logamp_prior = Conv1d(gc.hidden_dim // 2, 7, name="amp_prior_conv")(
            har_mag
        )
        phase_prior = Conv1d(gc.hidden_dim // 2, 7, name="phase_prior_conv")(
            har_phase
        )
        x = jnp.concatenate([mel, logamp_prior, phase_prior], axis=-1)
        x = nn.Conv(gc.hidden_dim, (1,), name="projector")(x)
        for i, k in enumerate((31, 15, 7, 3)):
            x = StyleConvNeXtBlock(
                gc.hidden_dim, gc.conv_intermediate_dim, kernel=k,
                name=f"convnext_{i}",
            )(x, style)

        logamp = AdaptiveLayerNorm(name="amp_final_norm")(x, style)
        logamp = Conv1d(
            freq_bins, gc.io_conv_kernel_size, name="amp_output_conv"
        )(jnp.concatenate([logamp, logamp_prior], axis=-1))
        phase = AdaptiveLayerNorm(name="phase_final_norm")(x, style)
        phase = Conv1d(
            freq_bins, gc.io_conv_kernel_size, name="phase_output_conv"
        )(jnp.concatenate([phase, phase_prior], axis=-1))

        # replicate-pad one trailing frame (reference generator.py:425-426)
        logamp = jnp.concatenate([logamp, logamp[:, -1:]], axis=1)
        phase = jnp.concatenate([phase, phase[:, -1:]], axis=1)

        spec = jnp.exp(logamp)
        audio = stft_head.inverse(spec, jnp.cos(phase), jnp.sin(phase))
        audio = jnp.tanh(audio)
        return DecoderPrediction(audio=audio, magnitude=logamp, phase=phase)
