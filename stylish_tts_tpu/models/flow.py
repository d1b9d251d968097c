"""VITS-style normalizing flow: gated WaveNet couplings over the latent,
plus prior/posterior encoders (train/models/flow.py).

The flow transports (z, mean, logstd) triples in both directions, exactly
as the reference ResidualCouplingBlock does (flow.py:99-218).  Layout is
channels-last; the latent has ``flow_dim = decoder.hidden_dim // 4``
channels split into two coupling halves.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.stft import stft
from .norms import Conv1d

FlowTriple = Tuple[jax.Array, jax.Array, jax.Array]


class WaveNet(nn.Module):
    """Non-causal WaveNet with gated tanh/sigmoid units and global style
    conditioning (flow.py:17-96).  dilation_rate=1 in all reference uses."""

    hidden_channels: int
    kernel_size: int
    n_layers: int
    dilation_rate: int = 1
    cond_channels: int = 0
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                    # [B, T, H]
        mask: Optional[jax.Array] = None,  # [B, T, 1] or None
        cond: Optional[jax.Array] = None,  # [B, S]
        train: bool = False,  # positional: nn.remat static_argnums=(4,)
    ) -> jax.Array:
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if cond is not None:
            g_all = nn.Dense(2 * h * self.n_layers, name="cond_layer")(cond)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = Conv1d(
                2 * h, self.kernel_size, dilation=dilation, name=f"in_{i}"
            )(x)
            if cond is not None:
                x_in = x_in + g_all[:, None, 2 * h * i : 2 * h * (i + 1)]
            acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
            acts = nn.Dropout(self.dropout, deterministic=not train)(acts)
            if i < self.n_layers - 1:
                res_skip = nn.Dense(2 * h, name=f"res_skip_{i}")(acts)
                x = x + res_skip[..., :h]
                if mask is not None:
                    x = x * mask
                output = output + res_skip[..., h:]
            else:
                output = output + nn.Dense(h, name=f"res_skip_{i}")(acts)
        if mask is not None:
            output = output * mask
        return output


class ResidualCouplingLayer(nn.Module):
    """One affine coupling transporting (z, mean, logstd) halves
    (flow.py:155-218)."""

    half_channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    cond_channels: int = 0

    @nn.compact
    def __call__(
        self,
        zs, means, logstds,
        cond: Optional[jax.Array] = None,
        reverse: bool = False,
        train: bool = False,  # positional: nn.remat static_argnums=(5, 6)
    ):
        z0, z1 = zs
        mean0, mean1 = means
        logstd0, logstd1 = logstds
        h = nn.Dense(self.hidden_channels, name="pre")(z0)
        h = WaveNet(
            self.hidden_channels,
            self.kernel_size,
            self.n_layers,
            cond_channels=self.cond_channels,
            name="enc",
        )(h, cond=cond, train=train)
        mean_flow = nn.Dense(
            self.half_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_mean",
        )(h)
        logstd_flow = nn.Dense(
            self.half_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_logstd",
        )(h)
        if reverse:
            scale = jnp.exp(-logstd_flow)
            z1 = (z1 - mean_flow) * scale
            mean1 = (mean1 - mean_flow) * scale
            logstd1 = logstd1 - logstd_flow
        else:
            scale = jnp.exp(logstd_flow)
            z1 = mean_flow + z1 * scale
            mean1 = mean_flow + mean1 * scale
            logstd1 = logstd1 + logstd_flow
        return (z0, z1), (mean0, mean1), (logstd0, logstd1)


class ResidualCouplingBlock(nn.Module):
    """n_flows × (coupling + flip) (flow.py:99-151).

    ``remat=True`` checkpoints each coupling layer: the flow runs at the
    generator frame rate (4× mel), so its per-layer activations are among
    the largest in the acoustic step; recomputing them in the backward
    trades cheap conv FLOPs for the HBM that bounds the batch size."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    n_layers: int = 4
    n_flows: int = 8
    cond_channels: int = 0
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        mean: jax.Array,
        logstd: jax.Array,
        cond: Optional[jax.Array] = None,
        reverse: bool = False,
        *,
        train: bool = False,
    ) -> FlowTriple:
        half = self.channels // 2
        zs = (z[..., :half], z[..., half:])
        means = (mean[..., :half], mean[..., half:])
        logstds = (logstd[..., :half], logstd[..., half:])

        layer_cls = (
            nn.remat(ResidualCouplingLayer, static_argnums=(5, 6))
            if self.remat else ResidualCouplingLayer
        )
        layers = [
            layer_cls(
                half,
                self.hidden_channels,
                self.kernel_size,
                self.n_layers,
                cond_channels=self.cond_channels,
                name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]
        order = range(self.n_flows)
        if reverse:
            # reversed(flows) hits the Flip *before* each coupling
            for i in reversed(list(order)):
                zs, means, logstds = _flip(zs), _flip(means), _flip(logstds)
                zs, means, logstds = layers[i](
                    zs, means, logstds, cond, True, train
                )
        else:
            for i in order:
                zs, means, logstds = layers[i](
                    zs, means, logstds, cond, False, train
                )
                zs, means, logstds = _flip(zs), _flip(means), _flip(logstds)
        return (
            jnp.concatenate(zs, -1),
            jnp.concatenate(means, -1),
            jnp.concatenate(logstds, -1),
        )


def _flip(pair):
    a, b = pair
    return (b, a)


class PriorEncoder(nn.Module):
    """Linear heads producing (z, mean, logstd) from decoder features
    (flow.py:296-315); z is sampled with the 'sample' rng."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, *, sample: bool = True) -> FlowTriple:
        mean = nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_mean",
        )(x)
        logstd = nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_logstd",
        )(x)
        if sample:
            noise = jax.random.normal(
                self.make_rng("sample"), mean.shape, mean.dtype
            )
        else:
            noise = jnp.zeros_like(mean)
        return mean + noise * jnp.exp(logstd), mean, logstd


class PosteriorEncoder(nn.Module):
    """Waveform -> STFT mag/phase -> convs -> WaveNet -> (z, mean, logstd)
    (flow.py:234-293).  STFT runs at hop/4 = generator frame rate."""

    out_channels: int
    hidden_channels: int
    n_fft: int
    win_length: int
    hop_length: int
    kernel_size: int = 3
    n_layers: int = 12
    cond_channels: int = 0
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        audio: jax.Array,  # [B, T]
        cond: Optional[jax.Array] = None,
        *,
        sample: bool = True,
        train: bool = False,
    ) -> FlowTriple:
        real, imag = stft(
            audio,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
        )
        mag = jnp.abs(jax.lax.complex(real, imag)) + 1e-9
        phase = jnp.arctan2(imag, real)
        # the STFT runs f32 (ops/stft.py); return to the activation dtype
        # so bf16 mixed precision survives into the WaveNet below
        act_dtype = cond.dtype if cond is not None else audio.dtype
        mag = mag[:, :-1].astype(act_dtype)   # drop trailing frame
        phase = phase[:, :-1].astype(act_dtype)
        h = self.hidden_channels
        x = jnp.concatenate(
            [
                nn.Conv(h // 2, (1,), name="pre_spec")(mag),
                nn.Conv(h // 2, (1,), name="pre_phase")(phase),
            ],
            axis=-1,
        )
        wn_cls = (
            nn.remat(WaveNet, static_argnums=(4,))
            if self.remat else WaveNet
        )
        x = wn_cls(
            h,
            self.kernel_size,
            self.n_layers,
            cond_channels=self.cond_channels,
            name="enc",
        )(x, None, cond, train)
        mean = nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_mean",
        )(x)
        logstd = nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_logstd",
        )(x)
        if sample:
            noise = jax.random.normal(
                self.make_rng("sample"), mean.shape, mean.dtype
            )
        else:
            noise = jnp.zeros_like(mean)
        return mean + noise * jnp.exp(logstd), mean, logstd
