"""SimAM-ResNet34 + attentive-statistics-pooling speaker embedder.

The reference's frozen speaker conditioner is wespeaker's "vblinkp" model
(voxblink2_samresnet34) with its final bottleneck removed, so stages
consume the 10240-d pre-bottleneck statistics vector
(train/models/ssl.py:34-67: `wespeaker.load_model("vblinkp")`,
`model.model.bottleneck = nn.Identity()`).  This is an architecture-exact
flax build of that network so the published checkpoint converts
(models/torch_convert.py:convert_wespeaker + scripts/convert_wespeaker.py):

* front: 2-D ResNet34 (3/4/6/3 SimAM basic blocks, 64 base channels) over
  [B, T, F=80, 1] Kaldi fbank features; SimAM is the parameter-free
  attention of Yang et al. — no weights to convert beyond conv/BN;
* pooling: ASP — attention over the flattened [C·F/8] channel axis
  (conv1d 128 bottleneck + softmax over time), weighted mean ‖ std;
* bottleneck: intentionally ABSENT (the reference strips it).

The wespeaker package itself cannot be installed air-gapped; layer naming
follows its `SimAM_ResNet34_ASP` (front.*, pooling.attention.*) so a real
checkpoint's state_dict maps 1:1 — fill_from_flat shape-checks every leaf
at convert time, which catches any structural drift.

TPU notes: channels-last NHWC convs (MXU native); BatchNorm runs in
inference mode with converted running stats (the model is always frozen).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def simam(x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Parameter-free SimAM attention over [B, H, W, C] (per channel):
    weight = sigmoid(((x-μ)² / (4·(σ²+λ)) + 0.5))."""
    # statistics over the spatial dims (H, W) per sample/channel
    n = x.shape[1] * x.shape[2] - 1
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    d = (x - mean) ** 2
    v = jnp.sum(d, axis=(1, 2), keepdims=True) / n
    e_inv = d / (4.0 * (v + eps)) + 0.5
    return x * jax.nn.sigmoid(e_inv)


class _BN(nn.Module):
    """Frozen inference-mode BatchNorm over the channel axis.  The whole
    network is permanently frozen (the reference never trains it), so the
    converted running stats live in the params collection as constants —
    this keeps the single-tree frozen-params plumbing of
    StageContext.ssl_features."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + 1e-5)
        return (x - mean) * inv * scale + bias


class SimAMBasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_planes = x.shape[-1]
        h = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, name="conv1",
        )(x)
        h = _BN(name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv2",
        )(h)
        h = _BN(name="bn2")(h)
        h = simam(h)
        if self.stride != 1 or in_planes != self.planes:
            x = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            x = _BN(name="downsample_bn")(x)
        return nn.relu(h + x)


class SimAMResNet34(nn.Module):
    """front: [B, T, F, 1] -> [B, T/8, F/8, 8·m] feature maps."""

    m_channels: int = 64
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        m = self.m_channels
        x = nn.Conv(
            m, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv1",
        )(x)
        x = nn.relu(_BN(name="bn1")(x))
        for stage, (blocks, planes, stride) in enumerate(
            zip(self.layers, (m, 2 * m, 4 * m, 8 * m), (1, 2, 2, 2))
        ):
            for i in range(blocks):
                x = SimAMBasicBlock(
                    planes, stride if i == 0 else 1,
                    name=f"layer{stage + 1}_{i}",
                )(x)
        return x


class ASP(nn.Module):
    """Attentive statistics pooling over time: [B, T', D] -> [B, 2D]."""

    bottleneck: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        w = nn.Conv(self.bottleneck, (1,), name="att_in")(x)
        w = nn.relu(w)
        w = _BN(name="att_bn")(w)
        w = nn.Conv(d, (1,), name="att_out")(w)
        w = jax.nn.softmax(w, axis=1)  # over time
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(
            jnp.clip(jnp.sum(x * x * w, axis=1) - mu * mu, 1e-5, None)
        )
        return jnp.concatenate([mu, sg], axis=-1)


class SimAMResNet34ASP(nn.Module):
    """fbank [B, T, n_mels] -> pre-bottleneck embedding
    [B, 2·8m·(n_mels/8)] (10240 at the published 80-mel / 64-channel
    size).  Mirrors wespeaker SimAM_ResNet34_ASP with bottleneck removed."""

    m_channels: int = 64
    n_mels: int = 80

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        # spatial orientation must match the torch kernels: (H=freq,
        # W=time) — conv weights are not transpose-symmetric
        x = SimAMResNet34(self.m_channels, name="front")(
            feats.transpose(0, 2, 1)[..., None]
        )  # [B, F', T', C]
        b, f, t, c = x.shape
        # wespeaker flattens (C, F) into the stats axis, C-major
        x = x.transpose(0, 2, 3, 1).reshape(b, t, c * f)
        return ASP(name="pooling")(x)
