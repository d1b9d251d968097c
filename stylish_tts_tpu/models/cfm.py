"""Conditional flow matching sampler with model-guidance CFG.

Parity: CfmSampler (train/models/cfm/cfm.py:24-137) — Euler ODE solver
over a linear t-span, optional classifier-free model guidance where the
(v_cond - v_uncond) delta is stop-gradiented, and the standard OT-CFM
pred/target construction.  TPU notes: the solver is a lax.fori_loop with a
static step count; condition dropout uses explicit rngs.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_pos_emb(x: jax.Array, dim: int, scale: float = 1000.0):
    """[B] timesteps -> [B, dim] embedding (cfm.py:6-22)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) / (half - 1) * jnp.arange(half, dtype=jnp.float32)
    )
    emb = scale * x[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class CfmSampler:
    """Wraps an estimator fn(x, t, **conds) -> velocity field."""

    def __init__(
        self,
        estimator: Callable,
        guidance_w: float = 0.7,
        cond_drop_prob: float = 0.0,
        non_drop_conds: List[str] = (),
        sigma_min: float = 1e-4,
    ):
        self.estimator = estimator
        self.guidance_w = guidance_w
        self.cond_drop_prob = cond_drop_prob
        self.non_drop_conds = set(non_drop_conds)
        self.sigma_min = sigma_min

    def sample(
        self,
        z: jax.Array,
        n_timesteps: int,
        temperature: float = 1.0,
        **conds,
    ) -> jax.Array:
        """Euler-solve the ODE from noise z (static step count)."""
        x = z * temperature
        dt = 1.0 / n_timesteps

        def step(i, x):
            t = jnp.full((x.shape[0],), i * dt, x.dtype)
            return x + dt * self.estimator(x, t=t, **conds)

        return jax.lax.fori_loop(0, n_timesteps, step, x)

    def _drop_conds(self, rng, batch, conds: Dict):
        cond_args, uncond_args = {}, {}
        for key, value in conds.items():
            cond, uncond = value, value
            if isinstance(value, jax.Array):
                if key not in self.non_drop_conds:
                    rng, k = jax.random.split(rng)
                    keep = (
                        jax.random.uniform(
                            k, (batch,) + (1,) * (value.ndim - 1)
                        )
                        > self.cond_drop_prob
                    )
                    cond = value * keep
                    uncond = jnp.zeros_like(value)
            cond_args[key] = cond
            uncond_args[key] = uncond
        return cond_args, uncond_args

    def compute_pred_target(self, rng: jax.Array, x1: jax.Array, **conds):
        """OT-CFM training pair (cfm.py:103-137).  x1 is [B, T, C]."""
        b = x1.shape[0]
        k_t, k_z, k_drop = jax.random.split(rng, 3)
        t = jax.random.uniform(k_t, (b, 1, 1), x1.dtype)
        z = jax.random.normal(k_z, x1.shape, x1.dtype)
        y = (1.0 - (1.0 - self.sigma_min) * t) * z + t * x1
        u = x1 - (1.0 - self.sigma_min) * z
        t_flat = t[:, 0, 0]

        if self.guidance_w == 0:
            return self.estimator(y, t=t_flat, **conds), u

        cond_args, uncond_args = self._drop_conds(k_drop, b, conds)
        v_cond = self.estimator(y, t=t_flat, **cond_args)
        v_uncond = self.estimator(y, t=t_flat, **uncond_args)
        delta = jax.lax.stop_gradient(v_cond - v_uncond)
        return v_cond + self.guidance_w * delta, u
