"""Train state PyTree: params / optimizer states / norm collections plus
the small scalar state machines the reference keeps on the host —
the discriminator-loss EMA (losses.py:281-307) and the CTC label-prior
accumulators (losses.py:540-639) — moved into the compiled step."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_states: Dict[str, Any]
    batch_stats: Dict[str, Any]          # BN / spectral-norm collections
    disc_ema: Dict[str, jax.Array]       # per-discriminator plain-loss EMA
    log_priors: jax.Array                # [C] CTC label priors
    prior_sum: jax.Array                 # [C] log-space epoch accumulator
    prior_frames: jax.Array              # [] frame count this epoch
    priors_initialized: jax.Array        # [] bool
    step: jax.Array                      # [] int32 step within stage

    def bump(self) -> "TrainState":
        return self.replace(step=self.step + 1)


def init_prior_state(n_classes: int):
    return dict(
        log_priors=jnp.zeros((n_classes,), jnp.float32),
        prior_sum=jnp.full((n_classes,), -1e30, jnp.float32),
        prior_frames=jnp.zeros((), jnp.float32),
        priors_initialized=jnp.zeros((), jnp.bool_),
    )
