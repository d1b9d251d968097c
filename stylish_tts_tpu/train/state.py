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


def restrict_state(state: TrainState, keys) -> TrainState:
    """Stage-scoped view of the train state holding only ``keys`` modules.

    The TPU analogue of the reference's prepare_model, which moves models
    unused by the stage to CPU (train/stage.py:332-349): only the
    restricted view is passed to the jitted step, so stage-unused module
    params and their Adam moments never occupy HBM (~2.9 GiB of the
    default model zoo during the acoustic stage).  Scalar fields ride
    along in the view."""
    keys = set(keys)
    return state.replace(
        params={k: v for k, v in state.params.items() if k in keys},
        opt_states={k: v for k, v in state.opt_states.items() if k in keys},
        batch_stats={
            k: v for k, v in state.batch_stats.items() if k in keys
        },
    )


def merge_state(full: TrainState, device: TrainState) -> TrainState:
    """Fold a restricted device view's updates back into the full state
    (checkpoint save and stage hand-off)."""
    return full.replace(
        params={**full.params, **device.params},
        opt_states={**full.opt_states, **device.opt_states},
        batch_stats={**full.batch_stats, **device.batch_stats},
        disc_ema=device.disc_ema,
        log_priors=device.log_priors,
        prior_sum=device.prior_sum,
        prior_frames=device.prior_frames,
        priors_initialized=device.priors_initialized,
        step=device.step,
    )


def init_prior_state(n_classes: int):
    return dict(
        log_priors=jnp.zeros((n_classes,), jnp.float32),
        prior_sum=jnp.full((n_classes,), -1e30, jnp.float32),
        prior_frames=jnp.zeros((), jnp.float32),
        priors_initialized=jnp.zeros((), jnp.bool_),
    )
