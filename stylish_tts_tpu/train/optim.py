"""Per-module AdamW with the logical-axis cosine schedule and the
gap-aware discriminator learning rate.

Parity with the reference MultiOptimizer (train/optimizers.py): one AdamW
per model key (wd=1e-4, betas=(0.85, 0.99), eps=1e-9); generator modules
follow a cosine schedule over a logical 10k-step axis rescaled to the
stage length with a plateau at 90 %; discriminator LR is slaved every step
to generator LR × a multiplier derived from the EMA of the disc loss.

TPU re-design: the EMA lives in the train state and the multiplier is a
pure function (losses.disc_lr_multiplier), so the whole LR logic stays
inside the compiled step — no host round-trip per step.  We implement this
with ``optax.inject_hyperparams`` so the learning rate is a state field we
overwrite functionally each step.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

LOGICAL_STEP_LIMIT = 10_000
PLATEAU = 0.9


def cosine_logical_lr(
    base_lr: float, step: jax.Array, step_limit: int
) -> jax.Array:
    """transformers.get_cosine_schedule_with_warmup on the logical axis
    (warmup 0), with the 90 % plateau (optimizers.py:94-101)."""
    logical = step * LOGICAL_STEP_LIMIT // max(step_limit, 1)
    logical = jnp.minimum(logical, int(LOGICAL_STEP_LIMIT * PLATEAU))
    progress = logical.astype(jnp.float32) / LOGICAL_STEP_LIMIT
    return base_lr * jnp.maximum(
        0.0, 0.5 * (1.0 + jnp.cos(math.pi * 2.0 * 0.5 * progress))
    )


def make_optimizer() -> optax.GradientTransformation:
    """AdamW with an injectable learning rate."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0,
        b1=0.85,
        b2=0.99,
        eps=1e-9,
        weight_decay=1e-4,
    )


def init_opt_states(params: Dict[str, Any]) -> Dict[str, Any]:
    """One optimizer state per module, over the *flattened* param vector.

    A model here has O(1000) small leaves; per-leaf adam updates become
    thousands of lane-padded micro-kernels on TPU (measured ~4 s/step for
    one module).  Flattening to a single f32 vector turns the update into
    five fused vector ops."""
    import jax.flatten_util

    opt = make_optimizer()
    out = {}
    for key in params:
        flat, _ = jax.flatten_util.ravel_pytree(params[key])
        out[key] = opt.init(flat)
    return out


def set_learning_rate(opt_state, lr: jax.Array):
    """Functionally override the injected learning rate."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = lr
    return opt_state._replace(hyperparams=hyperparams)


def apply_updates(params, grads, opt_state, lr: jax.Array):
    """One AdamW step for a single module at the given LR (flat-vector)."""
    import jax.flatten_util

    flat_params, unravel = jax.flatten_util.ravel_pytree(params)
    flat_grads, _ = jax.flatten_util.ravel_pytree(grads)
    opt = make_optimizer()
    opt_state = set_learning_rate(opt_state, lr)
    updates, new_opt_state = opt.update(flat_grads, opt_state, flat_params)
    return unravel(optax.apply_updates(flat_params, updates)), new_opt_state
